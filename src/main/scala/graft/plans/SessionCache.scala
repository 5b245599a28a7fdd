package graft.plans

import org.apache.spark.sql.SparkSession

/** Session-keyed shared-frame cache — the one implementation of the
  * lifecycle discipline that KgPipeline (triples/edges/enriched/metrics) and
  * Dedup (LSH prologue) both need:
  *
  *  - keys are (SparkSession REFERENCE, sf dir): a cached frame is bound to
  *    the session that built it, so a restarted session rebuilds instead of
  *    receiving stale frames that fail at execution (SparkSession does not
  *    override equals, so case-class equality is reference equality);
  *  - `computeIfAbsent`, not TrieMap.getOrElseUpdate: the latter can run the
  *    builder twice under concurrent first calls and leak the losing
  *    builder's materialized blocks;
  *  - entries of stopped sessions are purged on access so a dead session's
  *    object graph isn't pinned for the life of the JVM — but NEVER from a
  *    thread that is inside THIS map's own computeIfAbsent.
  *
  * That last point is the reason this class exists: ConcurrentHashMap forbids
  * a mapping function from modifying its own map (even other keys — the
  * in-flight bin is locked, and a same-thread remove() can detach the bin the
  * pending insert lands in, silently losing the fresh entry and stranding its
  * blocks). Builder chains make that easy to hit by accident: the edges
  * builder calls triples(), and when every accessor purged every cache, the
  * nested call purged the map whose computeIfAbsent was in-flight on the same
  * thread. Here each cache purges only ITSELF, and a ThreadLocal guard skips
  * the purge while this thread is inside this map's builder. Concurrent
  * purges from OTHER threads are fine — that is ordinary CHM concurrency.
  */
final class SessionCache[V](name: String) {
  import SessionCache.Key

  private val map = new java.util.concurrent.ConcurrentHashMap[Key, V]()
  private val inBuild: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial(() => java.lang.Boolean.FALSE)

  /** The cached value for (session, dir), building it under the map's bin
    * lock if absent. `build` runs at most once per key across threads.
    */
  def get(session: SparkSession, dir: String)(build: => V): V = {
    if (!inBuild.get()) purge()
    map.computeIfAbsent(Key(session, dir), _ => {
      val prev = inBuild.get()
      inBuild.set(java.lang.Boolean.TRUE)
      try build finally inBuild.set(prev)
    })
  }

  private def purge(): Unit = {
    val it = map.keySet().iterator()
    while (it.hasNext) if (it.next().session.sparkContext.isStopped) it.remove()
  }

  /** Apply `f` to every cached value (release hooks). */
  def foreachValue(f: V => Unit): Unit = map.values.forEach(v => f(v))

  def clear(): Unit = map.clear()

  override def toString: String = s"SessionCache($name, ${map.size()} entries)"
}

object SessionCache {
  private final case class Key(session: SparkSession, dir: String)
}
