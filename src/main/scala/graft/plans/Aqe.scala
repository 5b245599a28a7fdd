package graft.plans

import org.apache.spark.sql.SparkSession

/** AQE toggle for iterative fixed-point algorithms (connected components,
  * frontier BFS): each round's frames are tiny and already shaped, so AQE's
  * per-stage materialization barriers + replanning dominate the round cost —
  * measured 4-6× on this workload (BENCH/BASELINE.md). At bulk-scan scale
  * AQE earns its keep (skew splitting, coalescing); inside a small-frame
  * loop it is pure latency. Standard practice for GraphFrames-style jobs.
  */
object Aqe {
  // Session conf is shared mutable state: two overlapping without-blocks
  // would corrupt each other's save/restore (A restores mid-B, B's loop
  // runs AQE-on, B "restores" A's off). Serialize windows PER SESSION (a
  // global lock would also serialize unrelated sessions and could deadlock
  // a window that waits on another thread's window on a different session);
  // the lock is reentrant, so nested without-blocks on one thread (e.g. a
  // kg query wrapping ConnectedComponents.run) are fine. Residual
  // (documented): unrelated queries submitted on the same session DURING a
  // window plan without AQE — a perf-only effect; use a dedicated session
  // per concurrent stream if that matters.
  private val locks =
    new java.util.WeakHashMap[SparkSession, java.util.concurrent.locks.ReentrantLock]()
  private def lockFor(s: SparkSession) = locks.synchronized {
    var l = locks.get(s)
    if (l == null) { l = new java.util.concurrent.locks.ReentrantLock(); locks.put(s, l) }
    l
  }

  def without[A](spark: SparkSession)(f: => A): A = {
    val k = "spark.sql.adaptive.enabled"
    // opt-in loop fan-out: per-round frontier frames are tiny, so a session
    // may pin a smaller shuffle width inside fixed-point loops
    // (graft.loop.shufflePartitions; the bench session sets 8). Unset by
    // default — at cluster scale per-round frames can be large and the
    // session-wide width (or AQE coalescing) is the right answer.
    val kp = "spark.sql.shuffle.partitions"
    val lock = lockFor(spark)
    // tryLock with a timeout: `f` can run long, and a cross-thread wait
    // cycle (this thread holds lock X and waits on a thread needing X)
    // must degrade, not deadlock. On timeout, run WITHOUT the conf swap —
    // AQE stays as-is for this window (a perf-only effect), correctness is
    // unaffected.
    val locked = lock.tryLock(60, java.util.concurrent.TimeUnit.SECONDS)
    if (!locked) {
      // degrade loudly: this fires on ANY >60s holder (ordinary contention,
      // not just a wait cycle), and the window then runs with whatever AQE/
      // shuffle-width state the holder has pinned — perf-only, but it must
      // be visible in the log when timings look odd
      System.err.println("[graft] Aqe.without: lock timeout after 60s — " +
        "running this window WITHOUT the conf swap (AQE state inherited)")
      return f
    }
    try {
      val prev = spark.conf.getOption(k)
      val loopParts = spark.conf.getOption("graft.loop.shufflePartitions")
      val prevParts = spark.conf.getOption(kp)
      spark.conf.set(k, "false")
      loopParts.foreach(spark.conf.set(kp, _))
      try f
      finally {
        prev match {
          case Some(v) => spark.conf.set(k, v)
          case None => spark.conf.unset(k)
        }
        if (loopParts.isDefined) prevParts match {
          case Some(v) => spark.conf.set(kp, v)
          case None => spark.conf.unset(kp)
        }
      }
    } finally lock.unlock()
  }
}
