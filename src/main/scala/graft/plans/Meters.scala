package graft.plans

/** Last-observed counters for the iterative operators (frontier/pointer-jump
  * round counts). The growth lap (BENCH/BASELINE.md §growth) charts these
  * against corpus scale to evidence the O(log n)/O(diameter) round claims
  * with measurements instead of arguments; on a cluster the same numbers
  * would feed job metrics. Plain last-write-wins registry — loops run
  * driver-side, one at a time per query.
  */
object Meters {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, Long]()

  def set(key: String, value: Long): Unit = m.put(key, value)

  def get(key: String): Option[Long] = Option(m.get(key))

  def snapshot: Map[String, Long] = {
    val b = Map.newBuilder[String, Long]
    m.forEach((k, v) => b += (k -> v))
    b.result()
  }
}
