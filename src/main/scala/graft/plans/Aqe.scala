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
  def without[A](spark: SparkSession)(f: => A): A = {
    val k = "spark.sql.adaptive.enabled"
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, "false")
    try f
    finally prev match {
      case Some(v) => spark.conf.set(k, v)
      case None => spark.conf.unset(k)
    }
  }
}
