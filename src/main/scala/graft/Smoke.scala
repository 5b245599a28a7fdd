package graft

import org.apache.spark.sql.SparkSession

/** Local stand-in for the driver's t1 smoke check: runs SparkEntry.entry and
  * prints its row count (must be > 0) plus a sample.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows=$n")
    df.show(5, truncate = 120)
    require(n > 0, "entry must return rows")
    spark.stop()
  }
}
