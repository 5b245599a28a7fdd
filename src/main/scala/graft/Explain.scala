package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: prints the formatted physical plan of selected queries so scan
  * pruning (PushedFilters/ReadSchema), join strategies (BroadcastHashJoin)
  * and WholeStageCodegen coverage can be reviewed. Usage:
  *   sbt 'runMain graft.Explain q03_region_revenue s01_knn_brute ...'
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (n <- names; fn <- SparkEntry.queries.get(n)) {
      println(s"\n========== $n ==========")
      fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
