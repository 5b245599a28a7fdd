package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** KG-construction pipeline facade (synth corpus → parse → enrich → canon →
  * emit). Queries land here as the pipeline modules are built (SURVEY.md §7
  * build order); they are rows-only checked by the driver and P/R-gated by
  * ScalaTest fixtures.
  */
object KgPipeline {

  /** Flagship: full pipeline at tiny scale — returns the triple DataFrame. */
  def entry(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet").limit(1)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracleSql: Map[String, String] = Map()
}
