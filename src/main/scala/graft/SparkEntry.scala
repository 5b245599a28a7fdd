package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Dedup, Graph, Relational, Similarity, Sketches, TextAnalysis, TrainingMix}
import graft.multimodal.Multimodal
import graft.streaming.StreamingQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator surface: relational (agg/join/window/set
  * ops), text analysis, dedup, similarity search, iterative graph ops, and
  * the KG-construction pipeline queries. Each map key that also appears in
  * `oracleSql` is checked row/schema/hash-exact against DuckDB by the driver;
  * the rest are rows-only checked and gated by ScalaTest instead.
  */
object SparkEntry {

  /** Flagship on sf0.001: the KG pipeline entry (driver smoke-checks rows>0). */
  def entry(spark: SparkSession): DataFrame =
    KgPipeline.entry(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextAnalysis.queries ++ Dedup.queries ++
      Similarity.queries ++ Graph.queries ++ Multimodal.queries ++
      StreamingQueries.queries ++ TrainingMix.queries ++ Sketches.queries ++
      KgPipeline.queries

  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ TextAnalysis.oracleSql ++ Dedup.oracleSql ++
      Similarity.oracleSql ++ Graph.oracleSql ++ Multimodal.oracleSql ++
      StreamingQueries.oracleSql ++ TrainingMix.oracleSql ++
      Sketches.oracleSql ++ KgPipeline.oracleSql
}
