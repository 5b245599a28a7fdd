package graft.queries

import graft.canon.ConnectedComponents
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Iterative-graph operators with arithmetic oracles: the driver `documents`
  * doc_ids (dense 0..n-1) induce deterministic graphs whose closed-form
  * answers DuckDB can state directly (chains for CC) or compute with a
  * recursive CTE (tree depth). These exercise the same iterative-join
  * machinery the KG pipeline uses for canonicalization (SURVEY.md §4.2) and
  * the topic-closure query Q3.
  */
object Graph {

  // g01: CC over 50-node chains: edge (id, id-1) unless id % 50 == 0.
  // component(min label) = id - id % 50. A 50-long chain forces the
  // pointer-jumping path (log rounds), not just 1-hop propagation.
  def g01CcChains(s: SparkSession, d: String): DataFrame = {
    val edges = Tables.documents(s, d)
      .select(col("doc_id"))
      .filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id").as("src"), (col("doc_id") - 1).as("dst"))
    ConnectedComponents.run(edges)
      .select(col("node").as("doc_id"), col("comp").as("component"))
      .orderBy(col("doc_id"))
  }

  val g01Sql: String =
    """SELECT doc_id, doc_id - (doc_id % 50) AS component
      |FROM documents ORDER BY doc_id""".stripMargin

  // g02: depth in the binary tree parent(n) = n DIV 2 (root 0), computed by
  // iterative frontier expansion (the bounded transitive-closure loop of
  // reference Q3, create_events_per_month_diagram.py:31-38).
  def g02TreeDepth(s: SparkSession, d: String): DataFrame = {
    val nodes = Tables.documents(s, d).select(col("doc_id")).localCheckpoint(true)
    val edges = nodes.filter(col("doc_id") > 0)
      .selectExpr("doc_id AS child", "doc_id DIV 2 AS parent")
    var frontier = nodes.filter(col("doc_id") === 0)
      .select(col("doc_id"), lit(0).as("depth"))
    var acc = frontier
    var productive = 0
    var done = false
    while (!done) {
      val next = edges.join(frontier.withColumnRenamed("doc_id", "parent"), Seq("parent"))
        .select(col("child").as("doc_id"), (col("depth") + 1).as("depth"))
        .localCheckpoint(eager = true)
      if (next.isEmpty) done = true
      else {
        productive += 1
        // same policy as canon.Reach: the cap is a corruption guard counting
        // only PRODUCTIVE rounds (tree depth is log2(n); 64 covers any
        // conceivable corpus), never a silent truncation of the result
        require(productive <= 64, "g02 BFS exceeded 64 productive rounds — " +
          "doc_id tree deeper than 2^64 is impossible, so the input is corrupt")
        acc = acc.union(next); frontier = next
      }
    }
    acc.select(col("doc_id"), col("depth").cast(IntegerType).as("depth"))
      .orderBy(col("doc_id"))
  }

  val g02Sql: String =
    """WITH RECURSIVE r AS (
      |  SELECT CAST(0 AS BIGINT) AS doc_id, 0 AS depth
      |  UNION ALL
      |  SELECT d.doc_id, r.depth + 1
      |  FROM documents d JOIN r ON d.doc_id // 2 = r.doc_id
      |  WHERE d.doc_id > 0)
      |SELECT doc_id, CAST(depth AS INT) AS depth FROM r ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g01_cc_chains" -> (g01CcChains _),
    "g02_tree_depth" -> (g02TreeDepth _))

  val oracleSql: Map[String, String] = Map(
    "g01_cc_chains" -> g01Sql,
    "g02_tree_depth" -> g02Sql)
}
