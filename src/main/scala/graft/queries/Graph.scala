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
    val nodes = Tables.documents(s, d).select(col("doc_id"))
    val edges = nodes
      .filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id").as("src"), (col("doc_id") - 1).as("dst"))
    val cc = ConnectedComponents.run(edges)
      .select(col("node").as("doc_id"), col("comp").as("component"))
    // CC only emits nodes that appear in an edge; an ISOLATED node (a chain
    // head at the end of the id range, e.g. n-1 when (n-1) % 50 == 0) is its
    // own component — rejoin the full node set so the output covers every
    // doc exactly like the oracle's closed form (latent n-dependent parity
    // break; current SFs all have n % 50 == 0 and never exercise it)
    nodes.join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
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
      |  SELECT doc_id, 0 AS depth FROM documents WHERE doc_id = 0
      |  UNION ALL
      |  SELECT d.doc_id, r.depth + 1
      |  FROM documents d JOIN r ON d.doc_id // 2 = r.doc_id
      |  WHERE d.doc_id > 0)
      |SELECT doc_id, CAST(depth AS INT) AS depth FROM r ORDER BY doc_id""".stripMargin

  // g03: PageRank, the canonical web-scale iterative operator. Graph: every
  // doc links to (id+1) % N (ring — guarantees in-degree >= 1 everywhere) and
  // (2*id+1) % N (doubling shortcut), so out-degree is exactly 2 and there
  // are no dangling nodes to special-case. Fixed 8 power iterations with
  // damping 0.85 in SCALED INTEGER arithmetic (pr in 1e-12 units): float
  // PageRank can never be driver-hash-exact because double addition is not
  // associative and shuffle order varies, but BIGINT sums are exact and
  // order-free, and both engines define DIV/% identically on nonnegative
  // ints. Per iteration: contribution = pr DIV outdeg (outdeg == 2), then
  // pr' = (15 * (SCALE DIV N)) DIV 100 + (85 * sum_in) DIV 100.
  // Scale shape: the loop is join(pr, edges on src) + groupBy(dst) sum —
  // the same shuffle pair a 100 TB PageRank runs, with the edge frame
  // checkpointed once and reused; rounds are fixed (no convergence collect).
  private val PrScale = 1000000000000L
  private val PrIters = 8

  def g03PageRank(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id")).localCheckpoint(true)
    val n = docs.count() // one count over the cached id column
    require(n > 0, "g03 PageRank needs a non-empty documents table — " +
      "the ring edges and the 1/N teleport mass are undefined at N = 0")
    val edges = docs.selectExpr("doc_id AS src", s"(doc_id + 1) % $n AS dst")
      .unionAll(docs.selectExpr("doc_id AS src", s"(doc_id * 2 + 1) % $n AS dst"))
      .localCheckpoint(eager = true) // reused every round
    val teleport = 15L * (PrScale / n) / 100
    graft.plans.Aqe.without(s) {
      var pr = docs.selectExpr("doc_id AS node", s"CAST(${PrScale / n} AS BIGINT) AS pr")
      for (_ <- 1 to PrIters) {
        pr = edges.join(pr.withColumnRenamed("node", "src"), Seq("src"))
          .selectExpr("dst", "pr DIV 2 AS c")
          .groupBy(col("dst")).agg(sum(col("c")).as("sum_in"))
          .selectExpr("dst AS node", s"$teleport + (85 * sum_in) DIV 100 AS pr")
          .localCheckpoint(eager = true) // leaf per round: plans stay O(round)
      }
      pr.selectExpr("node AS doc_id", "pr AS pr_e12").orderBy(col("doc_id"))
    }
  }

  // The oracle unrolls the 8 iterations as a CTE chain (recursive CTEs cannot
  // aggregate over the recursive reference). CASTs keep DuckDB's sum() from
  // widening to HUGEINT and breaking BIGINT schema parity.
  val g03Sql: String = {
    val n = "(SELECT count(*) FROM documents)"
    val head =
      s"""WITH e AS (
         |  SELECT doc_id AS src, (doc_id + 1) % $n AS dst FROM documents
         |  UNION ALL
         |  SELECT doc_id AS src, (doc_id * 2 + 1) % $n AS dst FROM documents),
         |p0 AS (SELECT doc_id AS node, CAST($PrScale // $n AS BIGINT) AS pr FROM documents)""".stripMargin
    val iters = (1 to PrIters).map { i =>
      s"""p$i AS (
         |  SELECT e.dst AS node,
         |    CAST((15 * ($PrScale // $n)) // 100
         |      + (85 * CAST(sum(p${i - 1}.pr // 2) AS BIGINT)) // 100 AS BIGINT) AS pr
         |  FROM e JOIN p${i - 1} ON e.src = p${i - 1}.node
         |  GROUP BY e.dst)""".stripMargin
    }
    (Seq(head) ++ iters).mkString(",\n") +
      s"\nSELECT node AS doc_id, pr AS pr_e12 FROM p$PrIters ORDER BY node"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g01_cc_chains" -> (g01CcChains _),
    "g02_tree_depth" -> (g02TreeDepth _),
    "g03_pagerank" -> (g03PageRank _))

  val oracleSql: Map[String, String] = Map(
    "g01_cc_chains" -> g01Sql,
    "g02_tree_depth" -> g02Sql,
    "g03_pagerank" -> g03Sql)
}
