package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Plan-audit dump: `explain("formatted")` for a representative slice of the
  * query surface, one text file per query. This is how the plan claims in
  * COVERAGE.md / BENCH/BASELINE.md are re-checkable without running anything:
  * `ReadSchema` shows column pruning reached the parquet scan, `PushedFilters`
  * shows predicate pushdown, `BroadcastHashJoin`/`SortMergeJoin` nodes show
  * which side broadcasts, and `Exchange` nodes count the shuffles.
  *
  * Iterative queries (g01/g02/g03, kg04, kg08) are deliberately absent: their
  * returned frame is the final fixpoint leaf (a LogicalRDD), so the printed
  * plan would show none of the per-round work — their plan story is the loop
  * code plus the round-latency notes in BENCH/BASELINE.md.
  *
  * Usage: `sbt 'runMain graft.ExplainDump /root/testdata/sf0.01 BENCH/plans'`;
  * extra args select specific queries instead of the curated default slice
  * (unknown names fail loudly). This is the ONE explain tool — it replaced
  * the stdout-only `graft.Explain`, which silently skipped unknown names and
  * had drifted on session config.
  */
object ExplainDump {

  /** Scans + aggs, join shapes, windows, every LLM-pipeline family, and two
    * kg chain queries — the plans a reviewer would ask for first.
    */
  private val Names = Seq(
    "q01_pricing_summary",  // scan + partial agg: pushdown/pruning baseline
    "q03_region_revenue",   // multi-join: broadcast vs shuffle choice
    "q05_semi_join",
    "q12_top_orders",       // global top-k
    "q08_running_counts",   // window
    "t01_token_stats",      // pure expression pipeline (whole-stage codegen)
    "t06_repetition",       // explode + two-level agg
    "d02_lsh_pairs",        // banded LSH self-join over the shared prologue
    "d04_exact_dup_groups",
    "d06_embedding_neardup",
    "d08_ngram_jaccard",    // prefix-filter inverted-index join (exact Jaccard)
    "s01_knn_brute",
    "s03_ivf_topk",
    "x03_decontaminate",
    "x04_temperature_mix",
    "m02_frame_sample",
    "st01_windowed_agg",
    "st05_stream_stream_join", // interval join shape (batch twin of the stream)
    "q17_interval_join",    // keyless range join via bin-bucketed equi-join
    "q18_pivot",            // explicit-domain pivot: ONE aggregate, no domain job
    "q20_funnel",           // two chained range-windows, zero joins
    "m06_media_dedup",      // corpus explode + one aggregate
    "s04_kmeans_assign",    // broadcast centroids + single scan argmin
    "t07_ngram_novelty",    // inverted-index df join-back
    "sk01_hll_distinct",    // sketch state: map-side-combinable register MAX
    "sk03_bloom_filter",    // sketch probe: broadcast word state
    "q22_snapshot_diff",    // aggregate-before-join full-outer reconciliation
    "kg02_events_per_year", // edge-cache scan shape
    "kg11_company_entities", // longest chain-join query
    "kg15_entity_cooccurrence" // bounded bipartite projection self-join
  )

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 1) args(1) else "BENCH/plans"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val mode = org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    val names = if (args.length > 2) args.drop(2).toSeq else Names
    var failed = List.empty[String]
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"ExplainDump names a query that no longer exists: $name"))
      try {
        val plan = fn(spark, sfDir).queryExecution.explainString(mode)
        Files.writeString(Paths.get(s"$outDir/$name.txt"),
          s"== $name @ $sfDir ==\n\n$plan")
        println(s"[explain] wrote $outDir/$name.txt")
      } catch { case e: Throwable =>
        // delete any stale committed dump: README sells these files as
        // "checkable without running anything", so a plan from an older
        // commit masquerading as current is worse than a missing file
        Files.deleteIfExists(Paths.get(s"$outDir/$name.txt"))
        failed ::= name
        System.err.println(s"[explain] $name failed: ${e.getMessage}")
      }
    }
    KgPipeline.release()
    graft.queries.Dedup.release()
    spark.stop()
    if (failed.nonEmpty)
      sys.error(s"ExplainDump failed for: ${failed.reverse.mkString(", ")}")
  }
}
