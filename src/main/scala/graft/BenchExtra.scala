package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.kg.Ns

/** EXTRA measurement mains (spark_optimization_guide §1.4) — not part of the
  * driver contract (graft.Bench stays the frozen measured lap):
  *
  *  - default mode: per-query wall time through the NOOP SINK
  *    (`write.format("noop")`), which eagerly computes every column of every
  *    row — unlike the frozen lap's `.count()`, which lets the optimizer
  *    prune. Shared caches are warmed first so numbers isolate query plans
  *    from cache builds (the builds are timed on their own lines, like
  *    Bench). Jobs are labeled via setJobDescription for UI reads.
  *  - `cooc` mode: stage decomposition of the co-occurrence cache build
  *    (the association chain → distinct → k-guard → pair self-join →
  *    aggregate), each stage timed through the noop sink from a fresh
  *    session so nothing is amortized.
  *
  * Usage:
  *   sbt 'runMain graft.BenchExtra'                 # all queries, noop sink
  *   sbt 'runMain graft.BenchExtra d02_lsh_pairs …' # selected queries
  *   sbt 'runMain graft.BenchExtra cooc'            # cooc decomposition
  */
object BenchExtra {

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false")) // match Bench
      .config("graft.loop.shufflePartitions",
        math.min(8, cpus.toInt).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime()
    try { f; (System.nanoTime() - t0) / 1e9 }
    catch { case t: Throwable =>
      System.err.println(s"[bench-extra] failed: ${t.getMessage}"); -1.0 }
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Input-bytes/records accumulator keyed by job description — makes the
    * edge-layout source-prune claim a NUMBER per query (r5 VERDICT item 7:
    * the frozen Bench can't carry it, so the extra lap does).
    */
  private final class InputMeter extends org.apache.spark.scheduler.SparkListener {
    val bytes = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    @volatile var label: String = "warmup"
    override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val in = e.taskMetrics
      if (in != null)
        bytes.merge(label, in.inputMetrics.bytesRead, (a, b) => a + b)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = session()
    if (args.headOption.contains("cooc")) { probeCooc(spark, sfDir); spark.stop(); return }
    if (args.headOption.contains("d02")) {
      // stage decomposition of the shared dedup build (r6 shape)
      def stage(l: String)(f: => Unit): Unit =
        println(f"[d02] $l: ${timed(f)}%.2f s")
      stage("prologue (groups + sigs)")(
        graft.queries.Dedup.prologue(spark, sfDir).sigs.count())
      stage("bandPairsLeaf")(
        graft.queries.Dedup.bandPairsLeaf(spark, sfDir).count())
      stage("verifiedPairs (cand + sh arrays + overlap + top100)")(
        graft.queries.Dedup.d02LshPairs(spark, sfDir).count())
      stage("d09 (agree + overlap)")(
        graft.queries.Dedup.d09MinhashCalibration(spark, sfDir).count())
      stage("d11 (CC + stats)")(
        graft.queries.Dedup.d11DupClusters(spark, sfDir).count())
      graft.queries.Dedup.release()
      spark.stop(); return
    }
    if (args.headOption.contains("kg16")) {
      // split kg16 into its two halves: the driver-side sequential oracle
      // re-derivation vs the distributed diff
      KgPipeline.triples(spark, sfDir).count()
      val t0 = System.nanoTime()
      val n = kg.SequentialOracle.expectedTriples(kg.Synth.paramsFor(sfDir)).size
      println(f"[kg16] sequential oracle: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n triples)")
      val t1 = System.nanoTime()
      KgPipeline.kg16TripleParity(spark, sfDir).count()
      println(f"[kg16] full query (oracle + diff): ${(System.nanoTime() - t1) / 1e9}%.2f s")
      spark.stop(); return
    }
    val sc = spark.sparkContext
    val meter = new InputMeter
    sc.addSparkListener(meter)
    // same shared-cache hoist as Bench, each build on its own line
    def metered(label: String)(f: => Unit): Double = {
      meter.label = label
      try timed(f) finally meter.label = "warmup"
    }
    val builds = Seq(
      "cache_triples" -> metered("cache_triples")(KgPipeline.triples(spark, sfDir).count()),
      "cache_edges" -> metered("cache_edges")(KgPipeline.edges(spark, sfDir).count()),
      "cache_enriched" -> metered("cache_enriched")(KgPipeline.enriched(spark, sfDir).count()),
      "cache_metrics" -> metered("cache_metrics")(KgPipeline.kg12MonthlyMetrics(spark, sfDir).count()),
      "cache_corpus" -> metered("cache_corpus")(KgPipeline.corpusSpans(spark, sfDir).count()),
      "cache_cooc" -> metered("cache_cooc")(KgPipeline.cooccurrence(spark, sfDir).count()))
    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val rows = names.map { n =>
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"BenchExtra names an unknown query: $n"))
      sc.setJobDescription(s"noop: $n")
      val t = metered(n)(noop(fn(spark, sfDir)))
      sc.setJobDescription(null)
      n -> t
    }
    val qs = (builds ++ rows).map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val bs = (builds ++ rows).map { case (k, _) =>
      s"\"" + k + "\":" + meter.bytes.getOrDefault(k, 0L) }
      .mkString("{", ",", "}")
    val line = s"""{"metric":"noop_total","value":${
      (builds ++ rows).map(_._2).filter(_ >= 0).sum
    },"unit":"sec","queries":$qs,"input_bytes":$bs,"sf":"$sfDir"}"""
    println(line)
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("BENCH"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH/bench_extra_last.json"), line + "\n")
    } catch { case _: Throwable => () }
    KgPipeline.release()
    graft.queries.Dedup.release()
    spark.stop()
  }

  /** Noop-timed stage decomposition of the cooccurrence build (the kg15/kg17
    * prologue). Mirrors KgPipeline.cooccurrence / assocChain exactly; any
    * drift shows up as a stage-sum far from the cache_cooc line.
    */
  def probeCooc(spark: SparkSession, d: String): Unit = {
    def p(t: DataFrame, pred: String) = t.filter(col("pred") === pred)
      .select(col("subj"), col("obj"))
    def chain(t: DataFrame): DataFrame = {
      val evCtx = p(t, Ns.COY + "isIdentifiedBy")
        .filter(col("subj").startsWith(Ns.events))
        .select(col("subj").as("event"), col("obj").as("ctx"))
      val ctxSent = p(t, Ns.NIF + "subString")
        .select(col("subj").as("ctx"), col("obj").as("sent"))
        .filter(col("sent").startsWith(Ns.sentences))
      val sentPhrase = p(t, Ns.NIF + "subString")
        .select(col("subj").as("sent"), col("obj").as("phrase"))
        .filter(col("phrase").startsWith(Ns.phrases))
      val phraseArt = p(t, Ns.GN + "wikipediaArticle")
        .filter(col("subj").startsWith(Ns.phrases))
        .select(col("subj").as("phrase"), col("obj").as("article"))
      val sameAs = p(t, Ns.owlSameAs)
        .filter(col("subj").startsWith(Ns.wikipediaArticle))
        .select(col("subj").as("article"), col("obj").as("wd"))
      evCtx.join(ctxSent, "ctx").join(sentPhrase, "sent")
        .join(phraseArt, "phrase").join(sameAs, "article")
        .select(col("event"), col("wd"))
    }
    def stage(label: String)(f: => Unit): Unit = {
      spark.sparkContext.setJobDescription(s"cooc: $label")
      println(f"[cooc] $label: ${timed(f)}%.2f s")
      spark.sparkContext.setJobDescription(null)
    }
    stage("edges cache build")(KgPipeline.edges(spark, d).count())
    val t = KgPipeline.edges(spark, d)
    stage("5-hop chain, noop")(noop(chain(t)))
    stage("chain + distinct, noop")(noop(chain(t).distinct()))
    val eventWd = chain(t).distinct().localCheckpoint(true)
    stage("eventWd localCheckpoint (barrier)")(eventWd.count())
    val ok = eventWd.join(
      eventWd.groupBy(col("event")).agg(count(lit(1)).as("k"))
        .filter(col("k") <= KgPipeline.Kg15MaxEntities).select(col("event")),
      Seq("event"), "left_semi")
    stage("k-guard semi join, noop")(noop(ok))
    stage("pair self-join + agg, noop")(noop(
      ok.as("x").join(ok.as("y"),
          col("x.event") === col("y.event") && col("x.wd") < col("y.wd"))
        .select(col("x.wd").as("wd_a"), col("y.wd").as("wd_b"))
        .groupBy(col("wd_a"), col("wd_b")).agg(count(lit(1)).as("n_events"))))
    // the r6 window-guard shape, standalone (no checkpoint barrier) — and
    // whether ReuseExchange actually dedups the two self-join sides
    val okW = chain(t).distinct()
      .withColumn("k", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("event")))
      .filter(col("k") <= KgPipeline.Kg15MaxEntities)
      .select(col("event"), col("wd"))
    val coocW = okW.as("x").join(okW.as("y"),
        col("x.event") === col("y.event") && col("x.wd") < col("y.wd"))
      .select(col("x.wd").as("wd_a"), col("y.wd").as("wd_b"))
      .groupBy(col("wd_a"), col("wd_b")).agg(count(lit(1)).as("n_events"))
    stage("window-guard cooc end-to-end, noop")(noop(coocW))
    println("[cooc] window shape reuses exchange: " +
      coocW.queryExecution.executedPlan.toString.contains("ReusedExchange"))
    stage("full cooccurrence build (fresh session path)")(
      KgPipeline.cooccurrence(spark, d).count())
    KgPipeline.release()
  }
}
