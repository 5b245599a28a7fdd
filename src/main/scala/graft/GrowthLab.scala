package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Growth-curve lab (r4 VERDICT item 4): measure how candidate volumes,
  * iteration round counts, and wall time grow with corpus scale ABOVE the
  * largest driver-provided test SF, so the 100-TB scaling story is measured
  * rather than argued from O() shapes.
  *
  * Two subcommands:
  *
  *  - `synth` — deterministically generate documents tables at 1×/2×/4×/8×
  *    the sf0.1 corpus under /tmp/growth/docsN. The generator mirrors the
  *    measured sf0.1 statistics (31-word vocab, uniform 10-100 tokens/doc,
  *    lang mix en .41 / others ~.15, 20 sources, ~0.16% exact-dup rows) so
  *    the scale points are self-similar; the 1× point exists to cross-check
  *    the generator against the real sf0.1 numbers.
  *  - `probe` — per scale point: dedup candidate populations (d02 bounded
  *    band pairs, d06 bucket candidates, d08 prefix-filter candidates),
  *    full-query wall times, and g01/g05 round counts; then per kg scale
  *    point (sf0.1 / sf0.2 / sf0.4 via Synth.paramsFor years multiplier):
  *    triple build, chain-query walls, kg04 reach rounds, kg08 CC rounds.
  *
  * Dev tool — not part of the driver contract surface.
  */
object GrowthLab {

  // the exact sf0.1 documents vocabulary (measured; see BENCH/BASELINE.md)
  private val vocab = Array("a", "agg", "batch", "big", "column", "customer",
    "data", "dup", "fast", "filter", "group", "hash", "join", "key", "line",
    "merge", "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window")

  def synthDocs(spark: SparkSession, n: Int, outDir: String): Unit = {
    import spark.implicits._
    val base = (0 until n).map { i =>
      val rnd = new scala.util.Random(42L * 1000003L + i)
      val nTok = 10 + rnd.nextInt(91)
      val text = Seq.fill(nTok)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      val u = rnd.nextInt(1000)
      val lang = if (u < 412) "en" else if (u < 563) "zh"
        else if (u < 712) "es" else if (u < 860) "fr" else "de"
      (i.toLong, text, lang, s"src${rnd.nextInt(20)}")
    }
    val rows = base.map { case r @ (id, _, lang, src) =>
      val rnd = new scala.util.Random(7L * 999983L + id)
      if (id > 0 && rnd.nextInt(1000) < 2) // ~0.16% exact-dup injection
        (id, base(rnd.nextInt(id.toInt))._2, lang, src)
      else r
    }
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    println(s"[growth] synth $n docs -> $outDir")
  }

  private def t(label: String)(f: => Any): Unit = {
    val t0 = System.nanoTime()
    val r = f
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[growth] $label: $secs%.2f s" +
      (r match { case n: Long => s" (count=$n)"; case _ => "" }))
  }

  def probeDocs(spark: SparkSession, dir: String): Unit = {
    println(s"[growth] === docs point: $dir ===")
    val nDocs = queries.Tables.documents(spark, dir).count()
    println(s"[growth] n_docs: $nDocs")
    val pro = queries.Dedup.prologue(spark, dir)
    t("d02_reps")(pro.groups.count())
    t("d02_cand")(queries.Dedup.boundedBandPairs(pro.sigs).distinct().count())
    t("d02_full")(queries.Dedup.d02LshPairs(spark, dir).count())
    t("d06_cand")(queries.Dedup.d06CandidateStage(spark, dir).cand.count())
    t("d06_full")(queries.Dedup.d06EmbeddingNeardup(spark, dir).count())
    val d08 = queries.Dedup.d08CandidateStage(spark, dir)
    t("d08_distinct_grams")(d08.grams.select("g").distinct().count())
    t("d08_gram_rows")(d08.grams.count())
    t("d08_cand")(d08.cand.count())
    t("d08_full")(queries.Dedup.d08NgramJaccard(spark, dir).count())
    t("g01_full")(queries.Graph.queries("g01_cc_chains")(spark, dir).count())
    println(s"[growth] g01_cc_rounds: ${plans.Meters.get("cc.rounds").getOrElse(-1L)}")
    t("g05_full")(queries.Graph.queries("g05_sssp")(spark, dir).count())
    println(s"[growth] g05_sssp_rounds: ${plans.Meters.get("sssp.rounds").getOrElse(-1L)}")
    // r5/r6 loop+window operators (r5 VERDICT item 4)
    t("d10_full")(queries.Dedup.d10DuplicateSpans(spark, dir).count())
    t("d11_full")(queries.Dedup.d11DupClusters(spark, dir).count())
    println(s"[growth] d11_cc_rounds: ${plans.Meters.get("cc.rounds").getOrElse(-1L)}")
    t("st06_full")(streaming.StreamingQueries.st06StreamPacking(spark, dir).count())
    queries.Dedup.release()
  }

  def probeKg(spark: SparkSession, dir: String): Unit = {
    println(s"[growth] === kg point: $dir ===")
    t("kg_triples_build")(KgPipeline.triples(spark, dir).count())
    t("kg_edges_build")(KgPipeline.edges(spark, dir).count())
    for (r <- 1 to 2) {
      t(s"kg05_run$r")(KgPipeline.kg05EventMapWkts(spark, dir).count())
      t(s"kg11_run$r")(KgPipeline.kg11CompanyEntities(spark, dir).count())
    }
    t("kg04_full")(KgPipeline.kg04ClosureEventsPerMonth(spark, dir).count())
    println(s"[growth] kg04_reach_rounds: ${plans.Meters.get("reach.rounds").getOrElse(-1L)}")
    t("kg08_full")(KgPipeline.kg08CanonicalClusters(spark, dir).count())
    println(s"[growth] kg08_cc_rounds: ${plans.Meters.get("cc.rounds").getOrElse(-1L)}")
    // r5/r6 loop+window operators (r5 VERDICT item 4)
    t("kg15_cooc_build")(KgPipeline.cooccurrence(spark, dir).count())
    t("kg17_full")(KgPipeline.kg17EntityPagerank(spark, dir).count())
    t("cache_corpus_build")(KgPipeline.corpusSpans(spark, dir).count())
    t("m07_full")(multimodal.Multimodal.m07SequencePacking(spark, dir).count())
    KgPipeline.release()
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false")) // match Bench
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.headOption match {
      case Some("synth") =>
        for ((n, tag) <- Seq(5000 -> "docs1x", 10000 -> "docs2x",
            20000 -> "docs4x", 40000 -> "docs8x"))
          synthDocs(spark, n, s"/tmp/growth/$tag")
      case Some("probe") =>
        val docDirs = if (args.length > 1) args.drop(1).toSeq
          else Seq("/root/testdata/sf0.1", "/tmp/growth/docs1x",
            "/tmp/growth/docs2x", "/tmp/growth/docs4x")
        docDirs.foreach(probeDocs(spark, _))
      case Some("probekg") =>
        val kgDirs = if (args.length > 1) args.drop(1).toSeq
          else Seq("/root/testdata/sf0.1", "/tmp/growth/sf0.2", "/tmp/growth/sf0.4")
        kgDirs.foreach(probeKg(spark, _))
      case other =>
        sys.error(s"usage: GrowthLab synth|probe|probekg [dirs...]; got $other")
    }
    spark.stop()
  }
}
