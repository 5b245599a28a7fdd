package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class StreamJobsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("streaming windowed agg equals the batch plan over the same input") {
    // file stream sources need a directory: stage the table into one
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    def canon(df: org.apache.spark.sql.DataFrame): Array[String] =
      df.selectExpr("CAST(ws AS STRING) AS ws", "event_type", "n", "sum_value")
        .collect().map(_.toString).sorted
    val streamed = canon(StreamJobs.runWindowedStream(spark, dir.toString, "st_test"))
    val batch = canon(StreamJobs.windowedAgg(spark.read.parquet(s"$sfDir/events.parquet")))
    assert(streamed.nonEmpty)
    val diff = streamed.zipAll(batch, "<none>", "<none>").filter(p => p._1 != p._2)
    if (diff.nonEmpty) info(s"first diffs: ${diff.take(3).mkString(" | ")} (s=${streamed.length} b=${batch.length})")
    assert(streamed.sameElements(batch))
  }

  test("stream-static enrichment equals the batch plan over the same input") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_enrich")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val customers = spark.read.parquet(s"$sfDir/customer.parquet")
    def canon(df: org.apache.spark.sql.DataFrame): Array[String] =
      df.selectExpr("nation", "n_events", "sum_value_e6")
        .collect().map(_.toString).sorted
    val streamed = canon(
      StreamJobs.runEnrichStream(spark, dir.toString, customers, "st04_test"))
    val batch = canon(
      StreamJobs.enrichAgg(spark.read.parquet(s"$sfDir/events.parquet"), customers))
    assert(streamed.nonEmpty)
    assert(streamed.sameElements(batch))
  }

  test("multi-batch streaming dedup converges to the batch state and the groupBy truth") {
    import spark.implicits._
    // stage the fingerprinted docs as 4 parquet shards so the stream runs 4
    // REAL micro-batches (maxFilesPerTrigger=1) with fingerprints split
    // across them — the state must carry between batches
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_dedup").toString
    spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", s"${graft.queries.Dedup.bowFp} AS fp")
      .repartition(4) // round-robin: every shard sees a slice of most groups
      .write.mode("overwrite").parquet(dir)
    assert(spark.read.parquet(dir).inputFiles.length == 4)
    def canon(df: org.apache.spark.sql.DataFrame): Array[(String, Long, Long)] =
      df.select("fp", "rep_doc_id", "n_docs").as[(String, Long, Long)]
        .collect().sortBy(_._1)
    val streamed = canon(StreamJobs.runDedupStream(spark, dir, "st03_test"))
    val batch = canon(StreamingQueries.st03StreamDedup(spark, sfDir))
    val truth = canon(spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", s"${graft.queries.Dedup.bowFp} AS fp")
      .groupBy("fp")
      .agg(org.apache.spark.sql.functions.min("doc_id").as("rep_doc_id"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n_docs")))
    assert(streamed.nonEmpty && streamed.exists(_._3 > 1)) // real dup groups exercised
    assert(streamed.sameElements(truth))
    assert(batch.sameElements(truth))
  }

  test("multi-batch streaming packing equals the batch plan and the window truth") {
    import spark.implicits._
    // 4 REAL micro-batches staged in doc_id order (contiguous id ranges,
    // ascending mtimes): packing state is ORDER-DEPENDENT (a running token
    // cursor per lang), so this is the append-ordered ingestion contract —
    // and the cursor must carry across batch boundaries (range cuts land
    // mid-lang-stream by construction).
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "lang",
        "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens")
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_pack").toString
    val sorted = docs.orderBy("doc_id").collect()
    val slice = (sorted.length + 3) / 4
    for ((rows, i) <- sorted.grouped(slice).zipWithIndex) {
      val tmp = java.nio.file.Files.createTempDirectory("graft_pack_shard").toString
      spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](java.util.Arrays.asList(rows: _*)),
          docs.schema)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val target = new java.io.File(dir, f"shard$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, target.toPath)
      assert(target.setLastModified(1700000000000L + i * 60000L))
    }
    def canon(df: org.apache.spark.sql.DataFrame): Array[(Long, String, Long, Long)] =
      df.select("doc_id", "lang", "n_tokens", "seq_idx")
        .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    val streamed = canon(StreamJobs.runPackStream(spark, dir, "st06_test"))
    val batch = canon(StreamingQueries.st06StreamPacking(spark, sfDir))
    val truth = canon(docs.selectExpr("doc_id", "lang", "n_tokens",
      "COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id " +
        s"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), CAST(0 AS BIGINT)) " +
        s"DIV ${StreamJobs.PackBudget} AS seq_idx"))
    assert(truth.exists(_._4 > 0), "fixture must cross a sequence boundary")
    assert(streamed.sameElements(truth))
    assert(batch.sameElements(truth))
  }

  test("multi-batch streaming CMS cells equal the batch sketch state") {
    import spark.implicits._
    // 4 round-robin shards: per-cell sums are commutative, so ANY sharding
    // must converge to the batch cells — the sketch-union property a
    // cross-cluster merge relies on
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_cms").toString
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
      .repartition(4)
      .write.mode("overwrite").parquet(dir)
    assert(spark.read.parquet(dir).inputFiles.length == 4)
    def canon(df: org.apache.spark.sql.DataFrame): Array[(Long, Long, Long)] =
      df.select("row_k", "col_k", "cell_cnt").as[(Long, Long, Long)]
        .collect().sortBy(t => (t._1, t._2))
    val streamed = canon(StreamJobs.runCmsStream(spark, dir, "st07_test"))
    val batch = canon(StreamingQueries.st07StreamCmsCells(spark, sfDir))
    // 31-word vocab × 3 seeds bounds distinct cells at 93; mass = 3× token
    // occurrences
    assert(batch.length > 50 && batch.map(_._3).sum > 1000)
    assert(streamed.sameElements(batch))
  }

  test("sessionization state equals groupBy aggregation") {
    import spark.implicits._
    val evs = spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("user_id", "ts", "value").as[StreamJobs.Ev]
    val sessions = StreamJobs.sessionize(evs).collect().map(s => s.user_id -> s.n_events).toMap
    val expected = spark.read.parquet(s"$sfDir/events.parquet")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sessions == expected)
  }

  test("stream-stream interval join emits exactly the batch pair set over ordered micro-batches") {
    // 4 REAL micro-batches staged in event-time order (contiguous ts ranges,
    // ascending mtimes): with in-order arrival the 1 h watermark can never
    // evict a buffered click before its 30-min error window has fully
    // streamed past, so the append-mode stream must emit EXACTLY the batch
    // join's pairs — including matches whose two sides arrive in DIFFERENT
    // micro-batches (guaranteed here by cutting shards mid-timeline).
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_join").toString
    val sorted = ev.orderBy("ts").collect()
    val slice = (sorted.length + 3) / 4
    for ((rows, i) <- sorted.grouped(slice).zipWithIndex) {
      val tmp = java.nio.file.Files.createTempDirectory("graft_join_shard").toString
      spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](java.util.Arrays.asList(rows: _*)),
          ev.schema)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val target = new java.io.File(dir, f"shard$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, target.toPath)
      assert(target.setLastModified(1700000000000L + i * 60000L))
    }
    val streamed = StreamJobs.runJoinStream(spark, dir, "st05_test")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val batch = StreamingQueries.queries("st05_stream_stream_join")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(batch.nonEmpty) // fixture must actually exercise the join
    assert(streamed.sameElements(batch))
  }

  test("stream-stream join matches across micro-batch boundaries and respects the interval bound") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // shard 0: a click; shard 1: an in-window error (CROSS-batch match — the
    // click must still be buffered when the other side's row arrives a
    // micro-batch later) + a same-user view (ignored); shard 2: an error at
    // exactly +30 min (inclusive bound) and one past it (excluded), plus an
    // other-user error (no user match)
    val shards = Seq(
      Seq((100L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, "{}")),
      Seq((101L, ts("2024-01-01 10:10:00"), 1L, "error", 1.0, "{}"),
        (102L, ts("2024-01-01 10:11:00"), 1L, "view", 1.0, "{}")),
      Seq((103L, ts("2024-01-01 10:30:00"), 1L, "error", 1.0, "{}"),
        (104L, ts("2024-01-01 10:30:01"), 1L, "error", 1.0, "{}"),
        (105L, ts("2024-01-01 10:15:00"), 2L, "error", 1.0, "{}")))
    val dir = java.nio.file.Files.createTempDirectory("graft_join_synth").toString
    for ((rows, i) <- shards.zipWithIndex) {
      val tmp = java.nio.file.Files.createTempDirectory("graft_join_synth_shard").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val target = new java.io.File(dir, f"shard$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, target.toPath)
      assert(target.setLastModified(1700000000000L + i * 60000L))
    }
    val got = StreamJobs.runJoinStream(spark, dir, "st05_synth_test")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq == Seq((100L, 101L), (100L, 103L)))
  }

  test("append-mode watermark drops too-late rows and never emits open windows") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // 10-min windows, 10-min watermark delay. Batch boundaries are real
    // micro-batches (one file each, mtimes staged ascending). Late-event
    // filtering in batch N uses batch N-1's watermark (SPARK-42376 — see
    // StreamJobs.runLateDataStream), so the too-late row is staged TWO
    // batches after the row that advanced the watermark past its window:
    //   shard 0: 10:00, 10:05 (window 10:00) and 10:31 → wm becomes 10:21
    //   shard 1: 10:25 (window 10:20 open), 11:00 → wm becomes 10:50;
    //            eviction wm 10:21 emits (10:00, on_time, 2)
    //   shard 2: 10:02 TOO LATE (late-filter wm now 10:21 > window end
    //            10:10 → DROPPED), 11:30 → wm 11:20; 11:30 stays OPEN
    val shards = Seq(
      Seq((ts("2024-01-01 10:00:00"), "on_time"),
        (ts("2024-01-01 10:05:00"), "on_time"),
        (ts("2024-01-01 10:31:00"), "advance")),
      Seq((ts("2024-01-01 10:25:00"), "fresh"),
        (ts("2024-01-01 11:00:00"), "advance")),
      Seq((ts("2024-01-01 10:02:00"), "on_time"),
        (ts("2024-01-01 11:30:00"), "tail")))
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_late").toString
    for ((rows, i) <- shards.zipWithIndex) {
      val tmp = java.nio.file.Files.createTempDirectory("graft_late_shard").toString
      rows.toDF("ts", "k").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val target = new java.io.File(dir, f"shard$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, target.toPath)
      assert(target.setLastModified(1700000000000L + i * 60000L))
    }
    val (table, dropped) = StreamJobs.runLateDataStream(spark, dir, "st05_test")
    val got = table
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1)) -> r.getLong(2))
    assert(got.length == got.map(_._1).distinct.length) // each window emitted once
    val byKey = got.toMap
    // the core late-drop proof: the 10:02 arrival is NOT counted anywhere —
    // its window was already emitted with only the two on-time rows, and the
    // state operator reports exactly one watermark-dropped row
    assert(dropped == 1L)
    assert(byKey(("2024-01-01 10:00:00.0", "on_time")) == 2L)
    assert(byKey(("2024-01-01 10:20:00.0", "fresh")) == 1L)
    assert(byKey(("2024-01-01 10:30:00.0", "advance")) == 1L)
    // the stream-end window was never closed by the watermark → never emitted
    assert(!byKey.contains(("2024-01-01 11:30:00.0", "tail")))
    // contrast: the SAME plan in batch mode counts all three on_time rows —
    // the drop is a property of streaming execution, not of the plan
    val batch = StreamJobs.lateWindowCount(shards.flatten.toDF("ts", "k"))
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    assert(batch(("2024-01-01 10:00:00.0", "on_time")) == 3L)
    assert(batch.contains(("2024-01-01 11:30:00.0", "tail")))
  }
}
