package graft.kg

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.emit.TableIO

class MaterializeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001" // 2 months

  test("kill/restart: partial commit then resume reproduces the full snapshot") {
    val table = Files.createTempDirectory("graft_triples").toString
    // "killed" run: only month 1 committed
    val c1 = Materialize.run(spark, sfDir, table, maxMonths = 1)
    assert(c1 == 31)
    val m1 = TableIO.currentManifest(table)
    assert(m1.partitions.keySet.forall(_.startsWith("2022-01")))
    // restart: resumes from the snapshot, commits only month 2
    val c2 = Materialize.run(spark, sfDir, table)
    assert(c2 == 28) // February only — January partitions were skipped
    // final snapshot equals a from-scratch full run
    val got = TableIO.read(spark, table, "event_date")
      .collect().map(_.toString).toSet
    val full = Pipeline.triples(spark, sfDir).collect().map(_.toString).toSet
    // read() returns event_date as a partition column possibly reordered;
    // compare as Triple-shaped sets
    val gotSet = TableIO.read(spark, table, "event_date")
      .selectExpr("graph_module", "subj", "pred", "obj", "obj_is_iri",
        "obj_dtype", "obj_lang", "CAST(event_date AS STRING) AS event_date")
      .as[Triple](spark.implicits.newProductEncoder[Triple])
      .collect().toSet
    val fullSet = Pipeline.triples(spark, sfDir).collect().toSet
    assert(gotSet == fullSet)
  }

  test("manifest carries per-partition lineage counters incl parse errors") {
    val table = Files.createTempDirectory("graft_triples_metrics").toString
    Materialize.run(spark, sfDir, table, maxMonths = 1)
    val m = TableIO.currentManifest(table)
    val metrics = m.partitions("2022-01-05").metrics
    assert(metrics.size >= 10, s"expected >=10 lineage counters, got $metrics")
    assert(metrics.contains("n_time_parse_errors") && metrics.contains("n_date_parse_errors"))
    assert(metrics("n_triples") == m.partitions("2022-01-05").rows)
    assert(metrics("n_events") > 0 && metrics("n_articles") > 0)
    // avgDayTime/avgMonthTime analogues land in the same commit
    assert(metrics("month_wall_ms") > 0L)
    assert(metrics("avg_day_wall_ms") <= metrics("month_wall_ms"))
    assert(metrics.contains("month_task_ms") && metrics.contains("avg_day_task_ms"))
    // counters survive the manifest round-trip and a snapshot bump
    val someDate = "2022-01-06"
    val t = Pipeline.triples(spark, sfDir, Some(Set(someDate)))
    TableIO.replacePartitions(spark, table, t.toDF(), "event_date", Seq(someDate))
    assert(TableIO.currentManifest(table).partitions("2022-01-05").metrics == metrics)
  }

  test("idempotence: a second run over a complete snapshot commits nothing") {
    val table = Files.createTempDirectory("graft_triples2").toString
    Materialize.run(spark, sfDir, table)
    val snap = TableIO.currentManifest(table)
    val c = Materialize.run(spark, sfDir, table)
    assert(c == 0)
    assert(TableIO.currentManifest(table).snapshotId == snap.snapshotId)
  }

  test("skip-and-remember: a poisoned month is skipped, logged, and retried next run") {
    val table = Files.createTempDirectory("graft_triples_poison").toString
    val boom: (SparkSession, Synth.Params, Set[String]) => Pipeline.Build =
      (s, p, dates) =>
        if (dates.exists(_.startsWith("2022-01")))
          throw new RuntimeException("poisoned month")
        else Pipeline.trackedBuild(s, p, Some(dates))
    // January fails, February must still commit (reference __main__.py:297-317)
    val c1 = Materialize.run(spark, sfDir, table, buildFn = boom)
    assert(c1 == 28)
    assert(TableIO.currentManifest(table).partitions.keySet.forall(_.startsWith("2022-02")))
    val skipped = TableIO.unparsedMonths(table)
    assert(skipped.map(_._1) == Seq("2022-01"))
    assert(skipped.head._2.contains("poisoned"))
    // -coe analogue: crashOnError rethrows instead of skipping
    intercept[RuntimeException] {
      Materialize.run(spark, sfDir, table, crashOnError = true, buildFn = boom)
    }
    // a later healthy run retries ONLY the skipped month (Feb stays committed)
    val c2 = Materialize.run(spark, sfDir, table)
    assert(c2 == 31)
    assert(TableIO.currentManifest(table).partitions.size == 59)
  }

  test("fatal errors propagate instead of being recorded as skipped months") {
    val table = Files.createTempDirectory("graft_triples_fatal").toString
    // an interrupt (cancellation) is not a poisoned month — the skip policy
    // must rethrow it, not survive it on a broken/interrupted JVM
    intercept[InterruptedException] {
      Materialize.run(spark, sfDir, table,
        buildFn = (_, _, _) => throw new InterruptedException("cancelled"))
    }
    assert(TableIO.unparsedMonths(table).isEmpty)
  }

  test("salted writes: hot partitions spread over >1 file, manifest counts honest") {
    val table = Files.createTempDirectory("graft_triples_salt").toString
    spark.conf.set("graft.write.tasksPerPartition", "4")
    try {
      val someDate = "2022-01-05"
      val t = Pipeline.triples(spark, sfDir, Some(Set(someDate)))
      val m = TableIO.replacePartitions(spark, table, t.toDF(), "event_date", Seq(someDate))
      val meta = m.partitions(someDate)
      val dir = java.nio.file.Paths.get(table, "data", s"event_date=$someDate")
      val s = Files.list(dir)
      val actual = try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.count(_.toString.endsWith(".parquet"))
      } finally s.close()
      assert(meta.files == actual, "manifest file count must match the layout")
      assert(meta.files > 1, s"hot date should spread over >1 salt bucket, got ${meta.files}")
      // the salted exchange changes layout only — not content
      assert(TableIO.read(spark, table, "event_date").count() == meta.rows)
    } finally spark.conf.unset("graft.write.tasksPerPartition")
  }

  test("REPLACE WHERE rewrites exactly the targeted partition") {
    val table = Files.createTempDirectory("graft_triples3").toString
    Materialize.run(spark, sfDir, table, maxMonths = 1)
    val before = TableIO.currentManifest(table)
    val someDate = "2022-01-05"
    val t = Pipeline.triples(spark, sfDir, Some(Set(someDate)))
    TableIO.replacePartitions(spark, table, t.toDF(), "event_date", Seq(someDate))
    val after = TableIO.currentManifest(table)
    assert(after.snapshotId == before.snapshotId + 1)
    assert(after.partitions(someDate).rows == before.partitions(someDate).rows)
    assert((after.partitions - someDate) == (before.partitions - someDate))
  }
}
