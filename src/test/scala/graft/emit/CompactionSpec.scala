package graft.emit

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.kg.{Materialize, Ns, Synth}

/** Subject-level graph-consistency compaction (TableIO.compactSubjects) —
  * the GCK cascade analogue (reference graphConsistencyKeeper.py:116-477):
  * re-emitting an entity must delete its stale copies under partitions that
  * were NOT re-run.
  */
class CompactionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val cols = Seq("graph_module", "subj", "pred", "obj", "obj_is_iri",
    "obj_dtype", "obj_lang", "event_date")
  private val mention = Ns.COY + "hasMentionDate"
  private val exemptMention = s"pred = '$mention'"

  private def df(rows: Seq[(String, String, String, String)]) = {
    import spark.implicits._
    rows.map { case (s, p, o, d) =>
      ("base", s, p, o, false, Ns.xsdString, null: String, d)
    }.toDF(cols: _*)
  }

  test("toy cascade: stale copy deleted, current copy + foreign subjects + exempt rows kept") {
    val table = Files.createTempDirectory("graft_compact_toy").toString
    val d1 = "2022-01-05"
    val d2 = "2022-02-05"
    val v1 = df(Seq(
      ("A", "name", "old", d1), ("A", "name", "old", d2), // A: re-emitted, changes
      ("B", "name", "keep", d1), ("B", "name", "keep", d2), // B: re-emitted, unchanged
      ("C", "name", "foreign", d2), // C: not re-emitted — untouched
      ("T", mention, d1, d1), ("T", mention, d2, d2))) // per-date assertions (exempt)
    TableIO.replacePartitions(spark, table, v1, "event_date", Seq(d1, d2))
    // re-run d1 with A's new version
    val v2 = df(Seq(
      ("A", "name", "new", d1),
      ("B", "name", "keep", d1),
      ("T", mention, d1, d1)))
    TableIO.replacePartitions(spark, table, v2, "event_date", Seq(d1))
    TableIO.compactSubjects(spark, table, "event_date", Seq(d1),
      exemptExpr = exemptMention)
    val after = TableIO.read(spark, table, "event_date")
      .withColumn("event_date", col("event_date").cast("string"))
      .select("subj", "pred", "obj", "event_date")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(after == Set(
      ("A", "name", "new", d1), // current version (the re-run partition)
      ("B", "name", "keep", d1), ("B", "name", "keep", d2), // matching copy survives
      ("C", "name", "foreign", d2), // foreign subject untouched
      ("T", mention, d1, d1), ("T", mention, d2, d2))) // exempt per-date rows survive
    // A's stale d2 copy is the ONLY deletion
    assert(!after.contains(("A", "name", "old", d2)))
  }

  test("compaction preserves the affected partitions' lineage metrics") {
    val table = Files.createTempDirectory("graft_compact_metrics").toString
    val d1 = "2022-01-05"
    val d2 = "2022-02-05"
    val v1 = df(Seq(
      ("A", "name", "old", d1), ("A", "name", "old", d2),
      ("X", "name", "x", d2)))
    TableIO.replacePartitions(spark, table, v1, "event_date", Seq(d1, d2),
      metricsFn = _ => Map(d1 -> Map("m" -> 1L), d2 -> Map("m" -> 2L)))
    val v2 = df(Seq(("A", "name", "new", d1)))
    TableIO.replacePartitions(spark, table, v2, "event_date", Seq(d1),
      metricsFn = _ => Map(d1 -> Map("m" -> 3L)))
    TableIO.compactSubjects(spark, table, "event_date", Seq(d1))
    val parts = TableIO.currentManifest(table).partitions
    // d2 was rewritten by the cascade (A's stale copy removed): its original
    // build metrics must survive the rewrite, its row count must be honest
    assert(parts(d2).metrics == Map("m" -> 2L))
    assert(parts(d2).rows == 1L)
    // d1 was not an affected partition — untouched
    assert(parts(d1).metrics == Map("m" -> 3L))
  }

  test("pipeline cascade: re-enriched article leaves no stale triples in other months") {
    val sfDir = "/root/testdata/sf0.001"
    val table = Files.createTempDirectory("graft_compact_kg").toString
    Materialize.run(spark, sfDir, table)
    val tbl = TableIO.read(spark, table, "event_date")
      .withColumn("event_date", col("event_date").cast("string"))
    val nameP = Ns.SCHEMA + "name"
    // an article mentioned in BOTH months — its name triple exists under
    // January and February partitions
    val subj = tbl
      .filter(col("subj").startsWith(Ns.wikipediaArticle) && col("pred") === nameP)
      .select(col("subj"), substring(col("event_date"), 1, 7).as("ym")).distinct()
      .groupBy("subj").agg(countDistinct(col("ym")).as("n")).filter(col("n") === 2)
      .orderBy("subj").limit(1).collect()(0).getString(0)
    // "re-enrich": rewrite January with the article's name changed
    val p = Synth.paramsFor(sfDir)
    val janKeys = Materialize.datesOfMonth(p, 2022, 1)
    val doctored = tbl.filter(substring(col("event_date"), 1, 7) === "2022-01")
      .withColumn("obj",
        when(col("subj") === subj && col("pred") === nameP, lit("DOCTORED"))
          .otherwise(col("obj")))
    TableIO.replacePartitions(spark, table, doctored, "event_date", janKeys)
    // capture the February baseline BEFORE compaction rewrites those files
    // (tbl's plan binds to the pre-compaction file listing)
    val febTbl = TableIO.read(spark, table, "event_date")
      .withColumn("event_date", col("event_date").cast("string"))
      .filter(substring(col("event_date"), 1, 7) === "2022-02")
    val febBeforeCount = febTbl.count()
    val febStaleCount =
      febTbl.filter(col("subj") === subj && col("pred") === nameP).count()
    // versioned subjects: enrichment-derived entities only (articles, osm,
    // locations, points) — topics/events carry per-date assertions
    val versioned = Seq(Ns.wikipediaArticle, Ns.osmElement, Ns.locations, Ns.point)
      .map(p => s"startswith(subj, '$p')").mkString(" OR ")
    TableIO.compactSubjects(spark, table, "event_date", janKeys,
      subjectExpr = versioned, exemptExpr = exemptMention)
    val after = TableIO.read(spark, table, "event_date")
      .withColumn("event_date", col("event_date").cast("string"))
    // no stale name anywhere: every surviving name triple of the subject is
    // the doctored version — including under February partitions
    assert(after.filter(col("subj") === subj && col("pred") === nameP &&
      col("obj") =!= "DOCTORED").count() == 0)
    assert(after.filter(col("subj") === subj && col("pred") === nameP &&
      substring(col("event_date"), 1, 7) === "2022-02").count() == 0)
    // the subject's UNCHANGED triples survive in February
    assert(after.filter(col("subj") === subj &&
      substring(col("event_date"), 1, 7) === "2022-02").count() > 0)
    // subjects whose payload did not change keep their February copies: the
    // February slice shrinks ONLY by the subject's stale rows
    val febAfter = after.filter(substring(col("event_date"), 1, 7) === "2022-02")
    assert(febBeforeCount - febAfter.count() == febStaleCount && febStaleCount > 0)
  }
}
