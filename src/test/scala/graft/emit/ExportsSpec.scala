package graft.emit

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.kg._

class ExportsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("N-Triples serialization shapes") {
    import spark.implicits._
    val ts = Seq(
      Triple("base", "http://s", "http://p", "http://o", true, null, null, "2022-01-01"),
      Triple("base", "http://s", "http://p", "a \"quoted\"\nvalue", false, Ns.xsdString, null, "2022-01-01"),
      Triple("ohg", "http://s", "http://p", "hallo", false, null, "de", "2022-01-01")).toDS()
    val lines = Exports.toNTriples(ts).collect().sorted
    assert(lines.contains("<http://s> <http://p> <http://o> ."))
    assert(lines.contains("<http://s> <http://p> \"a \\\"quoted\\\"\\nvalue\"^^<" + Ns.xsdString + "> ."))
    assert(lines.contains("<http://s> <http://p> \"hallo\"@de ."))
  }

  test("event debug NDJSON sink emits first located link per event") {
    import spark.implicits._
    val p = Synth.paramsFor("/root/testdata/sf0.001")
    val events = Pipeline.parsedDays(spark, p).flatMap(_.events)
    val locFlags = Enrich.buildDicts(p).artLocFlag
    val located = locFlags.filter(_._2).keySet
    val df = Exports.eventDebugJson(events, located)
    assert(df.columns.toSeq == Seq("text", "s_begin", "location", "begin", "end"))
    assert(df.count() > 0)
  }

  test("F11: textWithoutSource drops len(sourceText) chars (reference event.py:31-33)") {
    // the reference's text already excludes source link text, yet
    // getTextWithoutSource still chops len(sourceText) — reproduce faithfully
    val e = KEvent("d", "2022-01-01", 0, None, "Quake hits CityX. ", "(Reuters)",
      "u", "r", Nil, Nil, Nil, Nil, Nil)
    assert(e.textWithoutSource == "Quake hits CityX. ".dropRight(9))
    val noSrc = e.copy(sourceText = "")
    assert(noSrc.textWithoutSource == "Quake hits CityX. ")
  }

  test("D6 compaction merges committed partitions into one distinct set") {
    val table = Files.createTempDirectory("graft_compact").toString
    Materialize.run(spark, "/root/testdata/sf0.001", table, maxMonths = 2)
    val out = Files.createTempDirectory("graft_compact_out").toString
    val n = Exports.compact(spark, table, out)
    val direct = Pipeline.triples(spark, "/root/testdata/sf0.001")
      .drop("event_date").dropDuplicates().count()
    assert(n == direct)
  }
}
