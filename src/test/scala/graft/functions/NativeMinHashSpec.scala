package graft.queries // access to Dedup's private[queries] SQL reference forms

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Native

/** The native single-pass expressions must be value-identical to the SQL
  * forms they replace (which are also the forms the DuckDB oracles state),
  * across ASCII, short, empty, repeated-separator, and multi-byte UTF-8
  * texts, plus the synthetic corpus itself.
  */
class NativeMinHashSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val nSeeds = 4

  private val edgeTexts = Seq(
    "the quick brown fox jumps over the lazy dog", // ordinary ASCII
    "exactly8!", // 9 chars → 2 windows
    "12345678", // exactly one full window
    "short", // shorter than a window → the whole text is the window
    "a", // single char
    "", // empty → md5 of the seed prefix alone / one empty token
    "double  space", // empty token between separators
    "trailing space ", // trailing empty token
    "repeat repeat repeat repeat repeat repeat", // heavy collisions
    "naïve café — déjà vu über straße", // multi-byte UTF-8 (bytes != chars)
    "日本語のテキストで八文字以上の長さ", // 3-byte code points
    ("x " * 1500) + "tail") // long text, many tokens

  private def edgeDf = {
    import spark.implicits._
    edgeTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("native minhashSigs == SQL form on edge texts") {
    val sqlForm = edgeDf
      .selectExpr(Seq("doc_id") ++ (0 until nSeeds).map(Dedup.minhashExpr): _*)
      .orderBy(col("doc_id")).collect()
      .map(r => (1 to nSeeds).map(r.getString))
    val nativeForm = edgeDf
      .select(col("doc_id"), Native.minhashSigs("text", nSeeds).as("mhs"))
      .selectExpr(Seq("doc_id") ++ (0 until nSeeds).map(k => s"mhs[$k] AS mh$k"): _*)
      .orderBy(col("doc_id")).collect()
      .map(r => (1 to nSeeds).map(r.getString))
    assert(sqlForm.length == nativeForm.length)
    sqlForm.zip(nativeForm).zipWithIndex.foreach { case ((s, n), i) =>
      assert(s == n, s"minhash mismatch for text #$i")
    }
  }

  test("native minhashSigs == SQL form on the synthetic documents corpus") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val sqlForm = docs
      .selectExpr(Seq("doc_id") ++ (0 until nSeeds).map(Dedup.minhashExpr): _*)
      .orderBy(col("doc_id")).collect().map(_.toSeq)
    val nativeForm = Dedup.queries("d01_minhash_signatures")(spark, dir)
      .collect().map(_.toSeq)
    assert(sqlForm.length == nativeForm.length && sqlForm.nonEmpty)
    assert(sqlForm.zip(nativeForm).forall { case (a, b) => a == b })
  }

  test("native simhash16 == SQL form on edge texts and the corpus") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_native_d03").toString
    edgeDf.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    for (d <- Seq(dir, "/root/testdata/sf0.001")) {
      val sqlForm = Dedup.d03SimhashSqlForm(spark, d).collect().map(_.toSeq)
      val nativeForm = Dedup.queries("d03_simhash")(spark, d).collect().map(_.toSeq)
      assert(sqlForm.length == nativeForm.length && sqlForm.nonEmpty)
      assert(sqlForm.zip(nativeForm).forall { case (a, b) => a == b }, s"simhash mismatch in $d")
    }
  }

  test("native tokenCountVec == explode/groupBy SQL form") {
    val dim = 64
    val nib = (i: Int) => s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1)"
    for (d <- Seq(edgeDf, Tables.documents(spark, "/root/testdata/sf0.001"))) {
      val sqlForm = d
        .selectExpr("doc_id", "explode(split(text, ' ')) AS tok")
        .selectExpr("doc_id", "substr(md5(tok), 1, 2) AS h")
        .selectExpr("doc_id", s"(${nib(1)} * 16 + ${nib(2)}) % $dim AS j")
        .groupBy(col("doc_id"), col("j"))
        .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("c"))
        .orderBy(col("doc_id"), col("j")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      val nativeForm = d
        .select(col("doc_id"), Native.tokenCountVec("text", dim).as("v"))
        .selectExpr("doc_id", "posexplode(v) AS (j, c)")
        .filter(col("c") > 0)
        .orderBy(col("doc_id"), col("j")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      assert(sqlForm.nonEmpty && sqlForm.toSeq == nativeForm.toSeq)
    }
  }

  test("native embBuckets == planes-join SQL form") {
    val dim = 64
    val nBands = 4
    for (nPlanes <- Seq(4, 7, 16)) {
      // sparse features from the native vec (already proven == SQL form)
      val feat = edgeDf
        .select(col("doc_id"), Native.tokenCountVec("text", dim).as("v"))
        .selectExpr("doc_id", "posexplode(v) AS (j, c)")
        .filter(col("c") > 0)
      val planes = spark.range(nBands.toLong * nPlanes * dim)
        .selectExpr(s"CAST(id DIV ${nPlanes * dim} AS INT) AS band",
          s"CAST((id DIV $dim) % $nPlanes AS INT) AS p",
          s"CAST(id % $dim AS INT) AS j")
        .selectExpr("band", "p", "j",
          "CASE WHEN (instr('0123456789abcdef', " +
            "substr(md5(concat('eb', band, '_', p, '_', j)), 1, 1)) - 1) % 2 = 0 " +
            "THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS sgn")
      val sqlForm = feat.join(planes, Seq("j"))
        .groupBy(col("doc_id"), col("band"), col("p"))
        .agg(org.apache.spark.sql.functions.sum(col("sgn") * col("c")).as("proj"))
        .selectExpr("doc_id", "band",
          "CASE WHEN proj > 0 THEN shiftleft(CAST(1 AS BIGINT), p) ELSE CAST(0 AS BIGINT) END AS bit")
        .groupBy(col("doc_id"), col("band"))
        .agg(org.apache.spark.sql.functions.sum(col("bit")).as("bucket"))
        .orderBy(col("doc_id"), col("band")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      val nativeForm = edgeDf
        .select(col("doc_id"), Native.tokenCountVec("text", dim).as("v"))
        .select(col("doc_id"), Native.embBuckets("v", nBands, nPlanes).as("bkts"))
        .selectExpr("doc_id", "posexplode(bkts) AS (band, bucket)")
        .orderBy(col("doc_id"), col("band")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      assert(sqlForm.nonEmpty && sqlForm.toSeq == nativeForm.toSeq,
        s"embBuckets mismatch at nPlanes=$nPlanes")
    }
  }
}
