package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** t06 against hand-computed repetition fractions — independent of the
    * DuckDB oracle (which shares the "count 2-grams" idea, so a shared
    * misreading of the metric would pass the driver gate; these goldens are
    * computed on paper from the definitions).
    */
  test("t06 repetition fractions match hand-computed goldens") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_t06").toString
    Seq(
      (0L, "a a a a"),      // grams: (a a)x3  -> n2=3 nd=1 top=3
      (1L, "x"),            // no grams (short-doc path)
      (2L, "w x y z"),      // all grams distinct -> n2=3 nd=3 top=1
      (3L, "a b a b a"))    // grams: (a b)x2 (b a)x2 -> n2=4 nd=2 top=2
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = TextAnalysis.queries("t06_repetition")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toSeq
    val want = Seq(
      (0L, 3L, 2.0 / 3.0, 1.0, 3.0 / 4.0),
      (1L, 0L, 0.0, 0.0, 0.0),
      (2L, 3L, 0.0, 1.0 / 3.0, 0.0),
      (3L, 4L, 0.5, 0.5, 3.0 / 5.0))
    assert(got == want)
  }

  /** t07 against hand-computed novelty — pins that sharing means df >= 2
    * over DOC-DISTINCT grams (a gram repeated within one doc does not make
    * it "shared"), that the short-doc convention is novelty 1.0, and that
    * sharing is symmetric across the sharing docs.
    */
  test("t07 n-gram novelty matches hand-computed goldens") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_t07").toString
    Seq(
      (0L, "a b c d"),       // grams {abc, bcd}; abc shared with doc 2
      (1L, "p q"),           // too short: 0 grams, novelty 1.0
      (2L, "a b c a b c"),   // doc-distinct {abc, bca, cab}; abc shared
      (3L, "u v w x"))       // {uvw, vwx} fully novel
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.queries("t07_ngram_novelty")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val want = Seq(
      (0L, 2L, 1L, 0.5),   // abc shared (df=2 via doc 2), bcd novel
      (1L, 0L, 0L, 1.0),
      (2L, 3L, 1L, 2.0 / 3.0), // within-doc repeat of abc is NOT sharing
      (3L, 2L, 0L, 1.0))
    assert(got == want)
  }

  /** t08 against hand-computed integer surprisal — pins the floor-log2
    * bitlength proxy (bitlen(N) - bitlen(cnt)), instance (not type)
    * summation, and that rarer tokens score strictly higher here.
    */
  test("t08 unigram surprisal matches hand-computed goldens") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_t08").toString
    // corpus: 'a' x12, 'b' x3, 'c' x1 -> N=16 (bitlen 5)
    // surprisal: a -> 5-4=1, b -> 5-2=3, c -> 5-1=4
    Seq(
      (0L, "a a a a a a a a a a"), // 10 a's: sum 10, mean 1.000
      (1L, "a a b b b"),           // 2+9=11, mean 11/5 -> 2200
      (2L, "c"))                   // 4, mean 4000
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.queries("t08_unigram_surprisal")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (0L, 10L, 10L, 1000L),
      (1L, 5L, 11L, 2200L),
      (2L, 1L, 4L, 4000L)))
  }

  /** t09 against the injection formula and a sequential Java-regex scrub —
    * measured counts must equal what was injected (no false positives on the
    * letters-only base text, none missed), and the redacted fingerprint must
    * equal scrubbing sequentially with the same patterns in the same order.
    */
  test("t09 PII scrub counts and redaction match the injection formula") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_t09").toString
    val base = Seq(
      (0L, "plain words only here"), // 0 emails, 0 ips, but %5=0 -> phone
      (1L, "more plain words"),      // 1 email, 1 ip, no phone
      (2L, "and some other text"),   // 2 emails, 0 ips
      (5L, "five gets a phone"),     // 2 emails, 1 ip, phone
      (6L, "six is fully clean"))    // %3=0, %2=0, %5=1 -> nothing injected
    base.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    def aug(id: Long, t: String): String =
      t + " " + (s"user$id@example.com " * (id % 3).toInt) +
        (s"10.0.0.${id % 256} " * (id % 2).toInt) +
        (if (id % 5 == 0) "+1-555-0199 " else "")
    val pats = Seq(
      "[a-z0-9.]+@[a-z0-9]+[.][a-z]+" -> "[EMAIL]",
      "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}" -> "[IP]",
      "[+]1-[0-9]{3}-[0-9]{4}" -> "[PHONE]")
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = base.map { case (id, t) =>
      val a = aug(id, t)
      val red = pats.foldLeft(a) { case (acc, (p, r)) =>
        acc.replaceAll(p, java.util.regex.Matcher.quoteReplacement(r))
      }
      (id, (id % 3), (id % 2), if (id % 5 == 0) 1L else 0L, md5hex(red))
    }
    val got = TextAnalysis.queries("t09_pii_scrub")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    assert(got == want)
    // fixture exercises all three kinds and the zero case
    assert(want.exists(_._2 > 0) && want.exists(_._3 > 0) && want.exists(_._4 > 0))
    assert(want.exists(w => w._2 == 0 && w._3 == 0 && w._4 == 0))
  }
}
