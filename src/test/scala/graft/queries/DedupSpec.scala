package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 100-member duplicate cluster + unrelated filler docs. Without the
    * exact-fingerprint pre-collapse the cluster floods every LSH bucket past
    * the 50-member mega-bucket guard and is silently dropped — the regression
    * this spec pins.
    */
  test("a 100-member duplicate cluster still groups despite the mega-bucket guard") {
    import spark.implicits._
    val cluster = (0L until 100L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog again and again tonight"))
    val filler = (100L until 160L).map(i =>
      (i, (0 until 10).map(j => s"tok${i}x$j").mkString(" "))) // no shared shingles
    val dir = Files.createTempDirectory("graft_dedup").toString
    (cluster ++ filler).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val pairs = Dedup.queries("d02_lsh_pairs")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every cluster member maps to the canonical representative (doc 0)
    val clusterPairs = pairs.filter { case (a, _, _) => a == 0L }
    assert(clusterPairs.length == 99)
    assert(clusterPairs.forall { case (_, b, j) => b >= 1L && b < 100L && j == 1000L })

    // the guard itself is observable: no mega bucket remains after collapse
    val stats = Dedup.queries("d05_lsh_bucket_stats")(spark, dir).collect()
    assert(stats.nonEmpty)
    assert(stats.forall(_.getLong(2) == 0L)) // n_mega_buckets
  }

  test("pre-collapse keeps representatives' near-dup discovery intact") {
    import spark.implicits._
    // two near-identical (not equal) docs + noise: LSH must still pair them
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (3L, "one two three four five six seven eight nine ten"),
      (4L, "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"))
    val dir = Files.createTempDirectory("graft_dedup2").toString
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = Dedup.queries("d02_lsh_pairs")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs.exists { case (a, b, j) => a == 1L && b == 2L && j > 500L })
  }

  test("embedding-cosine near-dup pairs high-overlap docs and excludes disjoint ones") {
    import spark.implicits._
    val base = (0 until 30).map(j => s"word$j").mkString(" ")
    val docs = Seq(
      (1L, base), // exact dup of 2 → cosine 1.0
      (2L, base),
      (3L, base + " extraone"), // near dup: 30 of 31 tokens shared
      (4L, (100 until 130).map(j => s"other$j").mkString(" "))) // disjoint
    val dir = Files.createTempDirectory("graft_dedup3").toString
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.queries("d06_embedding_neardup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // identical vectors: cosine exactly 1.0 up to one sqrt rounding
    val exact = got.filter { case (a, b, _) => a == 1L && b == 2L }
    assert(exact.length == 1 && exact.head._3 >= 999998L)
    // near dup crosses the 0.95 gate; the disjoint doc never appears
    assert(got.exists { case (a, b, s) => a <= 2L && b == 3L && s >= 950000L })
    assert(!got.exists { case (a, b, _) => a == 4L || b == 4L })
  }

  /** The J1 pattern (broadcast AND forced-shuffle, identical rows) for d06's
    * byte-based verification-join gate: the gate is a PLAN choice only, so
    * both sides must produce the same pairs bit for bit.
    */
  test("d06 broadcast and shuffle verification joins emit identical rows") {
    import spark.implicits._
    val base = (0 until 30).map(j => s"word$j").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base), (3L, base + " extraone"),
      (4L, (100 until 130).map(j => s"other$j").mkString(" ")))
    val dir = Files.createTempDirectory("graft_dedup_gate").toString
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val key = "graft.d06.broadcast.maxBytes"
    def run(): Seq[(Long, Long, Long)] =
      Dedup.queries("d06_embedding_neardup")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaBroadcast = run() // default 64 MB ≫ 4 docs → broadcast path
    spark.conf.set(key, "1") // 4 docs × ~0.57 KB > 1 B → shuffle path
    try {
      val viaShuffle = run()
      assert(viaBroadcast == viaShuffle)
      assert(viaBroadcast.nonEmpty) // the equality must not be vacuous
    } finally spark.conf.unset(key)
  }

  test("null-text docs are dropped from d01/d03 (oracle parity)") {
    import spark.implicits._
    // the DuckDB oracles lose null-text docs through the series join /
    // unnest; the native scalar expressions would keep a (doc_id, NULL) row —
    // the queries must filter for parity
    val dir = Files.createTempDirectory("graft_dedup_null").toString
    Seq((1L, "alpha beta gamma delta epsilon"), (2L, null: String))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val d01 = Dedup.queries("d01_minhash_signatures")(spark, dir).collect()
    assert(d01.map(_.getLong(0)).toSeq == Seq(1L))
    val d03 = Dedup.queries("d03_simhash")(spark, dir).collect()
    assert(d03.map(_.getLong(0)).toSeq == Seq(1L))
    // the in-repo SQL reference form agrees (row lost through the explode)
    val sqlForm = Dedup.d03SimhashSqlForm(spark, dir).collect()
    assert(sqlForm.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("d06 pre-collapse pairs a big identical-text cluster with its rep, not O(k^2)") {
    import spark.implicits._
    val cluster = (0L until 100L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog again and again tonight"))
    val filler = (100L until 130L).map(i =>
      (i, (0 until 10).map(j => s"tok${i}x$j").mkString(" ")))
    val dir = Files.createTempDirectory("graft_dedup4").toString
    (cluster ++ filler).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.queries("d06_embedding_neardup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val clusterPairs = got.filter { case (a, _, _) => a == 0L }
    assert(clusterPairs.length == 99) // member ↔ canonical rep, all k-1 of them
    assert(clusterPairs.forall { case (_, b, s) => b >= 1L && b < 100L && s >= 999998L })
    // no member-member pair survives the collapse (canonical semantics)
    assert(!got.exists { case (a, b, _) => a >= 1L && a < 100L && b < 100L })
  }

  /** d08's prefix filter must be LOSSLESS: its output equals the brute-force
    * all-pairs exact-Jaccard answer, pair for pair — including pairs whose
    * only shared grams are corpus-frequent (rank last in the global order,
    * the case a buggy prefix bound would drop) and pairs at the τ boundary.
    */
  test("d08 prefix-filter join == brute-force all-pairs exact Jaccard") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs: Seq[(Long, String)] = Seq(
      1L -> base, // exact dup pair (J = 1000)
      2L -> base,
      3L -> (base + " lambda"), // near dup of 1/2, above τ
      4L -> "alpha beta gamma delta epsilon zeta mu nu xi omicron", // ~boundary
      5L -> "one two three four five six seven eight nine ten", // disjoint
      6L -> "alpha beta gamma pi rho sigma tau upsilon phi chi", // below τ
      // a 25-member cluster of identical docs: every gram FREQUENT (df=25),
      // so their prefixes are built entirely from high-df grams
      7L -> "shared common words appear in every single clone document here") ++
      (8L until 32L).map(i =>
        i -> "shared common words appear in every single clone document here")
    val dir = Files.createTempDirectory("graft_dedup_d08").toString
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def grams3(t: String): Set[String] = {
      val w = t.split(' ')
      (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    val expected = (for {
      (a, ta) <- docs; (b, tb) <- docs if a < b
      ga = grams3(ta); gb = grams3(tb)
      c = (ga intersect gb).size; u = ga.size + gb.size - c
      if 5 * c >= 3 * u
    } yield (a, b, 1000L * c / u)).sortBy { case (a, b, j) => (-j, a, b) }

    val got = Dedup.queries("d08_ngram_jaccard")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // sanity on the fixture itself: it exercises exact dups, a frequent-gram
    // cluster (25·24/2 pairs), near dups, and excludes the below-τ pairs
    assert(expected.count { case (a, b, _) => a >= 7L } == 25 * 24 / 2)
    assert(expected.exists { case (a, b, j) => a == 1L && b == 3L && j < 1000L })
    assert(!expected.exists { case (a, b, _) => a == 1L && b == 6L })
  }

  /** d09 against a full sequential recompute (MinHash signatures, banding,
    * bucket guard, slot agreement, exact char-8-gram Jaccard) — pins that
    * the estimate is counted over ALL slots, the exact side uses CHAR
    * shingles (the universe the signatures hash), and err_e3 is the abs
    * difference of the two e3 values.
    */
  test("d09 calibration == sequential MinHash vs exact char-shingle Jaccard") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_d09").toString
    val common = (0 until 40).map(j => s"word$j").mkString(" ")
    val corpus = Seq(
      (0L, s"$common ending alpha"),
      (1L, s"$common ending beta"), // near-dup of 0: long shared prefix
      (2L, (0 until 40).map(j => s"other$j").mkString(" ")))
    corpus.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$d/documents.parquet")

    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def shingles(t: String): Seq[String] =
      (1 to math.max(t.length - 7, 1)).map(i => t.substring(i - 1, math.min(i + 7, t.length)))
    def sig(t: String): Seq[String] =
      (0 until 4).map(k => shingles(t).map(sh => md5hex(s"s$k$sh")).min)
    val sigs = corpus.map { case (id, t) => id -> sig(t) }.toMap
    // banding: all buckets here are far below the 50 guard
    val cand = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      if (0 until 4).exists(k => sa(k) == sb(k))
    } yield (a, b)).toSeq.sorted
    assert(cand.nonEmpty) // fixture sanity: the near-dup pair must band together
    val want = cand.map { case (a, b) =>
      val nAgree = (0 until 4).count(k => sigs(a)(k) == sigs(b)(k)).toLong
      val (shA, shB) = (shingles(corpus(a.toInt)._2).toSet, shingles(corpus(b.toInt)._2).toSet)
      val est = 1000L * nAgree / 4
      val jac = 1000L * (shA & shB).size / (shA | shB).size
      (a, b, nAgree, est, jac, math.abs(est - jac))
    }
    val got = Dedup.queries("d09_minhash_calibration")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
  }
}
