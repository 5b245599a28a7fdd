package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Sequential (collections-only) recompute of the s04 k-means assignment —
  * a third, scan-free algorithm independent of both the engine's broadcast
  * argmin and the oracle's cross-join SQL. The fixture plants two tight
  * clusters plus an equidistant tie vector so the (dist, cid) tiebreak is
  * actually exercised, and an empty-cluster seed so the zero-filled frame
  * row is covered.
  */
class SimilaritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dim = 64

  test("s04 assignment matches a sequential quantized-L2 argmin") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_s04").toString
    // 8 seeds: seed j = constant vector j.0; members near seeds 0 and 2;
    // vec 20 sits exactly between seeds 0 and 1 (tie → cid 0); seeds 3..7
    // attract nobody beyond themselves
    def const(v: Float): Seq[Float] = Seq.fill(dim)(v)
    val vecs: Seq[(Long, Seq[Float], String)] =
      (0L until 8L).map(j => (j, const(j.toFloat), "seed")) ++ Seq(
        (10L, const(0.1f), "m"), (11L, const(-0.2f), "m"), // near seed 0
        (12L, const(2.2f), "m"), (13L, const(1.8f), "m"), // near seed 2
        (20L, const(0.5f), "tie")) // exactly between seeds 0 and 1
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")

    def q(x: Float): Long = math.floor(x.toDouble * 1000).toLong
    def dist(a: Seq[Float], b: Seq[Float]): Long =
      a.zip(b).map { case (x, y) => val dd = q(x) - q(y); dd * dd }.sum
    val seeds = vecs.filter(_._1 < 8).map(v => v._1 -> v._2).toMap
    val want = (0L until 8L).map { cid =>
      val members = vecs.filter { case (_, e, _) =>
        val best = (0L until 8L).map(j => (dist(e, seeds(j)), j)).min
        best._2 == cid
      }
      (cid, members.size.toLong,
        members.map { case (_, e, _) => dist(e, seeds(cid)) }.sum,
        members.map { case (_, e, _) => q(e.head) }.sum)
    }

    val got = Similarity.queries("s04_kmeans_assign")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    // fixture sanity: the tie vector landed on the LOWER cid, and some seed
    // cluster is a singleton (the zero-padded frame path short of empty —
    // every seed is at distance 0 from itself, so truly empty needs k > n)
    assert(want(0)._2 == 4L) // seed 0 + vecs 10, 11, 20
    assert(want(1)._2 == 1L)
  }
}
