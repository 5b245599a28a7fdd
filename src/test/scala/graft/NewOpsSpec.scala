package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Sequential-oracle gates for the round-5 operators whose DuckDB oracles
  * share derivation shape with the engine (window cumsum / inverted index):
  * each is recomputed here with plain Scala collections — a third,
  * independent derivation — and compared exactly.
  */
class NewOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("m07 sequence packing equals a sequential single-threaded repack") {
    val spans = KgPipeline.corpusSpans(spark, sfDir)
      .select("doc_id", "pos", "kind", "text", "media_ref")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)), Option(r.getString(4))))
    def cost(kind: String, text: Option[String], ref: Option[String]): Long =
      if (kind == "text" || kind == "ib_row")
        math.max(1L, text.getOrElse("").split(" ", -1).length.toLong)
      else if (kind == "media") 64L
      else if (ref.isDefined) 16L
      else 1L
    // sequential repack: per month stream ordered by (doc_id, pos)
    val expectedFull = spans
      .map { case (doc, pos, kind, text, ref) =>
        (doc.substring(4, 11), doc, pos, kind, ref, cost(kind, text, ref)) }
      .groupBy(_._1).toSeq
      .flatMap { case (month, rows) =>
        var cum = 0L
        rows.sortBy(r => (r._2, r._3)).map { r =>
          val seq = cum / multimodal.Multimodal.SeqBudget
          cum += r._6
          ((month, seq), r)
        }.toSeq
      }
      .groupBy(_._1)
      .map { case ((month, seq), rows) =>
        val vs = rows.map(_._2).toSeq
        (month, seq, vs.size.toLong, vs.map(_._2).distinct.size.toLong,
          vs.map(_._6).sum,
          vs.filter(v => v._4 == "text" || v._4 == "ib_row").map(_._6).sum,
          vs.filter(_._5.isDefined).map(_._6).sum)
      }.toSeq.sortBy(t => (t._1, t._2))
    val got = multimodal.Multimodal.m07SequencePacking(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(t => (t._1, t._2))
    assert(got.length == expectedFull.length,
      s"sequence count ${got.length} vs ${expectedFull.length}")
    assert(got.sameElements(expectedFull))
    // invariant: a month's sequences are contiguous from 0 and conserve mass
    got.groupBy(_._1).foreach { case (_, seqs) =>
      assert(seqs.map(_._2).sorted.sameElements(0L until seqs.length))
    }
  }

  test("d10 duplicated spans equal a sequential inverted-index recompute") {
    val docs = queries.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.split(" ", -1).length >= 5)
    val grams = docs.map { case (id, text) =>
      val toks = text.split(" ", -1)
      id -> toks.sliding(5).map(_.mkString(" ")).toArray
    }
    val df = scala.collection.mutable.Map[String, Set[Long]]()
    for ((id, gs) <- grams; g <- gs.distinct) df(g) = df.getOrElse(g, Set()) + id
    val dup = df.filter(_._2.size >= 2).keySet
    val expected = grams.flatMap { case (id, gs) =>
      val dupPos = gs.zipWithIndex.collect { case (g, p) if dup(g) => p }
      if (dupPos.isEmpty) None
      else {
        // gaps-and-islands over consecutive positions
        val runs = dupPos.foldLeft(List.empty[List[Int]]) {
          case (acc @ (h :: t), p) if h.head == p - 1 => (p :: h) :: t
          case (acc, p) => List(p) :: acc
        }.map(_.size.toLong)
        Some((id, runs.sum, runs.size.toLong, runs.max + 4L))
      }
    }.sortBy(_._1)
    val got = queries.Dedup.d10DuplicateSpans(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(expected.nonEmpty && expected.exists(_._4 > 5L),
      "fixture must contain a multi-gram duplicated run")
    assert(got.length == expected.length)
    assert(got.sameElements(expected))
  }
}
