package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** g04's degree-ordered enumeration must equal a brute-force all-triples
    * adjacency scan — each triangle counted exactly once regardless of how
    * the degree order tilts its edges. n = 23 exercises ring wraparound and
    * shortcut collisions (2i+1 landing on ring neighbours).
    */
  test("g04 triangle counts == brute-force all-triples enumeration") {
    import spark.implicits._
    val n = 23L
    val dir = Files.createTempDirectory("graft_g04").toString
    (0L until n).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val edges: Set[(Long, Long)] = (0L until n).flatMap { i =>
      Seq((i, (i + 1) % n), (i, (i + 2) % n), (i, (2 * i + 1) % n))
    }.filter { case (u, v) => u != v }
      .map { case (u, v) => (math.min(u, v), math.max(u, v)) }.toSet
    val expected = (for {
      x <- 0L until n; y <- x + 1 until n; z <- y + 1 until n
      if edges((x, y)) && edges((y, z)) && edges((x, z))
    } yield Seq(x, y, z)).flatten
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }

    val got = Graph.queries("g04_triangles")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == (0L until n).toSet) // zero-count nodes included
    for (i <- 0L until n)
      assert(got(i) == expected.getOrElse(i, 0L), s"n_triangles($i)")
    assert(expected.values.sum / 3 >= n) // ring2 ⇒ every consecutive triple
  }

  /** g05's frontier Bellman-Ford must equal a sequential Dijkstra over the
    * same weighted graph — a THIRD algorithm, independent of both the
    * engine's frontier loop and the oracle's unrolled classic relaxation.
    * n = 157 (prime) exercises wraparound shortcuts and weight variety; the
    * assert on reached == all nodes pins the reachability claim the output
    * contract relies on.
    */
  /** The oracles seed/anchor node 0 unconditionally; a corpus without
    * doc_id 0 must fail LOUDLY (empty engine frame vs phantom oracle rows
    * is exactly the silent-gate-mismatch class the kg04 sweep hunts).
    */
  test("g02/g05 fail loudly when the doc_id-0 seed is missing") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_gseed").toString
    (5L until 15L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e5 = intercept[IllegalArgumentException] {
      Graph.queries("g05_sssp")(spark, dir).collect()
    }
    assert(e5.getMessage.contains("doc_id 0"))
    val e2 = intercept[IllegalArgumentException] {
      Graph.queries("g02_tree_depth")(spark, dir).collect()
    }
    assert(e2.getMessage.contains("doc_id 0"))
  }

  test("g05 SSSP == sequential Dijkstra; all nodes reached") {
    import spark.implicits._
    val n = 157L
    val dir = Files.createTempDirectory("graft_g05").toString
    (0L until n).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val adj = (0L until n).flatMap { i =>
      val w = 1L + i % 7
      Seq((i, (i + 1) % n, w), (i, (2 * i + 1) % n, w))
    }.groupBy(_._1).map { case (s0, es) => s0 -> es.map(e => (e._2, e._3)) }
    val dist = scala.collection.mutable.Map(0L -> 0L)
    val pq = scala.collection.mutable.PriorityQueue((0L, 0L))(
      Ordering.by[(Long, Long), Long](_._1).reverse)
    while (pq.nonEmpty) {
      val (dd, u) = pq.dequeue()
      if (dist(u) == dd)
        adj.getOrElse(u, Nil).foreach { case (v, w) =>
          if (dist.get(v).forall(_ > dd + w)) {
            dist(v) = dd + w; pq.enqueue((dd + w, v))
          }
        }
    }
    assert(dist.keySet == (0L until n).toSet) // everything reachable from 0

    val got = Graph.queries("g05_sssp")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == (0L until n).toSet)
    for (i <- 0L until n) assert(got(i) == dist(i), s"dist($i)")
  }
}
