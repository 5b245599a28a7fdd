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
}
