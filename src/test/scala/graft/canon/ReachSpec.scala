package graft.canon

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ReachSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def edges(pairs: (String, String)*) = {
    import spark.implicits._
    pairs.toDF("child", "parent")
  }
  private def seedOf(n: String) = {
    import spark.implicits._
    Seq(n).toDF("node")
  }

  test("regression: a depth-12 chain is closed to fixpoint (old fixed cap was 8)") {
    // the sf0.1 corpus exposed a depth-9 during-chain; pin well past it
    val chain = edges((1 to 12).map(i => s"n$i" -> s"n${i - 1}"): _*)
    val got = Reach.closure(chain, seedOf("n0")).collect().map(_.getString(0)).sorted
    assert(got.toSeq == (0 to 12).map(i => s"n$i").sorted)
  }

  test("multi-path diamond yields each node once") {
    val g = edges("b" -> "a", "c" -> "a", "d" -> "b", "d" -> "c", "e" -> "d")
    val got = Reach.closure(g, seedOf("a")).collect().map(_.getString(0)).sorted
    assert(got.toSeq == Seq("a", "b", "c", "d", "e"))
  }

  test("the round cap fails loudly instead of returning a truncated closure") {
    val chain = edges((1 to 6).map(i => s"n$i" -> s"n${i - 1}"): _*)
    val e = intercept[IllegalArgumentException] {
      Reach.closure(chain, seedOf("n0"), maxRounds = 3).collect()
    }
    assert(e.getMessage.contains("truncated closure"))
  }

  test("a closure of depth exactly maxRounds succeeds (confirming round is free)") {
    val chain = edges((1 to 4).map(i => s"n$i" -> s"n${i - 1}"): _*)
    val got = Reach.closure(chain, seedOf("n0"), maxRounds = 4)
      .collect().map(_.getString(0)).sorted
    assert(got.toSeq == (0 to 4).map(i => s"n$i").sorted)
  }

  test("a cyclic graph converges instead of tripping the guard") {
    val g = edges("b" -> "a", "c" -> "b", "a" -> "c") // 3-cycle
    val got = Reach.closure(g, seedOf("a"), maxRounds = 8)
      .collect().map(_.getString(0)).sorted
    assert(got.toSeq == Seq("a", "b", "c"))
  }
}
