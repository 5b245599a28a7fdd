package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class SaltedJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("salted join equals plain join under Zipf skew") {
    import spark.implicits._
    // head key "Q1" dominates the probe side
    val probe = spark.range(10000)
      .selectExpr("CASE WHEN id % 10 < 8 THEN 'Q1' ELSE concat('Q', id % 50) END AS key",
        "id AS payload")
    val dict = spark.range(50).selectExpr("concat('Q', id) AS key", "id * 100 AS dval")
    val expected = probe.join(dict, Seq("key"))
      .selectExpr("key", "payload", "dval").collect().map(_.toString).sorted
    val got = SaltedJoin.join(probe, dict, "key", salts = 8, hotThreshold = 500)
      .selectExpr("key", "payload", "dval").collect().map(_.toString).sorted
    assert(got.length == expected.length)
    assert(got.sameElements(expected))
  }

  test("no hot keys falls back to a plain join") {
    val probe = spark.range(100).selectExpr("concat('k', id) AS key", "id AS p")
    val dict = spark.range(100).selectExpr("concat('k', id) AS key", "id AS d")
    val got = SaltedJoin.join(probe, dict, "key", hotThreshold = 1000)
    assert(got.count() == 100)
  }
}
