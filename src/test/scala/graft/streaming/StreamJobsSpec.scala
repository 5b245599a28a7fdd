package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class StreamJobsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("streaming windowed agg equals the batch plan over the same input") {
    // file stream sources need a directory: stage the table into one
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    def canon(df: org.apache.spark.sql.DataFrame): Array[String] =
      df.selectExpr("CAST(ws AS STRING) AS ws", "event_type", "n", "sum_value")
        .collect().map(_.toString).sorted
    val streamed = canon(StreamJobs.runWindowedStream(spark, dir.toString, "st_test"))
    val batch = canon(StreamJobs.windowedAgg(spark.read.parquet(s"$sfDir/events.parquet")))
    assert(streamed.nonEmpty)
    val diff = streamed.zipAll(batch, "<none>", "<none>").filter(p => p._1 != p._2)
    if (diff.nonEmpty) info(s"first diffs: ${diff.take(3).mkString(" | ")} (s=${streamed.length} b=${batch.length})")
    assert(streamed.sameElements(batch))
  }

  test("sessionization state equals groupBy aggregation") {
    import spark.implicits._
    val evs = spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("user_id", "ts", "value").as[StreamJobs.Ev]
    val sessions = StreamJobs.sessionize(evs).collect().map(s => s.user_id -> s.n_events).toMap
    val expected = spark.read.parquet(s"$sfDir/events.parquet")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sessions == expected)
  }
}
