package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming jobs over the `events` table shape: watermarked
  * windowed aggregation and custom sessionization state
  * (mapGroupsWithState). The same transforms run in batch mode — the spec
  * asserts stream output == batch output over the same input, which is the
  * contract that matters when this runs against a real source (Kafka/files)
  * on a cluster.
  */
object StreamJobs {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Watermarked tumbling-window count/sum per event type. Works on both a
    * streaming and a batch DataFrame (identical plan semantics).
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "30 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_value"))

  // ---- sessionization with explicit state ----------------------------------
  // The value accumulator is exact integer micros (values carry ≤6 decimals,
  // TESTDATA.md) so the state is order-independent and the output oracles
  // exactly — float accumulation order in mapGroupsWithState is not
  // deterministic across partitionings.
  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(count: Long, sumE6: Long, lastTs: Long)
  case class SessionOut(user_id: Long, n_events: Long, sum_value_e6: Long)

  def sessionize(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionOut](GroupStateTimeout.NoTimeout()) {
        (user, it, state: GroupState[SessionState]) =>
          var s = state.getOption.getOrElse(SessionState(0, 0L, 0L))
          for (e <- it) s = SessionState(s.count + 1,
            s.sumE6 + Math.round(e.value * 1e6), math.max(s.lastTs, e.ts.getTime))
          state.update(s)
          SessionOut(user, s.count, s.sumE6)
      }
  }

  /** Drive the windowed agg as an actual stream from parquet and collect the
    * complete result via the memory sink (local smoke for the streaming
    * plan — used by the spec and available as a library entry point).
    */
  def runWindowedStream(spark: SparkSession, sfDir: String, queryName: String): DataFrame = {
    val stream = spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$sfDir")
    val q = windowedAgg(stream.filter(col("event_id").isNotNull))
      .writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
