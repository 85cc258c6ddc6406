package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming variant of the incremental ingest (SURVEY.md §2.7):
  * the reference's daily watermark+skip semantics (C1–C3) expressed natively
  * as `readStream` → event-time window aggregation with a watermark →
  * `writeStream` with checkpointing. `Trigger.AvailableNow` reproduces the
  * scheduled-batch cadence (process everything new, then stop).
  *
  * The watermark file + filter of [[graft.ingest.IncrementalBatch]] is
  * replaced by the engine-managed checkpoint: exactly-once sinks, late-data
  * drop at the watermark — state the reference hand-rolled (and got wrong,
  * bug B4).
  */
object EventsStream {

  /** Schema of the driver's `events` table (round-12 layout: `ts` is a
    * plain µs TIMESTAMP_NTZ — see [[graft.Tables.events]] for the batch
    * equivalent, which also still reads the older ns-long layout).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-stream over a directory of events parquet. Event-time ops
    * (watermarks, windows) want TimestampType, so the NTZ column is cast
    * once here — session timezone is UTC everywhere, so the instant is
    * unchanged.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(rawSchema)
      .parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp"))

  /** Tumbling-window per-type aggregates with a 1-hour watermark: counts,
    * sums — the streaming analog of the reference's per-batch row counts
    * (C7) plus real event-time semantics the reference lacks.
    */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"),
        approx_count_distinct(col("user_id")).as("approx_users"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"), col("approx_users"))

  /** Streaming exact deduplication: drop re-delivered events by key within
    * the watermark horizon — state is bounded because expired keys age out
    * with the watermark (the streaming form of the reference's
    * exactly-once-ish watermark skip, C2).
    */
  def dedupedEvents(events: DataFrame, keyCols: Seq[String]): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Watermarked stream-stream inner join: each event joined to same-user
    * purchases within the following hour — the streaming twin of the batch
    * banded range join (`q_range_join`; must produce the identical pair
    * set, asserted by `StreamingSpec`). Both sides carry watermarks and the
    * join condition is time-bounded, so join state is bounded: rows age out
    * once the watermark passes their reachability window. Inner-join
    * matches emit as soon as both rows arrive; the watermark only governs
    * state cleanup.
    */
  def purchaseAttribution(events: DataFrame): DataFrame = {
    val ev = events.select(col("event_id"), col("user_id"), col("ts"))
      .withWatermark("ts", "1 hour")
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("pts"))
      .withWatermark("pts", "1 hour")
    ev.join(purchases,
        col("user_id") === col("p_user_id") &&
          col("pts") >= col("ts") &&
          col("pts") <= col("ts") + expr("INTERVAL 1 HOUR"))
      .select(col("event_id"), col("purchase_id"))
  }

  /** Run one AvailableNow pass, appending to a parquet sink. Blocks until
    * the micro-batches drain; returns the finished query.
    */
  def runOnce(spark: SparkSession, srcDir: String, sinkDir: String,
              checkpointDir: String): StreamingQuery = {
    val q = hourlyRollup(readEvents(spark, srcDir))
      .writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .start(sinkDir)
    q.awaitTermination()
    q
  }
}
