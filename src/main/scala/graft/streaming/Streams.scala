package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface — a pure superset over the reference,
  * which has no stream processing at all (SURVEY §2.10: its only
  * "streaming" is chunked result fetch,
  * reference: src/TidierDB_macros.jl:591-622).
  *
  * Shapes provided: watermarked tumbling/sliding window aggregation and
  * session windows over the `events` fixture schema. Batch DataFrames
  * accept the same transforms, so each helper is testable by running the
  * fixture through a `memory` sink (see StreamingSpec).
  */
object Streams {

  /** events fixture schema for readStream (ts already micro-converted) */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos-as-long at scan; converted below
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** streaming scan of an events parquet directory */
  def readEventsStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema(eventsSchema)
      .parquet(path)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Watermarked tumbling-window counts per event type. At scale: the
    * shuffle key is (window, event_type); state store size is bounded by
    * the watermark horizon. */
  def tumblingCounts(events: DataFrame, watermark: String, windowLen: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(
        col("window.start").as("w_start"),
        col("window.end").as("w_end"),
        col("event_type"), col("n"), col("total_value"))

  /** Sliding-window per-user activity. */
  def slidingUserActivity(
      events: DataFrame, watermark: String,
      windowLen: String, slide: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("w_start"), col("user_id"), col("n_events"))

  /** Session windows (gap-based) per user — Spark-native session_window,
    * which keeps state per (user, open session) only. */
  def sessionize(events: DataFrame, watermark: String, gap: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("user_id"), col("n_events"), col("session_value"))
}
