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

  // ---- custom state (KeyValueGroupedDataset.flatMapGroupsWithState) ----

  /** typed view of an event row for the stateful operators */
  final case class Ev(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Cross-batch streaming DEDUP with event-time TTL — the custom-state
    * shape the built-in `dropDuplicatesWithinWatermark` hides: one
    * boolean-ish state cell per dedup key, expired by an event-time
    * timeout at the watermark horizon, so state size is bounded by
    * (distinct keys within the watermark), not the stream's lifetime.
    * Emits only the FIRST event per (user_id, event_type, value) key;
    * later duplicates — including ones arriving in LATER micro-batches —
    * are suppressed while the key's state lives.
    *
    * At 100 TB/day: state is hash-partitioned by key across executors
    * (the state store shuffle), each key costs ~24 bytes, and the TTL
    * keeps the store from growing without bound — the knobs that matter
    * are the watermark horizon and key cardinality within it.
    */
  def dedupStream(events: DataFrame, watermark: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val ds = events
      .select("event_id", "ts", "user_id", "event_type", "value")
      .withWatermark("ts", watermark)
      .as[Ev]
    ds.groupByKey(e => (e.user_id, e.event_type, e.value))
      .flatMapGroupsWithState[Long, Ev](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, rows, state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists) Iterator.empty // seen in a previous batch
          else {
            // first batch containing this key: emit the earliest row
            val first = rows.minBy(e => (e.ts.getTime, e.event_id))
            state.update(first.ts.getTime)
            // expire the key once the watermark passes its event time —
            // duplicates straggling beyond the watermark are out of
            // contract anyway (they'd be dropped by the watermark)
            if (state.getCurrentWatermarkMs() >= 0)
              state.setTimeoutTimestamp(first.ts.getTime, watermark)
            Iterator.single(first)
          }
      }
      .toDF()
  }

  /** Running per-user totals across micro-batches — incremental state
    * (count, sum) per user, emitted once per batch the user appears in.
    * The mapGroupsWithState analog of a forever-running grouped
    * aggregation, without the unbounded `complete`-mode result table.
    *
    * State lifetime: with `idleTtl = None` per-user state lives for the
    * stream's lifetime — bounded only by KEY CARDINALITY, not by the
    * watermark (fine for bounded user populations, unbounded for
    * e.g. session-scoped keys). Pass `idleTtl = Some("7 days")` to
    * expire users idle past the TTL (event-time timeout keyed to last
    * activity, the same bounded-state story as [[dedupStream]]); an
    * expired user that reappears restarts from zero. */
  def runningUserTotals(
      events: DataFrame, watermark: String, idleTtl: Option[String] = scala.None): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val ds = events
      .select("event_id", "ts", "user_id", "event_type", "value")
      .withWatermark("ts", watermark)
      .as[Ev]
    val timeout =
      if (idleTtl.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Double), UserRunning](
        OutputMode.Append, timeout) {
        case (_, _, state: GroupState[(Long, Double)]) if state.hasTimedOut =>
          state.remove(); Iterator.empty
        case (uid, rows, state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var s = s0
          var lastTs = Long.MinValue
          rows.foreach { e =>
            n += 1; s += e.value
            if (e.ts.getTime > lastTs) lastTs = e.ts.getTime
          }
          state.update((n, s))
          idleTtl.foreach { ttl =>
            if (state.getCurrentWatermarkMs() >= 0)
              state.setTimeoutTimestamp(lastTs, ttl)
          }
          Iterator.single(UserRunning(uid, n, s))
      }
      .toDF()
  }
}
