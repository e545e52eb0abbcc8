package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event-stream analytics — gap sessionization and funnel
  * analysis, the two query shapes every product-events warehouse runs
  * daily. The streaming twins live in [[graft.streaming.Streams]]
  * (`sessionize` = session windows with watermarks); these are the
  * batch formulations over an events table.
  *
  * 100 TB shape: both operators shuffle ONCE on the user key and stay
  * per-user from there — sessionization is a per-user window
  * (lag + running sum, no global window anywhere), the funnel is one
  * per-user aggregation whose state is the k stage timestamps. Skewed
  * power users cost what their event count costs; nothing crosses
  * users.
  */
object Events {

  /** exact epoch micros for TIMESTAMP and TIMESTAMP_NTZ alike — the
    * shared dispatch ([[graft.plans.ExactMicros]]) */
  private def micros(df: DataFrame, c: String): Column =
    graft.plans.ExactMicros.col(df, c)

  /** Gap-based session assignment: within each user, an event starts a
    * new session iff it is the user's first or arrives more than
    * `gapSeconds` after the PREVIOUS event (by `tsCol`, ties broken by
    * `orderCol` so the lag is deterministic). Adds `session_id`
    * (long, 0-based per user, in time order). Gap arithmetic is exact
    * integer microseconds — no double timestamps anywhere. */
  def assignSessions(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      gapSeconds: Long,
      orderCol: String,
      sessionCol: String = "session_id"): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(orderCol))
    val us = micros(events, tsCol)
    val prev = lag(us, 1).over(w)
    val isBreak = when(prev.isNull || us - prev > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    events
      .withColumn("__brk", isBreak)
      .withColumn(sessionCol,
        (sum(col("__brk")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L))
      .drop("__brk")
  }

  /** Per-(user, session) summary: event count, start/end, duration in
    * exact integer seconds (floor). */
  def sessionStats(
      sessioned: DataFrame,
      userCol: String,
      tsCol: String,
      sessionCol: String = "session_id"): DataFrame =
    sessioned
      .groupBy(col(userCol), col(sessionCol))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        // double division is exact here (span micros ≪ 2^53), cast floors
        ((max(micros(sessioned, tsCol)) - min(micros(sessioned, tsCol)))
          / lit(1000000L)).cast("long").as("duration_secs"))

  /** FUNNEL: per user, the earliest completion time of each step —
    * stage i is the user's first `steps(i)` event STRICTLY AFTER stage
    * i−1's time (greedy-earliest chain, the standard funnel
    * definition; equivalently `MIN(ts > t_{i-1})` per stage). Output:
    * one row per user with `stage_1..stage_k` timestamps (NULL =
    * never reached) and `depth` (0..k, stages completed).
    *
    * One aggregation: events fold per user over the time-sorted
    * (ts, type) list — the per-user event list rides one shuffle, the
    * fold state is k timestamps. Stage times come from the PREVIOUS
    * fold state, so one event never completes two stages (strict
    * ordering holds even on equal timestamps).
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      withinSeconds: Option[Long] = scala.None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    withinSeconds.foreach(w =>
      require(w > 0, s"withinSeconds must be positive, got $w"))
    val k = steps.size
    // only the steps' events matter — filter before the shuffle
    val relevant = events
      .filter(col(typeCol).isin(steps.map(lit): _*))
      .select(col(userCol), col(tsCol).as("__ts"), col(typeCol).as("__tp"))
    val sorted = relevant
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(col("__ts"), col("__tp")))).as("__evs"))
    val tsType = events.schema(tsCol).dataType // TIMESTAMP or TIMESTAMP_NTZ
    val zero = array(Seq.fill(k)(lit(null).cast(tsType)): _*)
    val folded = aggregate(
      col("__evs"),
      zero,
      (acc, e) => {
        val ts = e.getField("__ts"); val tp = e.getField("__tp")
        // element i fills from the OLD state: first matching event
        // strictly after the previous stage's time
        transform(acc, (t, i) => {
          val stepName = element_at(array(steps.map(lit): _*), i + 1)
          // CONVERSION WINDOW (when set): later stages must land within
          // `withinSeconds` of stage 1's time — the "convert within N
          // hours" funnel variant; interval arithmetic is exact micros
          val windowOk = withinSeconds.fold(lit(true)) { w =>
            when(i === 0, lit(true))
              .otherwise(ts <= element_at(acc, lit(1)) + expr(s"INTERVAL '$w' SECOND"))
          }
          val prevOk = when(i === 0, lit(true))
            .otherwise(element_at(acc, i).isNotNull &&
              ts > element_at(acc, i))
          when(t.isNotNull, t)
            .when(tp === stepName && prevOk && windowOk, ts)
            .otherwise(lit(null).cast(tsType))
        })
      })
    val stages = (1 to k).map(i => element_at(col("__stages"), i).as(s"stage_$i"))
    // depth = contiguous non-null prefix length
    val depth = aggregate(
      col("__stages"),
      struct(lit(0).as("d"), lit(true).as("go")),
      (acc, t) => struct(
        when(acc.getField("go") && t.isNotNull, acc.getField("d") + 1)
          .otherwise(acc.getField("d")).as("d"),
        (acc.getField("go") && t.isNotNull).as("go")),
      acc => acc.getField("d").cast("long"))
    sorted
      .withColumn("__stages", folded)
      .select(col(userCol) +: stages :+ depth.as("depth"): _*)
  }

  /** COHORT RETENTION: users grouped by the period of their FIRST
    * event (the cohort), counted in every later period they return.
    * Periods are integer day buckets (`periodDays`, day granularity —
    * calendar-free integer arithmetic: `day = epoch_micros div 86400e6`,
    * `cohort = first_day div periodDays`, `period_n = (day div
    * periodDays) - cohort` — engine-portable, no week-start or
    * timezone conventions to disagree on). Output: one row per
    * (cohort, period_n) with `n_users`; period 0 is the cohort size.
    *
    * Two shuffles: per-user first-event aggregation, then the
    * (cohort, period) count over user-distinct periods. */
  def retention(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      periodDays: Int = 7): DataFrame = {
    require(periodDays >= 1, s"periodDays must be >= 1, got $periodDays")
    // epoch micros exceed 2^53, so every division here is an integral
    // `div` on a materialized column — a double round-trip would be off
    val perUser = events
      .withColumn("__us", micros(events, tsCol))
      .select(col(userCol),
        expr(s"(__us div 86400000000) div $periodDays").cast("long").as("__p"))
      .groupBy(col(userCol))
      .agg(min(col("__p")).as("__cohort"), collect_set(col("__p")).as("__ps"))
    perUser
      .select(col("__cohort"), explode(col("__ps")).as("__p"))
      .groupBy(col("__cohort").as("cohort"),
        (col("__p") - col("__cohort")).as("period_n"))
      .agg(count(lit(1)).as("n_users"))
      .select(col("cohort"), col("period_n").cast("long").as("period_n"),
        col("n_users"))
  }

  /** Funnel conversion report: users reaching each stage (a user at
    * depth d counts toward stages 1..d) plus the step name — the
    * chart-ready shape. */
  def funnelReport(
      funnelDf: DataFrame,
      steps: Seq[String]): DataFrame = {
    val spark = funnelDf.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val aggs = (1 to steps.size).map(i =>
      // coalesce: sum over ZERO rows is NULL — an empty funnel must
      // report zero counts, not NPE
      coalesce(sum(when(col(s"stage_$i").isNotNull, 1L).otherwise(0L)), lit(0L))
        .as(s"c$i"))
    val counts = funnelDf.agg(aggs.head, aggs.tail: _*).head()
    val rows = steps.zipWithIndex.map { case (s, i) =>
      Row(i + 1, s, counts.getLong(i))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("stage", IntegerType, nullable = false),
        StructField("step", StringType, nullable = false),
        StructField("n_users", LongType, nullable = false))))
  }
}
