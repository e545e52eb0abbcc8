package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Events

/** Batch sessionization + funnel semantics (both also hash-gated:
  * q_sessionize_batch, q_funnel). */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("assignSessions: gap starts a new session, ids 0-based per user in time order") {
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 10:10:00")), // 10 min — same session (gap 30m)
      (3L, 10L, ts("2024-01-01 11:00:00")), // 50 min — new session
      (4L, 20L, ts("2024-01-01 10:00:00")), // other user independent
      (5L, 10L, ts("2024-01-01 11:30:00"))  // exactly 30m — NOT a break (> only)
    ).toDF("event_id", "user_id", "ts")
    val got = Events.assignSessions(ev, "user_id", "ts", 1800, "event_id")
      .select("event_id", "session_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L, 5L -> 1L))
    val stats = Events.sessionStats(
        Events.assignSessions(ev, "user_id", "ts", 1800, "event_id"),
        "user_id", "ts")
      .filter(col("user_id") === 10L && col("session_id") === 1L).head()
    assert(stats.getAs[Long]("n_events") == 2L)
    assert(stats.getAs[Long]("duration_secs") == 1800L)
  }

  test("funnel: strict ordering, drop-offs NULL, one event never fills two stages") {
    val ev = Seq(
      // user 1: full funnel in order
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (2L, 1L, ts("2024-01-01 10:01:00"), "click"),
      (3L, 1L, ts("2024-01-01 10:02:00"), "purchase"),
      // user 2: click BEFORE the first view → stage 2 needs a later click
      (4L, 2L, ts("2024-01-01 09:00:00"), "click"),
      (5L, 2L, ts("2024-01-01 10:00:00"), "view"),
      (6L, 2L, ts("2024-01-01 11:00:00"), "click"),
      // user 3: purchase without click → depth 1 (no stage skipping)
      (7L, 3L, ts("2024-01-01 10:00:00"), "view"),
      (8L, 3L, ts("2024-01-01 10:30:00"), "purchase"),
      // user 4: only irrelevant events → absent entirely
      (9L, 4L, ts("2024-01-01 10:00:00"), "error")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = Events.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("user_id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val u1 = got(0)
    assert(u1.getAs[Long]("depth") == 3L)
    val u2 = got(1)
    assert(u2.getAs[Timestamp]("stage_2") == ts("2024-01-01 11:00:00")) // not 09:00
    assert(u2.getAs[Long]("depth") == 2L)
    val u3 = got(2)
    assert(u3.isNullAt(u3.fieldIndex("stage_2")))
    assert(u3.isNullAt(u3.fieldIndex("stage_3"))) // purchase before click ≠ stage 3
    assert(u3.getAs[Long]("depth") == 1L)

    val report = Events.funnelReport(
        Events.funnel(ev, "user_id", "ts", "event_type",
          Seq("view", "click", "purchase")),
        Seq("view", "click", "purchase"))
      .orderBy("stage").collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(report == Seq(("view", 3L), ("click", 2L), ("purchase", 1L)))
  }

  test("retention: cohort by first period, distinct periods per user, period 0 = cohort size") {
    def at(day: Int) = new Timestamp(day * 86400000L + 3600000L) // day + 1h
    val ev = Seq(
      (1L, 10L, at(0)),  // u10 cohort 0 (periodDays=7)
      (2L, 10L, at(8)),  // period 1
      (3L, 10L, at(9)),  // period 1 again — counted once
      (4L, 11L, at(3)),  // u11 cohort 0, never returns
      (5L, 12L, at(14)), // u12 cohort 2
      (6L, 12L, at(28))  // period 2 (relative)
    ).toDF("event_id", "user_id", "ts")
    val got = Events.retention(ev, "user_id", "ts", periodDays = 7)
      .orderBy("cohort", "period_n").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((0L, 0L, 2L), (0L, 1L, 1L), (2L, 0L, 1L), (2L, 2L, 1L)))
  }

  test("funnel withinSeconds: later stages must land inside the stage-1 window") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (2L, 1L, ts("2024-01-01 10:20:00"), "click"),    // inside 30m window
      (3L, 1L, ts("2024-01-01 10:40:00"), "purchase"), // OUTSIDE → stage 3 null
      (4L, 2L, ts("2024-01-01 10:00:00"), "view"),
      (5L, 2L, ts("2024-01-01 10:40:00"), "click")     // outside → stage 2 null
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = Events.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), withinSeconds = Some(1800L))
      .orderBy("user_id").collect()
    assert(got(0).getAs[Long]("depth") == 2L)
    assert(got(0).isNullAt(got(0).fieldIndex("stage_3")))
    assert(got(1).getAs[Long]("depth") == 1L)
    // boundary: exactly at t1 + window is INSIDE (<=)
    val edge = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (2L, 1L, ts("2024-01-01 10:30:00"), "click")
    ).toDF("event_id", "user_id", "ts", "event_type")
    assert(Events.funnel(edge, "user_id", "ts", "event_type",
        Seq("view", "click"), withinSeconds = Some(1800L))
      .head().getAs[Long]("depth") == 2L)
  }

  test("funnel: equal timestamps never satisfy the strictly-after rule") {
    val t0 = ts("2024-01-01 10:00:00")
    val ev = Seq(
      (1L, 1L, t0, "view"),
      (2L, 1L, t0, "click"),                        // same instant → not after
      (3L, 1L, ts("2024-01-01 10:05:00"), "click")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val r = Events.funnel(ev, "user_id", "ts", "event_type", Seq("view", "click")).head()
    assert(r.getAs[Timestamp]("stage_2") == ts("2024-01-01 10:05:00"))
  }
}
