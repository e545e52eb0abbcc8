package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RangeJoinRule: pure-range inner joins (no cross-side equi conjunct)
  * rewritten by the optimizer into banded equi-joins — same rows, no
  * nested-loop physical join. */
class RangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private val Key = plans.RangeJoinRule.BandWidthKey

  private def withBandWidth[T](w: Long)(body: => T): T = {
    GraftExtensions.register(spark)
    spark.conf.set(Key, w.toString)
    try body finally spark.conf.unset(Key)
  }

  /** rows sorted for order-insensitive comparison */
  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def points = Seq(
    (1L, 5L), (2L, 10L), (3L, 99L), (4L, -7L), (5L, 0L)
  ).toDF("pid", "x")

  private def intervals = Seq(
    (10L, 0L, 10L),       // catches 5, 10, 0
    (11L, -10L, -1L),     // catches -7
    (12L, 98L, 200L),     // catches 99
    (13L, 50L, 40L),      // inverted → nothing
    (14L, 7L, 7L)         // single-point interval
  ).toDF("iid", "lo", "hi")

  test("pure range join is rewritten to a banded equi-join with identical rows") {
    val raw = points.join(intervals, $"x" >= $"lo" && $"x" <= $"hi")
    val expected = sortedRows(raw) // rule off: nested-loop reference

    withBandWidth(8L) {
      val j = points.join(intervals, $"x" >= $"lo" && $"x" <= $"hi")
      assert(j.queryExecution.optimizedPlan.toString.contains("__graft_band_p"),
        "rule should have fired")
      assert(sortedRows(j) == expected)
      val phys = j.queryExecution.executedPlan.toString
      assert(!phys.contains("NestedLoop") && !phys.contains("Cartesian"),
        s"banded join must not plan a nested loop:\n$phys")
    }
  }

  test("strict bounds and flipped operand order still match the raw join") {
    val raw = points.join(intervals, $"x" > $"lo" && $"hi" >= $"x")
    val expected = sortedRows(raw)
    withBandWidth(3L) {
      val j = points.join(intervals, $"x" > $"lo" && $"hi" >= $"x")
      assert(j.queryExecution.optimizedPlan.toString.contains("__graft_band_p"))
      assert(sortedRows(j) == expected)
    }
  }

  test("NULL bounds and NULL points produce no matches (same as raw)") {
    val p = Seq((1L, Some(5L)), (2L, None)).toDF("pid", "x")
    val iv = Seq((10L, Some(0L), Some(10L)), (11L, None, Some(10L)), (12L, Some(0L), None))
      .toDF("iid", "lo", "hi")
    val raw = sortedRows(p.join(iv, $"x" >= $"lo" && $"x" <= $"hi"))
    withBandWidth(4L) {
      val j = p.join(iv, $"x" >= $"lo" && $"x" <= $"hi")
      assert(j.queryExecution.optimizedPlan.toString.contains("__graft_band_p"))
      assert(sortedRows(j) == raw)
      assert(raw.size == 1) // only (1, 10)
    }
  }

  test("join with a cross-side equi conjunct is left alone") {
    val p = Seq((1L, 5L, "a")).toDF("pid", "x", "k")
    val iv = Seq((10L, 0L, 10L, "a")).toDF("iid", "lo", "hi", "k2")
    withBandWidth(8L) {
      val j = p.join(iv, $"k" === $"k2" && $"x" >= $"lo" && $"x" <= $"hi")
      assert(!j.queryExecution.optimizedPlan.toString.contains("__graft_band"),
        "equi-keyed joins already hash-partition; rule must not fire")
      assert(j.count() == 1)
    }
  }

  test("timestamp points band via unix_micros") {
    val p = Seq((1L, "2024-01-01 00:05:00"), (2L, "2024-01-01 03:00:00"))
      .toDF("pid", "tss").withColumn("ts", to_timestamp($"tss")).drop("tss")
    val iv = Seq((10L, "2024-01-01 00:00:00", "2024-01-01 00:10:00"))
      .toDF("iid", "los", "his")
      .withColumn("lo", to_timestamp($"los")).withColumn("hi", to_timestamp($"his"))
      .select("iid", "lo", "hi")
    val raw = sortedRows(p.join(iv, $"ts" >= $"lo" && $"ts" <= $"hi"))
    withBandWidth(10L * 60 * 1000000) { // 10 min in micros
      val j = p.join(iv, $"ts" >= $"lo" && $"ts" <= $"hi")
      assert(j.queryExecution.optimizedPlan.toString.contains("__graft_band_p"))
      assert(sortedRows(j) == raw)
      assert(raw.size == 1)
    }
  }

  test("timestamp_ntz points band too (parquet with isAdjustedToUTC=false)") {
    // pyarrow-written parquet (the driver's testdata) reads timestamps
    // back as NTZ; the rule declining there silently reverts the
    // event-time range join to a nested loop — regression gate
    val p = Seq((1L, java.time.LocalDateTime.parse("2024-01-01T00:05:00")),
        (2L, java.time.LocalDateTime.parse("2024-01-01T03:00:00")))
      .toDF("pid", "ts")
    val iv = Seq((10L, java.time.LocalDateTime.parse("2024-01-01T00:00:00"),
        java.time.LocalDateTime.parse("2024-01-01T00:10:00")))
      .toDF("iid", "lo", "hi")
    assert(p.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val raw = sortedRows(p.join(iv, $"ts" >= $"lo" && $"ts" <= $"hi"))
    withBandWidth(10L * 60 * 1000000) {
      val j = p.join(iv, $"ts" >= $"lo" && $"ts" <= $"hi")
      assert(j.queryExecution.optimizedPlan.toString.contains("__graft_band_p"),
        "rule must fire on TimestampNTZ bounds")
      assert(sortedRows(j) == raw)
      assert(raw.size == 1)
    }
  }

  test("point on the RIGHT side of the join works symmetrically") {
    val raw = sortedRows(intervals.join(points, $"x" >= $"lo" && $"x" <= $"hi"))
    withBandWidth(8L) {
      val j = intervals.join(points, $"x" >= $"lo" && $"x" <= $"hi")
      assert(j.queryExecution.optimizedPlan.toString.contains("__graft_band_p"))
      assert(sortedRows(j) == raw)
    }
  }

  test("bandWidth=auto probes interval stats and fires with a sane width") {
    GraftExtensions.register(spark)
    spark.conf.set(Key, "auto")
    try {
      val raw = sortedRows(points.join(intervals, $"x" >= $"lo" && $"x" <= $"hi"))
      val j = points.join(intervals, $"x" >= $"lo" && $"x" <= $"hi")
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("__graft_band_p"), s"auto width should fire the rule:\n$opt")
      // intervals: lengths 10, 9, 102, -10 (inverted), 0 → avg 22.2 →
      // probed width 24 appears as the pmod literal in the plan
      assert(opt.contains("24"), s"expected probed width 24 in plan:\n$opt")
      assert(sortedRows(j) == raw)
      val phys = j.queryExecution.executedPlan.toString
      assert(!phys.contains("NestedLoop") && !phys.contains("Cartesian"))
      // timestamps probe in micros
      val p = Seq((1L, "2024-01-01 00:05:00")).toDF("pid", "tss")
        .withColumn("ts", to_timestamp($"tss")).drop("tss")
      val iv = Seq((10L, "2024-01-01 00:00:00", "2024-01-01 00:10:00"))
        .toDF("iid", "los", "his")
        .withColumn("lo", to_timestamp($"los")).withColumn("hi", to_timestamp($"his"))
        .select("iid", "lo", "hi")
      val tj = p.join(iv, $"ts" >= $"lo" && $"ts" <= $"hi")
      assert(tj.queryExecution.optimizedPlan.toString.contains("__graft_band_p"))
      assert(tj.count() == 1)
    } finally spark.conf.unset(Key)
  }

  test("unset / zero band width disables the rule") {
    GraftExtensions.register(spark)
    val j = points.join(intervals, $"x" >= $"lo" && $"x" <= $"hi")
    assert(!j.queryExecution.optimizedPlan.toString.contains("__graft_band"))
  }

  test("double-typed bounds are not banded (no inexact conversions)") {
    val p = Seq((1L, 5.0)).toDF("pid", "x")
    val iv = Seq((10L, 0.0, 10.0)).toDF("iid", "lo", "hi")
    withBandWidth(8L) {
      val j = p.join(iv, $"x" >= $"lo" && $"x" <= $"hi")
      assert(!j.queryExecution.optimizedPlan.toString.contains("__graft_band"))
      assert(j.count() == 1)
    }
  }

  test("negative values band floor-aligned (pmod, not truncating div)") {
    val p = Seq((1L, -9L), (2L, -8L), (3L, -1L)).toDF("pid", "x")
    val iv = Seq((10L, -9L, -2L)).toDF("iid", "lo", "hi")
    val raw = sortedRows(p.join(iv, $"x" >= $"lo" && $"x" <= $"hi"))
    withBandWidth(5L) {
      val j = p.join(iv, $"x" >= $"lo" && $"x" <= $"hi")
      assert(sortedRows(j) == raw)
      assert(raw.size == 2) // -9 and -8
    }
  }
}
