package graft

import org.apache.spark.sql.functions._
import graft.functions.{Fns, Selector}

/** Unit grid over the core verbs, mirroring the reference's testset
  * scenarios (reference: test/comp_tests.jl:1-87,160-310). */
class CoreVerbsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("AA", "bb", 1L, 0.005), ("AB", "aa", 2L, 0.010),
    ("AC", "bb", 3L, 0.015), ("AD", "aa", 4L, 0.020),
    ("AE", "bb", 5L, 0.025), ("AF", "aa", 1L, 0.030)
  ).toDF("id", "groups", "value", "percent")

  test("select with tidy selectors") {
    val tf = Tidier.from(df)
    assert(tf.select("id", "value").df.columns.toSeq == Seq("id", "value"))
    assert(tf.select(Selector.startsWith("gr")).df.columns.toSeq == Seq("groups"))
    assert(tf.select(Selector.range("id", "value")).df.columns.toSeq ==
      Seq("id", "groups", "value"))
    assert(tf.select(!Selector.Name("percent")).df.columns.toSeq ==
      Seq("id", "groups", "value"))
    assert(tf.select(Selector.contains("e")).df.columns.toSeq ==
      Seq("value", "percent"))
  }

  test("filter multiple conditions AND") {
    val out = Tidier.from(df).filter(col("groups") === "bb", col("value") > 1L).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("AC", "AE"))
  }

  test("mutate appends in order, overwrites in place, sees earlier cols") {
    val out = Tidier.from(df)
      .mutate(
        "double_v" -> col("value") * 2,
        "quad_v" -> col("double_v") * 2,
        "value" -> lit(0L))
      .df
    assert(out.columns.toSeq == Seq("id", "groups", "value", "percent", "double_v", "quad_v"))
    val r = out.orderBy("id").collect()
    assert(r.head.getAs[Long]("quad_v") == 4L)
    assert(r.head.getAs[Long]("value") == 0L)
  }

  test("arrange by 1-based column position, negative = descending (NEWS v8.10)") {
    val byPos = Tidier.from(df).arrange(3).df.collect().map(_.getAs[Long]("value")).toSeq
    assert(byPos == byPos.sorted)
    val byNeg = Tidier.from(df).arrange(-3).df.collect().map(_.getAs[Long]("value")).toSeq
    assert(byNeg == byNeg.sorted.reverse)
    // multi-position: groups asc then value desc
    val multi = Tidier.from(df).arrange(2, -3).df.collect()
      .map(r => (r.getAs[String]("groups"), r.getAs[Long]("value"))).toSeq
    assert(multi == multi.sortBy { case (g, v) => (g, -v) })
    val e = intercept[IllegalArgumentException] { Tidier.from(df).arrange(9) }
    assert(e.getMessage.contains("out of range"))
  }

  test("groupByAll groups by every current column (NEWS v8.10 group_by(all))") {
    val doubled = Tidier.from(df.select("groups", "value").unionAll(df.select("groups", "value")))
    val out = doubled.groupByAll().summarize("n" -> count(lit(1)))
    assert(out.df.columns.toSeq == Seq("groups", "value", "n"))
    val rows = out.collect()
    assert(rows.forall(_.getLong(2) >= 2L)) // every (groups, value) pair doubled
    assert(rows.map(r => (r.getString(0), r.getLong(1))).distinct.length == rows.length)
  }

  test("grouped mutate windows aggregates and clears grouping") {
    val tf = Tidier.from(df).groupBy("groups").mutate("gsum" -> sum(col("value")))
    assert(tf.groups.isEmpty)
    val m = tf.df.orderBy("id").collect().map(r => r.getAs[String]("groups") -> r.getAs[Long]("gsum"))
    assert(m.forall { case (g, s) => if (g == "bb") s == 9L else s == 7L })
  }

  test("summarize keeps group cols then aggregates") {
    val out = Tidier.from(df).groupBy("groups")
      .summarize("n" -> count(lit(1)), "total" -> sum(col("value")))
      .arrange("groups").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("aa", 3L, 7L), ("bb", 3L, 9L)))
  }

  test("distinct keeps only listed columns (reference semantics)") {
    val out = Tidier.from(df).distinct("groups").df
    assert(out.columns.toSeq == Seq("groups"))
    assert(out.count() == 2)
  }

  test("rename new=old") {
    val out = Tidier.from(df).rename("g" -> "groups").df
    assert(out.columns.toSeq == Seq("id", "g", "value", "percent"))
  }

  test("relocate before/after anchors") {
    val tf = Tidier.from(df)
    assert(tf.relocate(Seq(Selector.Name("percent")), before = Some("id")).df.columns.toSeq ==
      Seq("percent", "id", "groups", "value"))
    assert(tf.relocate(Seq(Selector.Name("id")), after = Some("value")).df.columns.toSeq ==
      Seq("groups", "value", "id", "percent"))
  }

  test("transmute keeps only listed + group cols") {
    val out = Tidier.from(df).transmute("v2" -> (col("value") * 2)).df
    assert(out.columns.toSeq == Seq("v2"))
  }

  test("across expands selector x fn grid") {
    val tf = Tidier.from(df).groupBy("groups")
    val out = tf.summarize(tf.across(
      Seq[Selector]("value", "percent"),
      "sum" -> (c => sum(c)), "max" -> (c => max(c))): _*).df
    assert(out.columns.toSeq ==
      Seq("groups", "value_sum", "value_max", "percent_sum", "percent_max"))
  }

  test("count with sort") {
    val out = Tidier.from(df).countSorted("groups").collect()
    assert(out.length == 2 && out.head.getAs[Long]("n") == 3L)
  }

  test("ifElse 4-arg routes null condition to missing case") {
    val d = Seq[(java.lang.Long, String)]((1L, "x"), (null, "y")).toDF("v", "tag")
    val out = d.select(Fns.ifElse(col("v") > 0L, lit("pos"), lit("neg"), lit("unk")).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("pos", "unk"))
  }

  test("caseWhen falls through to default") {
    val out = df.select(Fns.caseWhen(
      Seq((col("value") < 2L) -> lit("lo"), (col("value") < 4L) -> lit("mid")),
      Some(lit("hi"))).as("band"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("lo", "mid", "mid", "hi", "hi", "lo"))
  }

  test("grouped filter evaluates aggregates over the group (HAVING-style)") {
    val out = Tidier.from(df).groupBy("groups")
      .filter(sum(col("value")) > 7L) // bb sums 9, aa sums 7
      .df.select("groups").distinct().collect().map(_.getString(0)).toSeq
    assert(out == Seq("bb"))
  }

  test("mutate is a single projection: wide chained mutates stay linear and correct") {
    // 60 columns, each referencing the previous — the old withColumn
    // fold re-analyzed the plan per column
    val names = (0 until 60).map(i => s"c$i")
    val defs: Seq[(String, org.apache.spark.sql.Column)] =
      ("c0" -> (col("value") + 1L)) +:
        (1 until 60).map(i => s"c$i" -> (col(s"c${i - 1}") + 1L))
    val t0 = System.nanoTime()
    val out = Tidier.from(df).mutate(defs: _*)
    val analyzed = out.df.queryExecution.analyzed // force analysis
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 10.0, f"wide mutate analysis took $secs%.1f s")
    val row = out.df.select((col("id") +: names.map(col)): _*)
      .filter(col("id") === "AA").first()
    (0 until 60).foreach(i => assert(row.getLong(i + 1) == 1L + (i + 1)))
    // overwrite-in-place + self-reference reads the OLD value
    val ow = Tidier.from(df).mutate("value" -> (col("value") * 10L))
      .df.filter(col("id") === "AA").select("value").first().getLong(0)
    assert(ow == 10L)
    // redefinition within one mutate: later definition sees the earlier one
    val redef = Tidier.from(df)
      .mutate("a" -> lit(1L), "a" -> (col("a") + 1L))
      .df.select("a").first().getLong(0)
    assert(redef == 2L)
  }

  test("grouped filter: every aggregate condition sees the ORIGINAL groups") {
    // bb: sum=9, min=0.005; aa: sum=7, min=0.010.
    // If the second condition ran on rows already filtered by the first,
    // its window would see a truncated group — dplyr/HAVING evaluate all
    // conditions over the full group.
    val out = Tidier.from(df).groupBy("groups")
      .filter(sum(col("value")) > 7L, min(col("percent")) < 0.006)
      .df.select("groups").distinct().collect().map(_.getString(0)).toSeq
    assert(out == Seq("bb"))
    // a condition pair where sequential filtering would CHANGE the
    // second window's value: first drops low-value rows, then a
    // group-max over survivors differs from max over the full group
    val d2 = Seq(("g1", 1L), ("g1", 10L), ("g2", 5L), ("g2", 6L)).toDF("g", "v")
    val both = Tidier.from(d2).groupBy("g")
      .filter(max(col("v")) >= 6L, min(col("v")) <= 1L)
      .df.select("g").distinct().collect().map(_.getString(0)).toSeq
    assert(both == Seq("g1")) // g2 fails min<=1 on the FULL group
    // mixing a plain (row-level) condition with an aggregate one
    val mixed = Tidier.from(d2).groupBy("g")
      .filter(max(col("v")) >= 6L, col("v") > 4L)
      .df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(mixed == Set(("g1", 10L), ("g2", 5L), ("g2", 6L)))
  }

  test("strReplace first-occurrence keeps user capture groups aligned") {
    val d = Seq("abc123def456").toDF("s")
    // $1 must refer to the USER's group ([0-9]+), not the internal
    // prefix-anchor group
    val out = d.select(
        Fns.strReplace(col("s"), "([0-9]+)", "<$1>").as("r1"),
        Fns.strReplaceAll(col("s"), "([0-9]+)", "<$1>").as("rall"),
        Fns.strReplace(col("s"), "[0-9]+", "#").as("plain"),
        // $0 = the user regex's WHOLE match (not the internal prefix group)
        Fns.strReplace(col("s"), "[0-9]+", "[$0]").as("whole"),
        // \$ escape survives the rewrite as a literal dollar
        Fns.strReplace(col("s"), "[0-9]+", "\\$1x").as("esc"))
      .first()
    assert(out.getString(0) == "abc<123>def456")
    assert(out.getString(1) == "abc<123>def<456>")
    assert(out.getString(2) == "abc#def456")
    assert(out.getString(3) == "abc[123]def456")
    assert(out.getString(4) == "abc$1xdef456")
  }

  test("summarize() with no aggregates returns distinct group keys") {
    val out = Tidier.from(df).groupBy("groups").summarize()
      .arrange("groups").collect().map(_.getString(0)).toSeq
    assert(out == Seq("aa", "bb"))
  }

  test("cube/rollup/groupingSets: levels, grouping_id, one shuffle") {
    val d = Seq(("a", "x", 1L), ("a", "y", 2L), ("b", "x", 4L)).toDF("k1", "k2", "v")
    val cube = Tidier.from(d).groupBy("k1", "k2")
      .cube("s" -> sum(col("v")))
      .arrange("grouping_id", "k1", "k2")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(cube.toSeq == Seq(
      ("a", "x", 0L, 1L), ("a", "y", 0L, 2L), ("b", "x", 0L, 4L),
      ("a", null, 1L, 3L), ("b", null, 1L, 4L),
      (null, "x", 2L, 5L), (null, "y", 2L, 2L),
      (null, null, 3L, 7L)))
    val roll = Tidier.from(d).groupBy("k1", "k2")
      .rollup("s" -> sum(col("v")))
      .collect()
    assert(roll.length == 6) // 3 leaf + 2 by-k1 + 1 grand total
    val gs = Tidier.from(d).groupBy("k1", "k2")
      .groupingSets(Seq(Seq("k1"), Seq("k2")))("s" -> sum(col("v")))
      .collect()
    assert(gs.length == 4) // 2 by-k1 + 2 by-k2, no leaf/grand rows
    // all levels aggregate in ONE shuffle (Expand, not per-level scans)
    val plan = Tidier.from(d).groupBy("k1", "k2").cube("s" -> sum(col("v")))
      .df.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length == 1, s"expected 1 shuffle:\n$plan")
    assert(plan.contains("Expand"), s"expected Expand operator:\n$plan")
    // unknown grouping-set column is loud
    assert(intercept[IllegalArgumentException] {
      Tidier.from(d).groupBy("k1").groupingSets(Seq(Seq("nope")))("s" -> sum(col("v")))
    }.getMessage.contains("nope"))
    // showQuery never throws on an Expand plan (SqlPrinter or fallback)
    val shown = Console.withOut(new java.io.PrintStream(new java.io.ByteArrayOutputStream())) {
      Tidier.from(d).groupBy("k1", "k2").cube("s" -> sum(col("v"))).showQuery()
    }
    assert(shown.nonEmpty)
  }

  test("dropMissing on subset of columns") {
    val d = Seq(("a", java.lang.Double.valueOf(1.0)), ("b", null.asInstanceOf[java.lang.Double]))
      .toDF("k", "v")
    assert(Tidier.from(d).dropMissing("v").df.count() == 1)
    assert(Tidier.from(d).dropMissing("k").df.count() == 2)
  }
}
