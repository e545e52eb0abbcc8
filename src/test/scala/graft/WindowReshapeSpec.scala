package graft

import org.apache.spark.sql.functions._
import graft.functions.{Fns, Selector}

/** Window/frame/slice + reshape semantics
  * (reference: test/comp_tests.jl:312-323,336-396). */
class WindowReshapeSpec extends SparkSpec {
  import spark.implicits._

  private def seqDf = Seq(
    ("g1", 1L, 10.0), ("g1", 2L, 20.0), ("g1", 3L, 30.0),
    ("g2", 1L, 5.0), ("g2", 2L, 15.0)
  ).toDF("g", "i", "v")

  test("cumsum gets running frame") {
    val out = Tidier.from(seqDf).groupBy("g").windowOrder(col("i"))
      .mutate("cs" -> Fns.cumsum(col("v")))
      .arrange("g", "i").collect().map(_.getAs[Double]("cs"))
    assert(out.toSeq == Seq(10.0, 30.0, 60.0, 5.0, 20.0))
  }

  test("windowFrame ROWS between") {
    val out = Tidier.from(seqDf).groupBy("g").windowOrder(col("i")).windowFrame(-1, 0)
      .mutate("s2" -> sum(col("v")))
      .arrange("g", "i").collect().map(_.getAs[Double]("s2"))
    assert(out.toSeq == Seq(10.0, 30.0, 50.0, 5.0, 20.0))
  }

  test("mutateBy inline kwargs equals macro chain") {
    val viaState = Tidier.from(seqDf).groupBy("g").windowOrder(col("i"))
      .mutate("r" -> row_number()).arrange("g", "i").collect().map(_.getAs[Int]("r")).toSeq
    val viaKwargs = Tidier.from(seqDf)
      .mutateBy(by = Seq[Selector]("g"), order = Seq(col("i")))("r" -> row_number())
      .arrange("g", "i").collect().map(_.getAs[Int]("r")).toSeq
    assert(viaState == viaKwargs)
  }

  test("agg() escape hatch windows arbitrary functions; whitelist is extensible") {
    // median is not in the whitelist — agg() forces the OVER wrap
    val viaEscape = Tidier.from(seqDf).groupBy("g")
      .mutate("m" -> Fns.agg(expr("percentile(v, 0.5)")))
      .arrange("g", "i").collect().map(_.getAs[Double]("m")).toSeq
    assert(viaEscape == Seq(20.0, 20.0, 20.0, 10.0, 10.0))
    // extending the whitelist makes the bare call windowed too
    graft.functions.WindowRewrite.addWindowFn("percentile")
    val viaWhitelist = Tidier.from(seqDf).groupBy("g")
      .mutate("m" -> expr("percentile(v, 0.5)"))
      .arrange("g", "i").collect().map(_.getAs[Double]("m")).toSeq
    assert(viaWhitelist == viaEscape)
  }

  test("sliceMax keeps ties (rank semantics)") {
    val d = Seq(("a", 3), ("a", 3), ("a", 2), ("b", 9)).toDF("g", "v")
    val out = Tidier.from(d).groupBy("g").sliceMax("v", 1).df
    assert(out.count() == 3) // both a-3 rows kept + b-9
  }

  test("ungrouped slice: rank-ties semantics incl. nulls, and NO global window in the plan") {
    val d = Seq[(String, java.lang.Integer)](
      ("a", 3), ("b", 3), ("c", 2), ("d", 9), ("e", null), ("f", null)
    ).toDF("k", "v")
    // sliceMax n=1: max is 9, no ties; nulls sort LAST under desc → dropped
    val mx = Tidier.from(d).sliceMax("v", 1).collect().map(_.getString(0)).toSeq
    assert(mx == Seq("d"))
    // sliceMax n=5: 9,3,3,2 kept (ranks 1,2,2,4), nulls rank 5,5 → kept too
    val mx5 = Tidier.from(d).sliceMax("v", 5).df.count()
    assert(mx5 == 6)
    // sliceMin n=1: asc = NULLS FIRST → both nulls tie at rank 1, 2 excluded
    val mn = Tidier.from(d).sliceMin("v", 1).collect().map(_.getString(0)).toSet
    assert(mn == Set("e", "f"))
    // sliceMin n=3: nulls (rank 1,1) + value 2 (rank 3); the 3s rank 4 → out
    val mn3 = Tidier.from(d).sliceMin("v", 3).collect().map(_.getString(0)).toSet
    assert(mn3 == Set("e", "f", "c"))
    // ties extension: duplicate max values ALL kept
    val ties = Seq(("a", 3), ("b", 3), ("c", 2)).toDF("k", "v")
    assert(Tidier.from(ties).sliceMax("v", 1).df.count() == 2)
    // scale shape: no single-task WindowExec; TakeOrdered carries the sort
    val plan = Tidier.from(d).sliceMax("v", 1).df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"ungrouped slice must not plan a global window:\n$plan")
    assert(plan.contains("TakeOrdered"), s"expected TakeOrdered threshold pass:\n$plan")
    val samplePlan = Tidier.from(d).sliceSample(2).df.queryExecution.executedPlan.toString
    assert(!samplePlan.contains("Window") && samplePlan.contains("TakeOrdered"))
    assert(Tidier.from(d).sliceSample(2, seed = 9L).df.count() == 2)
  }

  test("sliceSample deterministic with seed and respects n") {
    val d = (1 to 100).map(i => (if (i % 2 == 0) "even" else "odd", i)).toDF("g", "v")
    val s1 = Tidier.from(d).groupBy("g").sliceSample(3, seed = 7L).collect().map(_.getInt(1)).toSeq
    val s2 = Tidier.from(d).groupBy("g").sliceSample(3, seed = 7L).collect().map(_.getInt(1)).toSeq
    assert(s1.sorted == s2.sorted && s1.length == 6)
  }

  test("refined-then-prefix window specs plan ONE sort (ordering reuse)") {
    // second window's ORDER BY is a prefix of the first's → its
    // required ordering is satisfied by the first sort's output; the
    // plan must not re-sort
    val out = Tidier.from(seqDf)
      .groupBy("g").windowOrder(col("v").desc, col("i"))
      .mutate("rn" -> row_number())
      .groupBy("g").windowOrder(col("v").desc)
      .mutate("rk" -> call_function("rank"))
      .df
    val plan = out.queryExecution.executedPlan.toString
    val sorts = "(?m)^\\s*\\+?-?\\s*\\*?\\(?\\d*\\)?\\s*Sort ".r.findAllIn(plan).size
    assert(sorts == 1, s"expected exactly one Sort, got $sorts:\n$plan")
  }

  test("pivotWider/pivotLonger round trip") {
    val long = Seq((1, "x", 10.0), (1, "y", 20.0), (2, "x", 30.0), (2, "y", 40.0))
      .toDF("id", "variable", "value")
    val wide = Tidier.from(long).pivotWider("variable", "value", values = Seq("x", "y"))
    assert(wide.df.columns.toSeq == Seq("id", "x", "y"))
    val back = wide.pivotLonger(Seq[Selector]("x", "y")).arrange("id", "variable")
    assert(back.collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1, "x", 10.0), (1, "y", 20.0), (2, "x", 30.0), (2, "y", 40.0)))
  }

  test("pivotWider with multiple values_from uses the <name>_<vc> alias scheme") {
    val long = Seq((1, "x", 10.0, 1L), (1, "y", 20.0, 2L), (2, "x", 30.0, 3L))
      .toDF("id", "variable", "a", "b")
    val wide = Tidier.from(long)
      .pivotWider("variable", Seq("a", "b"), values = Seq("x", "y")).df
    assert(wide.columns.toSeq == Seq("id", "x_a", "x_b", "y_a", "y_b"))
    val r = wide.orderBy("id").collect()
    assert(r(0).getDouble(1) == 10.0 && r(0).getLong(2) == 1L)
    assert(r(0).getDouble(3) == 20.0 && r(0).getLong(4) == 2L)
    assert(r(1).getDouble(1) == 30.0 && r(1).isNullAt(3)) // missing (2,"y")
    // single-element Seq degrades to the un-suffixed form
    val single = Tidier.from(long)
      .pivotWider("variable", Seq("a"), values = Seq("x", "y")).df
    assert(single.columns.toSeq == Seq("id", "b", "x", "y"))
  }

  test("unnestWider expands struct fields in place") {
    val d = Seq((1, (1.5, 2.5)), (2, (3.5, 4.5))).toDF("id", "pos")
    val out = Tidier.from(d).unnestWider("pos").df
    assert(out.columns.toSeq == Seq("id", "_1", "_2"))
    val withSep = Tidier.from(d).unnestWider("pos", namesSep = Some("_")).df
    assert(withSep.columns.toSeq == Seq("id", "pos__1", "pos__2"))
  }

  test("unnestLonger single and parallel (zip) explode") {
    val d = Seq((1, Seq(1, 2), Seq("a", "b"))).toDF("id", "xs", "ys")
    val single = Tidier.from(d).unnestLonger("xs").df
    assert(single.count() == 2)
    val par = Tidier.from(d).unnestLonger("xs", "ys").arrange("xs").collect()
    assert(par.map(r => (r.getInt(1), r.getString(2))).toSeq == Seq((1, "a"), (2, "b")))
  }

  test("separate: last part swallows remaining separators, empties → null") {
    val d = Seq("1-1", "2-2", "3-3-3").toDF("a")
    val out = Tidier.from(d).separate("a", Seq("p1", "p2"), "-").collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("1", "1"), ("2", "2"), ("3", "3-3")))
    val short = Tidier.from(Seq("x").toDF("a")).separate("a", Seq("p1", "p2"), "-").collect()
    assert(short.head.getString(0) == "x" && short.head.isNullAt(1))
  }

  test("unite concat_ws, drops inputs, lands at first input position") {
    val d = Seq(("b1", "c1", 7)).toDF("b", "c", "n")
    val out = Tidier.from(d).unite("bc", Seq("b", "c"), "_").df
    assert(out.columns.toSeq == Seq("bc", "n"))
    assert(out.collect().head.getString(0) == "b1_c1")
  }
}
