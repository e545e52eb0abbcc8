package graft

import org.apache.spark.sql.functions._

import graft.operators.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("exact profile matches hand computation incl. nulls and interpolation") {
    val d = Seq(Some(1.0), Some(2.0), Some(3.0), None).toDF("x")
      .withColumn("y", lit(7.0))
    val rows = Profile.tableProfile(d, Seq("x", "y"))
      .orderBy("column").collect()
    val x = rows(0)
    assert(x.getString(0) == "x")
    assert(x.getLong(1) == 3L && x.getLong(2) == 1L)       // n, n_null
    assert(x.getDouble(3) == 1.0 && x.getDouble(4) == 3.0) // min, max
    assert(x.getDouble(5) == 2.0)                          // mean
    assert(x.getDouble(6) == 1.5 && x.getDouble(7) == 2.0 && x.getDouble(8) == 2.5)
    assert(x.getLong(9) == 3L)                             // n_distinct
    val y = rows(1)
    assert(y.getString(0) == "y" && y.getLong(2) == 0L && y.getDouble(7) == 7.0)
  }

  test("one data pass for all columns (single scan; only agg-state exchanges)") {
    val d = spark.read.parquet(s"$sf001/lineitem.parquet")
    val plan = Profile.tableProfile(d, Seq("l_quantity", "l_discount", "l_tax"))
      .queryExecution.executedPlan.toString
    // the table is scanned ONCE no matter how many columns profile;
    // the distinct aggregates add one extra exchange of tiny agg state
    assert("Scan parquet".r.findAllIn(plan).length == 1)
    assert("Exchange".r.findAllIn(plan).length <= 2)
  }

  test("approx profile: same schema, sketch values sane") {
    val d = Seq(1.0, 2.0, 3.0).toDF("x")
    val exact = Profile.tableProfile(d, Seq("x"))
    val approx = Profile.tableProfileApprox(d, Seq("x"))
    assert(approx.schema == exact.schema)
    val r = approx.head()
    assert(r.getDouble(7) == 2.0) // p50 lands on a real element
    assert(r.getLong(9) == 3L)
  }

  test("sketchGate: deterministic fields verbatim, sketch checks all pass") {
    val d = (1 to 1000).map(i => (i.toDouble, (i % 7).toDouble)).toDF("a", "b")
    val rows = Profile.sketchGate(d, Seq("a", "b")).orderBy("column").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b"))
    val a = rows(0)
    assert(a.getLong(1) == 1000L && a.getLong(2) == 0L)
    assert(a.getDouble(3) == 1.0 && a.getDouble(4) == 1000.0)
    assert(a.getDouble(5) == 500.5)
    // a healthy sketch must land inside its own error bounds — ranks
    // for quantiles (plateau-safe: column b has only 7 distinct values)
    assert((6 to 9).forall(i => rows.forall(_.getBoolean(i))))
  }
}
