package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{CboJoin, IcebergNdv, IcebergWrite}

/** Stats-driven join planning: broadcast vs shuffle vs bucket-aligned
  * picked from MANIFEST live bytes/rows and ANALYZE NDV — planning
  * state Catalyst cannot see through the opaque scan unions. Every
  * decision is plan-asserted, every result value-checked against the
  * undecided plain join. */
class CboJoinSpec extends SparkSpec {

  private def facts(n: Int) = {
    import spark.implicits._
    (1L to n.toLong).map(i => (i, i % 50L, s"payload_$i")).toDF("id", "k", "v")
  }
  private def dim(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).map(i => (i, s"name_$i")).toDF("k", "name")
  }

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("small dim by live bytes -> broadcast-right, plan-asserted") {
    val base = Files.createTempDirectory("graft_cbo1").toString
    IcebergWrite.create(spark, facts(2000), s"$base/f")
    IcebergWrite.create(spark, dim(50), s"$base/d")
    val (df, d) = CboJoin.plan(spark, s"$base/f", s"$base/d", Seq("k" -> "k"))
    assert(d.strategy == "broadcast-right", d.reason)
    assert(physical(df).contains("BroadcastHashJoin"))
    assert(df.count() == 2000)
    // deletes shrink the estimate through the manifests, not a re-stat
    assert(d.left.rows == 2000 && d.right.rows == 50)
  }

  test("budget exceeded -> shuffle, no broadcast in the plan") {
    val base = Files.createTempDirectory("graft_cbo2").toString
    IcebergWrite.create(spark, facts(2000), s"$base/f")
    IcebergWrite.create(spark, dim(50), s"$base/d")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      // Spark's own size-estimate broadcast is disabled so the plan
      // shows OUR decision, not Catalyst's fallback guess
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val (df, d) = CboJoin.plan(spark, s"$base/f", s"$base/d",
        Seq("k" -> "k"), broadcastBytes = 1L)
      assert(d.strategy == "shuffle", d.reason)
      assert(!physical(df).contains("BroadcastHashJoin"))
      assert(df.count() == 2000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("matching bucket layouts -> bucket-aligned (BucketJoin delegate)") {
    val base = Files.createTempDirectory("graft_cbo3").toString
    IcebergWrite.create(spark, facts(1000), s"$base/f",
      partitionBy = Seq("bucket(4, k)"))
    IcebergWrite.create(spark, dim(50), s"$base/d",
      partitionBy = Seq("bucket(4, k)"))
    val (df, d) = CboJoin.plan(spark, s"$base/f", s"$base/d", Seq("k" -> "k"))
    assert(d.strategy == "bucket-aligned", d.reason)
    assert(df.count() == 1000)
    // mismatched N must NOT claim alignment
    IcebergWrite.create(spark, dim(50), s"$base/d8",
      partitionBy = Seq("bucket(8, k)"))
    val (_, d2) = CboJoin.plan(spark, s"$base/f", s"$base/d8", Seq("k" -> "k"))
    assert(d2.strategy != "bucket-aligned")
  }

  test("semi join: NDV x width beats raw bytes for the build estimate") {
    val base = Files.createTempDirectory("graft_cbo4").toString
    import spark.implicits._
    // right side: many rows, long payloads, but only 5 distinct keys
    val bigRight = (1L to 5000L)
      .map(i => (i % 5L, "x" * 200)).toDF("k", "pad")
    IcebergWrite.create(spark, facts(2000), s"$base/f")
    IcebergWrite.create(spark, bigRight, s"$base/r")
    IcebergNdv.analyze(spark, s"$base/r", Seq("k"))
    val rStats = CboJoin.sideStats(spark, s"$base/r")
    assert(rStats.ndv.get("k").exists(n => n >= 4 && n <= 6))
    // budget below the relation's inflated bytes but above ndv x width:
    // only the distinct-key rewrite can broadcast
    val budget = 4096L
    assert(rStats.liveBytes * CboJoin.DefaultInflation > budget)
    val (df, d) = CboJoin.plan(spark, s"$base/f", s"$base/r",
      Seq("k" -> "k"), how = "left_semi", broadcastBytes = budget)
    assert(d.strategy == "semi-distinct-broadcast", d.reason)
    assert(physical(df).contains("BroadcastHashJoin"))
    // value check against the plain semi join
    val plainCount = graft.sources.IcebergScan.read(spark, s"$base/f")
      .join(graft.sources.IcebergScan.read(spark, s"$base/r"),
        Seq("k"), "left_semi").count()
    assert(df.count() == plainCount)
  }

  test("output-cardinality estimate uses the containment rule") {
    val base = Files.createTempDirectory("graft_cbo5").toString
    IcebergWrite.create(spark, facts(2000), s"$base/f")
    IcebergWrite.create(spark, dim(50), s"$base/d")
    IcebergNdv.analyze(spark, s"$base/f", Seq("k"))
    IcebergNdv.analyze(spark, s"$base/d", Seq("k"))
    val (_, d) = CboJoin.plan(spark, s"$base/f", s"$base/d", Seq("k" -> "k"))
    // |L|*|R| / max(ndv) = 2000*50/50 = 2000 (HLL jitter tolerated)
    assert(d.outRowsEst.exists(e => e > 1500 && e < 2600), d.outRowsEst)
  }
}
