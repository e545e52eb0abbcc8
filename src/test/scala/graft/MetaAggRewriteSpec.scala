package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.plans.MetaAggRewriteRule
import graft.sources.{DeltaScan, DeltaWrite, IcebergScan, IcebergWrite}

/** Plan-time metadata-aggregate rewrite: a bare global
  * count/min/max over a registered lakehouse table's full live scan
  * plans to a one-row Project with ZERO data files read; anything the
  * metadata cannot prove exactly keeps the real scan. */
class MetaAggRewriteSpec extends SparkSpec {

  private def df() = {
    import spark.implicits._
    (1L to 100L).map(i =>
      (i, s"w${i % 7}", if (i % 2 == 0) null else java.lang.Double.valueOf(i * 1.5)))
      .toDF("id", "w", "x")
  }

  private def scans(d: org.apache.spark.sql.DataFrame): Boolean = {
    val p = d.queryExecution.executedPlan.toString
    p.contains("FileScan") || p.contains("Scan parquet")
  }

  test("Delta: bare count/min/max plan to a scan-free one-row Project") {
    val dir = Files.createTempDirectory("graft_marw_d").toString + "/t"
    DeltaWrite.create(spark, df().repartition(4), dir)
    MetaAggRewriteRule.install(spark)
    MetaAggRewriteRule.register(spark, dir)
    try {
      val q = DeltaScan.read(spark, dir)
        .agg(count(lit(1)).as("n"), min(col("id")).as("lo"),
          max(col("id")).as("hi"), min(col("x")).as("xlo"))
      assert(!scans(q), q.queryExecution.executedPlan.toString)
      val r = q.head()
      assert(r.getLong(0) == 100L && r.getLong(1) == 1L && r.getLong(2) == 100L)
      assert(r.getDouble(3) == 1.5)

      // df.count() itself is the same logical shape
      assert(DeltaScan.read(spark, dir).count() == 100L)

      // a string min is writer-truncatable: the rewrite must refuse
      val sq = DeltaScan.read(spark, dir).agg(min(col("w")).as("m"))
      assert(scans(sq), "string bounds are not exact — keep the scan")
      assert(sq.head().getString(0) == "w0")

      // a FILTERED scan never matches (it is not the full live set)
      val fq = DeltaScan.read(spark, dir).filter(col("id") > 10L)
        .agg(count(lit(1)).as("n"))
      assert(fq.head().getLong(0) == 90L)

      // appends invalidate the per-version cache: fresh values served
      DeltaWrite.append(spark, df().withColumn("id", col("id") + 1000L), dir)
      val q2 = DeltaScan.read(spark, dir)
        .agg(count(lit(1)).as("n"), max(col("id")).as("hi"))
      assert(!scans(q2))
      val r2 = q2.head()
      assert(r2.getLong(0) == 200L && r2.getLong(1) == 1100L)

      // a DV delete makes counts unprovable from a bare scan (the read
      // itself stops being a bare relation): values stay exact
      DeltaWrite.deleteWhereDV(spark, dir, col("id") === 5L)
      assert(DeltaScan.read(spark, dir).count() == 199L)
    } finally MetaAggRewriteRule.unregister(dir)
  }

  test("Iceberg: manifests serve the rewrite, timestamps included") {
    val dir = Files.createTempDirectory("graft_marw_i").toString + "/t"
    import spark.implicits._
    val d = (1L to 60L).map(i => (i,
      java.sql.Timestamp.valueOf(f"2024-03-${(i % 28) + 1}%02d 12:00:00")))
      .toDF("id", "ts")
    IcebergWrite.create(spark, d.repartition(3), dir)
    MetaAggRewriteRule.install(spark)
    MetaAggRewriteRule.register(spark, dir)
    try {
      val q = IcebergScan.read(spark, dir)
        .agg(count(lit(1)).as("n"), min(col("ts")).as("lo"),
          max(col("id")).as("hi"))
      assert(!scans(q), q.queryExecution.executedPlan.toString)
      val r = q.head()
      assert(r.getLong(0) == 60L && r.getLong(2) == 60L)
      assert(r.getTimestamp(1) == java.sql.Timestamp.valueOf("2024-03-01 12:00:00"))

      // an UNREGISTERED look-alike table keeps its scan
      val dir2 = Files.createTempDirectory("graft_marw_i2").toString + "/t"
      IcebergWrite.create(spark, d, dir2)
      assert(scans(IcebergScan.read(spark, dir2).agg(count(lit(1)).as("n"))))

      // a position delete makes counts/bounds unprovable; exact anyway
      IcebergWrite.deleteWhere(spark, dir, col("id") === 60L)
      val q3 = IcebergScan.read(spark, dir)
        .agg(count(lit(1)).as("n"), max(col("id")).as("hi"))
      val r3 = q3.head()
      assert(r3.getLong(0) == 59L && r3.getLong(1) == 59L)
    } finally MetaAggRewriteRule.unregister(dir)
  }

  test("distinct/filtered aggregates and grouped aggregates never rewrite") {
    val dir = Files.createTempDirectory("graft_marw_g").toString + "/t"
    DeltaWrite.create(spark, df(), dir)
    MetaAggRewriteRule.install(spark)
    MetaAggRewriteRule.register(spark, dir)
    try {
      val g = DeltaScan.read(spark, dir).groupBy("w")
        .agg(count(lit(1)).as("n"))
      assert(scans(g), "grouped aggregates must keep the scan")
      assert(g.count() == 7L)
      val dq = DeltaScan.read(spark, dir)
        .agg(countDistinct(col("w")).as("n"))
      assert(scans(dq))
      assert(dq.head().getLong(0) == 7L)
    } finally MetaAggRewriteRule.unregister(dir)
  }
}
