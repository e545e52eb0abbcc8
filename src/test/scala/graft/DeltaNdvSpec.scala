package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{CboJoin, DeltaNdv, DeltaWrite, IcebergNdv, IcebergWrite}

/** Delta ANALYZE (domain-metadata NDV stats): estimate quality,
  * version-scoped staleness, protocol gating, mergeability, and
  * consumption by the star planner's selectivity ordering. */
class DeltaNdvSpec extends SparkSpec {
  import spark.implicits._

  test("analyze estimates NDV; any later commit invalidates; re-analyze restores") {
    val base = Files.createTempDirectory("graft_dndv1").toString + "/t"
    val df = spark.range(0, 2000)
      .select(col("id"), (col("id") % 50L).as("k"))
    DeltaWrite.create(spark, df, base)
    val stats = DeltaNdv.analyze(spark, base, Seq("id", "k"))
      .map(s => s.column -> s.ndv).toMap
    assert(math.abs(stats("id") - 2000L) <= 60, stats)
    assert(math.abs(stats("k") - 50L) <= 2, stats)
    val served = DeltaNdv.tableStatistics(spark, base)
    assert(served.exists(_.map(s => s.column -> s.ndv).toMap == stats))
    // stale after ANY commit (metadata-only included — conservative)
    DeltaWrite.append(spark, Seq((9999L, 1L)).toDF("id", "k"), base)
    assert(DeltaNdv.tableStatistics(spark, base).isEmpty)
    DeltaNdv.analyze(spark, base, Seq("k"))
    assert(DeltaNdv.tableStatistics(spark, base)
      .exists(_.exists(s => s.column == "k")))
    // the protocol carries the domainMetadata writer feature
    val proto = graft.sources.DeltaScan.read(spark, base) // table still reads
    assert(proto.count() == 2001)
  }

  test("sketches stay mergeable across tables (DataSketches HLL union)") {
    val a = Files.createTempDirectory("graft_dndv2").toString + "/a"
    val b = Files.createTempDirectory("graft_dndv2").toString + "/b"
    DeltaWrite.create(spark, spark.range(0, 1000).select(col("id")), a)
    DeltaWrite.create(spark, spark.range(1000, 2000).select(col("id")), b)
    val sa = DeltaNdv.analyze(spark, a, Seq("id")).head.sketch
    val sb = DeltaNdv.analyze(spark, b, Seq("id")).head.sketch
    val merged = IcebergNdv.mergedNdv(spark, Seq(sa, sb))
    assert(math.abs(merged - 2000L) <= 80, merged)
  }

  test("star planner orders by Delta-fact NDV like Iceberg ANALYZE") {
    val base = Files.createTempDirectory("graft_dndv3").toString
    val fact = spark.range(0, 400)
      .select(col("id"), (col("id") % 7L).as("k2"), (col("id") * 3L).as("v"))
      .repartitionByRange(4, col("id"))
    DeltaWrite.create(spark, fact, s"$base/f")
    DeltaNdv.analyze(spark, s"$base/f", Seq("id", "k2"))
    IcebergWrite.create(spark,
      Seq((10L, "da_x"), (320L, "da_y")).toDF("fk", "da_name"), s"$base/dA")
    IcebergWrite.create(spark,
      (0L until 5L).map(i => (i, s"db_$i")).toDF("fk", "db_name"), s"$base/dB")
    val (df, sd) = CboJoin.planStar(spark, s"$base/f", Seq(
      CboJoin.DimSpec(s"$base/dB", "k2", "fk"),
      CboJoin.DimSpec(s"$base/dA", "id", "fk")))
    assert(sd.order == Seq(s"$base/dA", s"$base/dB"), sd.order)
    assert(sd.fraction(s"$base/dA") < 0.05 && sd.fraction(s"$base/dB") > 0.3,
      sd.fraction)
    val got = df.select(col("id"), col("da_name"), col("db_name"))
      .orderBy("id").as[(Long, String, String)].collect()
    assert(got.toSeq == Seq((10L, "da_x", "db_3")))
  }
}
