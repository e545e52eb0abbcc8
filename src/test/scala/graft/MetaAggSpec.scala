package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{DeltaWrite, IcebergWrite, MetaAgg}

/** Metadata-only aggregates: count(*)/min/max served from the Delta
  * log stats / Iceberg manifests with NO data file opened, and the
  * honest fallback (metadataOnly=false, value still exact) everywhere
  * metadata cannot prove the answer. Every assertion cross-checks the
  * metadata answer against the real delete-applied read. */
class MetaAggSpec extends SparkSpec {

  private def df() = {
    import spark.implicits._
    (1L to 100L).map { i =>
      (i,
        if (i % 10 == 0) null else s"w${i % 7}",
        java.sql.Timestamp.valueOf(f"2024-03-${(i % 28) + 1}%02d 12:30:${i % 60}%02d"),
        java.sql.Date.valueOf(f"2024-03-${(i % 28) + 1}%02d"),
        if (i % 2 == 0) null else java.lang.Double.valueOf(i * 1.5),
        null: java.lang.Long)
    }.toDF("id", "w", "ts", "d", "x", "allnull")
  }

  test("Delta: count and min/max from stats alone; DV cardinalities subtract") {
    val dir = Files.createTempDirectory("graft_meta_d1").toString + "/t"
    DeltaWrite.create(spark, df().repartition(4), dir)
    val c0 = MetaAgg.countDelta(spark, dir)
    assert(c0 == MetaAgg.Meta(100L, true))

    for (c <- Seq("id", "d", "x")) {
      val m = MetaAgg.minMaxDelta(spark, dir, c)
      assert(m.metadataOnly, s"$c should answer from metadata")
      val r = graft.sources.DeltaScan.read(spark, dir)
        .agg(min(col(c)), max(col(c))).head()
      assert(m.value == ((r.get(0), r.get(1))), s"$c min/max")
    }
    // Delta JSON stats may carry ms-truncated timestamps (delta-spark
    // rounds the max UP) — exact-or-fallback means fall back, value
    // still exact (Iceberg's binary micros bounds keep the fast path)
    val tsm = MetaAgg.minMaxDelta(spark, dir, "ts")
    assert(!tsm.metadataOnly)
    val tsr = graft.sources.DeltaScan.read(spark, dir)
      .agg(min(col("ts")), max(col("ts"))).head()
    assert(tsm.value == ((tsr.get(0), tsr.get(1))))
    // all-null column: provably (null, null) from nullCount == numRecords
    assert(MetaAgg.minMaxDelta(spark, dir, "allnull") ==
      MetaAgg.Meta((null, null), true))
    // strings may be writer-truncated: fallback, still exact
    val ws = MetaAgg.minMaxDelta(spark, dir, "w")
    assert(!ws.metadataOnly && ws.value == (("w0", "w6")))

    DeltaWrite.deleteWhereDV(spark, dir, col("id") % 3 === 0)
    assert(MetaAgg.countDelta(spark, dir) == MetaAgg.Meta(67L, true))
    // a DV may have removed the extreme row: min/max must fall back
    val m = MetaAgg.minMaxDelta(spark, dir, "id")
    assert(!m.metadataOnly && m.value == ((1L, 100L)))
  }

  test("Delta: partition-column min/max falls back (values live in dir names)") {
    val dir = Files.createTempDirectory("graft_meta_d2").toString + "/t"
    DeltaWrite.create(spark, df().select("id", "w"), dir, partitionBy = Seq("w"))
    val m = MetaAgg.minMaxDelta(spark, dir, "w")
    assert(!m.metadataOnly && m.value == (("w0", "w6")))
    assert(MetaAgg.countDelta(spark, dir).metadataOnly)
  }

  test("Delta: a stats-less foreign add falls back for count, exactly") {
    import java.nio.charset.StandardCharsets.UTF_8
    val base = Files.createTempDirectory("graft_meta_d3")
    val part = Files.createTempDirectory("graft_meta_d3p").toString
    df().select("id").limit(7).coalesce(1).write.mode("overwrite").parquet(part)
    val pf = Files.list(java.nio.file.Paths.get(part))
      .filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
    Files.move(pf, base.resolve("f0.parquet"))
    val log = base.resolve("_delta_log"); Files.createDirectories(log)
    val schemaJson = """{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}}]}"""
    Files.write(log.resolve(f"${0L}%020d.json"), Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"m3","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{},"createdTime":1700000000000}}""",
      s"""{"add":{"path":"f0.parquet","partitionValues":{},"size":${Files.size(base.resolve("f0.parquet"))},"modificationTime":1700000000000,"dataChange":true}}"""
    ).mkString("", "\n", "\n").getBytes(UTF_8))
    assert(MetaAgg.countDelta(spark, base.toString) == MetaAgg.Meta(7L, false))
  }

  test("Iceberg: counts across the delete-file spectrum") {
    val dir = Files.createTempDirectory("graft_meta_i1").toString + "/t"
    IcebergWrite.create(spark, df().repartition(4), dir)
    assert(MetaAgg.countIceberg(spark, dir) == MetaAgg.Meta(100L, true))

    // v2 parquet position deletes: duplicate/dead references are legal
    // in the wild — metadata cannot subtract, the read can
    IcebergWrite.deleteWhere(spark, dir, col("id") % 3 === 0)
    assert(MetaAgg.countIceberg(spark, dir) == MetaAgg.Meta(67L, false))

    // v3 deletion vectors: one per file, cardinality recorded — exact
    IcebergWrite.upgradeFormatVersion(spark, dir)
    assert(MetaAgg.countIceberg(spark, dir) == MetaAgg.Meta(67L, true))
    IcebergWrite.deleteWhere(spark, dir, col("id") % 5 === 0)
    assert(MetaAgg.countIceberg(spark, dir) == MetaAgg.Meta(53L, true))

    // equality deletes: metadata can never prove the count
    IcebergWrite.deleteEqual(spark, dir,
      df().filter(col("id") % 7 === 0).select("id"))
    val eq = MetaAgg.countIceberg(spark, dir)
    assert(eq == MetaAgg.Meta(
      graft.sources.IcebergScan.read(spark, dir).count(), false))
  }

  test("Iceberg: min/max from manifest bounds; deletes force fallback") {
    val dir = Files.createTempDirectory("graft_meta_i2").toString + "/t"
    IcebergWrite.create(spark, df().repartition(4), dir)
    for (c <- Seq("id", "ts", "d", "x")) {
      val m = MetaAgg.minMaxIceberg(spark, dir, c)
      assert(m.metadataOnly, s"$c should answer from metadata")
      val r = graft.sources.IcebergScan.read(spark, dir)
        .agg(min(col(c)), max(col(c))).head()
      assert(m.value == ((r.get(0), r.get(1))), s"$c min/max")
    }
    assert(MetaAgg.minMaxIceberg(spark, dir, "allnull") ==
      MetaAgg.Meta((null, null), true))
    val ws = MetaAgg.minMaxIceberg(spark, dir, "w")
    assert(!ws.metadataOnly && ws.value == (("w0", "w6")))

    IcebergWrite.deleteWhere(spark, dir, col("id") === 100L)
    val m = MetaAgg.minMaxIceberg(spark, dir, "id")
    assert(!m.metadataOnly && m.value == ((1L, 99L)),
      "a delete may remove the extreme row — the fallback sees it did")
  }

  test("non-null column counts from nullCount stats; DVs force fallback") {
    val dDir = Files.createTempDirectory("graft_meta_cc_d").toString + "/t"
    DeltaWrite.create(spark, df().repartition(4), dDir)
    assert(MetaAgg.countColumnDelta(spark, dDir, "x") == MetaAgg.Meta(50L, true))
    assert(MetaAgg.countColumnDelta(spark, dDir, "w") == MetaAgg.Meta(90L, true))
    assert(MetaAgg.countColumnDelta(spark, dDir, "allnull") == MetaAgg.Meta(0L, true))
    DeltaWrite.deleteWhereDV(spark, dDir, col("id") % 2 === 0)
    // the DV deleted only even ids (all-null x rows): metadata cannot
    // know that split — fallback, still exact
    assert(MetaAgg.countColumnDelta(spark, dDir, "x") == MetaAgg.Meta(50L, false))

    val iDir = Files.createTempDirectory("graft_meta_cc_i").toString + "/t"
    IcebergWrite.create(spark, df().repartition(4), iDir)
    assert(MetaAgg.countColumnIceberg(spark, iDir, "x") == MetaAgg.Meta(50L, true))
    assert(MetaAgg.countColumnIceberg(spark, iDir, "allnull") == MetaAgg.Meta(0L, true))
    IcebergWrite.deleteWhere(spark, iDir, col("id") % 2 === 0)
    assert(MetaAgg.countColumnIceberg(spark, iDir, "x") == MetaAgg.Meta(50L, false))
  }

  test("Delta per-partition counts from the log; DV cardinalities subtract per file") {
    val dir = Files.createTempDirectory("graft_meta_pc").toString + "/t"
    DeltaWrite.create(spark, df().select("id", "w", "x"), dir,
      partitionBy = Seq("w"))
    DeltaWrite.deleteWhereDV(spark, dir, col("id") % 4 === 0)
    val m = MetaAgg.countByPartitionDelta(spark, dir)
    assert(m.metadataOnly)
    val got = m.value.collect()
      .map(r => (if (r.isNullAt(0)) null else r.getString(0)) -> r.getLong(1)).toMap
    val want = graft.sources.DeltaScan.read(spark, dir)
      .groupBy("w").count().collect()
      .map(r => (if (r.isNullAt(0)) null else r.getString(0)) -> r.getLong(1)).toMap
    assert(got == want)
    assert(got.contains(null), "the null partition is counted too")
  }

  test("Iceberg: identity-partitioned column bounds come from partition values") {
    val dir = Files.createTempDirectory("graft_meta_i3").toString + "/t"
    import spark.implicits._
    val data = (1L to 60L).map(i => (i, (i % 5) + 10, s"p$i"))
      .toDF("id", "grp", "payload")
    IcebergWrite.create(spark, data, dir, partitionBy = Seq("grp"))
    // the hive layout strips grp from the data files; the manifests'
    // identity partition values are lower = upper = the value
    assert(MetaAgg.minMaxIceberg(spark, dir, "grp") ==
      MetaAgg.Meta((10L, 14L), true))
    assert(MetaAgg.countIceberg(spark, dir) == MetaAgg.Meta(60L, true))
  }
}
