package graft

import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._

import graft.sources.{IcebergNdv, IcebergScan, IcebergWrite, Puffin}

/** Table statistics files: ANALYZE → Puffin NDV blobs + the spec's
  * `statistics` metadata field, carried across commits, replaced on
  * re-analyze, mergeable across analyze passes. */
class IcebergNdvSpec extends SparkSpec {

  private def metaNode(dir: String) = {
    val v = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "metadata", "version-hint.text")), "UTF-8").trim.toInt
    new ObjectMapper().readTree(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "metadata", s"v$v.metadata.json")))
  }

  test("analyze registers a statistics file; ndv within tolerance; stats survive appends") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ndv").toString + "/t"
    val df = (1L to 3000L).map(i => (i, s"g${i % 97}", i.toDouble / 7.0))
      .toDF("id", "grp", "x")
    IcebergWrite.create(spark, df, dir)
    val stats = IcebergNdv.analyze(spark, dir)
    assert(stats.map(_.column).toSet == Set("id", "grp", "x"))
    val byCol = stats.map(s => s.column -> s.ndv).toMap
    assert(math.abs(byCol("id") - 3000L) <= 150, s"id ndv ${byCol("id")}")
    assert(math.abs(byCol("grp") - 97L) <= 5, s"grp ndv ${byCol("grp")}")
    assert(math.abs(byCol("x") - 3000L) <= 150, s"x ndv ${byCol("x")}")

    // the statistics field is spec-shaped
    val entry = metaNode(dir).get("statistics").elements().next()
    assert(entry.get("snapshot-id").asLong() == 1L)
    assert(entry.get("statistics-path").asText().endsWith(".puffin"))
    assert(entry.get("file-size-in-bytes").asLong() > 0)
    assert(entry.get("file-footer-size-in-bytes").asLong() > 0)
    assert(entry.get("blob-metadata").size() == 3)
    val blob0 = entry.get("blob-metadata").elements().next()
    assert(blob0.get("type").asText() == IcebergNdv.BlobType)
    assert(blob0.get("properties").get("ndv").asLong() > 0)

    // readable back, sketch bytes present
    val read = IcebergNdv.tableStatistics(spark, dir).get
    assert(read.map(s => s.column -> s.ndv).toMap == byCol)
    assert(read.forall(_.sketch.nonEmpty))

    // an unrelated append CARRIES the field — but the stats are scoped
    // to their snapshot, so the reader reports none for the new one
    IcebergWrite.append(spark, Seq((99999L, "zz", 1.0)).toDF("id", "grp", "x"), dir)
    assert(metaNode(dir).get("statistics").size() == 1, "field carried verbatim")
    assert(IcebergNdv.tableStatistics(spark, dir).isEmpty,
      "stale stats must not be reported for a newer snapshot")

    // re-analyze at the new snapshot REPLACES nothing (different
    // snapshot-id → both entries), and the current one is served
    val again = IcebergNdv.analyze(spark, dir, Seq("grp"))
    assert(metaNode(dir).get("statistics").size() == 2)
    assert(IcebergNdv.tableStatistics(spark, dir).get.map(_.column) == Seq("grp"))
    assert(math.abs(again.head.ndv - 98L) <= 5)
  }

  test("re-analyze at the SAME snapshot replaces the entry; sketches merge across passes") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ndv2").toString + "/t"
    IcebergWrite.create(spark,
      (1L to 1000L).map(i => Tuple1(i)).toDF("id"), dir)
    IcebergNdv.analyze(spark, dir, Seq("id"))
    IcebergNdv.analyze(spark, dir, Seq("id")) // same snapshot → replace
    assert(metaNode(dir).get("statistics").size() == 1)

    // merge: two DISJOINT halves' sketches union to the full ndv
    val half1 = IcebergScan.read(spark, dir).filter(col("id") <= 500L)
      .agg(hll_sketch_agg(col("id"))).head().getAs[Array[Byte]](0)
    val half2 = IcebergScan.read(spark, dir).filter(col("id") > 500L)
      .agg(hll_sketch_agg(col("id"))).head().getAs[Array[Byte]](0)
    val merged = IcebergNdv.mergedNdv(spark, Seq(half1, half2))
    assert(math.abs(merged - 1000L) <= 50, s"merged ndv $merged")

    // the driver-side estimate/union are bit-equal to Spark's
    // hll_sketch_estimate / hll_union_agg expressions (recorded NDV
    // values must not change with the job-free path)
    import org.apache.spark.sql.functions.{hll_sketch_estimate, hll_union_agg, lit}
    val exprEst = spark.range(1)
      .select(hll_sketch_estimate(lit(half1))).head().getLong(0)
    assert(graft.sources.IcebergNdv.sketchEstimate(half1) == exprEst)
    val exprMerged = Seq(half1, half2).toDF("s")
      .agg(hll_sketch_estimate(hll_union_agg(col("s")))).head().getLong(0)
    assert(merged == exprMerged, s"driver union $merged vs expr $exprMerged")

    // the Puffin blobs themselves decode through the container reader
    val entry = metaNode(dir).get("statistics").elements().next()
    val p = new org.apache.hadoop.fs.Path(entry.get("statistics-path").asText())
    val (blobs, props) = Puffin.footer(
      spark.sparkContext.hadoopConfiguration, p)
    assert(blobs.size == 1 && blobs.head.fields == Seq(1))
    assert(props.get("created-by").contains("graft-analyze"))
  }

  test("partition statistics: per-partition counts from manifest metadata only") {
    import spark.implicits._
    import graft.sources.IcebergPartitionStats
    val dir = Files.createTempDirectory("graft_pstats").toString + "/t"
    val df = (1L to 90L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    IcebergWrite.create(spark, df, dir, partitionBy = Seq("g"))
    // a position delete: its rows must show up in the delete counts
    assert(IcebergWrite.deleteWhere(spark, dir, col("id") <= 6L) == 6L)

    IcebergPartitionStats.write(spark, dir)
    val got = IcebergPartitionStats.read(spark, dir).get
      .selectExpr("partition.g", "data_record_count", "data_file_count",
        "total_data_file_size_in_bytes", "position_delete_record_count")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == Set("g0", "g1", "g2"))
    // data counts are PRE-delete (position deletes ride as delete rows)
    assert(got.values.map(_._1).sum == 90L)
    assert(got.values.forall(v => v._2 >= 1 && v._3 > 0L))
    assert(got.values.map(_._4).sum == 6L, s"delete rows per partition: $got")

    // the metadata field is spec-shaped and snapshot-scoped
    val entry = metaNode(dir).get("partition-statistics").elements().next()
    assert(entry.get("statistics-path").asText().endsWith(".parquet"))
    assert(entry.get("file-size-in-bytes").asLong() > 0L)
    IcebergWrite.append(spark, Seq((91L, "g0")).toDF("id", "g"), dir)
    assert(metaNode(dir).get("partition-statistics").size() == 1,
      "field carried verbatim across unrelated commits")
    assert(IcebergPartitionStats.read(spark, dir).isEmpty,
      "stale partition stats must not be served for a newer snapshot")

    // re-write at the new snapshot: fresh counts include the append
    IcebergPartitionStats.write(spark, dir)
    val again = IcebergPartitionStats.read(spark, dir).get
      .selectExpr("partition.g", "data_record_count").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again("g0") == 31L, s"append counted: $again")
  }

  test("analyze refuses unknown columns and empty tables") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ndv3").toString + "/t"
    IcebergWrite.create(spark, Seq((1L, "a")).toDF("id", "v"), dir)
    intercept[IllegalArgumentException] {
      IcebergNdv.analyze(spark, dir, Seq("nope"))
    }
    assert(IcebergNdv.tableStatistics(spark,
      Files.createTempDirectory("graft_ndv4").toString + "/t" match {
        case d => IcebergWrite.create(spark, Seq(Tuple1(1L)).toDF("id"), d); d
      }).isEmpty)
  }
}
