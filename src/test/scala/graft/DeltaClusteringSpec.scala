package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.sources.{DeltaScan, DeltaWrite}

/** Clustered Delta tables (PROTOCOL §Clustered Table / §Domain
  * Metadata) — the Delta twin of Iceberg sort orders: clustering
  * columns recorded once in the `delta.clustering` metadata domain,
  * honored by OPTIMIZE-style compaction, surviving checkpoint
  * truncation, removable by tombstone. */
class DeltaClusteringSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def logLines(dir: String, v: Long): Seq[com.fasterxml.jackson.databind.JsonNode] =
    java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(dir, "_delta_log", f"$v%020d.json"))
      .asScala.toSeq.map(mapper.readTree)

  test("setClusteringColumns: domain metadata + feature gate; compact clusters; checkpoint survives; Nil tombstones") {
    val dir = java.nio.file.Files.createTempDirectory("graft_delta_clust").toString + "/t"
    // three appends with fully overlapping k ranges — compact must
    // UNMIX them once clustering is declared
    def batch(seed: Int) =
      (0 until 30).map(i => (seed * 100L + i, (i * 7 + seed) % 90L, s"v$seed-$i"))
        .toDF("id", "k", "v")
    DeltaWrite.create(spark, batch(1), dir)
    DeltaWrite.append(spark, batch(2), dir)
    DeltaWrite.append(spark, batch(3), dir)
    assert(DeltaScan.clusteringColumns(spark, dir).isEmpty)
    val expected = DeltaScan.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

    DeltaWrite.setClusteringColumns(spark, dir, Seq("k"))
    // the commit carries the protocol upgrade (writer features) and the
    // reserved-domain action with the spec's configuration shape
    val v = DeltaScan.latestVersion(spark, dir)
    val lines = logLines(dir, v)
    val proto = lines.find(_.has("protocol")).get.get("protocol")
    assert(proto.get("minWriterVersion").asInt() == 7)
    val wf = proto.get("writerFeatures").elements().asScala.map(_.asText()).toSet
    assert(wf.contains("clustering") && wf.contains("domainMetadata"), wf.toString)
    // legacy writer-2 implied features listed explicitly per the
    // upgrade rule
    assert(wf.contains("appendOnly") && wf.contains("invariants"), wf.toString)
    val dm = lines.find(_.has("domainMetadata")).get.get("domainMetadata")
    assert(dm.get("domain").asText() == "delta.clustering")
    assert(!dm.get("removed").asBoolean())
    val cfg = mapper.readTree(dm.get("configuration").asText())
    assert(cfg.get("clusteringColumns").toString == """[["k"]]""")
    assert(DeltaScan.clusteringColumns(spark, dir) == Seq("k"))

    // idempotent re-set doesn't re-upgrade the protocol
    DeltaWrite.setClusteringColumns(spark, dir, Seq("k"))
    val lines2 = logLines(dir, DeltaScan.latestVersion(spark, dir))
    assert(!lines2.exists(_.has("protocol")), "second set must not re-upgrade")

    // compact honors the clustering: added files' k-ranges are disjoint
    DeltaWrite.compact(spark, dir, smallFileBytes = Long.MaxValue, targetFiles = 3)
    val optLines = logLines(dir, DeltaScan.latestVersion(spark, dir))
    val ranges = optLines.filter(_.has("add")).map { n =>
      val st = mapper.readTree(n.get("add").get("stats").asText())
      (st.get("minValues").get("k").asLong(), st.get("maxValues").get("k").asLong())
    }.sortBy(_._1)
    assert(ranges.size == 3, s"expected 3 clustered files, got $ranges")
    ranges.sliding(2).foreach { case Seq((_, aMax), (bMin, _)) =>
      assert(aMax < bMin, s"clustered file ranges overlap: $ranges")
    }
    assert(DeltaScan.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet == expected)

    // checkpoint + JSON-log truncation: the domain must survive in the
    // checkpoint parquet (this is why it joins the checkpoint schema)
    DeltaWrite.checkpoint(spark, dir)
    val cpV = DeltaScan.latestVersion(spark, dir)
    (0L until cpV).foreach { old =>
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(dir, "_delta_log", f"$old%020d.json"))
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(dir, "_delta_log", f".$old%020d.json.crc"))
    }
    assert(DeltaScan.clusteringColumns(spark, dir) == Seq("k"),
      "clustering lost to checkpoint truncation")
    assert(DeltaScan.read(spark, dir).count() == expected.size.toLong)

    // removal: tombstone action, state reads empty, next checkpoint
    // drops the domain entirely
    DeltaWrite.setClusteringColumns(spark, dir, Nil)
    val rmLines = logLines(dir, DeltaScan.latestVersion(spark, dir))
    val rm = rmLines.find(_.has("domainMetadata")).get.get("domainMetadata")
    assert(rm.get("removed").asBoolean())
    assert(DeltaScan.clusteringColumns(spark, dir).isEmpty)
    DeltaWrite.checkpoint(spark, dir)
    val cp2 = spark.read.parquet(
      s"$dir/_delta_log/" + f"${DeltaScan.latestVersion(spark, dir)}%020d.checkpoint.parquet")
    assert(!cp2.columns.contains("domainMetadata") ||
      cp2.filter(col("domainMetadata.domain").isNotNull).count() == 0L,
      "tombstoned domain resurrected in the checkpoint")

    // loud errors
    assert(intercept[IllegalArgumentException] {
      DeltaWrite.setClusteringColumns(spark, dir, Seq("nope"))
    }.getMessage.contains("not a column"))
    assert(intercept[IllegalArgumentException] {
      DeltaWrite.setClusteringColumns(spark, dir, Seq("k", "k"))
    }.getMessage.contains("duplicate"))
    assert(intercept[IllegalArgumentException] {
      DeltaWrite.setClusteringColumns(spark, dir, Nil) // already unset
    }.getMessage.contains("nothing to remove"))
  }

  test("clustering on a column-mapped table stores PHYSICAL names; partition columns refuse") {
    val dir = java.nio.file.Files.createTempDirectory("graft_delta_clustm").toString + "/t"
    DeltaWrite.create(spark,
      (0 until 20).map(i => (i.toLong, i % 7L, s"p${i % 2}")).toDF("id", "k", "p"),
      dir, partitionBy = Seq("p"))
    // renaming upgrades to columnMapping; the clustering domain must
    // then record the column's PHYSICAL name (what the parquet files
    // carry) so foreign engines cluster the right bytes
    DeltaWrite.renameColumn(spark, dir, "k", "kk")
    DeltaWrite.setClusteringColumns(spark, dir, Seq("kk"))
    val phys = DeltaScan.clusteringColumns(spark, dir)
    assert(phys.size == 1 && phys.head != "kk",
      s"mapped table must store the physical name, got $phys")
    // compact still works (reads physical columns) and content holds
    DeltaWrite.append(spark,
      (100 until 120).map(i => (i.toLong, i % 7L, s"p${i % 2}")).toDF("id", "kk", "p"),
      dir, partitionBy = Seq("p"))
    DeltaWrite.compact(spark, dir, smallFileBytes = Long.MaxValue, targetFiles = 2)
    assert(DeltaScan.read(spark, dir).count() == 40L)
    assert(intercept[IllegalArgumentException] {
      DeltaWrite.setClusteringColumns(spark, dir, Seq("p"))
    }.getMessage.contains("partition column"))
  }
}
