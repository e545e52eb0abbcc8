package graft

import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._

import graft.sources.{IcebergScan, IcebergWrite}

/** Iceberg format-version 3 WRITE path: upgrade (parquet position
  * deletes → Puffin deletion vectors), DV-writing DML with the
  * one-DV-per-file supersede rule, MOR update/merge on v3, compaction
  * folding, row-lineage metadata (`next-row-id` / `first-row-id` /
  * explicit `first_row_id`), and the concurrent-DV loss guard. */
class IcebergDvSpec extends SparkSpec {

  private def metaNode(dir: String) = {
    val hint = java.nio.file.Paths.get(dir, "metadata", "version-hint.text")
    val v = new String(Files.readAllBytes(hint), "UTF-8").trim.toInt
    new ObjectMapper().readTree(
      Files.readAllBytes(java.nio.file.Paths.get(dir, "metadata", s"v$v.metadata.json")))
  }
  private def fmtVersion(dir: String): Int = metaNode(dir).get("format-version").asInt()
  private def nextRowId(dir: String): Long = metaNode(dir).get("next-row-id").asLong()
  private def deleteEntries(dir: String) =
    IcebergScan.files(spark, dir).filter(col("content") =!= "data").collect()
      .map(r => (r.getString(6), Option(r.getString(7)), r.getLong(2))).toSeq

  test("upgradeFormatVersion: parquet position deletes convert to one DV per file") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dv_up").toString + "/t"
    IcebergWrite.create(spark,
      (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v").repartition(2), dir)
    assert(IcebergWrite.deleteWhere(spark, dir, col("id") <= 3L) == 3L)
    assert(fmtVersion(dir) == 2)
    assert(deleteEntries(dir).forall(_._1 == "PARQUET"))

    IcebergWrite.upgradeFormatVersion(spark, dir)
    assert(fmtVersion(dir) == 3)
    assert(nextRowId(dir) == 0L, "upgrade assigns no row ids")
    val dels = deleteEntries(dir)
    assert(dels.nonEmpty && dels.forall(_._1 == "PUFFIN"),
      s"upgrade must convert every parquet position delete, have $dels")
    assert(dels.flatMap(_._2).distinct.size == dels.size,
      "at most one deletion vector per referenced data file")
    assert(dels.map(_._3).sum == 3L, "DV cardinalities = effective deleted rows")
    assert(IcebergScan.read(spark, dir).collect().map(_.getLong(0)).sorted.toSeq
      == (4L to 10L))
    // idempotent
    IcebergWrite.upgradeFormatVersion(spark, dir)
    assert(fmtVersion(dir) == 3)
  }

  test("v3 deleteWhere writes DVs; a re-delete supersedes with the union") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dv_del").toString + "/t"
    IcebergWrite.create(spark,
      (1L to 8L).map(i => (i, i % 2 == 0)).toDF("id", "even").coalesce(1), dir)
    IcebergWrite.upgradeFormatVersion(spark, dir)

    assert(IcebergWrite.deleteWhere(spark, dir, col("id") === 1L) == 1L)
    val d1 = deleteEntries(dir)
    assert(d1.size == 1 && d1.head._1 == "PUFFIN" && d1.head._3 == 1L)

    // second delete on the SAME data file: the replacement DV must hold
    // the union — the old positions must not resurrect
    assert(IcebergWrite.deleteWhere(spark, dir, col("id") === 2L) == 1L)
    val d2 = deleteEntries(dir)
    assert(d2.size == 1, s"supersede must leave ONE DV per file, have $d2")
    assert(d2.head._3 == 2L, s"replacement DV must union old+new, have $d2")
    assert(IcebergScan.read(spark, dir).collect().map(_.getLong(0)).sorted.toSeq
      == (3L to 8L))
    // time travel still sees pre-delete states
    assert(IcebergScan.read(spark, dir, snapshotAsOf = Some(2L)).count() == 8L)
    assert(IcebergScan.read(spark, dir, snapshotAsOf = Some(3L)).count() == 7L)
  }

  test("v3 deleteWhere on a hidden-partitioned table: DV rides the data file's partition") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dv_part").toString + "/t"
    val df = (1L to 40L).map(i => (i, s"g${i % 4}")).toDF("id", "g")
    IcebergWrite.create(spark, df, dir, partitionBy = Seq("bucket(4, id)"))
    IcebergWrite.upgradeFormatVersion(spark, dir)
    assert(IcebergWrite.deleteWhere(spark, dir, col("id") % 10 === 0L) == 4L)
    val dels = deleteEntries(dir)
    assert(dels.nonEmpty && dels.forall(_._1 == "PUFFIN"))
    // every DV entry carries its referenced file's partition tuple
    val dvParts = IcebergScan.files(spark, dir)
      .filter(col("content") === "position-deletes")
      .collect().map(_.getMap[String, String](4))
    assert(dvParts.forall(m => m.contains("id_bucket") && m("id_bucket") != null))
    assert(IcebergScan.read(spark, dir).count() == 36L)
    // pruned read (bucket-constrained) still applies the DV
    val got = IcebergScan.read(spark, dir, skippingFilter = Some(col("id") === 10L))
    assert(got.count() == 0L)
    val kept = IcebergScan.read(spark, dir, skippingFilter = Some(col("id") === 11L))
    assert(kept.collect().map(_.getLong(0)).toSeq == Seq(11L))
  }

  test("v3 MOR update: DVs + new images in one snapshot; compact folds them away") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dv_mor").toString + "/t"
    IcebergWrite.create(spark,
      (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v").repartition(2), dir)
    IcebergWrite.upgradeFormatVersion(spark, dir)
    IcebergWrite.setProperties(spark, dir, Map("write.update.mode" -> "merge-on-read"))

    val dataBefore = IcebergScan.files(spark, dir).filter(col("content") === "data")
      .collect().map(_.getString(0)).toSet
    val n = IcebergWrite.updateWhere(spark, dir, col("id") % 2 === 0,
      Seq("v" -> concat(lit("U:"), col("v"))))
    assert(n == 5L)
    val dataAfter = IcebergScan.files(spark, dir).filter(col("content") === "data")
      .collect().map(_.getString(0)).toSet
    assert(dataBefore.subsetOf(dataAfter) && dataAfter.size > dataBefore.size,
      "MOR update keeps originals live and only adds images")
    assert(deleteEntries(dir).forall(_._1 == "PUFFIN"),
      "v3 MOR update must kill originals via deletion vectors")
    val got = IcebergScan.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == (1L to 10L).map(i =>
      i -> (if (i % 2 == 0) s"U:v$i" else s"v$i")).toMap)
    // the update's images were assigned fresh row ids
    assert(nextRowId(dir) == 5L)

    // stacked second update hits an already-updated row
    assert(IcebergWrite.updateWhere(spark, dir, col("id") === 2L,
      Seq("v" -> lit("final"))) == 1L)
    assert(IcebergScan.read(spark, dir).filter(col("id") === 2L)
      .head().getString(1) == "final")

    // full compaction folds every DV away; table stays v3
    val (picked, _) = IcebergWrite.compact(spark, dir, smallFileBytes = 1L << 30)
    assert(picked > 0)
    assert(deleteEntries(dir).isEmpty, "full compaction must fold the DVs")
    assert(fmtVersion(dir) == 3)
    val got2 = IcebergScan.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got2(2L) == "final" && got2(4L) == "U:v4" && got2(3L) == "v3")
    assert(got2.size == 10)
  }

  test("v3 merge (equality deletes) and appends: row-id accounting advances") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dv_merge").toString + "/t"
    IcebergWrite.create(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1), dir)
    IcebergWrite.upgradeFormatVersion(spark, dir)
    assert(nextRowId(dir) == 0L)

    // v3 appends assign ids and stamp them explicitly
    IcebergWrite.append(spark, Seq((3L, "c")).toDF("id", "v").coalesce(1), dir)
    assert(nextRowId(dir) == 1L)
    val metaN = metaNode(dir)
    val snaps = metaN.get("snapshots").elements()
    var lastFirst = -1L
    while (snaps.hasNext) {
      val s = snaps.next()
      if (s.has("first-row-id")) lastFirst = s.get("first-row-id").asLong()
    }
    assert(lastFirst == 0L, "the append snapshot starts the id range at 0")

    IcebergWrite.setProperties(spark, dir, Map("write.merge.mode" -> "merge-on-read"))
    val (upd, ins) = IcebergWrite.merge(spark, dir,
      Seq((2L, "B2"), (4L, "d")).toDF("id", "v"), Seq("id"))
    assert((upd, ins) == (1L, 1L))
    assert(fmtVersion(dir) == 3)
    assert(nextRowId(dir) == 3L, "merge assigned ids to its 2 source rows")
    val got = IcebergScan.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(1L -> "a", 2L -> "B2", 3L -> "c", 4L -> "d"))
    // the equality-delete manifest survived the v3 commit
    assert(IcebergScan.files(spark, dir)
      .filter(col("content") === "equality-deletes").count() == 1L)
  }

  test("v3 kept files carry their first_row_id through a partial rewrite") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dv_keep").toString + "/t"
    IcebergWrite.create(spark, Seq((1L, "a")).toDF("id", "v").coalesce(1), dir)
    IcebergWrite.upgradeFormatVersion(spark, dir)
    IcebergWrite.append(spark, Seq((2L, "b")).toDF("id", "v").coalesce(1), dir) // ids [0,1)
    IcebergWrite.append(spark,
      (3L to 12L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1), dir) // ids [1,11)
    assert(nextRowId(dir) == 11L)
    // CoW delete rewrites ONLY the 10-row file; the 1-row v3 file and
    // the pre-upgrade file are kept — their (absent/explicit) row-id
    // claims must carry verbatim, and fresh ids must not collide
    assert(IcebergWrite.deleteWhere(spark, dir, col("id") === 12L) == 1L)
    assert(nextRowId(dir) == 11L, "a DV delete assigns no ids")
    val (picked, _) = IcebergWrite.compact(spark, dir, smallFileBytes = 1L << 30)
    assert(picked > 0)
    assert(nextRowId(dir) > 11L, "compaction outputs get fresh id ranges")
    assert(IcebergScan.read(spark, dir).count() == 11L)
  }

  test("concurrent DV delete on the same file refuses loudly (lost-delete guard)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dv_race").toString + "/t"
    IcebergWrite.create(spark,
      (1L to 6L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1), dir)
    IcebergWrite.upgradeFormatVersion(spark, dir)
    // land a racing DV delete on the SAME data file between this
    // delete's staging and its first CAS attempt
    IcebergWrite.beforeCommit = () => {
      IcebergWrite.beforeCommit = () => ()
      IcebergWrite.deleteWhere(spark, dir, col("id") === 2L)
    }
    try {
      val e = intercept[IllegalStateException] {
        IcebergWrite.deleteWhere(spark, dir, col("id") === 1L)
      }
      assert(e.getMessage.contains("concurrent deletion-vector commit"))
    } finally IcebergWrite.beforeCommit = () => ()
    // the winner's delete is intact; re-running the loser works
    assert(IcebergScan.read(spark, dir).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 3L, 4L, 5L, 6L))
    assert(IcebergWrite.deleteWhere(spark, dir, col("id") === 1L) == 1L)
    assert(IcebergScan.read(spark, dir).collect().map(_.getLong(0)).sorted.toSeq
      == (3L to 6L))
    val d = deleteEntries(dir)
    assert(d.size == 1 && d.head._3 == 2L, s"one unioned DV after the re-run, have $d")
  }

  test("readWithRowIds: ids = first_row_id + ordinal, stable under DVs and kept files") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dv_rowids").toString + "/t"
    // pre-upgrade file: its rows never receive ids (NULL per spec)
    IcebergWrite.create(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1), dir)
    IcebergWrite.upgradeFormatVersion(spark, dir)
    // two v3 appends: ids [0,3) and [3,5)
    IcebergWrite.append(spark,
      Seq((3L, "c"), (4L, "d"), (5L, "e")).toDF("id", "v").coalesce(1), dir)
    IcebergWrite.append(spark, Seq((6L, "f"), (7L, "g")).toDF("id", "v").coalesce(1), dir)
    def ids(): Map[Long, Option[Long]] =
      IcebergScan.readWithRowIds(spark, dir).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val before = ids()
    assert(before(1L).isEmpty && before(2L).isEmpty, "pre-upgrade rows have no ids")
    assert(before(3L).contains(0L) && before(4L).contains(1L) && before(5L).contains(2L))
    assert(before(6L).contains(3L) && before(7L).contains(4L))

    // a DV delete: survivors keep their ids
    assert(IcebergWrite.deleteWhere(spark, dir, col("id") === 4L) == 1L)
    val after = ids()
    assert(!after.contains(4L) && after(3L).contains(0L) && after(5L).contains(2L))

    // non-v3 table refuses loudly
    val v2dir = Files.createTempDirectory("graft_dv_rowids2").toString + "/t"
    IcebergWrite.create(spark, Seq((1L, "x")).toDF("id", "v"), v2dir)
    val e = intercept[IllegalArgumentException] {
      IcebergScan.readWithRowIds(spark, v2dir)
    }
    assert(e.getMessage.contains("format-version 3"))
  }

  test("v3 equality deletes (deleteEqual) commit v3 metadata and still gate by sequence") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dv_eq").toString + "/t"
    IcebergWrite.create(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1), dir)
    IcebergWrite.upgradeFormatVersion(spark, dir)
    assert(IcebergWrite.deleteEqual(spark, dir, Seq(Tuple1(2L)).toDF("id")) == 1L)
    assert(fmtVersion(dir) == 3)
    assert(IcebergScan.read(spark, dir).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 3L))
    // rows appended AFTER the equality delete are immune (seq gating)
    IcebergWrite.append(spark, Seq((2L, "b2")).toDF("id", "v").coalesce(1), dir)
    assert(IcebergScan.read(spark, dir).filter(col("id") === 2L)
      .head().getString(1) == "b2")
  }
}
