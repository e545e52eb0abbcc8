package graft

import org.apache.spark.sql.functions._

import graft.sources.{DeltaScan, DeltaWrite}

/** DELTA ROW TRACKING (PROTOCOL §Row Tracking): stable per-row ids.
  * Invariants proven here:
  *  - enable backfills existing rows with unique contiguous ids;
  *  - appends allocate FRESH ids above the high watermark;
  *  - DV delete preserves surviving rows' ids exactly;
  *  - compact preserves ids by MATERIALIZING them (and still assigns
  *    fresh baseRowIds to the new files);
  *  - ids survive checkpoint + log-truncation-equivalent replay;
  *  - copy-on-write DML / restore / purge / clone refuse loudly;
  *  - id-breaking paths can't run by accident. */
class RowTrackingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString + "/t"

  /** business-key → row id map of the current state */
  private def idsByKey(dir: String): Map[Long, Long] =
    DeltaWrite.readWithRowIds(spark, dir)
      .select("id", "_row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("enable backfills unique ids; appends allocate above the watermark") {
    val dir = tmp("graft_rt1")
    DeltaWrite.create(spark,
      (0L until 20L).map(i => (i, s"v$i")).toDF("id", "v").repartition(4), dir)
    DeltaWrite.enableRowTracking(spark, dir)

    val ids0 = idsByKey(dir)
    assert(ids0.size == 20, "every row readable with an id")
    assert(ids0.values.toSeq.distinct.size == 20, "ids unique")
    assert(ids0.values.min == 0L && ids0.values.max == 19L,
      s"backfill is contiguous 0..19, got ${ids0.values.toSeq.sorted}")

    DeltaWrite.append(spark,
      (100L until 110L).map(i => (i, s"v$i")).toDF("id", "v").repartition(2), dir)
    val ids1 = idsByKey(dir)
    assert(ids1.size == 30)
    assert(ids1.values.toSeq.distinct.size == 30, "fresh ids never collide")
    assert((100L until 110L).map(ids1).min >= 20L,
      "fresh rows allocate above the backfill watermark")
    // the old rows kept their ids
    ids0.foreach { case (k, id) => assert(ids1(k) == id, s"row $k re-identified") }

    // double-enable refuses
    val e = intercept[IllegalArgumentException](
      DeltaWrite.enableRowTracking(spark, dir))
    assert(e.getMessage.contains("already enabled"))
  }

  test("DV delete preserves ids exactly; update/merge images get fresh ids") {
    val dir = tmp("graft_rt2")
    DeltaWrite.create(spark,
      (0L until 30L).map(i => (i, s"v$i")).toDF("id", "v").repartition(3), dir)
    DeltaWrite.enableRowTracking(spark, dir)
    val before = idsByKey(dir)

    val n = DeltaWrite.deleteWhereDV(spark, dir, col("id") % 3 === 0)
    assert(n == 10)
    val after = idsByKey(dir)
    assert(after.size == 20)
    after.foreach { case (k, id) =>
      assert(before(k) == id, s"surviving row $k must keep its id") }

    // updateWhereDV: the image is a NEW row to row tracking (fresh id),
    // survivors keep theirs — the documented unpreserved-update mode
    val u = DeltaWrite.updateWhereDV(spark, dir, col("id") === 1L,
      Seq("v" -> lit("updated")))
    assert(u == 1)
    val afterU = idsByKey(dir)
    assert(afterU.size == 20)
    assert(afterU(1L) != before(1L), "image row carries a fresh id")
    assert(afterU(1L) > after.values.max - 1, "fresh id from above the watermark")
    (after.keySet - 1L).foreach { k =>
      assert(afterU(k) == after(k), s"non-updated row $k must keep its id") }
    val vRow = DeltaWrite.readWithRowIds(spark, dir)
      .filter(col("id") === 1L).select("v").head().getString(0)
    assert(vRow == "updated")
  }

  test("compact preserves ids by materializing; new files get fresh baseRowIds") {
    val dir = tmp("graft_rt3")
    DeltaWrite.create(spark,
      (0L until 40L).map(i => (i, s"v$i")).toDF("id", "v").repartition(8), dir)
    DeltaWrite.enableRowTracking(spark, dir)
    DeltaWrite.append(spark,
      (100L until 120L).map(i => (i, s"v$i")).toDF("id", "v").repartition(4), dir)
    val before = idsByKey(dir)

    DeltaWrite.compact(spark, dir, smallFileBytes = 1L << 20, targetFiles = 1)
    val after = idsByKey(dir)
    assert(after == before,
      "compaction must not re-identify any row (materialized ids win)")

    // the rewritten add carries a FRESH baseRowId (protocol: every new
    // file gets one) — read the log to prove the stamp + watermark grew
    val log = new java.io.File(dir + "/_delta_log")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val lastCommit = log.listFiles().filter(_.getName.matches("\\d{20}\\.json"))
      .sortBy(_.getName).last
    val lines = scala.io.Source.fromFile(lastCommit, "UTF-8").getLines().toList
    val adds = lines.map(mapper.readTree).filter(_.has("add")).map(_.get("add"))
    assert(adds.nonEmpty, "compaction commit re-adds the merged file")
    adds.foreach { a =>
      assert(a.has("baseRowId") && !a.get("baseRowId").isNull,
        "compacted output files must be stamped") }
    val hwmLine = lines.map(mapper.readTree)
      .filter(_.has("domainMetadata")).map(_.get("domainMetadata"))
      .filter(_.get("domain").asText() == "delta.rowTracking")
    assert(hwmLine.nonEmpty, "compaction commit bumps the high watermark")

    // a second compaction round still preserves (materialized values
    // coalesce over re-materialization)
    DeltaWrite.append(spark,
      (200L until 210L).map(i => (i, s"v$i")).toDF("id", "v").repartition(2), dir)
    DeltaWrite.compact(spark, dir, smallFileBytes = 1L << 20, targetFiles = 1)
    val after2 = idsByKey(dir)
    before.foreach { case (k, id) => assert(after2(k) == id,
      s"row $k re-identified by the second compaction") }
  }

  test("ids survive checkpointing (baseRowId + watermark in the checkpoint)") {
    val dir = tmp("graft_rt4")
    DeltaWrite.create(spark,
      (0L until 10L).map(i => (i, s"v$i")).toDF("id", "v").repartition(2), dir)
    DeltaWrite.enableRowTracking(spark, dir)
    val before = idsByKey(dir)
    DeltaWrite.checkpoint(spark, dir)
    // appends after the checkpoint must keep allocating ABOVE the
    // watermark the checkpoint carries
    DeltaWrite.append(spark, Seq((100L, "x")).toDF("id", "v"), dir)
    val after = idsByKey(dir)
    before.foreach { case (k, id) => assert(after(k) == id) }
    assert(after(100L) >= 10L, "watermark must survive the checkpoint")
    assert(after.values.toSeq.distinct.size == after.size)
  }

  test("id-breaking paths refuse loudly; reader demands enablement") {
    val dir = tmp("graft_rt5")
    DeltaWrite.create(spark,
      (0L until 10L).map(i => (i, s"v$i")).toDF("id", "v"), dir)

    val eNo = intercept[IllegalArgumentException](
      DeltaWrite.readWithRowIds(spark, dir))
    assert(eNo.getMessage.contains("not enabled"))

    DeltaWrite.enableRowTracking(spark, dir)
    def refuses(op: => Any, name: String): Unit = {
      val e = intercept[IllegalArgumentException](op)
      assert(e.getMessage.contains("row-tracked"), s"$name must refuse: ${e.getMessage}")
    }
    refuses(DeltaWrite.deleteWhere(spark, dir, col("id") === 1L), "deleteWhere")
    refuses(DeltaWrite.updateWhere(spark, dir, col("id") === 1L,
      Seq("v" -> lit("x"))), "updateWhere")
    refuses(DeltaWrite.merge(spark, dir,
      Seq((1L, "x")).toDF("id", "v"), Seq("id")), "merge")
    refuses(DeltaWrite.restore(spark, dir, 0L), "restore")
    refuses(DeltaWrite.purge(spark, dir), "purge")
    refuses(DeltaWrite.cloneShallow(spark, dir, tmp("graft_rt5_clone")), "cloneShallow")
  }

  test("plain DeltaScan.read still reads row-tracked tables (ids are opt-in)") {
    val dir = tmp("graft_rt6")
    val df = (0L until 25L).map(i => (i, s"v$i")).toDF("id", "v")
    DeltaWrite.create(spark, df.repartition(5), dir)
    DeltaWrite.enableRowTracking(spark, dir)
    DeltaWrite.compact(spark, dir, smallFileBytes = 1L << 20, targetFiles = 1)
    // the compacted files carry hidden materialized columns — the plain
    // reader must project exactly the table schema regardless
    val got = DeltaScan.read(spark, dir)
    assert(got.columns.toSeq == Seq("id", "v"))
    assert(got.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
  }
}
