package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.operators.Rollup
import graft.sources.{DeltaScan, DeltaWrite}

/** Incrementally-maintained rollups: bit-parity with a full recompute,
  * increment-only reads (proven by deleting the old data files),
  * compaction transparency, and the loud-failure contracts. */
class RollupSpec extends SparkSpec {

  import spark.implicits._

  private def docs(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, s"lang${i % 3}", i * 10 + 1)).toDF("id", "lang", "chars")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rollupRows(path: String): Seq[(String, Long, java.math.BigDecimal)] =
    Rollup.read(spark, path)
      .select("lang", "n_rows", "sum_chars")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
      .sortBy(_._1).toSeq

  test("incremental maintain is bit-identical to a full recompute") {
    val corpus = tmp("rollup_corpus"); val roll = tmp("rollup") + "/r"
    DeltaWrite.create(spark, docs(0, 100), corpus)
    Rollup.build(spark, corpus, roll, Seq("lang"), Seq("chars"))
    DeltaWrite.append(spark, docs(100, 250), corpus)
    DeltaWrite.append(spark, docs(250, 300), corpus)
    Rollup.maintain(spark, corpus, roll)
    val full = tmp("rollup") + "/full"
    Rollup.build(spark, corpus, full, Seq("lang"), Seq("chars"))
    assert(rollupRows(roll) === rollupRows(full))
    assert(Rollup.corpusVersion(spark, roll) === DeltaScan.latestVersion(spark, corpus))
  }

  test("maintain reads ONLY the increment: old data files can be gone") {
    val corpus = tmp("rollup_corpus"); val roll = tmp("rollup") + "/r"
    DeltaWrite.create(spark, docs(0, 100), corpus)
    Rollup.build(spark, corpus, roll, Seq("lang"), Seq("chars"))
    // capture the v0 data files, then delete them from disk — a full
    // rescan would now fail; the increment-only maintain must not care
    val v0Files = DeltaScan.changedAddsBetween(spark, corpus, -1L, 0L)
    assert(v0Files.nonEmpty)
    DeltaWrite.append(spark, docs(100, 150), corpus)
    val fs = new Path(corpus).getFileSystem(spark.sparkContext.hadoopConfiguration)
    v0Files.foreach(f => assert(fs.delete(new Path(f), false)))
    Rollup.maintain(spark, corpus, roll)
    val expected = docs(0, 150).groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(col("chars").cast("decimal(38,6)")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).sortBy(_._1).toSeq
    assert(rollupRows(roll) === expected)
  }

  test("maintain at the current version is an idempotent no-op") {
    val corpus = tmp("rollup_corpus"); val roll = tmp("rollup") + "/r"
    DeltaWrite.create(spark, docs(0, 50), corpus)
    Rollup.build(spark, corpus, roll, Seq("lang"), Seq("chars"))
    val before = rollupRows(roll)
    Rollup.maintain(spark, corpus, roll)
    Rollup.maintain(spark, corpus, roll)
    assert(rollupRows(roll) === before)
  }

  test("compaction (dataChange=false) does not double-count") {
    val corpus = tmp("rollup_corpus"); val roll = tmp("rollup") + "/r"
    DeltaWrite.create(spark, docs(0, 60), corpus)
    Rollup.build(spark, corpus, roll, Seq("lang"), Seq("chars"))
    DeltaWrite.append(spark, docs(60, 90), corpus)
    DeltaWrite.compact(spark, corpus)
    Rollup.maintain(spark, corpus, roll)
    val expected = docs(0, 90).groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(col("chars").cast("decimal(38,6)")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).sortBy(_._1).toSeq
    assert(rollupRows(roll) === expected)
  }

  test("a data-changing remove in the range fails loudly") {
    val corpus = tmp("rollup_corpus"); val roll = tmp("rollup") + "/r"
    DeltaWrite.create(spark, docs(0, 40), corpus)
    Rollup.build(spark, corpus, roll, Seq("lang"), Seq("chars"))
    // hand-write a real delete commit (dataChange=true remove)
    val rel = DeltaScan.changedAddsBetween(spark, corpus, -1L, 0L).head
      .split('/').last
    java.nio.file.Files.write(
      java.nio.file.Paths.get(corpus, "_delta_log", f"${1L}%020d.json"),
      (s"""{"remove":{"path":"$rel","deletionTimestamp":1,"dataChange":true}}""" + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val e = intercept[IllegalArgumentException] {
      Rollup.maintain(spark, corpus, roll)
    }
    assert(e.getMessage.contains("data-changing removes"))
  }

  test("racing maintainers: the loser's conditional commit fails loudly") {
    val corpus = tmp("rollup_corpus"); val roll = tmp("rollup") + "/r"
    DeltaWrite.create(spark, docs(0, 30), corpus)
    Rollup.build(spark, corpus, roll, Seq("lang"), Seq("chars"))
    // two maintainers both target rollup version 1: the second create
    // of commit-1.json must throw, never clobber (commitAt = the seam
    // for the version race, same as DeltaWrite's)
    val rows = Rollup.read(spark, roll)
    Rollup.commitAt(spark, roll, 1L, rows, 1L, Seq("lang"), Seq("chars"))
    intercept[java.util.ConcurrentModificationException] {
      Rollup.commitAt(spark, roll, 1L, rows, 1L, Seq("lang"), Seq("chars"))
    }
  }

  test("mergeable HLL distinct counts: incremental union matches full rebuild and exact counts") {
    val corpus = tmp("rollup_corpus"); val roll = tmp("rollup") + "/r"
    // ids overlap across batches: distinct(chars) per lang exercises the
    // union (sum of per-batch distincts would over-count)
    val b1 = docs(0, 120); val b2 = docs(60, 200)
    DeltaWrite.create(spark, b1, corpus)
    Rollup.build(spark, corpus, roll, Seq("lang"), Nil, distinctCols = Seq("chars"))
    DeltaWrite.append(spark, b2, corpus)
    Rollup.maintain(spark, corpus, roll)
    val got = Rollup.readEstimates(spark, roll)
      .select("lang", "nd_chars").collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue)).sortBy(_._1).toSeq
    // exact reference: sparse-mode HLL is lossless at these cardinalities
    val exact = b1.union(b2).groupBy("lang")
      .agg(countDistinct("chars").as("nd")).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got === exact)
    // and the incrementally-unioned estimates equal a from-scratch build
    val full = tmp("rollup") + "/full"
    Rollup.build(spark, corpus, full, Seq("lang"), Nil, distinctCols = Seq("chars"))
    val fullEst = Rollup.readEstimates(spark, full)
      .select("lang", "nd_chars").collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue)).sortBy(_._1).toSeq
    assert(got === fullEst)
  }

  test("build refuses an existing rollup; maintain refuses a missing one") {
    val corpus = tmp("rollup_corpus"); val roll = tmp("rollup") + "/r"
    DeltaWrite.create(spark, docs(0, 10), corpus)
    Rollup.build(spark, corpus, roll, Seq("lang"), Seq("chars"))
    assert(intercept[IllegalArgumentException] {
      Rollup.build(spark, corpus, roll, Seq("lang"), Seq("chars"))
    }.getMessage.contains("already exists"))
    assert(intercept[IllegalArgumentException] {
      Rollup.maintain(spark, corpus, tmp("rollup") + "/nope")
    }.getMessage.contains("no rollup"))
  }
}
