package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.sources.{DeltaScan, DeltaWrite, ParquetStats}

/** Delta DATA SKIPPING: per-file footer stats written by [[DeltaWrite]]
  * and consumed by [[DeltaScan.read]]'s `skippingFilter`. The central
  * proof is physical: data files the stats prove irrelevant are
  * DELETED from disk and the filtered read still succeeds — the scan
  * can only have worked by never planning those files. */
class DeltaSkipSpec extends SparkSpec {
  import spark.implicits._

  /** id-range-clustered table: 4 files covering [0,25),[25,50),[50,75),[75,100) */
  private def rangedTable(): String = {
    val base = Files.createTempDirectory("graft_skip").toString
    val df = spark.range(0, 100)
      .select(col("id"),
        (col("id") * 2).as("v"),
        concat(lit("s"), format_string("%03d", col("id"))).as("s"),
        when(col("id") < 50, col("id").cast("double")).as("d"))
      .repartitionByRange(4, col("id"))
    DeltaWrite.create(spark, df, base)
    base
  }

  private def dataFiles(base: String): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    Files.walk(Paths.get(base)).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && !p.toString.contains("_delta_log"))
      .toSeq
  }

  test("skipping filter returns exactly filter() semantics") {
    val base = rangedTable()
    val got = DeltaScan.read(spark, base,
        skippingFilter = Some(col("id") >= 30 && col("id") < 40))
      .orderBy("id").select("id", "v").as[(Long, Long)].collect()
    assert(got.toSeq == (30L until 40L).map(i => (i, i * 2)))
  }

  test("pruned files are physically unnecessary: delete them, read still works") {
    val base = rangedTable()
    val all = dataFiles(base)
    assert(all.size == 4, s"expected 4 range files, got ${all.size}")
    // keep only files whose stats admit id in [0, 25): delete the rest
    val conf = spark.sparkContext.hadoopConfiguration
    val tblSchema = DeltaScan.read(spark, base).schema
    val doomed = all.filter { p =>
      val st = ParquetStats.statsJson(conf, new org.apache.hadoop.fs.Path(p.toString))
        .flatMap(ParquetStats.parse)
      !ParquetStats.mayMatch(st, graft.sources.ParquetStats.predicateExpr(spark, tblSchema, col("id") < 25))
    }
    assert(doomed.size == 3, s"stats should rule out 3 of 4 files, ruled out ${doomed.size}")
    doomed.foreach(Files.delete)
    val got = DeltaScan.read(spark, base, skippingFilter = Some(col("id") < 25))
      .orderBy("id").select("id").as[Long].collect()
    assert(got.toSeq == (0L until 25L))
    // and without the filter the table is genuinely broken — proves the
    // deleted files were load-bearing for a full scan
    intercept[Exception] {
      DeltaScan.read(spark, base).count()
    }
  }

  test("string and double bounds prune; conservative on missing stats") {
    val base = rangedTable()
    // strings: s075..s099 live in the last file only
    val gotS = DeltaScan.read(spark, base, skippingFilter = Some(col("s") >= "s090"))
      .orderBy("id").select("id").as[Long].collect()
    assert(gotS.toSeq == (90L until 100L))
    // doubles: d is null for id >= 50 — IS NOT NULL + range
    val gotD = DeltaScan.read(spark, base,
        skippingFilter = Some(col("d").isNotNull && col("d") > lit(47.0)))
      .orderBy("id").select("id").as[Long].collect()
    assert(gotD.toSeq == Seq(48L, 49L))
  }

  test("all-null column stats prune equality; IS NULL keeps null-free files out") {
    val base = rangedTable()
    // files 3 and 4 (id >= 50) have d entirely null → d = 10.0 can't match there;
    // prove by checking the pruner directly on their stats
    val conf = spark.sparkContext.hadoopConfiguration
    val tblSchema = DeltaScan.read(spark, base).schema
    val byFile = dataFiles(base).map { p =>
      val st = ParquetStats.statsJson(conf, new org.apache.hadoop.fs.Path(p.toString))
        .flatMap(ParquetStats.parse)
      (st.get.min.get("id"), ParquetStats.mayMatch(st, graft.sources.ParquetStats.predicateExpr(spark, tblSchema, col("d") === 10.0)),
        ParquetStats.mayMatch(st, graft.sources.ParquetStats.predicateExpr(spark, tblSchema, col("d").isNull)))
    }
    byFile.foreach { case (minId, eqKeeps, nullKeeps) =>
      val lowFile = minId.exists(_.asInstanceOf[java.math.BigDecimal].longValue < 50)
      if (lowFile) assert(nullKeeps == false, "null-free file must not survive IS NULL")
      else assert(eqKeeps == false, "all-null file must not survive d = 10.0")
    }
  }

  test("stats survive compaction and checkpointing") {
    val base = Files.createTempDirectory("graft_skip_cp").toString
    DeltaWrite.create(spark, spark.range(0, 10).toDF("id"), base)
    DeltaWrite.append(spark, spark.range(10, 20).toDF("id"), base)
    DeltaWrite.append(spark, spark.range(20, 30).toDF("id"), base)
    DeltaWrite.compact(spark, base)
    DeltaWrite.checkpoint(spark, base)
    // truncate the JSON log to its tail: replay must come from the
    // checkpoint (plus the checkpoint-version commit, per convention)
    import scala.jdk.CollectionConverters._
    val jsons = Files.list(Paths.get(base, "_delta_log")).iterator().asScala
      .filter(_.toString.endsWith(".json")).toSeq.sortBy(_.toString)
    jsons.dropRight(1).foreach(Files.delete)
    val got = DeltaScan.read(spark, base, skippingFilter = Some(col("id") < 5))
      .orderBy("id").select("id").as[Long].collect()
    assert(got.toSeq == (0L until 5L))
    // checkpointed adds still carry stats: an impossible predicate
    // must prune every file (empty result, no scan error even if we
    // delete all data files first)
    dataFiles(base).foreach(Files.delete)
    val none = DeltaScan.read(spark, base, skippingFilter = Some(col("id") > 1000))
      .collect()
    assert(none.isEmpty)
  }

  test("unsupported predicate shapes keep all files (conservative)") {
    val base = rangedTable()
    val got = DeltaScan.read(spark, base,
        skippingFilter = Some((col("id") % 10) === 3))
      .orderBy("id").select("id").as[Long].collect()
    assert(got.toSeq == (0L until 100L).filter(_ % 10 == 3))
  }

  test("IN list and timestamp-free mixed conjunction prune correctly") {
    val base = rangedTable()
    val got = DeltaScan.read(spark, base,
        skippingFilter = Some(col("id").isin(3L, 97L) && col("v") >= 0))
      .orderBy("id").select("id").as[Long].collect()
    assert(got.toSeq == Seq(3L, 97L))
    // pruner keeps exactly the first and last range files for the IN
    val conf = spark.sparkContext.hadoopConfiguration
    val tblSchema = DeltaScan.read(spark, base).schema
    val kept = dataFiles(base).count { p =>
      val st = ParquetStats.statsJson(conf, new org.apache.hadoop.fs.Path(p.toString))
        .flatMap(ParquetStats.parse)
      ParquetStats.mayMatch(st, graft.sources.ParquetStats.predicateExpr(spark, tblSchema, col("id").isin(3L, 97L)))
    }
    assert(kept == 2, s"IN(3,97) should keep 2 of 4 range files, kept $kept")
  }
}
