package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.DeltaScan

/** Incrementally-maintained aggregate tables ("materialized rollups")
  * over an append-only Delta corpus — the daily-ingest companion of
  * [[Pipelines.ingestIncrement]]: per-key doc counts and exact sums
  * that a 100 TB pipeline keeps current WITHOUT rescanning the corpus.
  *
  * Maintenance cost is proportional to the INCREMENT, not the table:
  * `maintain` reads only the parquet files added since the rollup's
  * recorded corpus version ([[DeltaScan.changedAddsBetween]] — the
  * protocol's `dataChange` flag keeps compaction swaps out), aggregates
  * them (one shuffle over increment-sized data), and merges with the
  * bounded existing rollup. Sums run in DECIMAL(38,6) — exact,
  * order-independent, externally reproducible — so an incrementally
  * maintained rollup is BIT-IDENTICAL to a full recompute (the hash
  * gate proves it against a from-scratch oracle).
  *
  * Storage layout (versioned, conditional-commit — the [[
  * graft.sources.DeltaWrite]] race discipline): `v<N>/` rollup rows as
  * parquet, then `commit-<N>.json` (created with overwrite=false; a
  * racing maintainer gets ConcurrentModificationException) recording
  * the corpus version + spec. Readers take the highest committed N.
  * Non-delete maintenance guarantees: a data-changing REMOVE in the
  * corpus range fails loudly — rebuild with [[build]] instead.
  */
object Rollup {

  /** one rollup row set: keys..., n_rows, sum_<col>… (decimal 38,6),
    * nd_<col>_sketch… (Datasketches HLL binary — the MERGEABLE distinct
    * count: a plain COUNT(DISTINCT) cannot be maintained incrementally,
    * a sketch unions in O(k)) */
  private def aggregateRows(
      df: DataFrame, keyCols: Seq[String], sumCols: Seq[String],
      distinctCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sumCols.map(c =>
          sum(col(c).cast("decimal(38,6)")).as(s"sum_$c")) ++
        distinctCols.map(c =>
          expr(s"hll_sketch_agg($c)").as(s"nd_${c}_sketch")): _*)

  /** merge two row sets of the aggregate schema (sums exact: long +
    * decimal; distinct sketches union losslessly in sparse mode and
    * within the standard HLL error beyond it) */
  private def merge(
      a: DataFrame, b: DataFrame, keyCols: Seq[String], sumCols: Seq[String],
      distinctCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keyCols.map(col): _*)
      .agg(sum("n_rows").cast("long").as("n_rows"),
        sumCols.map(c =>
          sum(col(s"sum_$c")).cast("decimal(38,6)").as(s"sum_$c")) ++
        distinctCols.map(c =>
          expr(s"hll_union_agg(nd_${c}_sketch)").as(s"nd_${c}_sketch")): _*)

  /** Full build at the corpus's current version; fails if the rollup
    * already exists (this is the create path — `maintain` advances it). */
  def build(
      spark: SparkSession,
      corpusPath: String,
      rollupPath: String,
      keyCols: Seq[String],
      sumCols: Seq[String],
      distinctCols: Seq[String] = Nil): Unit = {
    require(keyCols.nonEmpty, "rollup needs at least one key column")
    val fs = new Path(rollupPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(committedVersions(fs, new Path(rollupPath)).isEmpty,
      s"rollup already exists at $rollupPath — use maintain")
    val v = DeltaScan.latestVersion(spark, corpusPath)
    val agg = aggregateRows(DeltaScan.read(spark, corpusPath, Some(v)),
      keyCols, sumCols, distinctCols)
    commit(spark, fs, rollupPath, 0L, agg, v, keyCols, sumCols, distinctCols)
  }

  /** Advance the rollup to the corpus's current version by aggregating
    * ONLY the files added since the recorded version. No-op when
    * already current. Racing maintainers: first commit wins, the loser
    * gets ConcurrentModificationException. */
  def maintain(spark: SparkSession, corpusPath: String, rollupPath: String): Unit = {
    val fs = new Path(rollupPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = new Path(rollupPath)
    val prev = committedVersions(fs, root).maxOption.getOrElse(
      throw new IllegalArgumentException(
        s"no rollup at $rollupPath — use build"))
    val (corpusV, keyCols, sumCols, distinctCols) = readMeta(fs, root, prev)
    val nowV = DeltaScan.latestVersion(spark, corpusPath)
    if (nowV == corpusV) return // already current — idempotent
    require(nowV > corpusV,
      s"corpus at $corpusPath is at version $nowV but the rollup recorded " +
        s"$corpusV — the corpus log was rewritten; rebuild the rollup")
    val files = DeltaScan.changedAddsBetween(spark, corpusPath, corpusV, nowV)
    val old = read(spark, rollupPath)
    val next =
      if (files.isEmpty) old // metadata-only commits: just advance the version
      else merge(old,
        aggregateRows(spark.read.parquet(files: _*), keyCols, sumCols, distinctCols),
        keyCols, sumCols, distinctCols)
    commit(spark, fs, rollupPath, prev + 1, next, nowV, keyCols, sumCols, distinctCols)
  }

  /** (recorded corpus version, keyCols, sumCols, distinctCols) of the
    * current rollup — the freshness/shape contract
    * [[graft.plans.RollupRewriteRule]] checks before serving an
    * aggregation from the rollup instead of the corpus. */
  def meta(spark: SparkSession, rollupPath: String): (Long, Seq[String], Seq[String], Seq[String]) = {
    val fs = new Path(rollupPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = new Path(rollupPath)
    val v = committedVersions(fs, root).maxOption.getOrElse(
      throw new IllegalArgumentException(s"no rollup at $rollupPath"))
    readMeta(fs, root, v)
  }

  /** Highest committed rollup version at the path, if any. */
  def currentVersion(spark: SparkSession, rollupPath: String): Option[Long] = {
    val fs = new Path(rollupPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    committedVersions(fs, new Path(rollupPath)).maxOption
  }

  /** Whether a committed rollup exists at the path. */
  def exists(spark: SparkSession, rollupPath: String): Boolean = {
    val fs = new Path(rollupPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    committedVersions(fs, new Path(rollupPath)).nonEmpty
  }

  /** The current rollup rows (highest committed version). */
  def read(spark: SparkSession, rollupPath: String): DataFrame = {
    val fs = new Path(rollupPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = committedVersions(fs, new Path(rollupPath)).maxOption.getOrElse(
      throw new IllegalArgumentException(s"no rollup at $rollupPath"))
    spark.read.parquet(s"$rollupPath/v$v")
  }

  /** The rollup rows with every `nd_<col>_sketch` resolved to its
    * `nd_<col>` BIGINT estimate (sketches stay queryable/mergeable on
    * disk; estimates are the human surface). */
  def readEstimates(spark: SparkSession, rollupPath: String): DataFrame = {
    val fs = new Path(rollupPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = new Path(rollupPath)
    val v = committedVersions(fs, root).maxOption.getOrElse(
      throw new IllegalArgumentException(s"no rollup at $rollupPath"))
    val (_, _, _, distinctCols) = readMeta(fs, root, v)
    distinctCols.foldLeft(read(spark, rollupPath)) { (d, c) =>
      d.withColumn(s"nd_$c", expr(s"hll_sketch_estimate(nd_${c}_sketch)"))
        .drop(s"nd_${c}_sketch")
    }
  }

  /** The corpus version the current rollup reflects. */
  def corpusVersion(spark: SparkSession, rollupPath: String): Long = {
    val fs = new Path(rollupPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = new Path(rollupPath)
    val v = committedVersions(fs, root).maxOption.getOrElse(
      throw new IllegalArgumentException(s"no rollup at $rollupPath"))
    readMeta(fs, root, v)._1
  }

  // ---- versioned conditional-commit storage ------------------------------

  /** test seam for the conditional-commit guard: commit at an explicit
    * rollup version (the race is two maintainers picking the same one) */
  private[graft] def commitAt(
      spark: SparkSession,
      rollupPath: String,
      version: Long,
      rows: DataFrame,
      corpusVersion: Long,
      keyCols: Seq[String],
      sumCols: Seq[String]): Unit = {
    val fs = new Path(rollupPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    commit(spark, fs, rollupPath, version, rows, corpusVersion, keyCols, sumCols, Nil)
  }

  private def commit(
      spark: SparkSession,
      fs: FileSystem,
      rollupPath: String,
      version: Long,
      rows: DataFrame,
      corpusVersion: Long,
      keyCols: Seq[String],
      sumCols: Seq[String],
      distinctCols: Seq[String]): Unit = {
    // data first, marker last: a crash between the two leaves an
    // uncommitted dir that the next maintain overwrites
    rows.write.mode("overwrite").parquet(s"$rollupPath/v$version")
    def jarr(xs: Seq[String]) =
      xs.map(x => "\"" + x.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
        .mkString("[", ",", "]")
    val meta = s"""{"corpus_version":$corpusVersion,""" +
      s""""keys":${jarr(keyCols)},"sums":${jarr(sumCols)},""" +
      s""""distincts":${jarr(distinctCols)}}"""
    val marker = new Path(rollupPath, s"commit-$version.json")
    val out =
      try fs.create(marker, false)
      catch {
        case e: java.io.IOException =>
          throw new java.util.ConcurrentModificationException(
            s"concurrent rollup commit detected: $marker already exists — " +
              "another maintainer committed this version; re-read and retry", e)
      }
    try out.write(meta.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  private def committedVersions(fs: FileSystem, root: Path): Seq[Long] = {
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq.map(_.getPath.getName)
      .collect { case n if n.matches("commit-\\d+\\.json") =>
        n.stripPrefix("commit-").stripSuffix(".json").toLong }
      .sorted
  }

  private def readMeta(
      fs: FileSystem, root: Path, version: Long)
      : (Long, Seq[String], Seq[String], Seq[String]) = {
    val in = fs.open(new Path(root, s"commit-$version.json"))
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
    import scala.jdk.CollectionConverters._
    def arr(k: String): Seq[String] = Option(node.get(k))
      .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
    (node.get("corpus_version").asLong(), arr("keys"), arr("sums"), arr("distincts"))
  }
}
