package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-order-up benchmark (VERDICT r7 item 7): the 10 most expensive
  * headline shapes from BENCH_DETAIL, run at a synthesized ~sf1 (10x
  * the sf0.1 fixtures) to expose shuffle/skew behavior the 600k-row
  * scale hides.
  *
  * Synthesis: 10 key-offset copies of each input table, written ONCE
  * to `SPARK_GRAFT_SF1_DIR` (default /tmp/graft_sf1) and reused across
  * runs. Keys are offset per copy so joins/graphs scale as 10 disjoint
  * replicas (component structure preserved, volume 10x); text and
  * embeddings are deterministically perturbed per copy so the dedup
  * shapes see realistic near-duplicates instead of a pathological
  * 10-way exact-duplicate cluster on every row.
  *
  * Output: ONE JSON line + BENCH_SF1.json — per query, seconds at
  * sf0.1 and sf1, the per-row cost ratio `sf1 / (10 * sf0.1)`, any
  * PlanLint findings on the sf1 plan, and an `audit` flag when the
  * per-row ratio exceeds 2 (the VERDICT threshold for a plan audit
  * note). Fixed commit/job latency (the lakehouse DML shapes) makes
  * sub-1 ratios EXPECTED there; a >2 ratio means the plan stopped
  * scaling linearly.
  */
object BenchSf1 {

  /** the 10 most expensive rows of BENCH_DETAIL r8, plus (round 9)
    * the hidden-partitioning gate and the bucket-aligned join — the
    * two new layout levers must hold one order up */
  private val top = Seq(
    "q_ingest_neardup", "q_pagerank", "q_profile_sketch",
    "q_iceberg_part_dml", "q_harmonic", "q_pipeline_clean",
    "q_pipeline_prepare", "q_dedup_semantic", "q_simjoin", "q_delta_cdf",
    "q_iceberg_transform", "q_bucket_join", "q_delta_transform",
    // round 10: spec evolution proven one order up (r9 proved it only
    // at gate scale) — the mixed-layout read must keep pruning and
    // stay linear when the pre/post-evolution file sets are 10x
    "q_iceberg_spec_evolve",
    // round 10: the v3 deletion-vector lifecycle (parquet deletes →
    // upgrade conversion → DV delete with supersede) must stay linear
    // when victims span 10x the files — DV staging is one shuffle by
    // victim file + executor-side Puffin writes, never a driver fold
    "q_iceberg_dv",
    // round 10, extension: metadata-only aggregates must stay
    // O(metadata) one order up (the ratio ~0 is the point); the CDF
    // write + feed read and the medallion apply must scale with the
    // CHANGED rows, not the table
    "q_meta_agg", "q_delta_cdf_files", "q_delta_cdc_apply")

  private val Copies = 10

  private def synthesize(spark: SparkSession, sf01: String, out: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // per-table guards: a synth dir from an earlier round back-fills
    // only the tables it lacks
    def need(name: String): Boolean =
      !fs.exists(new org.apache.hadoop.fs.Path(out, s"$name/_SUCCESS"))

    def copies(df: DataFrame, f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until Copies).map(i => f(df, i)).reduce(_ unionByName _)

    if (need("documents.parquet")) {
      System.err.println(s"[bench-sf1] synthesizing ${Copies}x documents into $out")
      val docs = spark.read.parquet(s"$sf01/documents.parquet")
      copies(docs, (d, i) => d
        .withColumn("doc_id", col("doc_id") + lit(i.toLong * 10_000_000L))
        // perturb text per copy (i>0): near-dup structure, not exact clones
        .withColumn("text",
          if (i == 0) col("text") else concat(col("text"), lit(s" c$i"))))
        .repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")
    }

    if (need("embeddings.parquet")) {
      val emb = spark.read.parquet(s"$sf01/embeddings.parquet")
      copies(emb, (d, i) => d
        .withColumn("vec_id", col("vec_id") + lit(i.toLong * 10_000_000L))
        .withColumn("embedding",
          if (i == 0) col("embedding")
          else transform(col("embedding"),
            (x, j) => (x + cos(col("vec_id") * (j + lit(1))) * lit(0.01)).cast("float"))))
        .repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    }

    if (need("lineitem.parquet")) {
      val li = spark.read.parquet(s"$sf01/lineitem.parquet")
      copies(li, (d, i) => d
        .withColumn("l_orderkey", col("l_orderkey") + lit(i.toLong * 100_000_000L))
        .withColumn("l_partkey", col("l_partkey") + lit(i.toLong * 100_000_000L))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i.toLong * 100_000_000L)))
        .repartition(32).write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    }

    if (need("events.parquet")) {
      val ev = spark.read.parquet(s"$sf01/events.parquet")
      copies(ev, (d, i) => d
        .withColumn("event_id", col("event_id") + lit(i.toLong * 100_000_000L)))
        .repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")
    }

    // the bucket-join shape needs both sides; keys offset IN STEP so
    // each copy's orders join its own copy's customers (structure
    // preserved, volume 10x)
    if (need("orders.parquet")) {
      val o = spark.read.parquet(s"$sf01/orders.parquet")
      copies(o, (d, i) => d
        .withColumn("o_orderkey", col("o_orderkey") + lit(i.toLong * 100_000_000L))
        .withColumn("o_custkey", col("o_custkey") + lit(i.toLong * 100_000_000L)))
        .repartition(32).write.mode("overwrite").parquet(s"$out/orders.parquet")
    }
    if (need("customer.parquet")) {
      val c = spark.read.parquet(s"$sf01/customer.parquet")
      copies(c, (d, i) => d
        .withColumn("c_custkey", col("c_custkey") + lit(i.toLong * 100_000_000L)))
        .repartition(32).write.mode("overwrite").parquet(s"$out/customer.parquet")
    }
  }

  /** round-9 pruning assertion one order up: a ONE-DAY source filter
    * on an sf1 transform-partitioned events table must plan a small
    * fraction of the files (events span ~30 days) — file skipping is
    * the whole point of hidden partitioning, and it must not decay
    * with volume. Returns (filesTotal, filesPlanned). */
  private def transformSkipProbe(spark: SparkSession, sf1: String): (Int, Int) = {
    import graft.sources.{IcebergScan, IcebergWrite}
    val base = s"$sf1/_transform_probe/t"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(base, "metadata/version-hint.text"))) {
      val ev = spark.read.parquet(s"$sf1/events.parquet")
        .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
          col("user_id"), col("event_type"))
      IcebergWrite.create(spark, ev, base,
        partitionBy = Seq("day(ts)", "bucket(8, user_id)"))
    }
    val all = IcebergScan.read(spark, base).inputFiles.length
    val day = IcebergScan.read(spark, base, skippingFilter = Some(
      col("ts") >= to_timestamp(lit("2024-01-10 00:00:00")) &&
        col("ts") < to_timestamp(lit("2024-01-11 00:00:00")))).inputFiles.length
    require(day > 0 && day.toDouble / all < 0.2,
      s"sf1 transform pruning decayed: planned $day of $all files for a one-day filter")
    (all, day)
  }

  /** round-11 pruning assertion one order up: a 100-key dim domain
    * over an sf1 range-clustered fact must plan a small fraction of
    * the fact's files — runtime join pruning (the DPP analogue for
    * path-addressed scans) must not decay with volume. Returns
    * (filesTotal, filesKept). */
  private def runtimePruneProbe(spark: SparkSession, sf1: String): (Int, Int) = {
    import graft.sources.{CboJoin, IcebergWrite}
    val base = s"$sf1/_rtprune_probe"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // BOTH tables must exist to reuse — a run interrupted between the
    // two creates must rebuild, not wedge every later bench
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$base/f/metadata/version-hint.text")) ||
        !fs.exists(new org.apache.hadoop.fs.Path(s"$base/d/metadata/version-hint.text"))) {
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val ev = spark.read.parquet(s"$sf1/events.parquet")
        .select(col("event_id"), col("user_id"), col("event_type"))
        .repartitionByRange(64, col("event_id"))
      IcebergWrite.create(spark, ev, s"$base/f")
      val ids = spark.read.parquet(s"$sf1/events.parquet")
        .select(col("event_id").as("eid")).orderBy("eid").limit(100)
      IcebergWrite.create(spark, ids, s"$base/d")
    }
    val (df, d) = CboJoin.planPruned(spark, s"$base/f", s"$base/d",
      Seq("event_id" -> "eid"))
    val m = "kept (\\d+)/(\\d+)".r.findFirstMatchIn(d.reason).getOrElse(
      throw new IllegalStateException(s"no file counts in '${d.reason}'"))
    val (kept, total) = (m.group(1).toInt, m.group(2).toInt)
    require(df.count() == 100L,
      s"runtime-pruned probe join returned ${df.count()} rows, expected 100")
    require(kept > 0 && kept.toDouble / total < 0.2,
      s"sf1 runtime pruning decayed: kept $kept of $total fact files for " +
        "a 100-key one-range dim domain")
    (total, kept)
  }

  /** the DELTA twin of [[runtimePruneProbe]] — add-file stats prune
    * the same shape, same bound. Returns (filesTotal, filesKept). */
  private def runtimePruneProbeDelta(spark: SparkSession, sf1: String): (Int, Int) = {
    import graft.sources.{CboJoin, DeltaWrite, IcebergWrite}
    val base = s"$sf1/_rtprune_probe_delta"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // BOTH tables must exist to reuse (see runtimePruneProbe)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$base/f/_delta_log")) ||
        !fs.exists(new org.apache.hadoop.fs.Path(s"$base/d/metadata/version-hint.text"))) {
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val ev = spark.read.parquet(s"$sf1/events.parquet")
        .select(col("event_id"), col("user_id"), col("event_type"))
        .repartitionByRange(64, col("event_id"))
      DeltaWrite.create(spark, ev, s"$base/f")
      val ids = spark.read.parquet(s"$sf1/events.parquet")
        .select(col("event_id").as("eid")).orderBy("eid").limit(100)
      IcebergWrite.create(spark, ids, s"$base/d")
    }
    val (df, d) = CboJoin.planPruned(spark, s"$base/f", s"$base/d",
      Seq("event_id" -> "eid"))
    val m = "kept (\\d+)/(\\d+)".r.findFirstMatchIn(d.reason).getOrElse(
      throw new IllegalStateException(s"no file counts in '${d.reason}'"))
    val (kept, total) = (m.group(1).toInt, m.group(2).toInt)
    require(df.count() == 100L,
      s"Delta runtime-pruned probe returned ${df.count()} rows, expected 100")
    require(kept > 0 && kept.toDouble / total < 0.2,
      s"sf1 Delta runtime pruning decayed: kept $kept of $total fact files")
    (total, kept)
  }

  private def timeOne(spark: SparkSession, name: String, dir: String): Double = {
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir).count()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sf01 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sf1 = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    synthesize(spark, sf01, sf1)

    // warm codegen/JIT on the smallest SF, as graft.Bench does
    top.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }

    // min-of-`reps` SUITE-MAJOR passes per scale + the stall probe +
    // host calibration, exactly like graft.Bench: the committed ratio
    // must demonstrate the scaling claim, not a host stall phase
    // (round-10's q_dedup_semantic record was stall-inflated and the
    // artifact could not say so)
    Bench.startStallProbe()
    val calStart = Bench.calibrationKernel()
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    def minTimes(dir: String): Map[String, Double] = {
      val acc = scala.collection.mutable.Map.empty[String, Double]
      (1 to reps).foreach { _ =>
        top.foreach { name =>
          val t = timeOne(spark, name, dir)
          acc(name) = math.min(t, acc.getOrElse(name, Double.MaxValue))
        }
      }
      acc.toMap
    }
    val t01m = minTimes(sf01)
    val t1m = minTimes(sf1)
    val rows = top.map { name =>
      val t01 = t01m(name); val t1 = t1m(name)
      val lint = try graft.tools.PlanLint.lint(SparkEntry.queries(name)(spark, sf1))
        .map(f => s"${f.rule}@${f.node}") catch { case _: Throwable => Seq.empty[String] }
      val ratio = t1 / (Copies * t01)
      System.err.println(f"[bench-sf1] $name%-22s sf0.1=$t01%6.2fs sf1=$t1%7.2fs " +
        f"per-row-ratio=$ratio%5.2f${if (ratio > 2.0) "  AUDIT" else ""}" +
        (if (lint.nonEmpty) s"  lint=${lint.mkString(";")}" else ""))
      (name, t01, t1, ratio, lint)
    }
    val calSec = math.min(calStart, Bench.calibrationKernel())

    // transform pruning must hold at sf1 — loud require + recorded ratio
    val (skipAll, skipDay) = transformSkipProbe(spark, sf1)
    System.err.println(f"[bench-sf1] transform skip probe: one-day filter plans " +
      f"$skipDay of $skipAll files (${skipDay.toDouble / skipAll}%.3f)")

    // runtime join pruning must hold at sf1 too — same contract
    val (pruneAll, pruneKept) = runtimePruneProbe(spark, sf1)
    System.err.println(f"[bench-sf1] runtime prune probe: 100-key dim domain keeps " +
      f"$pruneKept of $pruneAll fact files (${pruneKept.toDouble / pruneAll}%.3f)")
    val (pruneAllD, pruneKeptD) = runtimePruneProbeDelta(spark, sf1)
    System.err.println(f"[bench-sf1] delta runtime prune probe: keeps " +
      f"$pruneKeptD of $pruneAllD fact files (${pruneKeptD.toDouble / pruneAllD}%.3f)")

    def j(rs: Seq[(String, Double, Double, Double, Seq[String])]): String =
      rs.map { case (n, a, b, r, l) =>
        val lintJ = l.map(s => "\"" + s + "\"").mkString("[", ",", "]")
        f""""$n":{"sf01":$a%.3f,"sf1":$b%.3f,"per_row_ratio":$r%.2f,"audit":${r > 2.0},"lint":$lintJ}"""
      }.mkString("{", ",", "}")
    val line =
      f"""{"metric":"sf1_total","value":${rows.map(_._3).sum}%.3f,"unit":"sec","copies":$Copies,""" +
        f""""reps":$reps,"stalls":${Bench.stallCount.get()},""" +
        f""""stall_sec":${Bench.stallNanos.get() / 1e9}%.1f,"cal_sec":$calSec%.3f,""" +
        f""""transform_skip":{"files":$skipAll,"planned_one_day":$skipDay},""" +
        f""""runtime_prune":{"files":$pruneAll,"kept":$pruneKept},""" +
        f""""runtime_prune_delta":{"files":$pruneAllD,"kept":$pruneKeptD},"queries":${j(rows)}}"""
    try {
      val w = new java.io.PrintWriter(new java.io.File("BENCH_SF1.json"), "UTF-8")
      try w.println(line) finally w.close()
    } catch { case _: Throwable => () }
    spark.stop()
    System.out.println(line)
    System.out.flush()
  }
}
