package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{CboJoin, IcebergNdv, IcebergWrite}

/** Stats-driven join planning: broadcast vs shuffle vs bucket-aligned
  * picked from MANIFEST live bytes/rows and ANALYZE NDV — planning
  * state Catalyst cannot see through the opaque scan unions. Every
  * decision is plan-asserted, every result value-checked against the
  * undecided plain join. */
class CboJoinSpec extends SparkSpec {

  private def facts(n: Int) = {
    import spark.implicits._
    (1L to n.toLong).map(i => (i, i % 50L, s"payload_$i")).toDF("id", "k", "v")
  }
  private def dim(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).map(i => (i, s"name_$i")).toDF("k", "name")
  }

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("small dim by live bytes -> broadcast-right, plan-asserted") {
    val base = Files.createTempDirectory("graft_cbo1").toString
    IcebergWrite.create(spark, facts(2000), s"$base/f")
    IcebergWrite.create(spark, dim(50), s"$base/d")
    val (df, d) = CboJoin.plan(spark, s"$base/f", s"$base/d", Seq("k" -> "k"))
    assert(d.strategy == "broadcast-right", d.reason)
    assert(physical(df).contains("BroadcastHashJoin"))
    assert(df.count() == 2000)
    // deletes shrink the estimate through the manifests, not a re-stat
    assert(d.left.rows == 2000 && d.right.rows == 50)
  }

  test("budget exceeded -> shuffle, no broadcast in the plan") {
    val base = Files.createTempDirectory("graft_cbo2").toString
    IcebergWrite.create(spark, facts(2000), s"$base/f")
    IcebergWrite.create(spark, dim(50), s"$base/d")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      // Spark's own size-estimate broadcast is disabled so the plan
      // shows OUR decision, not Catalyst's fallback guess
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val (df, d) = CboJoin.plan(spark, s"$base/f", s"$base/d",
        Seq("k" -> "k"), broadcastBytes = 1L)
      assert(d.strategy == "shuffle", d.reason)
      assert(!physical(df).contains("BroadcastHashJoin"))
      assert(df.count() == 2000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("matching bucket layouts -> bucket-aligned (BucketJoin delegate)") {
    val base = Files.createTempDirectory("graft_cbo3").toString
    IcebergWrite.create(spark, facts(1000), s"$base/f",
      partitionBy = Seq("bucket(4, k)"))
    IcebergWrite.create(spark, dim(50), s"$base/d",
      partitionBy = Seq("bucket(4, k)"))
    val (df, d) = CboJoin.plan(spark, s"$base/f", s"$base/d", Seq("k" -> "k"))
    assert(d.strategy == "bucket-aligned", d.reason)
    assert(df.count() == 1000)
    // mismatched N must NOT claim alignment
    IcebergWrite.create(spark, dim(50), s"$base/d8",
      partitionBy = Seq("bucket(8, k)"))
    val (_, d2) = CboJoin.plan(spark, s"$base/f", s"$base/d8", Seq("k" -> "k"))
    assert(d2.strategy != "bucket-aligned")
  }

  test("semi join: NDV x width beats raw bytes for the build estimate") {
    val base = Files.createTempDirectory("graft_cbo4").toString
    import spark.implicits._
    // right side: many rows, long payloads, but only 5 distinct keys
    val bigRight = (1L to 5000L)
      .map(i => (i % 5L, "x" * 200)).toDF("k", "pad")
    IcebergWrite.create(spark, facts(2000), s"$base/f")
    IcebergWrite.create(spark, bigRight, s"$base/r")
    IcebergNdv.analyze(spark, s"$base/r", Seq("k"))
    val rStats = CboJoin.sideStats(spark, s"$base/r")
    assert(rStats.ndv.get("k").exists(n => n >= 4 && n <= 6))
    // budget below the relation's inflated bytes but above ndv x width:
    // only the distinct-key rewrite can broadcast
    val budget = 4096L
    assert(rStats.liveBytes * CboJoin.DefaultInflation > budget)
    val (df, d) = CboJoin.plan(spark, s"$base/f", s"$base/r",
      Seq("k" -> "k"), how = "left_semi", broadcastBytes = budget)
    assert(d.strategy == "semi-distinct-broadcast", d.reason)
    assert(physical(df).contains("BroadcastHashJoin"))
    // value check against the plain semi join
    val plainCount = graft.sources.IcebergScan.read(spark, s"$base/f")
      .join(graft.sources.IcebergScan.read(spark, s"$base/r"),
        Seq("k"), "left_semi").count()
    assert(df.count() == plainCount)
  }

  test("output-cardinality estimate uses the containment rule") {
    val base = Files.createTempDirectory("graft_cbo5").toString
    IcebergWrite.create(spark, facts(2000), s"$base/f")
    IcebergWrite.create(spark, dim(50), s"$base/d")
    IcebergNdv.analyze(spark, s"$base/f", Seq("k"))
    IcebergNdv.analyze(spark, s"$base/d", Seq("k"))
    val (_, d) = CboJoin.plan(spark, s"$base/f", s"$base/d", Seq("k" -> "k"))
    // |L|*|R| / max(ndv) = 2000*50/50 = 2000 (HLL jitter tolerated)
    assert(d.outRowsEst.exists(e => e > 1500 && e < 2600), d.outRowsEst)
  }

  test("plan() dispatches Delta sides: log-priced broadcast, DeltaNdv semi, mixed formats") {
    val base = Files.createTempDirectory("graft_cbo_delta").toString
    import spark.implicits._
    graft.sources.DeltaWrite.create(spark, facts(2000), s"$base/f")
    graft.sources.DeltaWrite.create(spark, dim(50), s"$base/d")
    val (df, d) = CboJoin.plan(spark, s"$base/f", s"$base/d", Seq("k" -> "k"))
    assert(d.strategy == "broadcast-right", d.reason)
    assert(d.left.rows == 2000 && d.right.rows == 50) // exact from add-file stats
    assert(df.count() == 2000)
    // semi: the ANALYZE NDV prices the distinct build under a budget
    // the whole relation exceeds
    val bigRight = (1L to 5000L).map(i => (i % 5L, "x" * 200)).toDF("k", "pad")
    graft.sources.DeltaWrite.create(spark, bigRight, s"$base/r")
    graft.sources.DeltaNdv.analyze(spark, s"$base/r", Seq("k"))
    val (semi, d2) = CboJoin.plan(spark, s"$base/f", s"$base/r",
      Seq("k" -> "k"), how = "left_semi", broadcastBytes = 4096L)
    assert(d2.strategy == "semi-distinct-broadcast", d2.reason)
    val plain = graft.sources.DeltaScan.read(spark, s"$base/f")
      .join(graft.sources.DeltaScan.read(spark, s"$base/r"), Seq("k"), "left_semi")
      .count()
    assert(semi.count() == plain)
    // mixed formats: Iceberg left × Delta right
    IcebergWrite.create(spark, facts(1000), s"$base/fi")
    val (mix, d3) = CboJoin.plan(spark, s"$base/fi", s"$base/d", Seq("k" -> "k"))
    assert(d3.strategy == "broadcast-right", d3.reason)
    assert(mix.count() == 1000)
  }

  // ------------------------------------------------------------------
  // runtime join pruning
  // ------------------------------------------------------------------

  private def parquetFiles(base: String): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    Files.walk(java.nio.file.Paths.get(base)).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") &&
        !p.toString.contains("metadata") && !p.toString.contains("_delta_log"))
      .toSeq
  }

  /** id-range-clustered fact: 4 files covering [0,100)…[300,400) */
  private def rangedFact(path: String): Unit = {
    val df = spark.range(0, 400)
      .select(col("id"), (col("id") % 7L).as("k2"), (col("id") * 3L).as("v"))
      .repartitionByRange(4, col("id"))
    IcebergWrite.create(spark, df, path)
  }

  test("runtime-pruned join: dim key domain prunes fact files, physically proven") {
    val base = Files.createTempDirectory("graft_cbo_rt1").toString
    import spark.implicits._
    rangedFact(s"$base/f")
    IcebergWrite.create(spark,
      Seq((5L, "a"), (7L, "b"), (360L, "c")).toDF("fk", "name"), s"$base/d")
    // keys {5,7,360} touch range files [0,100) and [300,400) only —
    // delete the two files the pruner must rule out BEFORE planning:
    // the join can only succeed by never reading them
    val conf = spark.sparkContext.hadoopConfiguration
    val schema = graft.sources.IcebergScan.read(spark, s"$base/f").schema
    val doomed = parquetFiles(s"$base/f").filter { p =>
      val st = graft.sources.ParquetStats
        .statsJson(conf, new org.apache.hadoop.fs.Path(p.toString))
        .flatMap(graft.sources.ParquetStats.parse)
      !graft.sources.ParquetStats.mayMatch(st,
        graft.sources.ParquetStats.predicateExpr(spark, schema,
          col("id").isin(5L, 7L, 360L)))
    }
    assert(doomed.size == 2, s"expected 2 prunable range files, got ${doomed.size}")
    doomed.foreach(p => Files.delete(p))
    val (df, d) = CboJoin.planPruned(spark, s"$base/f", s"$base/d",
      Seq("id" -> "fk"))
    assert(d.strategy == "runtime-pruned-broadcast", d.reason)
    assert(d.reason.contains("kept 2/4"), d.reason)
    assert(physical(df).contains("BroadcastHashJoin"))
    val got = df.select(col("id"), col("name")).orderBy("id")
      .as[(Long, String)].collect()
    assert(got.toSeq == Seq((5L, "a"), (7L, "b"), (360L, "c")))
  }

  test("runtime filter degrades to min/max range past the key cap") {
    val base = Files.createTempDirectory("graft_cbo_rt2").toString
    import spark.implicits._
    rangedFact(s"$base/f")
    // dim keys 150..169: 20 distinct — over a cap of 8, the filter
    // becomes id BETWEEN 150 AND 169, still pruning to 1 of 4 files
    IcebergWrite.create(spark,
      (150L until 170L).map(i => (i, s"n$i")).toDF("fk", "name"), s"$base/d")
    val prev = CboJoin.maxRuntimeFilterKeys
    try {
      CboJoin.maxRuntimeFilterKeys = 8
      val (df, d) = CboJoin.planPruned(spark, s"$base/f", s"$base/d",
        Seq("id" -> "fk"))
      assert(d.reason.contains("BETWEEN"), d.reason)
      assert(d.reason.contains("kept 1/4"), d.reason)
      assert(df.count() == 20)
    } finally CboJoin.maxRuntimeFilterKeys = prev
  }

  test("empty dim prunes the fact scan to nothing") {
    val base = Files.createTempDirectory("graft_cbo_rt3").toString
    import spark.implicits._
    rangedFact(s"$base/f")
    IcebergWrite.create(spark,
      Seq((1L, "x")).toDF("fk", "name"), s"$base/d")
    val (df, d) = CboJoin.planPruned(spark, s"$base/f", s"$base/d",
      Seq("id" -> "fk"), dimFilter = Some(col("fk") < 0))
    assert(d.reason.contains("kept 0/4"), d.reason)
    assert(df.count() == 0)
  }

  test("runtime pruning over a DELTA fact via add-file stats") {
    val base = Files.createTempDirectory("graft_cbo_rt4").toString
    import spark.implicits._
    val df = spark.range(0, 400)
      .select(col("id"), (col("id") * 3L).as("v"))
      .repartitionByRange(4, col("id"))
    graft.sources.DeltaWrite.create(spark, df, s"$base/f")
    IcebergWrite.create(spark,
      Seq((42L, "a"), (350L, "b")).toDF("fk", "name"), s"$base/d")
    val (out, d) = CboJoin.planPruned(spark, s"$base/f", s"$base/d",
      Seq("id" -> "fk"))
    assert(d.reason.contains("kept 2/4"), d.reason)
    val got = out.select(col("id"), col("name")).orderBy("id")
      .as[(Long, String)].collect()
    assert(got.toSeq == Seq((42L, "a"), (350L, "b")))
  }

  test("left_semi prunes; outer join types are refused loudly") {
    val base = Files.createTempDirectory("graft_cbo_rt5").toString
    import spark.implicits._
    rangedFact(s"$base/f")
    IcebergWrite.create(spark,
      Seq((5L, "a"), (360L, "c")).toDF("fk", "name"), s"$base/d")
    val (semi, d) = CboJoin.planPruned(spark, s"$base/f", s"$base/d",
      Seq("id" -> "fk"), how = "left_semi")
    assert(d.reason.contains("kept 2/4"), d.reason)
    assert(semi.select("id").as[Long].collect().sorted.toSeq == Seq(5L, 360L))
    val e = intercept[IllegalArgumentException] {
      CboJoin.planPruned(spark, s"$base/f", s"$base/d",
        Seq("id" -> "fk"), how = "left")
    }
    assert(e.getMessage.contains("sound only"))
  }

  test("pruned join prices the dim: over-budget dim joins shuffled, Delta dim priced from stats") {
    val base = Files.createTempDirectory("graft_cbo_rt6").toString
    import spark.implicits._
    rangedFact(s"$base/f")
    // Delta dim: rows from add-file numRecords × schema width prices it
    graft.sources.DeltaWrite.create(spark,
      Seq((5L, "a"), (360L, "c")).toDF("fk", "name"), s"$base/d")
    val (df, d) = CboJoin.planPruned(spark, s"$base/f", s"$base/d",
      Seq("id" -> "fk"))
    assert(d.strategy == "runtime-pruned-broadcast", d.reason)
    assert(d.right.rows == 2, d.right) // exact from Delta stats
    assert(physical(df).contains("BroadcastHashJoin"))
    // a budget of 1 byte refuses the broadcast; pruning still happens
    val prev = CboJoin.maxBroadcastBytes
    try {
      CboJoin.maxBroadcastBytes = 1L
      val (df2, d2) = CboJoin.planPruned(spark, s"$base/f", s"$base/d",
        Seq("id" -> "fk"))
      assert(d2.strategy == "runtime-pruned-shuffle", d2.reason)
      assert(d2.reason.contains("kept 2/4"), d2.reason)
      assert(df2.count() == 2)
    } finally CboJoin.maxBroadcastBytes = prev
  }

  test("star planner: role-playing dim (same path, two fact keys) keeps distinct audit entries") {
    val base = Files.createTempDirectory("graft_cbo_star_rp").toString
    import spark.implicits._
    rangedFact(s"$base/f")
    IcebergNdv.analyze(spark, s"$base/f", Seq("id", "k2"))
    IcebergWrite.create(spark,
      Seq((3L, "x"), (10L, "y")).toDF("fk", "name"), s"$base/dD")
    val (df, sd) = CboJoin.planStar(spark, s"$base/f", Seq(
      CboJoin.DimSpec(s"$base/dD", "id", "fk"),
      CboJoin.DimSpec(s"$base/dD", "k2", "fk")))
    // labels disambiguate by fact key; both entries survive
    assert(sd.order.toSet == Set(s"$base/dD#id", s"$base/dD#k2"), sd.order)
    assert(sd.fraction.size == 2 && sd.strategy.size == 2, sd)
    assert(sd.fraction(s"$base/dD#id") < sd.fraction(s"$base/dD#k2"), sd.fraction)
    // id∈{3,10} AND k2∈{3,10}∩[0,7) = {3}: rows id=3 (k2=3), id=10 (k2=3)
    assert(df.select("id").as[Long].collect().sorted.toSeq == Seq(3L, 10L))
  }

  test("semi distinct-broadcast refuses an unpriceable right side (stats-less Delta)") {
    val base = Files.createTempDirectory("graft_cbo_nostats").toString
    import spark.implicits._
    IcebergWrite.create(spark, facts(2000), s"$base/f")
    val bigRight = (1L to 5000L).map(i => (i % 5L, "x" * 200)).toDF("k", "pad")
    graft.sources.DeltaWrite.create(spark, bigRight, s"$base/r")
    graft.sources.DeltaNdv.analyze(spark, s"$base/r", Seq("k"))
    // simulate a foreign writer: strip add-file stats from the log —
    // NDV stays current (same versions) but live rows become unknowable
    val logDir = java.nio.file.Paths.get(s"$base/r/_delta_log")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    import scala.jdk.CollectionConverters._
    Files.list(logDir).iterator().asScala
      .filter(_.toString.endsWith(".json")).foreach { p =>
        val out = Files.readAllLines(p).asScala.map { line =>
          val node = mapper.readTree(line)
          if (node.has("add")) {
            node.get("add").asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
              .remove("stats")
            mapper.writeValueAsString(node)
          } else line
        }
        Files.write(p, out.mkString("\n").getBytes("UTF-8"))
      }
    // the raw rewrite invalidates Hadoop LocalFS checksum sidecars
    Files.list(logDir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".crc")).foreach(Files.delete)
    // rows = -1: the distinct-key estimate must NOT collapse to ~1
    // tuple and broadcast on a guess — generic decision takes over and
    // the unpriceable side shuffles
    val (df, d) = CboJoin.plan(spark, s"$base/f", s"$base/r",
      Seq("k" -> "k"), how = "left_semi", broadcastBytes = 4096L)
    assert(d.strategy == "shuffle", d.reason)
    assert(d.right.rows == -1L, d.right)
    val plain = graft.sources.IcebergScan.read(spark, s"$base/f")
      .join(graft.sources.DeltaScan.read(spark, s"$base/r"), Seq("k"), "left_semi")
      .count()
    assert(df.count() == plain)
  }

  test("star planner: left dims never prune and join after inner dims") {
    val base = Files.createTempDirectory("graft_cbo_star_l").toString
    import spark.implicits._
    rangedFact(s"$base/f")
    IcebergNdv.analyze(spark, s"$base/f", Seq("id", "k2"))
    IcebergWrite.create(spark,
      Seq((10L, "da_x"), (320L, "da_y")).toDF("fk", "da_name"), s"$base/dA")
    IcebergWrite.create(spark,
      Seq((3L, "L3"), (6L, "L6")).toDF("fk", "dl_name"), s"$base/dL")
    val (df, sd) = CboJoin.planStar(spark, s"$base/f", Seq(
      CboJoin.DimSpec(s"$base/dL", "k2", "fk", how = "left"),
      CboJoin.DimSpec(s"$base/dA", "id", "fk")))
    // the left dim orders AFTER the inner dim despite being listed first
    assert(sd.order == Seq(s"$base/dA", s"$base/dL"), sd.order)
    // only the inner dim's domain prunes: id∈{10,320} keeps 2 files —
    // the left dim's tiny key set must NOT shrink that further
    assert(sd.factFilesKept == 2 && sd.factFilesTotal == 4,
      (sd.factFilesKept, sd.factFilesTotal))
    // unmatched left rows survive with nulls (id=320 → k2=5, no dL key)
    val got = df.select(col("id"), col("da_name"), col("dl_name"))
      .orderBy("id").as[(Long, String, Option[String])].collect()
    assert(got.toSeq == Seq((10L, "da_x", Some("L3")), (320L, "da_y", None)))
  }

  test("star planner: selectivity order, AND-combined pruning, value check") {
    val base = Files.createTempDirectory("graft_cbo_star").toString
    import spark.implicits._
    rangedFact(s"$base/f")
    IcebergNdv.analyze(spark, s"$base/f", Seq("id", "k2"))
    // dA observes 2 of ~400 id keys (fraction ≈ 0.005); dB observes
    // 5 of 7 k2 keys (fraction ≈ 0.71) — dA must join first
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
    assert(sd.strategy.values.forall(_ == "broadcast"), sd.strategy)
    // AND of both domains: id∈{10,320} AND k2∈[0,5) keeps files 1 and 4
    assert(sd.factFilesKept == 2 && sd.factFilesTotal == 4,
      (sd.factFilesKept, sd.factFilesTotal))
    val got = df.select(col("id"), col("da_name"), col("db_name"))
      .orderBy("id").as[(Long, String, String)].collect()
    // id=10 → k2=3 → db_3; id=320 → k2=320%7=5 → no dB match (inner)
    assert(got.toSeq == Seq((10L, "da_x", "db_3")))
  }
}
