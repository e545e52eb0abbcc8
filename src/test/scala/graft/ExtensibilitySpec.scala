package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import graft.functions.Fns
import graft.operators.JoinKey

/** Extensibility surface: arbitrary-function passthrough
  * (reference: src/parsing_duckdb.jl:183), backend-registered UDFs
  * (reference: docs/examples/UserGuide/udfs_ex.jl), typed UDAFs, and
  * join shorthand. */
class ExtensibilitySpec extends SparkSpec {
  import spark.implicits._

  test("GraftExtensions: native kernels callable from pure SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cs,
        |  dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
        |  size(hashed_word_shingles('a b c d', 3)) AS nsh,
        |  simhash64('hello world hello') AS sh,
        |  decode_image_features(cast('not an image' AS BINARY)).format AS fmt,
        |  decode_video_features(cast('not a video' AS BINARY), 2).format AS vfmt
        |""".stripMargin).collect().head
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 11.0)
    assert(r.getInt(2) == 2) // "a b c","b c d"
    assert(!r.isNullAt(3))
    assert(r.isNullAt(4)) // junk bytes → NULL struct
    assert(r.isNullAt(5))
    // non-literal shingle size is a clear error, not a silent misplan
    val e = intercept[Exception] {
      spark.sql("SELECT hashed_word_shingles('a b', length('xxx'))").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("table functions: the reference's SQL scan surface runs verbatim") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tvf").toString
    val d = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    d.write.mode("overwrite").parquet(s"$dir/p")
    d.write.mode("overwrite").option("header", "true").csv(s"$dir/c")
    graft.sources.DeltaWrite.create(spark, d, s"$dir/delta")
    graft.sources.IcebergWrite.create(spark, d, s"$dir/ice")

    def ids(sql: String) =
      spark.sql(sql).select("id").collect().map(_.getLong(0)).toSet
    assert(ids(s"SELECT * FROM read_parquet('$dir/p')") == Set(1L, 2L, 3L))
    assert(spark.sql(s"SELECT * FROM read_csv('$dir/c') WHERE id > 1").count() == 2L)
    assert(ids(s"SELECT * FROM delta_scan('$dir/delta')") == Set(1L, 2L, 3L))
    assert(ids(s"SELECT * FROM iceberg_scan('$dir/ice')") == Set(1L, 2L, 3L))
    // the reference's list form: read_parquet(['a','b'])
    d.filter($"id" === 1L).write.mode("overwrite").parquet(s"$dir/p1")
    d.filter($"id" === 2L).write.mode("overwrite").parquet(s"$dir/p2")
    assert(ids(s"SELECT * FROM read_parquet(array('$dir/p1', '$dir/p2'))") == Set(1L, 2L))

    // metadata-only aggregates + the change feed as verbatim SQL
    val mc = spark.sql(s"SELECT * FROM delta_meta_count('$dir/delta')").head()
    assert(mc.getLong(0) == 3L && mc.getBoolean(1))
    val ic = spark.sql(s"SELECT * FROM iceberg_meta_count('$dir/ice')").head()
    assert(ic.getLong(0) == 3L && ic.getBoolean(1))
    graft.sources.DeltaWrite.create(spark, d, s"$dir/delta_cdf")
    graft.sources.DeltaWrite.enableChangeDataFeed(spark, s"$dir/delta_cdf")
    graft.sources.DeltaWrite.deleteWhere(spark, s"$dir/delta_cdf",
      org.apache.spark.sql.functions.col("id") === 2L)
    val cdf = spark.sql(
      s"SELECT id, _change_type FROM delta_cdf('$dir/delta_cdf', 2, 2)").collect()
    assert(cdf.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((2L, "delete")))
    // composes with scalar kernels and plain SQL
    val n = spark.sql(
      s"SELECT count(*) AS n FROM delta_scan('$dir/delta') WHERE length(v) = 1")
      .head().getLong(0)
    assert(n == 3L)
    // option arguments: extra positional/named literals are tolerated
    // and ignored (DuckDB's `opt = true` spelling is rejected by
    // Spark's ANALYZER as an unresolved column before any builder
    // runs — callers use Spark's `=> literal` or positional form)
    assert(ids(s"SELECT * FROM iceberg_scan('$dir/ice', true)") == Set(1L, 2L, 3L))
    // multiple paths to a single-table scan are a LOUD error, never a
    // silent partial read
    val multi = intercept[Exception] {
      spark.sql(s"SELECT * FROM delta_scan('$dir/delta', '$dir/delta')").collect()
    }
    assert(multi.getMessage.contains("ONE table path"))
    // warc_scan over a minimal single-record WARC file
    val warc = "WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Record-ID: <urn:1>\r\n" +
      "WARC-Target-URI: https://x/1\r\nWARC-Date: 2024-01-01T00:00:00Z\r\n" +
      "Content-Type: text/plain\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/one.warc"),
      warc.getBytes("UTF-8"))
    val recs = spark.sql(s"SELECT warc_type FROM warc_scan('$dir/one.warc')")
      .collect().map(_.getString(0)).toSeq
    assert(recs == Seq("conversion"))
  }

  test("GraftExtensions applies through the SparkSessionExtensions injection point") {
    // build a FRESH session on the shared context with the extensions
    // class wired the production way (spark.sql.extensions analog)
    val active = org.apache.spark.sql.SparkSession.getActiveSession
    val default = org.apache.spark.sql.SparkSession.getDefaultSession
    try {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val v = s2.sql("SELECT dot_product(array(2.0D, 3.0D), array(4.0D, 5.0D))")
        .collect().head.getDouble(0)
      assert(v == 23.0)
    } finally {
      active.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
      default.foreach(org.apache.spark.sql.SparkSession.setDefaultSession)
    }
  }

  test("unknown functions pass through to the Spark SQL registry") {
    val d = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    // kurtosis/var_samp are not in our Fns surface — passthrough works
    val out = Tidier.from(d)
      .summarize("v" -> Fns.sql("var_samp(x)"), "k" -> Fns.sql("kurtosis(x)"))
      .collect().head
    assert(math.abs(out.getDouble(0) - 5.0 / 3.0) < 1e-9)
  }

  test("registered scalar UDF callable from mutate (reference UDF flow)") {
    spark.udf.register("graft_double_it", (x: Long) => x * 2)
    val out = Tidier.from(Seq(21L).toDF("v"))
      .mutate("d" -> Fns.sql("graft_double_it(v)"))
      .collect().head
    assert(out.getLong(1) == 42L)
  }

  test("typed Aggregator UDAF registers and aggregates") {
    val geomean = new Aggregator[Double, (Double, Long), Double] {
      def zero = (0.0, 0L)
      def reduce(b: (Double, Long), a: Double) = (b._1 + math.log(a), b._2 + 1)
      def merge(x: (Double, Long), y: (Double, Long)) = (x._1 + y._1, x._2 + y._2)
      def finish(r: (Double, Long)) = math.exp(r._1 / r._2)
      def bufferEncoder: Encoder[(Double, Long)] = Encoders.product[(Double, Long)]
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
    spark.udf.register("graft_geomean", udaf(geomean))
    val out = Tidier.from(Seq(1.0, 10.0, 100.0).toDF("x"))
      .summarize("g" -> Fns.sql("graft_geomean(x)"))
      .collect().head.getDouble(0)
    assert(math.abs(out - 10.0) < 1e-9)
  }

  test("bare-column join shorthand id == id") {
    val a = Seq((1L, "x")).toDF("id", "av")
    val b = Seq((1L, "y")).toDF("id", "bv")
    val out = Tidier.from(a).innerJoin(Tidier.from(b), JoinKey("id")).df
    assert(out.columns.toSeq == Seq("id", "av", "bv"))
    assert(out.count() == 1)
  }

  test("warnings(true) announces dropped grouping state; silent by default") {
    val err = new java.io.ByteArrayOutputStream()
    Tidier.warnings(true)
    try {
      Console.withErr(new java.io.PrintStream(err)) {
        Tidier.from(Seq((1, "a"), (2, "b")).toDF("v", "g"))
          .groupBy("g").summarize("n" -> count(lit(1)))
      }
      assert(err.toString.contains("grouping (g) was consumed"))
    } finally Tidier.warnings(false)
    val err2 = new java.io.ByteArrayOutputStream()
    Console.withErr(new java.io.PrintStream(err2)) {
      Tidier.from(Seq((1, "a")).toDF("v", "g"))
        .groupBy("g").summarize("n" -> count(lit(1)))
    }
    assert(err2.toString.isEmpty)
  }

  test("summary/describe profile runs") {
    val s = Tidier.from(Seq(1.0, 2.0).toDF("x")).summary()
    assert(s.columns.contains("summary") && s.count() >= 4)
  }

  test("createTable saves and re-reads through the catalog") {
    Tidier.from(Seq((1, "a")).toDF("k", "v")).createTable("graft_ct_test")
    assert(Tidier.table(spark, "graft_ct_test").df.count() == 1)
    spark.sql("DROP TABLE graft_ct_test")
  }
}
