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
