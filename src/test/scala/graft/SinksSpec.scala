package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Sinks / sources (SURVEY §2.1): createView, writeFile round-trips,
  * csv/json scans, streamed collect. */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq((1, "a"), (2, "b")).toDF("k", "v")

  test("createView registers a temp view queryable by SQL; dropView removes it") {
    val tf = Tidier.from(df)
    tf.createView("sink_view")
    assert(spark.sql("SELECT count(*) FROM sink_view").first().getLong(0) == 2)
    assert(Tidier.showTables(spark).count() >= 1)
    tf.dropView("sink_view")
    assert(!spark.catalog.tableExists("sink_view"))
  }

  test("writeFile parquet/csv/json round-trip by extension") {
    val tmp = Files.createTempDirectory("graft_sink").toString
    Tidier.from(df).writeFile(s"$tmp/out_parquet")
    assert(Tidier.read(spark, s"$tmp/out_parquet").df.count() == 2)
    Tidier.from(df).writeFile(s"$tmp/out.csv")
    assert(Tidier.read(spark, s"$tmp/out.csv").df.count() == 2)
    Tidier.from(df).writeFile(s"$tmp/out.json")
    assert(Tidier.read(spark, s"$tmp/out.json").df.count() == 2)
  }

  test("writeFile(format=delta/iceberg): create then append through the standard API") {
    val tmp = Files.createTempDirectory("graft_sink_lake").toString
    for (fmt <- Seq("delta", "iceberg")) {
      val path = s"$tmp/$fmt"
      Tidier.from(df).writeFile(path, fmt)          // create
      Tidier.from(df).writeFile(path, fmt)          // append (new commit)
      assert(Tidier.read(spark, path, fmt).df.count() == 4)
    }
    val e = intercept[IllegalArgumentException] {
      Tidier.from(df).writeFile(s"$tmp/x", "xlsx")
    }
    assert(e.getMessage.contains("not supported"))
  }

  test("multi-path scan unions files") {
    val tmp = Files.createTempDirectory("graft_multi").toString
    df.write.parquet(s"$tmp/p1"); df.write.parquet(s"$tmp/p2")
    assert(Tidier.read(spark, Seq(s"$tmp/p1", s"$tmp/p2")).df.count() == 4)
  }

  test("streamCollect iterates all rows without full materialization") {
    val it = Tidier.from(df).streamCollect()
    assert(it.size == 2)
  }

  test("iceberg/delta dispatch: real read when connector present, actionable error otherwise") {
    // iceberg without a connector falls back to the BUILT-IN
    // metadata/manifest reader (IcebergScanSpec covers real reads); a
    // pathless table must surface its no-metadata error, not a
    // ClassNotFound
    val ei = intercept[Exception] {
      Tidier.read(spark, "/tmp/graft-nonexistent-table", "iceberg")
    }
    assert(ei.getMessage.contains("no Iceberg metadata")
      || !ei.getMessage.contains("Failed to find data source"))
    // delta without a connector falls back to the BUILT-IN log-replay
    // reader (DeltaScanSpec covers real reads); a pathless table must
    // surface its no-log error, not a ClassNotFound
    val e = intercept[Exception] {
      Tidier.read(spark, "/tmp/graft-nonexistent-table", "delta")
    }
    assert(e.getMessage.contains("no Delta log found")
      || !e.getMessage.contains("Failed to find data source"))
    // explicit-format dispatch for built-ins shares the same entry point
    val p = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    Tidier.from(Seq((1L, "x")).toDF("id", "v")).writeFile(s"$p/t.parquet")
    assert(Tidier.read(spark, s"$p/t.parquet", "parquet").df.count() == 1)
  }

  test("explicit-schema CSV read skips inference; samplingRatio read stays typed") {
    import org.apache.spark.sql.types._
    val tmp = Files.createTempDirectory("graft_schema").toString
    Seq((1, "7"), (2, "8")).toDF("k", "v").write
      .option("header", "true").mode("overwrite").csv(s"$tmp/s.csv")
    // v declared STRING: values look numeric, so if inference ran it
    // would come back IntegerType — staying StringType proves the
    // inference pass was skipped
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    val tf = Tidier.read(spark, s"$tmp/s.csv", schema)
    assert(tf.df.schema == schema)
    assert(tf.df.orderBy("k").collect().map(_.getString(1)).toSeq == Seq("7", "8"))
    // sampled inference still types the columns
    val sampled = Tidier.read(spark, s"$tmp/s.csv", 0.5)
    assert(sampled.df.schema("k").dataType != StringType)
  }

  test("showQuery/explain does not throw") {
    Tidier.from(df).filter(col("k") > 0).showQuery("formatted")
  }

  test("showQuery('sql') unparses a filter+join+agg chain into readable clauses") {
    val orders = Seq((1, 10, 100.0), (2, 10, 50.0), (3, 20, 75.0))
      .toDF("o_id", "cust_id", "amount")
    val cust = Seq((10, "alice"), (20, "bob")).toDF("cust_id", "name")
    val q = Tidier.from(orders)
      .filter(col("amount") > 60.0)
      .innerJoin(Tidier.from(cust), graft.operators.JoinKey("cust_id"))
      .groupBy("name")
      .summarize("total" -> sum(col("amount")), "n" -> count(lit(1)))
      .filter(col("n") >= 1)
      .arrange("name")
    val sql = q.showQuery()
    // clause skeleton, in order
    // every clause present (WHERE fuses into the join's left subquery —
    // that's correct SQL, so no global-position assertion on it)
    Seq("SELECT", "FROM", "JOIN", "WHERE", "GROUP BY", "HAVING", "ORDER BY")
      .foreach(k => assert(sql.contains(k), s"missing $k in:\n$sql"))
    // top-level skeleton in order: GROUP BY after the join, HAVING after
    // GROUP BY, ORDER BY last
    val skel = Seq("JOIN", "GROUP BY", "HAVING", "ORDER BY").map(sql.indexOf)
    assert(skel == skel.sorted && skel.forall(_ >= 0), s"skeleton out of order:\n$sql")
    // the pieces a user must be able to read back
    assert(sql.contains("GROUP BY") && sql.contains("name"), sql)
    assert(sql.toLowerCase.contains("sum("), sql)
    assert(sql.contains("AS total"), sql)
    // ungrammatical plans must FALL BACK, not throw: a Window node
    val w = Tidier.from(orders).groupBy("cust_id").windowOrder(col("o_id"))
      .mutate("rn" -> row_number())
    val wsql = w.showQuery()
    assert(wsql.nonEmpty)
    // set ops render as UNION ALL subqueries
    val u = Tidier.from(orders).select("o_id").unionAll(Tidier.from(orders).select("o_id"))
    assert(u.showQuery().contains("UNION ALL"))
  }

  test("showQuery colorizes under Tidier.color(true); strip round-trips") {
    val orders = Seq((1, 10, 100.0), (2, 20, 50.0)).toDF("o_id", "cust_id", "amount")
    val q = Tidier.from(orders).filter(col("amount") > 60.0)
      .groupBy("cust_id").summarize("total" -> sum(col("amount")))
      .arrange("cust_id")
    val plain = q.showQuery()
    // clause formatting puts major clauses on their own indented lines
    assert(plain.contains("\n\tFROM ") || plain.contains("\nSELECT"), plain)
    assert(!plain.contains("\u001b["), "no escapes with color off")
    try {
      Tidier.color(true)
      val colored = q.showQuery()
      // the reference's palette groups: cyan SELECT/FROM, yellow GROUP
      // BY, pink ORDER BY (src/TidierDB_macros.jl:544-565)
      assert(colored.contains("\u001b[36mSELECT\u001b[0m"), colored)
      assert(colored.contains("\u001b[33mGROUP BY\u001b[0m"), colored)
      assert(colored.contains("\u001b[35mORDER BY\u001b[0m"), colored)
      // color is presentation only: stripping recovers the plain text
      assert(graft.plans.SqlFormat.strip(colored) == plain)
    } finally Tidier.color(false)
  }
}
