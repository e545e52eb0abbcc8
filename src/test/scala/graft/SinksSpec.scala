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
    Seq("iceberg", "delta").foreach { fmt =>
      try {
        Tidier.read(spark, "/tmp/graft-nonexistent-table", fmt)
        fail(s"$fmt read of a nonexistent path should not succeed")
      } catch {
        case e: IllegalStateException =>
          // connector absent — the error must tell the user exactly
          // which jar/conf to add
          assert(e.getMessage.contains(fmt match {
            case "iceberg" => "iceberg-spark-runtime"
            case _         => "delta-spark"
          }))
        case _: Throwable =>
          // connector present: dispatch reached the real source and
          // failed on the bogus path instead — the wiring works
          succeed
      }
    }
    // explicit-format dispatch for built-ins shares the same entry point
    val p = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    Tidier.from(Seq((1L, "x")).toDF("id", "v")).writeFile(s"$p/t.parquet")
    assert(Tidier.read(spark, s"$p/t.parquet", "parquet").df.count() == 1)
  }

  test("showQuery/explain does not throw") {
    Tidier.from(df).filter(col("k") > 0).showQuery()
  }
}
