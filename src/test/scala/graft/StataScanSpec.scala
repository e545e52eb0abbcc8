package graft

import org.apache.spark.sql.types._

import graft.sources.StataScan

/** Built-in Stata .dta reader against fixtures written by an
  * INDEPENDENT real writer (pandas to_stata, checked in as test
  * resources) — what's tested is spec compliance, not a self
  * round-trip. */
class StataScanSpec extends SparkSpec {

  private def fixture(name: String): String =
    getClass.getResource(s"/stata/$name").getPath

  test("reads pandas-written v117 and v118 fixtures: types, values, missing, unicode") {
    for (ver <- Seq(117, 118)) {
      val df = StataScan.read(spark, fixture(s"sample_v$ver.dta"))
      assert(df.schema == StructType(Seq(
        StructField("idx", ByteType), StructField("small", ShortType),
        StructField("big", IntegerType), StructField("ratio", FloatType),
        StructField("score", DoubleType), StructField("name", StringType))))
      val rows = df.orderBy("idx").collect()
      assert(rows.length == 5)
      assert(rows.map(_.getByte(0)).toSeq == Seq(1, 2, 3, 4, 5))
      assert(rows.map(_.getShort(1)).toSeq == Seq(100, -200, 300, 0, -32000))
      assert(rows.map(_.getInt(2)).toSeq ==
        Seq(1000000, -2, 0, 2000000000, 7))
      // NaN exported by pandas becomes a Stata missing sentinel → NULL
      assert(rows(3).isNullAt(3) && rows(1).isNullAt(4))
      assert(rows(0).getFloat(3) == 1.5f && rows(2).getFloat(3) == 0.0f)
      assert(rows(0).getDouble(4) == 10.125 && rows(4).getDouble(4) == 9e10)
      assert(rows.map(_.getString(5)).toSeq ==
        Seq("alpha", "beta", "", "delta", "épsilon"))
    }
  }

  test("non-dta and unsupported inputs fail loudly") {
    val junk = java.nio.file.Files.createTempFile("not_dta", ".dta")
    java.nio.file.Files.write(junk, "hello world not a dta".getBytes)
    val e = intercept[IllegalArgumentException] {
      StataScan.read(spark, junk.toString)
    }
    assert(e.getMessage.contains("not a Stata"))
  }

  test("Tidier.read dispatches .dta by extension") {
    val df = Tidier.read(spark, fixture("sample_v118.dta")).df
    assert(df.count() == 5 && df.columns.contains("score"))
  }
}
