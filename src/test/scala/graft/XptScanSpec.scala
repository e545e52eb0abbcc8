package graft

import org.apache.spark.sql.types._

import graft.sources.XptScan

/** Built-in SAS XPORT v5 reader against a fixture cross-validated at
  * generation time by pandas' independent XPORT reader
  * (tools/gen_xpt_fixtures.py) — the spec interpretation is pinned
  * against a second implementation, not a self round-trip. */
class XptScanSpec extends SparkSpec {

  private def fixture: String = getClass.getResource("/xpt/sample_v5.xpt").getPath

  test("reads the v5 fixture: IBM floats (full + truncated), missing, strings") {
    val df = XptScan.read(spark, fixture)
    assert(df.schema == StructType(Seq(
      StructField("IDX", DoubleType), StructField("SCORE", DoubleType),
      StructField("SHORTN", DoubleType), StructField("NAME", StringType))))
    val rows = df.orderBy("IDX").collect()
    assert(rows.length == 5)
    assert(rows.map(_.getDouble(0)).toSeq == Seq(1.0, 2.0, 3.0, 4.0, 5.0))
    assert(rows(1).isNullAt(1)) // '.' missing -> NULL
    assert(rows(0).getDouble(1) == 10.125 && rows(2).getDouble(1) == -7.25)
    assert(rows(3).getDouble(1) == 2.5 && rows(4).getDouble(1) == 9e10)
    // truncated 4-byte IBM floats: exact for these dyadic values; IBM
    // true zero (all-zero bytes) decodes to 0.0, not pandas' 5.4e-79
    assert(rows.map(_.getDouble(2)).toSeq == Seq(1.5, 0.0, 0.25, 1024.0, -0.5))
    assert(rows.map(_.getString(3)).toSeq ==
      Seq("", "beta", "midrowname", "delta row", "final row 5!"))
  }

  test("non-xpt and V8 inputs fail loudly") {
    val junk = java.nio.file.Files.createTempFile("not_xpt", ".xpt")
    java.nio.file.Files.write(junk, ("x" * 480).getBytes)
    assert(intercept[IllegalArgumentException] {
      XptScan.read(spark, junk.toString)
    }.getMessage.contains("not an XPORT"))
    val v8 = java.nio.file.Files.createTempFile("v8", ".xpt")
    java.nio.file.Files.write(v8,
      ("HEADER RECORD*******LIBV8   HEADER RECORD!!!!!!!" + "0" * 30 + "  ").padTo(480, ' ').getBytes)
    assert(intercept[IllegalArgumentException] {
      XptScan.read(spark, v8.toString)
    }.getMessage.contains("V5"))
  }

  test("Tidier.read dispatches .xpt by extension") {
    val df = Tidier.read(spark, fixture).df
    assert(df.count() == 5 && df.columns.contains("SHORTN"))
  }
}
