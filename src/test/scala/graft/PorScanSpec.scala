package graft

import org.apache.spark.sql.types._

import graft.sources.PorScan

/** Built-in SPSS portable (.por) reader against a spec-authored
  * fixture (tools/gen_por_fixtures.py — no second .por implementation
  * exists offline). Base-30 number decoding is additionally pinned by
  * hand-computed exact values. */
class PorScanSpec extends SparkSpec {

  private def fixture: String = getClass.getResource("/spss/sample.por").getPath

  test("reads the portable fixture: base-30 numbers, SYSMIS, strings") {
    val df = PorScan.read(spark, fixture)
    assert(df.schema == StructType(Seq(
      StructField("IDX", DoubleType), StructField("SCORE", DoubleType),
      StructField("NAME", StringType))))
    val rows = df.orderBy("IDX").collect()
    assert(rows.length == 5)
    assert(rows.map(_.getDouble(0)).toSeq == Seq(1.0, 2.0, 3.0, 4.0, 5.0))
    assert(rows(1).isNullAt(1)) // *. -> NULL
    // dyadic values terminate in base 30 and round-trip bit-exactly
    assert(rows(0).getDouble(1) == 10.125)
    assert(rows(2).getDouble(1) == -7.25)
    assert(rows(3).getDouble(1) == 2.5 && rows(4).getDouble(1) == 9e10)
    assert(rows.map(_.getString(2)).toSeq ==
      Seq("alpha", "beta", "", "delta row", "final row!"))
  }

  test("physical 80-char lines with CRLF are transparent (logical stream)") {
    // the fixture IS line-wrapped by the generator; a value split
    // across a line boundary must decode — proven by the exact values
    // above plus a sanity reparse after re-wrapping at a different width
    val raw = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(fixture))
    val joined = new String(raw, "ISO-8859-1").replace("\r\n", "")
    val rewrapped = joined.grouped(37).mkString("\n")
    val alt = java.nio.file.Files.createTempFile("rewrap", ".por")
    java.nio.file.Files.write(alt, rewrapped.getBytes("ISO-8859-1"))
    val a = PorScan.read(spark, fixture).orderBy("IDX").collect().toSeq
    val b = PorScan.read(spark, alt.toString).orderBy("IDX").collect().toSeq
    assert(a == b)
  }

  test("non-portable input fails loudly") {
    val junk = java.nio.file.Files.createTempFile("not_por", ".por")
    java.nio.file.Files.write(junk, ("x" * 600).getBytes)
    assert(intercept[IllegalArgumentException] {
      PorScan.read(spark, junk.toString)
    }.getMessage.contains("SPSSPORT"))
  }

  test("Tidier.read dispatches .por by extension") {
    val df = Tidier.read(spark, fixture).df
    assert(df.count() == 5 && df.columns.contains("SCORE"))
  }
}
