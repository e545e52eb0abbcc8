package graft

import org.apache.spark.sql.types._

import graft.sources.Sas7bdatScan

/** Built-in .sas7bdat reader against fixtures cross-validated at
  * generation time by pandas' independent pure-Python reader
  * (tools/gen_sas7bdat_fixtures.py) — spec interpretation pinned
  * against a second implementation, in both page layouts. */
class Sas7bdatScanSpec extends SparkSpec {

  private def fixture(name: String): String =
    getClass.getResource(s"/sas7bdat/$name").getPath

  for (layout <- Seq("meta_data", "mix", "u64"))
    test(s"reads the $layout layout: types, values, missing, multi-page walk") {
      val df = Sas7bdatScan.read(spark, fixture(s"sample_$layout.sas7bdat"))
      assert(df.schema == StructType(Seq(
        StructField("IDX", DoubleType), StructField("SCORE", DoubleType),
        StructField("NAME", StringType))))
      val rows = df.orderBy("IDX").collect()
      assert(rows.length == 5)
      assert(rows.map(_.getDouble(0)).toSeq == Seq(1.0, 2.0, 3.0, 4.0, 5.0))
      assert(rows(1).isNullAt(1)) // SAS missing (NaN payload) -> NULL
      assert(rows(0).getDouble(1) == 10.125 && rows(2).getDouble(1) == -7.25)
      assert(rows(3).getDouble(1) == 2.5 && rows(4).getDouble(1) == 9e10)
      assert(rows.map(_.getString(2)).toSeq ==
        Seq("alpha", "beta", "midrowname", "delta row", "final row!"))
    }

  test("all three layouts decode identically") {
    val a = Sas7bdatScan.read(spark, fixture("sample_meta_data.sas7bdat"))
      .orderBy("IDX").collect().toSeq
    val b = Sas7bdatScan.read(spark, fixture("sample_mix.sas7bdat"))
      .orderBy("IDX").collect().toSeq
    val c = Sas7bdatScan.read(spark, fixture("sample_u64.sas7bdat"))
      .orderBy("IDX").collect().toSeq
    assert(a == b && b == c)
  }

  test("non-sas7bdat input fails loudly") {
    val junk = java.nio.file.Files.createTempFile("not_sas", ".sas7bdat")
    java.nio.file.Files.write(junk, Array.fill[Byte](2048)('x'))
    assert(intercept[IllegalArgumentException] {
      Sas7bdatScan.read(spark, junk.toString)
    }.getMessage.contains("magic"))
  }

  test("Tidier.read dispatches .sas7bdat by extension") {
    val df = Tidier.read(spark, fixture("sample_mix.sas7bdat")).df
    assert(df.count() == 5 && df.columns.contains("SCORE"))
  }
}
