package graft

import org.apache.spark.sql.types._

import graft.sources.SavScan

/** Built-in SPSS .sav reader against fixtures authored section-by-
  * section from the publicly documented system-file format (no
  * independent .sav writer exists in this container — the generator is
  * tools/gen_sav_fixtures.py, deliberately explicit for auditing).
  * Both case-data encodings are pinned: raw and bytecode-compressed. */
class SavScanSpec extends SparkSpec {

  private def fixture(name: String): String =
    getClass.getResource(s"/spss/$name").getPath

  for (variant <- Seq("raw", "comp"))
    test(s"reads the $variant fixture: types, values, SYSMIS, unicode, long names") {
      val df = SavScan.read(spark, fixture(s"sample_$variant.sav"))
      // long-name extension maps NAME -> doc_name; numerics are doubles
      assert(df.schema == StructType(Seq(
        StructField("IDX", DoubleType), StructField("SCORE", DoubleType),
        StructField("doc_name", StringType))))
      val rows = df.orderBy("IDX").collect()
      assert(rows.length == 5)
      assert(rows.map(_.getDouble(0)).toSeq == Seq(1.0, 2.0, 3.0, 4.0, 5.0))
      assert(rows(1).isNullAt(1)) // SYSMIS -> NULL
      assert(rows(0).getDouble(1) == 10.125 && rows(2).getDouble(1) == 0.0)
      assert(rows(3).getDouble(1) == 2.5 && rows(4).getDouble(1) == 9e10)
      assert(rows.map(_.getString(2)).toSeq ==
        Seq("alpha", "beta", "", "épsilon", "last row"))
    }

  test("raw, bytecode, and zsav case data decode identically") {
    val a = SavScan.read(spark, fixture("sample_raw.sav")).orderBy("IDX").collect().toSeq
    val b = SavScan.read(spark, fixture("sample_comp.sav")).orderBy("IDX").collect().toSeq
    val z = SavScan.read(spark, fixture("sample.zsav")).orderBy("IDX").collect().toSeq
    assert(a == b && b == z)
  }

  test("Tidier.read dispatches .zsav by extension") {
    val df = Tidier.read(spark, fixture("sample.zsav")).df
    assert(df.count() == 5 && df.columns.contains("doc_name"))
  }

  test("non-sav and unsupported inputs fail loudly") {
    val junk = java.nio.file.Files.createTempFile("not_sav", ".sav")
    java.nio.file.Files.write(junk, "hello world definitely not spss".getBytes)
    assert(intercept[IllegalArgumentException] {
      SavScan.read(spark, junk.toString)
    }.getMessage.contains("not an SPSS"))
    val zsav = java.nio.file.Files.createTempFile("z", ".zsav")
    java.nio.file.Files.write(zsav, ("$FL3" + "x" * 200).getBytes)
    assert(intercept[IllegalArgumentException] {
      SavScan.read(spark, zsav.toString) // garbage layout code after a real magic
    }.getMessage.contains("layout"))
  }

  test("Tidier.read dispatches .sav by extension") {
    val df = Tidier.read(spark, fixture("sample_raw.sav")).df
    assert(df.count() == 5 && df.columns.contains("doc_name"))
  }
}
