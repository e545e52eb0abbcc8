package graft

import org.apache.spark.sql.types._

import graft.sources.ArrowScan

/** Built-in Arrow IPC reader against fixtures written by an
  * INDEPENDENT real writer (pyarrow, checked in as test resources) —
  * spec compliance, not a self round-trip. Covers the file format
  * (uncompressed + lz4-compressed feather v2), the stream format, and
  * multi-batch files. */
class ArrowScanSpec extends SparkSpec {

  private def fixture(name: String): String =
    getClass.getResource(s"/arrow/$name").getPath

  private val expectedSchema = StructType(Seq(
    StructField("i8", ByteType), StructField("i16", ShortType),
    StructField("i32", IntegerType), StructField("i64", LongType),
    StructField("f32", FloatType), StructField("f64", DoubleType),
    StructField("flag", BooleanType), StructField("s", StringType),
    StructField("b", BinaryType), StructField("d", DateType),
    StructField("ts", TimestampType), StructField("dec", DecimalType(10, 2)),
    StructField("arr", ArrayType(LongType, containsNull = true)),
    StructField("st", StructType(Seq(
      StructField("a", LongType), StructField("bb", StringType))))))

  private def checkRows(rows: Array[org.apache.spark.sql.Row]): Unit = {
    assert(rows.length == 3)
    val r0 = rows(0); val r1 = rows(1); val r2 = rows(2)
    assert(r0.getByte(0) == 1 && r1.getByte(0) == -2 && r2.isNullAt(0))
    assert(r0.getShort(1) == 100 && r1.getShort(1) == -200)
    assert(r0.getInt(2) == 1000 && r1.getInt(2) == -2000)
    assert(r0.getLong(3) == 1000000000000L && r1.getLong(3) == -1000000000000L)
    assert(r0.getFloat(4) == 1.5f && r1.getFloat(4) == -0.5f)
    assert(r0.getDouble(5) == 2.25 && r1.getDouble(5) == -2.5)
    assert(r0.getBoolean(6) && !r1.getBoolean(6) && r2.isNullAt(6))
    assert(r0.getString(7) == "hello")
    assert(r1.getString(7) == "𝄞 non-bmp 🚀")
    assert(r0.getAs[Array[Byte]](8).toSeq == Seq[Byte](1, 2))
    assert(r1.getAs[Array[Byte]](8).isEmpty)
    assert(r0.getDate(9).toString == "2020-01-02")
    assert(r1.getDate(9).toString == "1969-12-31")
    assert(r0.getTimestamp(10).toInstant.toString == "2021-03-04T05:06:07.123456Z")
    assert(r0.getDecimal(11) == new java.math.BigDecimal("12345.67"))
    assert(r1.getDecimal(11) == new java.math.BigDecimal("-0.01"))
    assert(r0.getSeq[Long](12) == Seq(1L, 2L, 3L))
    assert(r1.getSeq[Long](12).isEmpty && r2.isNullAt(12))
    assert(r0.getStruct(13).getLong(0) == 7L && r0.getStruct(13).getString(1) == "x")
    assert(r2.isNullAt(13))
  }

  test("file format, uncompressed: schema + all mapped types + nulls + non-BMP") {
    val df = ArrowScan.read(spark, fixture("typed.arrow"))
    assert(df.schema == expectedSchema)
    checkRows(df.orderBy(org.apache.spark.sql.functions.col("i8").desc_nulls_last).collect())
  }

  test("feather v2 with lz4-compressed buffers decodes identically") {
    val df = ArrowScan.read(spark, fixture("typed_lz4.feather"))
    assert(df.schema == expectedSchema)
    checkRows(df.orderBy(org.apache.spark.sql.functions.col("i8").desc_nulls_last).collect())
  }

  test("stream format (.arrows) decodes identically") {
    val df = ArrowScan.read(spark, fixture("typed.arrows"))
    assert(df.schema == expectedSchema)
    checkRows(df.orderBy(org.apache.spark.sql.functions.col("i8").desc_nulls_last).collect())
  }

  test("multi-batch file concatenates batches; Tidier.read dispatches by extension") {
    val df = ArrowScan.read(spark, fixture("multi.arrow"))
    assert(df.count() == 9)
    assert(df.filter(org.apache.spark.sql.functions.col("i8") === 1).count() == 3)
    val viaTidier = Tidier.read(spark, fixture("typed.arrow")).df
    assert(viaTidier.schema == expectedSchema && viaTidier.count() == 3)
  }

  test("junk input fails loudly") {
    val junk = java.nio.file.Files.createTempFile("not_arrow", ".arrow")
    java.nio.file.Files.write(junk, "this is not an arrow file at all".getBytes)
    intercept[Exception] { ArrowScan.read(spark, junk.toString).collect() }
  }

  test("ArrowWrite round-trips every supported scalar type incl. nulls; writeFile dispatches") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, "hello", true), (2L, "𝄞 non-bmp 🚀", false), (3L, null.asInstanceOf[String], true)
    ).toDF("id", "s", "flag")
      .withColumn("ts", when(col("id") =!= 3L, timestamp_micros(col("id") * 1000000L)))
      .withColumn("dec", col("id").cast("decimal(10,2)"))
      .withColumn("d", to_date(concat(lit("2021-06-0"), col("id").cast("string"))))
      .withColumn("f32", (col("id") / 2).cast("float"))
      .withColumn("i32", col("id").cast("int"))
      .withColumn("b", when(col("id") === 1L, lit(Array[Byte](9, 8))))
    // written to target/ (not a temp) so the dev loop can cross-read it
    // with pyarrow — the independent-reader check for the WRITE side
    val out = new java.io.File("target/arrow-write-out")
    out.mkdirs()
    val path = s"${out.getPath}/roundtrip.arrow"
    graft.sources.ArrowWrite.write(df, path)
    val back = ArrowScan.read(spark, path).orderBy("id").collect()
    val orig = df.orderBy("id").collect()
    assert(back.length == orig.length)
    orig.zip(back).foreach { case (a, b) =>
      (0 until a.length).foreach { i =>
        val (x, y) = (a.get(i), b.get(i))
        (x, y) match {
          case (p: Array[Byte], q: Array[Byte]) => assert(p.toSeq == q.toSeq)
          case _ => assert(x == y, s"col $i: $x != $y")
        }
      }
    }
    // Tidier writeFile dispatches .arrow to ArrowWrite
    val path2 = s"${out.getPath}/via_writefile.arrow"
    Tidier.from(df.select("id", "s")).writeFile(path2)
    assert(ArrowScan.read(spark, path2).count() == 3)
    // non-scalar columns fail loudly
    intercept[IllegalArgumentException] {
      graft.sources.ArrowWrite.write(
        df.withColumn("arr", array(col("id"))), s"${out.getPath}/bad.arrow")
    }
  }

  test("single-file size guard: arrow/avro writes refuse past maxRows, point at the sharded sink, leave no partial file") {
    import spark.implicits._
    val df = (1L to 100L).toDF("id")
    val out = new java.io.File("target/arrow-guard-out")
    out.mkdirs()
    val pArrow = s"${out.getPath}/big.arrow"
    val eA = intercept[IllegalArgumentException] {
      graft.sources.ArrowWrite.write(df, pArrow, maxRows = 10L)
    }
    assert(eA.getMessage.contains("writeSharded") &&
      eA.getMessage.contains("maxRows=10"), s"wrong refusal: $eA")
    assert(!new java.io.File(pArrow).exists(),
      "a refused arrow export must delete its partial file")
    val pAvro = s"${out.getPath}/big.avro"
    val eV = intercept[IllegalArgumentException] {
      graft.sources.AvroWrite.write(df, pAvro, maxRows = 10L)
    }
    assert(eV.getMessage.contains("writeSharded"), s"wrong refusal: $eV")
    assert(!new java.io.File(pAvro).exists(),
      "a refused avro export must delete its partial file")
    // at or under the threshold both formats round-trip unchanged
    graft.sources.ArrowWrite.write(df, pArrow, maxRows = 100L)
    assert(ArrowScan.read(spark, pArrow).count() == 100L)
    graft.sources.AvroWrite.write(df, pAvro, maxRows = 100L)
    assert(graft.sources.AvroScan.read(spark, pAvro).count() == 100L)
  }

  test("writeSharded: one IPC file per partition, manifest commit, distributed read-back") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1L to 1000L).map(i => (i, s"doc_$i", i % 7 == 0)).toDF("id", "s", "flag")
      .withColumn("dec", col("id").cast("decimal(12,3)"))
      .repartition(4, col("id"))
    // target/ (not temp) so the dev loop can cross-read the shards +
    // manifest with pyarrow (tools/crossread_shards.py) — the
    // independent-reader check for the executor write path
    val dir = new java.io.File("target/arrow-write-out/sharded")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    // a stray part file from a "lost task attempt" must be cleaned at commit
    dir.mkdirs()
    java.nio.file.Files.write(dir.toPath.resolve("part-00099-deadbeef.arrow"),
      Array[Byte](1, 2, 3))
    val written = graft.sources.ArrowWrite.writeSharded(df, dir.getPath, batchRows = 100)
    assert(written.size == 4, s"expected 4 shards, got ${written.map(_._1)}")
    assert(written.map(_._2).sum == 1000L)
    assert(new java.io.File(dir, "_manifest.json").exists())
    assert(!new java.io.File(dir, "part-00099-deadbeef.arrow").exists(),
      "stray uncommitted part file survived commit cleanup")
    // every shard is an independently-valid IPC FILE (magic ARROW1)
    written.foreach { case (name, _) =>
      val head = java.nio.file.Files.readAllBytes(dir.toPath.resolve(name)).take(6)
      assert(new String(head, "US-ASCII") == "ARROW1", s"$name is not IPC file format")
    }
    // distributed read-back equals the original frame
    val back = graft.sources.ArrowScan.readSharded(spark, dir.getPath)
    assert(back.rdd.getNumPartitions >= 2, "sharded read should parallelize over files")
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
    // single-file read of one shard also works (plain Arrow consumers)
    assert(written.map { case (n, _) =>
      graft.sources.ArrowScan.read(spark, s"${dir.getPath}/$n").count()
    }.sum == 1000L)
  }

  test("readSharded fails loudly on writer shards without a manifest (half-failed job)") {
    import spark.implicits._
    val df = (1L to 10L).toDF("id")
    val dir = new java.io.File("target/arrow-write-out/uncommitted")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    graft.sources.ArrowWrite.writeSharded(df.repartition(2), dir.getPath)
    // simulate a job that died between task writes and driver commit
    assert(new java.io.File(dir, "_manifest.json").delete())
    val e = intercept[IllegalStateException] {
      graft.sources.ArrowScan.readSharded(spark, dir.getPath).count()
    }
    assert(e.getMessage.contains("_manifest.json"))
    // hand-assembled dirs (non-writer part names) keep the glob path
    val hand = new java.io.File("target/arrow-write-out/hand")
    org.apache.commons.io.FileUtils.deleteQuietly(hand)
    hand.mkdirs()
    val shard = new java.io.File(dir,
      dir.listFiles().map(_.getName).filter(_.endsWith(".arrow")).head)
    java.nio.file.Files.copy(shard.toPath, hand.toPath.resolve("part-0.arrow"))
    assert(graft.sources.ArrowScan.readSharded(spark, hand.getPath).count() > 0L)
  }
}
