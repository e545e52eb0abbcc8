package graft

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.functions._
import graft.sources.{AvroScan, AvroWrite}

/** [[AvroScan]] against fixtures authored directly with avro-core's
  * official GenericDatumWriter (container framing + encoding by the
  * Apache reference implementation, values hand-constructed — the
  * mapping code under test never touches the fixture side), plus the
  * write→read round trip and the Tidier dispatch surface. */
class AvroScanSpec extends SparkSpec {

  private def writeFixture(schema: Schema, recs: Seq[GenericRecord]): String = {
    val f = java.nio.file.Files.createTempFile("graft_avro_fix", ".avro")
    f.toFile.deleteOnExit()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, f.toFile)
    recs.foreach(w.append)
    w.close()
    f.toString
  }

  test("scalar types, logical types, nullable unions") {
    val schema = SchemaBuilder.record("r").fields()
      .requiredLong("id")
      .optionalString("s")
      .requiredBoolean("b")
      .requiredInt("i")
      .requiredFloat("f")
      .requiredDouble("d")
      .name("dt").`type`(LogicalTypes.date()
        .addToSchema(Schema.create(Schema.Type.INT))).noDefault()
      .name("ts").`type`(LogicalTypes.timestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))).noDefault()
      .name("dec").`type`(LogicalTypes.decimal(10, 2)
        .addToSchema(Schema.create(Schema.Type.BYTES))).noDefault()
      .requiredBytes("bin")
      .endRecord()
    def rec(id: Long, s: String): GenericRecord = {
      val r = new GenericData.Record(schema)
      r.put("id", id); r.put("s", s); r.put("b", id % 2 == 0)
      r.put("i", id.toInt * 10); r.put("f", id.toFloat / 2); r.put("d", id * 1.5)
      r.put("dt", 19000 + id.toInt) // days since epoch
      r.put("ts", 1700000000000000L + id * 1000000L) // micros
      r.put("dec", java.nio.ByteBuffer.wrap(
        java.math.BigDecimal.valueOf(id * 100 + 25, 2).unscaledValue().toByteArray))
      r.put("bin", java.nio.ByteBuffer.wrap(Array[Byte](id.toByte, 0x7f)))
      r
    }
    val path = writeFixture(schema, Seq(rec(1, "one"), rec(2, null), rec(3, "three")))
    val df = AvroScan.read(spark, path).orderBy("id")
    val rows = df.collect()
    assert(rows.length == 3)
    assert(df.schema("s").nullable && !df.schema("id").nullable)
    val r1 = rows(0)
    assert(r1.getLong(0) == 1L && r1.getString(1) == "one" && !r1.getBoolean(2))
    assert(r1.getInt(3) == 10 && r1.getFloat(4) == 0.5f && r1.getDouble(5) == 1.5)
    assert(r1.getDate(6).toLocalDate == java.time.LocalDate.ofEpochDay(19001))
    assert(r1.getTimestamp(7).getTime == 1700000001000L)
    assert(r1.getDecimal(8).compareTo(new java.math.BigDecimal("1.25")) == 0)
    assert(r1.getAs[Array[Byte]](9).sameElements(Array[Byte](1, 0x7f)))
    assert(rows(1).isNullAt(1)) // optional string null survives
  }

  test("nested record, array, map, enum") {
    val inner = SchemaBuilder.record("pt").fields()
      .requiredInt("x").requiredInt("y").endRecord()
    val schema = SchemaBuilder.record("r").fields()
      .requiredLong("id")
      .name("p").`type`(inner).noDefault()
      .name("xs").`type`().array().items().longType().noDefault()
      .name("m").`type`().map().values().stringType().noDefault()
      .name("e").`type`().enumeration("color").symbols("RED", "BLUE").noDefault()
      .endRecord()
    val r = new GenericData.Record(schema)
    r.put("id", 7L)
    val p = new GenericData.Record(inner); p.put("x", 3); p.put("y", 4)
    r.put("p", p)
    r.put("xs", java.util.Arrays.asList(1L, 2L, 3L))
    r.put("m", Map("k1" -> "v1", "k2" -> "v2").asJava)
    r.put("e", new GenericData.EnumSymbol(schema.getField("e").schema(), "BLUE"))
    val df = AvroScan.read(spark, writeFixture(schema, Seq(r)))
    val row = df.collect()(0)
    assert(row.getStruct(1).getInt(0) == 3 && row.getStruct(1).getInt(1) == 4)
    assert(row.getSeq[Long](2) == Seq(1L, 2L, 3L))
    assert(row.getMap[String, String](3) == Map("k1" -> "v1", "k2" -> "v2"))
    assert(row.getString(4) == "BLUE")
  }

  test("write -> read round trip over fixture documents") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"),
        timestamp_micros(col("doc_id") * 1000000L).as("ts"),
        col("doc_id").cast("decimal(10,2)").as("dec"),
        (col("doc_id") % 2 === 0).as("flag"),
        col("n_chars").cast("int").as("nc"))
      .orderBy("doc_id")
    val f = java.nio.file.Files.createTempFile("graft_avro_rt", ".avro")
    f.toFile.deleteOnExit()
    AvroWrite.write(docs, f.toString)
    val back = Tidier.read(spark, f.toString).df.orderBy("doc_id")
    assert(back.schema.map(f2 => (f2.name, f2.dataType)) ==
      docs.schema.map(f2 => (f2.name, f2.dataType)))
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("writeSharded: one container per partition, manifest commit, distributed read-back") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"),
        timestamp_micros(col("doc_id") * 1000000L).as("ts"),
        col("doc_id").cast("decimal(10,2)").as("dec"))
      .repartition(3, col("doc_id"))
    // target/ so the dev loop can cross-read shards with avro-tools/
    // python (tools/crossread_shards.py)
    val dir = new java.io.File("target/avro-write-out/sharded")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    val written = graft.sources.AvroWrite.writeSharded(docs, dir.getPath)
    assert(written.size == 3, s"expected 3 shards, got ${written.map(_._1)}")
    assert(written.map(_._2).sum == docs.count())
    assert(new java.io.File(dir, "_manifest.json").exists())
    // every shard is an independently-valid Avro object container
    // (magic 'Obj\x01') readable by the avro-core single-file reader
    written.foreach { case (name, _) =>
      val head = java.nio.file.Files.readAllBytes(dir.toPath.resolve(name)).take(4)
      assert(head.toSeq == Seq[Byte]('O', 'b', 'j', 1), s"$name is not an Avro container")
    }
    assert(written.map { case (n, _) =>
      AvroScan.read(spark, s"${dir.getPath}/$n").count()
    }.sum == docs.count())
    // distributed read-back equals the original frame
    val back = graft.sources.AvroScan.readSharded(spark, dir.getPath)
    assert(back.schema.map(f2 => (f2.name, f2.dataType)) ==
      docs.schema.map(f2 => (f2.name, f2.dataType)))
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("explicit-format read falls back without the spark-avro jar") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet").select("doc_id", "lang")
    val f = java.nio.file.Files.createTempFile("graft_avro_fb", ".avro")
    f.toFile.deleteOnExit()
    AvroWrite.write(docs, f.toString)
    val back = Tidier.read(spark, f.toString, "avro").df
    assert(back.count() == docs.count())
  }

  test("unsupported shapes fail loudly") {
    // non-record top level
    val arrSchema = Schema.createArray(Schema.create(Schema.Type.LONG))
    intercept[Exception] {
      val f = java.nio.file.Files.createTempFile("graft_avro_bad", ".avro")
      f.toFile.deleteOnExit()
      val w = new DataFileWriter[Any](
        new GenericDatumWriter[Any](arrSchema))
      w.create(arrSchema, f.toFile)
      w.append(java.util.Arrays.asList(1L))
      w.close()
      AvroScan.read(spark, f.toString)
    }
    // nested column through the scalar writer
    intercept[IllegalArgumentException] {
      import spark.implicits._
      AvroWrite.write(Seq((1L, Seq(1, 2))).toDF("a", "b"), "/tmp/never.avro")
    }
  }

  test("orc dispatch: write and read through Tidier") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString + "/d.orc"
    Tidier.from(docs).writeFile(dir)
    val back = Tidier.read(spark, dir).df
    assert(back.orderBy("doc_id").exceptAll(docs.orderBy("doc_id")).isEmpty)
    assert(back.schema == docs.schema)
  }
}
