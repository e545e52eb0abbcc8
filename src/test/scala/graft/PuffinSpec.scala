package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path => JPath}

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._

import graft.sources.{IcebergScan, Puffin}

/** Puffin container codec + Iceberg v3 deletion-vector READ path, against
  * hand-built spec-shaped fixtures (no Iceberg jar anywhere in the loop —
  * the fixture bytes come straight from the published format rules, so a
  * graft bug and a fixture bug cannot cancel out). */
class PuffinSpec extends SparkSpec {

  private def conf = new Configuration()

  // ---- container round trips --------------------------------------------

  test("Puffin: write -> footer -> readBlob round trip, two blobs + properties") {
    val dir = Files.createTempDirectory("graft_puffin")
    val p = new HPath(dir.resolve("t.puffin").toString)
    val fs = p.getFileSystem(conf)
    val b1 = Puffin.Blob("test-blob", Seq(1), -1L, -1L,
      Map("k" -> "v1"), "payload-one".getBytes(StandardCharsets.UTF_8))
    val b2 = Puffin.Blob(Puffin.DvBlobType, Seq.empty, -1L, -1L,
      Map("referenced-data-file" -> "f.parquet", "cardinality" -> "3"),
      Puffin.dvPayload(Array(0L, 5L, 9L)))
    val metas = Puffin.write(fs, p, Seq(b1, b2), Map("created-by" -> "graft"))
    assert(metas.map(_.blobType) == Seq("test-blob", Puffin.DvBlobType))
    assert(metas.head.offset == 4L) // right after the header magic
    assert(metas(1).offset == 4L + b1.payload.length)

    val (read, props) = Puffin.footer(conf, p)
    assert(read == metas)
    assert(props == Map("created-by" -> "graft"))
    assert(Puffin.readBlob(conf, p, read.head)
      .sameElements(b1.payload))
    assert(Puffin.readDvPositions(conf, p, read(1).offset, read(1).length)
      .toSeq == Seq(0L, 5L, 9L))
  }

  test("Puffin: DV payload round-trips positions above 2^32 (multi-bitmap keys)") {
    val dir = Files.createTempDirectory("graft_puffin_hi")
    val p = new HPath(dir.resolve("hi.puffin").toString)
    val fs = p.getFileSystem(conf)
    val positions = Array(0L, 4095L, 4096L, 70000L, (1L << 32) + 7L, (3L << 32))
    val metas = Puffin.write(fs, p, Seq(Puffin.Blob(
      Puffin.DvBlobType, Seq.empty, -1L, -1L, Map.empty, Puffin.dvPayload(positions))))
    assert(Puffin.readDvPositions(conf, p, metas.head.offset, metas.head.length)
      .toSeq == positions.toSeq)
  }

  test("Puffin: corrupted DV blob CRC refuses loudly") {
    val dir = Files.createTempDirectory("graft_puffin_crc")
    val p = dir.resolve("bad.puffin")
    val hp = new HPath(p.toString)
    val fs = hp.getFileSystem(conf)
    val metas = Puffin.write(fs, hp, Seq(Puffin.Blob(
      Puffin.DvBlobType, Seq.empty, -1L, -1L, Map.empty, Puffin.dvPayload(Array(1L, 2L)))))
    val bytes = Files.readAllBytes(p)
    bytes(8) = (bytes(8) ^ 0x40).toByte // flip a bit inside the bitmap magic/vector
    Files.write(p, bytes)
    // drop Hadoop's LocalFileSystem checksum sidecar so the corruption
    // reaches graft's own CRC validation instead of ChecksumException
    Files.deleteIfExists(dir.resolve(".bad.puffin.crc"))
    val e = intercept[IllegalArgumentException] {
      Puffin.readDvPositions(conf, hp, metas.head.offset, metas.head.length)
    }
    assert(e.getMessage.contains("CRC") || e.getMessage.contains("magic"))
  }

  test("Puffin: LZ4-frame-compressed footer payload reads (spec flag bit 0)") {
    // hand-assemble a puffin whose FOOTER is lz4-frame compressed — the
    // one footer shape graft does not write but external writers may
    val dir = Files.createTempDirectory("graft_puffin_lz4")
    val p = dir.resolve("z.puffin")
    val payload = "blob-bytes".getBytes(StandardCharsets.UTF_8)
    val footerJson =
      s"""{"blobs":[{"type":"test-blob","fields":[],"snapshot-id":-1,
         |"sequence-number":-1,"offset":4,"length":${payload.length}}],
         |"properties":{}}""".stripMargin.replaceAll("\n", "")
    val compressed = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new net.jpountz.lz4.LZ4FrameOutputStream(bos)
      z.write(footerJson.getBytes(StandardCharsets.UTF_8)); z.close()
      bos.toByteArray
    }
    val out = new java.io.ByteArrayOutputStream()
    val magic = Array[Byte](0x50, 0x46, 0x41, 0x31)
    out.write(magic); out.write(payload); out.write(magic); out.write(compressed)
    val tail = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    tail.putInt(compressed.length); tail.putInt(1) // flags: compressed footer
    out.write(tail.array()); out.write(magic)
    Files.write(p, out.toByteArray)

    val (blobs, _) = Puffin.footer(conf, new HPath(p.toString))
    assert(blobs.map(b => (b.blobType, b.offset, b.length)) ==
      Seq(("test-blob", 4L, payload.length.toLong)))
  }

  // ---- v3 table end-to-end ----------------------------------------------

  /** manifest_entry schema carrying the v3 DV fields (143-145). */
  private val entrySchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"sequence_number","type":["null","long"],"default":null},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |  {"name":"content","type":"int","default":0},
      |  {"name":"file_path","type":"string"},
      |  {"name":"file_format","type":"string"},
      |  {"name":"record_count","type":"long"},
      |  {"name":"referenced_data_file","type":["null","string"],"default":null},
      |  {"name":"content_offset","type":["null","long"],"default":null},
      |  {"name":"content_size_in_bytes","type":["null","long"],"default":null}]}}]}"""
      .stripMargin)

  private val listSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"content","type":"int","default":0},
      |{"name":"sequence_number","type":["null","long"],"default":null}]}""".stripMargin)

  private def writeAvro(path: JPath, schema: Schema, records: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, path.toFile)
    records.foreach(w.append)
    w.close()
  }

  private def entry(status: Int, filePath: String, fmt: String, rows: Long,
      content: Int = 0, seq: Option[Long] = None,
      dv: Option[(String, Long, Long)] = None): GenericRecord = {
    val df = new GenericData.Record(entrySchema.getField("data_file").schema())
    df.put("content", content)
    df.put("file_path", filePath)
    df.put("file_format", fmt)
    df.put("record_count", rows)
    dv.foreach { case (ref, off, len) =>
      df.put("referenced_data_file", ref)
      df.put("content_offset", Long.box(off))
      df.put("content_size_in_bytes", Long.box(len))
    }
    val e = new GenericData.Record(entrySchema)
    e.put("status", status)
    seq.foreach(s => e.put("sequence_number", Long.box(s)))
    e.put("data_file", df)
    e
  }

  private def listEntry(path: String, content: Int, seq: Long): GenericRecord = {
    val r = new GenericData.Record(listSchema)
    r.put("manifest_path", path)
    r.put("manifest_length", 0L)
    r.put("content", content)
    r.put("sequence_number", Long.box(seq))
    r
  }

  /** Build a v3-shaped table: two data files, one Puffin DV deleting
    * rows 0 and 2 of file A. Returns (tableDir, dv seq used). */
  private def buildV3Table(dvSeq: Long): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ice_v3")
    val meta = dir.resolve("metadata"); Files.createDirectory(meta)
    val data = dir.resolve("data"); Files.createDirectory(data)

    def oneFile(path: JPath, rows: Seq[(Long, String)]): Unit = {
      val tmp = Files.createTempDirectory("graft_v3_part")
      rows.toDF("id", "v").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(part, path)
    }
    oneFile(data.resolve("a.parquet"), Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    oneFile(data.resolve("b.parquet"), Seq((10L, "x"), (11L, "y")))

    // DV: delete positions 0 and 2 of a.parquet (ids 1 and 3)
    val puffinPath = new HPath(data.resolve("dv.puffin").toString)
    val payload = Puffin.dvPayload(Array(0L, 2L))
    val metas = Puffin.write(puffinPath.getFileSystem(conf), puffinPath,
      Seq(Puffin.Blob(Puffin.DvBlobType, Seq.empty, -1L, -1L,
        Map("referenced-data-file" -> s"$dir/data/a.parquet", "cardinality" -> "2"),
        payload)))

    writeAvro(meta.resolve("m1.avro"), entrySchema, Seq(
      entry(1, s"$dir/data/a.parquet", "PARQUET", 4, seq = Some(1L)),
      entry(1, s"$dir/data/b.parquet", "PARQUET", 2, seq = Some(1L))))
    writeAvro(meta.resolve("m2.avro"), entrySchema, Seq(
      entry(1, s"$dir/data/dv.puffin", "PUFFIN", 2, content = 1, seq = Some(dvSeq),
        dv = Some((s"$dir/data/a.parquet", metas.head.offset, metas.head.length)))))
    writeAvro(meta.resolve("l1.avro"), listSchema, Seq(
      listEntry(s"$dir/metadata/m1.avro", 0, 1L),
      listEntry(s"$dir/metadata/m2.avro", 1, dvSeq)))

    val schemaJson =
      """{"type":"struct","schema-id":0,"fields":[
        |{"id":1,"name":"id","required":true,"type":"long"},
        |{"id":2,"name":"v","required":false,"type":"string"}]}""".stripMargin
    Files.write(meta.resolve("v1.metadata.json"),
      s"""{"format-version":3,"table-uuid":"extv3","location":"$dir",
         |"current-schema-id":0,"schemas":[$schemaJson],
         |"partition-specs":[{"spec-id":0,"fields":[]}],"default-spec-id":0,
         |"last-sequence-number":$dvSeq,"next-row-id":6,
         |"current-snapshot-id":1,
         |"snapshots":[{"snapshot-id":1,"sequence-number":$dvSeq,"first-row-id":0,
         |"manifest-list":"$dir/metadata/l1.avro"}]}"""
        .stripMargin.replaceAll("\n", "").getBytes(StandardCharsets.UTF_8))
    Files.write(meta.resolve("version-hint.text"), "1".getBytes(StandardCharsets.UTF_8))
    dir.toString
  }

  test("Iceberg v3: a Puffin deletion vector drops its rows from the read") {
    val dir = buildV3Table(dvSeq = 2L)
    val got = IcebergScan.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    // positions 0 and 2 of a.parquet (ids 1, 3) are deleted
    assert(got == Seq((2L, "b"), (4L, "d"), (10L, "x"), (11L, "y")))
    // pruned read still applies the DV
    val filtered = IcebergScan.read(spark, dir,
      skippingFilter = Some(col("id") < 10L)).orderBy("id").collect()
      .map(_.getLong(0)).toSeq
    assert(filtered == Seq(2L, 4L))
  }

  test("Iceberg v3: a stale DV (sequence below the data file's) does not apply") {
    val dir = buildV3Table(dvSeq = 0L) // data files carry seq 1
    val got = IcebergScan.read(spark, dir).orderBy("id").collect()
      .map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L, 3L, 4L, 10L, 11L))
  }
}
