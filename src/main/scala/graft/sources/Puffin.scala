package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Puffin file format — Apache Iceberg's container for table/file-level
  * auxiliary blobs (statistics sketches, and since format-version 3,
  * DELETION VECTORS). Implemented dependency-free from the public spec
  * (iceberg.apache.org/puffin-spec). The reference reads Iceberg through
  * a DuckDB extension (src/TidierDB.jl:209-212); here the container is
  * parsed directly so [[IcebergScan]] can apply v3 deletion vectors as a
  * Spark anti-join on `_metadata.row_index` — no connector jar.
  *
  * Wire layout (all public spec):
  * {{{
  *   Magic | Blob1 | Blob2 | ... | Magic | FooterPayload |
  *     FooterPayloadSize (i32 LE) | Flags (4 bytes) | Magic
  * }}}
  *  - Magic = 0x50 0x46 0x41 0x31 ("PFA1")
  *  - FooterPayload: UTF-8 JSON `{"blobs": [...], "properties": {...}}`,
  *    optionally LZ4-FRAME-compressed (flags byte 0, bit 0)
  *  - blob JSON: `type`, `fields`, `snapshot-id`, `sequence-number`,
  *    `offset`, `length`, optional `compression-codec`, `properties`
  *
  * Deletion-vector blobs (`deletion-vector-v1`, Iceberg spec §Position
  * Delete Files + Puffin spec §deletion-vector-v1) reuse Delta's exact
  * bitmap encoding, by design of the Iceberg spec:
  * {{{
  *   len(magic+vector) i32 BE | magic 1681511377 i32 LE |
  *     64-bit RoaringBitmapArray "portable" | crc32(magic+vector) i32 BE
  * }}}
  * so [[DeletionVectors.encode]]/[[DeletionVectors.decode]] serve both
  * formats. Per the spec, DV blob metadata sets `snapshot-id` and
  * `sequence-number` to -1 (the commit is not yet known when the file is
  * written) and readers ignore them; `properties` carries
  * `referenced-data-file` and `cardinality`.
  */
object Puffin {

  private val Magic: Array[Byte] = Array(0x50, 0x46, 0x41, 0x31).map(_.toByte)

  /** One blob's footer metadata. `offset`/`length` address the blob's
    * payload bytes inside the file (for DVs: starting at the i32 BE
    * length prefix — exactly what manifest `content_offset` /
    * `content_size_in_bytes` record). */
  final case class BlobMeta(
      blobType: String,
      fields: Seq[Int],
      snapshotId: Long,
      sequenceNumber: Long,
      offset: Long,
      length: Long,
      compressionCodec: Option[String],
      properties: Map[String, String])

  /** A blob to write: metadata (offset/length assigned by [[write]]) +
    * uncompressed payload. */
  final case class Blob(
      blobType: String,
      fields: Seq[Int],
      snapshotId: Long,
      sequenceNumber: Long,
      properties: Map[String, String],
      payload: Array[Byte])

  /** Write a Puffin file (uncompressed footer, uncompressed blobs — the
    * spec's `compression-codec` stays absent) and return each blob's
    * stamped metadata in input order. Creation is exclusive: Puffin
    * files are immutable once referenced by a commit. */
  def write(fs: FileSystem, path: Path, blobs: Seq[Blob],
      fileProperties: Map[String, String] = Map.empty): Seq[BlobMeta] = {
    val metas = Seq.newBuilder[BlobMeta]
    val out = fs.create(path, false)
    try {
      out.write(Magic)
      var pos = 4L
      blobs.foreach { b =>
        metas += BlobMeta(b.blobType, b.fields, b.snapshotId, b.sequenceNumber,
          pos, b.payload.length.toLong, scala.None, b.properties)
        out.write(b.payload)
        pos += b.payload.length
      }
      val mapper = new ObjectMapper()
      val root = mapper.createObjectNode()
      val arr = root.putArray("blobs")
      metas.result().foreach { m =>
        val n = arr.addObject()
        n.put("type", m.blobType)
        val f = n.putArray("fields")
        m.fields.foreach(f.add)
        n.put("snapshot-id", m.snapshotId)
        n.put("sequence-number", m.sequenceNumber)
        n.put("offset", m.offset)
        n.put("length", m.length)
        if (m.properties.nonEmpty) {
          val p = n.putObject("properties")
          m.properties.foreach { case (k, v) => p.put(k, v) }
        }
      }
      val props = root.putObject("properties")
      fileProperties.foreach { case (k, v) => props.put(k, v) }
      val payload = mapper.writeValueAsString(root).getBytes(StandardCharsets.UTF_8)
      out.write(Magic)
      out.write(payload)
      val tail = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      tail.putInt(payload.length)
      tail.putInt(0) // flags: footer uncompressed
      out.write(tail.array())
      out.write(Magic)
    } finally out.close()
    metas.result()
  }

  /** Read the footer: all blob metadata + file properties. Supports
    * uncompressed and LZ4-frame-compressed footer payloads (both spec
    * options; lz4-java ships with Spark). */
  def footer(conf: Configuration, path: Path): (Seq[BlobMeta], Map[String, String]) = {
    val fs = path.getFileSystem(conf)
    val len = fs.getFileStatus(path).getLen
    require(len >= 4 + 4 + 12,
      s"$path too short (${len}B) to be a Puffin file")
    val in = fs.open(path)
    try {
      val head = new Array[Byte](4)
      in.readFully(0L, head)
      require(head.sameElements(Magic), s"$path: bad Puffin header magic")
      val tail = new Array[Byte](12)
      in.readFully(len - 12, tail)
      val bb = ByteBuffer.wrap(tail).order(ByteOrder.LITTLE_ENDIAN)
      val payloadSize = bb.getInt
      val flags = bb.getInt
      require(tail.slice(8, 12).sameElements(Magic), s"$path: bad Puffin trailer magic")
      require(payloadSize >= 0 && payloadSize <= len - 20,
        s"$path: absurd footer payload size $payloadSize")
      val payloadStart = len - 12 - payloadSize
      val lead = new Array[Byte](4)
      in.readFully(payloadStart - 4, lead)
      require(lead.sameElements(Magic), s"$path: bad footer-start magic")
      val raw = new Array[Byte](payloadSize)
      in.readFully(payloadStart, raw)
      val compressed = (flags & 1) != 0
      require((flags & ~1) == 0, s"$path: reserved Puffin flag bits set ($flags)")
      val json = if (!compressed) raw else {
        val s = new net.jpountz.lz4.LZ4FrameInputStream(
          new java.io.ByteArrayInputStream(raw))
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          var n = s.read(chunk)
          while (n >= 0) { buf.write(chunk, 0, n); n = s.read(chunk) }
          buf.toByteArray
        } finally s.close()
      }
      val root = new ObjectMapper().readTree(new String(json, StandardCharsets.UTF_8))
      val blobs = Option(root.get("blobs")).toSeq
        .flatMap(_.elements().asScala)
        .map { n =>
          BlobMeta(
            blobType = n.get("type").asText(),
            fields = Option(n.get("fields")).toSeq
              .flatMap(_.elements().asScala).map(_.asInt()),
            snapshotId = Option(n.get("snapshot-id")).map(_.asLong()).getOrElse(-1L),
            sequenceNumber = Option(n.get("sequence-number")).map(_.asLong()).getOrElse(-1L),
            offset = n.get("offset").asLong(),
            length = n.get("length").asLong(),
            compressionCodec = Option(n.get("compression-codec")).map(_.asText()),
            properties = Option(n.get("properties")).map(p =>
              p.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
              .getOrElse(Map.empty))
        }
      val props = Option(root.get("properties")).map(p =>
        p.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
        .getOrElse(Map.empty)
      (blobs, props)
    } finally in.close()
  }

  /** Raw payload bytes of one blob (uncompressed blobs only — graft
    * writes none compressed; a compressed external blob refuses loudly
    * rather than decoding wrong). */
  def readBlob(conf: Configuration, path: Path, meta: BlobMeta): Array[Byte] = {
    require(meta.compressionCodec.isEmpty,
      s"$path: blob compression '${meta.compressionCodec.get}' not supported " +
        "by the built-in Puffin reader")
    readRange(conf, path, meta.offset, meta.length)
  }

  private def readRange(conf: Configuration, path: Path,
      offset: Long, length: Long): Array[Byte] = {
    require(length >= 0 && length <= Int.MaxValue, s"absurd blob length $length")
    val fs = path.getFileSystem(conf)
    val in = fs.open(path)
    try {
      val buf = new Array[Byte](length.toInt)
      in.readFully(offset, buf)
      buf
    } finally in.close()
  }

  // ---- deletion-vector-v1 blobs ----------------------------------------

  val DvBlobType = "deletion-vector-v1"

  /** Encode sorted deleted row positions as a `deletion-vector-v1` blob
    * payload: i32 BE length of (magic+vector), the Delta-shared
    * `<magic><RoaringBitmapArray portable>` bytes, i32 BE CRC-32 of
    * (magic+vector). */
  def dvPayload(positions: Array[Long]): Array[Byte] = {
    val data = DeletionVectors.encode(positions) // magic + portable bitmap
    val out = ByteBuffer.allocate(4 + data.length + 4).order(ByteOrder.BIG_ENDIAN)
    out.putInt(data.length)
    out.put(data)
    val crc = new java.util.zip.CRC32()
    crc.update(data)
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  /** Decode a `deletion-vector-v1` blob read straight from its manifest
    * address (`content_offset`, `content_size_in_bytes`) — no footer
    * round trip; the spec records the blob address in the delete-file
    * entry precisely so readers can skip it. Validates the length prefix
    * and CRC before trusting the bitmap. */
  def readDvPositions(conf: Configuration, path: Path,
      contentOffset: Long, contentSize: Long): Array[Long] = {
    val blob = readRange(conf, path, contentOffset, contentSize)
    require(blob.length >= 8, s"$path: DV blob shorter (${blob.length}B) than its framing")
    val bb = ByteBuffer.wrap(blob).order(ByteOrder.BIG_ENDIAN)
    val dataLen = bb.getInt
    require(dataLen == blob.length - 8,
      s"$path: DV blob declares ${dataLen}B but manifest length implies ${blob.length - 8}")
    val data = java.util.Arrays.copyOfRange(blob, 4, 4 + dataLen)
    val crc = new java.util.zip.CRC32()
    crc.update(data)
    val stored = ByteBuffer.wrap(blob, 4 + dataLen, 4).order(ByteOrder.BIG_ENDIAN).getInt
    require(stored == crc.getValue.toInt,
      s"$path: DV blob CRC mismatch (stored $stored, computed ${crc.getValue.toInt})")
    DeletionVectors.decode(data, data.length)
  }
}
