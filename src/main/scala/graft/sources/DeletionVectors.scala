package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Delta Lake deletion-vector decoding, dependency-free per the public
  * protocol spec (github.com/delta-io/delta PROTOCOL.md, "Deletion
  * Vector Descriptor Schema" + "Deletion Vector Format"). The reference
  * reads DV tables through a DuckDB extension (src/TidierDB.jl:209-212);
  * here the stored bitmaps are parsed directly so `DeltaScan` can apply
  * them as a Spark anti-join on `_metadata.row_index` — row-level
  * deletes without a connector jar.
  *
  * Wire format recap (all public spec):
  *  - descriptor `storageType`: "u" (UUID-named file under the table,
  *    pathOrInlineDv = optional random prefix + 20-char Z85 UUID),
  *    "p" (absolute path), "i" (inline, pathOrInlineDv = Z85 of the data)
  *  - on-disk file: 1-byte format version, then per-DV blocks; the
  *    descriptor `offset` points at a 4-byte BIG-endian length, followed
  *    by `sizeInBytes` bytes of data (a CRC-32 trails it; not needed for
  *    reads)
  *  - DV data: 4-byte LITTLE-endian magic 1681511377, then a 64-bit
  *    RoaringBitmapArray in "portable" form: int64 LE bitmap count, then
  *    each 32-bit RoaringBitmap (index = high 32 bits of the values) in
  *    the standard interoperable Roaring serialization
  *    (github.com/RoaringBitmap/RoaringFormatSpec)
  */
object DeletionVectors {

  /** Java-serializable Hadoop `Configuration` carrier so DV decoding can
    * run in executor tasks (Spark's own equivalent is `private[spark]`). */
  final class ConfHolder(@transient private var conf: Configuration) extends Serializable {
    def value: Configuration = conf
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      conf.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      conf = new Configuration(false)
      conf.readFields(in)
    }
  }

  /** Deletion-vector descriptor as recorded on an `add` action. */
  final case class Descriptor(
      storageType: String,
      pathOrInlineDv: String,
      offset: Option[Int],
      sizeInBytes: Int,
      cardinality: Long)

  // ---- Z85 (ZeroMQ spec 32) -----------------------------------------------

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val z85Dec: Array[Int] = {
    val a = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"Z85 input length ${s.length} is not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    var o = 0
    while (i < s.length) {
      var acc = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val v = if (c < 128) z85Dec(c) else -1
        require(v >= 0, s"invalid Z85 character '$c' in deletion-vector reference")
        acc = acc * 85 + v
        j += 1
      }
      require(acc <= 0xFFFFFFFFL, "Z85 group overflows 32 bits")
      out(o) = ((acc >>> 24) & 0xFF).toByte
      out(o + 1) = ((acc >>> 16) & 0xFF).toByte
      out(o + 2) = ((acc >>> 8) & 0xFF).toByte
      out(o + 3) = (acc & 0xFF).toByte
      i += 5
      o += 4
    }
    out
  }

  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, "Z85 encodes 4-byte groups")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var acc = 0L
      var j = 0
      while (j < 4) { acc = (acc << 8) | (bytes(i + j) & 0xFFL); j += 1 }
      val chars = new Array[Char](5)
      var k = 4
      while (k >= 0) { chars(k) = Z85Alphabet((acc % 85).toInt); acc /= 85; k -= 1 }
      sb.appendAll(chars)
      i += 4
    }
    sb.toString
  }

  /** Resolve a "u"-storage descriptor to its on-disk file:
    * `<table>/[<prefix>/]deletion_vector_<uuid>.bin` where the UUID is
    * the Z85-decoded 20-char tail of `pathOrInlineDv`. */
  def uuidFile(tablePath: String, pathOrInlineDv: String): Path = {
    require(pathOrInlineDv.length >= 20,
      s"'u' deletion-vector reference '$pathOrInlineDv' shorter than a Z85 UUID")
    val prefix = pathOrInlineDv.dropRight(20)
    val bb = ByteBuffer.wrap(z85Decode(pathOrInlineDv.takeRight(20)))
    val uuid = new java.util.UUID(bb.getLong, bb.getLong)
    val name = s"deletion_vector_$uuid.bin"
    if (prefix.isEmpty) new Path(tablePath, name)
    else new Path(new Path(tablePath, prefix), name)
  }

  /** All deleted row indexes for one descriptor, reading the stored file
    * (or decoding the inline payload). Runs driver- or executor-side;
    * memory is bounded by the descriptor's declared cardinality. */
  def readPositions(conf: Configuration, tablePath: String, d: Descriptor): Array[Long] = {
    val data = d.storageType match {
      case "i" =>
        val raw = z85Decode(d.pathOrInlineDv)
        require(raw.length >= d.sizeInBytes,
          s"inline deletion vector shorter (${raw.length}) than declared size ${d.sizeInBytes}")
        raw
      case "u" | "p" =>
        val file =
          if (d.storageType == "p") new Path(d.pathOrInlineDv)
          else uuidFile(tablePath, d.pathOrInlineDv)
        val fs = file.getFileSystem(conf)
        val in = fs.open(file)
        try {
          // descriptor offset points at the 4-byte big-endian length that
          // precedes this DV's data inside the (possibly multi-DV) file
          in.seek(d.offset.getOrElse(1).toLong)
          val szBuf = new Array[Byte](4)
          in.readFully(szBuf)
          val size = ByteBuffer.wrap(szBuf).order(ByteOrder.BIG_ENDIAN).getInt
          require(size == d.sizeInBytes,
            s"deletion vector at ${file} declares $size bytes on disk but " +
              s"${d.sizeInBytes} in the descriptor")
          val buf = new Array[Byte](size)
          in.readFully(buf)
          buf
        } finally in.close()
      case other =>
        throw new IllegalArgumentException(
          s"deletion-vector storage type '$other' is not in the Delta protocol (u/i/p)")
    }
    val positions = decode(data, d.sizeInBytes)
    require(positions.length == d.cardinality,
      s"deletion vector decoded ${positions.length} rows but descriptor declares ${d.cardinality}")
    positions
  }

  // ---- encoding (the write side of the same public formats) -----------

  /** Serialize sorted row indexes into `<magic><RoaringBitmapArray
    * portable>` — the exact inverse of [[decode]]: one 32-bit
    * RoaringBitmap per high-32-bit key (empties included, the array is
    * dense), each in the interoperable no-run serialization (array
    * containers ≤4096 values, bitset containers above). */
  private[graft] def encode(positions: Array[Long]): Array[Byte] = {
    require(positions.sameElements(positions.sorted), "positions must be sorted")
    val nBitmaps = if (positions.isEmpty) 0L else (positions.last >>> 32) + 1
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
      out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
    }
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >>> 8) & 0xFF) }
    def le64(v: Long): Unit = { le32(v.toInt); le32((v >>> 32).toInt) }
    le32(1681511377) // magic
    le64(nBitmaps)
    var key = 0L
    var idx = 0
    while (key < nBitmaps) {
      // values of this 32-bit bitmap
      val start = idx
      while (idx < positions.length && (positions(idx) >>> 32) == key) idx += 1
      val vals = java.util.Arrays.copyOfRange(positions, start, idx)
        .map(p => (p & 0xFFFFFFFFL).toInt)
      // group into containers by high 16 bits of the 32-bit value
      val containers = vals.groupBy(v => (v >>> 16) & 0xFFFF).toSeq.sortBy(_._1)
      le32(12346) // SERIAL_COOKIE_NO_RUN
      le32(containers.size)
      containers.foreach { case (k, vs) => le16(k); le16(vs.length - 1) }
      // offset header (always present with the no-run cookie): byte
      // offsets of each container's data from the bitmap's start
      val headerLen = 4 + 4 + containers.size * 4 + containers.size * 4
      var off = headerLen
      containers.foreach { case (_, vs) =>
        le32(off)
        off += (if (vs.length <= 4096) vs.length * 2 else 8192)
      }
      containers.foreach { case (_, vs) =>
        if (vs.length <= 4096) vs.foreach(v => le16(v & 0xFFFF))
        else {
          val words = new Array[Long](1024)
          vs.foreach { v =>
            val low = v & 0xFFFF
            words(low >>> 6) |= (1L << (low & 63))
          }
          words.foreach(le64)
        }
      }
      key += 1
    }
    out.toByteArray
  }

  /** Write one deletion vector as a 'u'-storage file under the table
    * root (`deletion_vector_<uuid>.bin`: 1-byte format version, 4-byte
    * BIG-endian length, data, 4-byte BIG-endian CRC-32) and return its
    * descriptor. Safe to call from executor tasks (pass the conf via
    * [[ConfHolder]]). */
  private[graft] def writeDvFile(conf: Configuration, tablePath: String,
      positions: Array[Long]): Descriptor = {
    val data = encode(positions)
    val uuid = java.util.UUID.randomUUID()
    val bb = ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    val ref = z85Encode(bb.array())
    val file = new Path(tablePath, s"deletion_vector_$uuid.bin")
    val fs = file.getFileSystem(conf)
    val outS = fs.create(file, false)
    try {
      outS.write(1) // format version
      val lenBuf = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(data.length)
      outS.write(lenBuf.array())
      outS.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(data)
      val crcBuf = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
        .putInt(crc.getValue.toInt)
      outS.write(crcBuf.array())
    } finally outS.close()
    Descriptor("u", ref, Some(1), data.length, positions.length.toLong)
  }

  /** Parse `<magic><RoaringBitmapArray portable>` into sorted row indexes. */
  private[graft] def decode(data: Array[Byte], size: Int): Array[Long] = {
    val bb = ByteBuffer.wrap(data, 0, size).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt
    require(magic == 1681511377, s"bad deletion-vector magic $magic (want 1681511377)")
    val nBitmaps = bb.getLong
    require(nBitmaps >= 0 && nBitmaps <= Int.MaxValue, s"absurd bitmap count $nBitmaps")
    val out = new ArrayBuffer[Long]()
    var key = 0L
    while (key < nBitmaps) {
      readRoaring32(bb, key << 32, out)
      key += 1
    }
    out.toArray
  }

  private val SerialCookie = 12347 // with run containers
  private val SerialCookieNoRun = 12346
  private val NoOffsetThreshold = 4

  /** One 32-bit RoaringBitmap in the interoperable format; values are
    * emitted as `high | v` in ascending order (containers are stored in
    * key order, values in ascending order per the spec). */
  private def readRoaring32(bb: ByteBuffer, high: Long, out: ArrayBuffer[Long]): Unit = {
    val cookie = bb.getInt
    val (nContainers, runFlags) =
      if ((cookie & 0xFFFF) == SerialCookie) {
        val n = (cookie >>> 16) + 1
        val flags = new Array[Byte]((n + 7) / 8)
        bb.get(flags)
        (n, flags)
      } else {
        require(cookie == SerialCookieNoRun, s"unrecognized RoaringBitmap cookie $cookie")
        (bb.getInt, null)
      }
    if (nContainers == 0) return
    val keys = new Array[Int](nContainers)
    val cards = new Array[Int](nContainers)
    var i = 0
    while (i < nContainers) {
      keys(i) = bb.getShort & 0xFFFF
      cards(i) = (bb.getShort & 0xFFFF) + 1
      i += 1
    }
    // the offset header exists unless the run-aware cookie has few containers
    if (runFlags == null || nContainers >= NoOffsetThreshold)
      bb.position(bb.position() + 4 * nContainers)
    i = 0
    while (i < nContainers) {
      val base = high | (keys(i).toLong << 16)
      val isRun = runFlags != null && (runFlags(i / 8) & (1 << (i % 8))) != 0
      if (isRun) {
        val nRuns = bb.getShort & 0xFFFF
        var r = 0
        while (r < nRuns) {
          val start = bb.getShort & 0xFFFF
          val len = bb.getShort & 0xFFFF
          var v = start
          while (v <= start + len) { out += (base | v); v += 1 }
          r += 1
        }
      } else if (cards(i) <= 4096) {
        var j = 0
        while (j < cards(i)) { out += (base | (bb.getShort & 0xFFFF)); j += 1 }
      } else {
        var w = 0
        while (w < 1024) {
          val word = bb.getLong
          if (word != 0L) {
            var b = 0
            while (b < 64) {
              if (((word >>> b) & 1L) == 1L) out += (base | (w * 64 + b))
              b += 1
            }
          }
          w += 1
        }
      }
      i += 1
    }
  }
}
