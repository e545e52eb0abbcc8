package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.{Charset, StandardCharsets}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Dependency-free reader for SPSS `.sav` system files — the second of
  * the stat-file scans the reference routes through the readstat C
  * library (reference: src/TidierDB.jl:175-178). Parses the publicly
  * documented system-file format (the PSPP project documents it in
  * full): 176-byte header, variable records, value-label / document /
  * extension records, `999` dictionary terminator, then case data.
  *
  * Supported: little-endian files, uncompressed (compression 0) and
  * simple-bytecode (compression 1) case data, numeric variables
  * (doubles; `SYSMIS` → NULL), short string variables (width ≤ 255,
  * with continuation records), long variable names (extension subtype
  * 13), explicit character encoding (subtype 20, defaults UTF-8).
  * Loud failures: `$FL3`/zlib (zsav), big-endian, very-long-string
  * segments (subtype 14). Value labels, documents and user-missing
  * ranges are skipped structurally (documented) — the DATA comes back
  * typed.
  *
  * Scale note: same stance as [[StataScan]] — a .sav is a
  * single-machine artifact (the reference's readstat engine is
  * single-node too), parsed driver-side with the rows parallelized.
  */
object SavScan {

  private val Sysmis = java.lang.Double.longBitsToDouble(0xffefffffffffffffL) // lowest finite double

  def read(spark: SparkSession, path: String): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(p).getLen
    require(len < 2L * 1024 * 1024 * 1024, s".sav file too large for the driver-side reader ($len bytes)")
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    parse(spark, bytes, path)
  }

  /** one dictionary variable: short name, string width (0 = numeric) */
  private final case class Var(shortName: String, width: Int)

  private def parse(spark: SparkSession, b: Array[Byte], path: String): DataFrame = {
    require(b.length >= 180, s"$path is not an SPSS system file (too short)")
    val magic = new String(b, 0, 4, StandardCharsets.US_ASCII)
    require(magic == "$FL2" || magic == "$FL3",
      s"$path is not an SPSS system file (magic '$magic', expected '$$FL2'/'$$FL3')")

    val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    def i32(off: Int): Int = buf.getInt(off)
    def f64(off: Int): Double = buf.getDouble(off)

    val layout = i32(64)
    require(layout == 2 || layout == 3,
      if (Integer.reverseBytes(layout) == 2 || Integer.reverseBytes(layout) == 3)
        s"$path is big-endian — not supported"
      else s"$path: unrecognized layout code $layout")
    val caseSize = i32(68)
    val compression = i32(72)
    require(compression == 0 || compression == 1 || compression == 2,
      s"$path: compression $compression not supported (0=raw, 1=bytecode, 2=zlib)")
    require((compression == 2) == (magic == "$FL3"),
      s"$path: magic '$magic' inconsistent with compression $compression")
    val nCases = i32(80)
    val bias = f64(84)

    // ---- dictionary walk -------------------------------------------------
    var off = 176
    val vars = Vector.newBuilder[Var]
    var encoding: Charset = StandardCharsets.UTF_8
    var longNames = Map.empty[String, String]
    var done = false
    while (!done) {
      i32(off) match {
        case 2 => // variable record
          val tpe = i32(off + 4)
          val hasLabel = i32(off + 8)
          val nMissing = i32(off + 12)
          val name = new String(b, off + 24, 8, StandardCharsets.US_ASCII).trim
          off += 32
          if (hasLabel == 1) {
            val labelLen = i32(off)
            off += 4 + ((labelLen + 3) / 4) * 4
          }
          off += 8 * math.abs(nMissing)
          if (tpe >= 0) vars += Var(name, tpe) // -1 continuations carry no data of their own
        case 3 => // value labels: (f64 value, len byte, label padded so value+label is 8k)
          var n = i32(off + 4); off += 8
          while (n > 0) {
            val labelLen = b(off + 8) & 0xff
            off += 8 + ((labelLen + 1 + 7) / 8) * 8
            n -= 1
          }
        case 4 => // value-label variable index list
          off += 8 + 4 * i32(off + 4)
        case 6 => // documents
          off += 8 + 80 * i32(off + 4)
        case 7 => // extension record
          val subtype = i32(off + 4)
          val size = i32(off + 8)
          val count = i32(off + 12)
          val data = off + 16
          subtype match {
            case 13 => // long variable names: SHORT=Long pairs, \t-separated
              val s = new String(b, data, size * count, StandardCharsets.UTF_8)
              longNames = s.split('\t').iterator.filter(_.contains('='))
                .map { kv => val Array(k, v) = kv.split("=", 2); k.trim -> v }
                .toMap
            case 14 => throw new IllegalArgumentException(
              s"$path uses very-long-string segments (extension 14) — width > 255 not supported")
            case 20 =>
              encoding = Charset.forName(
                new String(b, data, size * count, StandardCharsets.US_ASCII).trim)
            case _ => () // ignore: display params, number-format, etc.
          }
          off += 16 + size * count
        case 999 =>
          off += 8
          done = true
        case other => throw new IllegalArgumentException(
          s"$path: unrecognized dictionary record type $other at offset $off")
      }
    }
    val dict = vars.result()
    val elemsPerVar = dict.map(v => if (v.width == 0) 1 else (v.width + 7) / 8)
    require(elemsPerVar.sum == caseSize,
      s"$path: dictionary case size ${elemsPerVar.sum} != header case size $caseSize")

    // ---- case data -------------------------------------------------------
    val elems: Iterator[Array[Byte]] =
      if (compression == 0) rawElements(b, off)
      else if (compression == 1) bytecodeElements(b, off, bias)
      else { // zsav: zlib blocks whose concatenation IS the bytecode stream
        val inflated = inflateZsav(b, off, path)
        bytecodeElements(inflated, 0, bias)
      }

    val nRows = if (nCases >= 0) nCases else Int.MaxValue
    val rows = Vector.newBuilder[Row]
    var r = 0
    var exhausted = false
    while (r < nRows && !exhausted) {
      if (!elems.hasNext) exhausted = true
      else {
        val cells = new Array[Any](dict.length)
        var c = 0
        while (c < dict.length) {
          val v = dict(c)
          if (v.width == 0) {
            val d = ByteBuffer.wrap(elems.next()).order(ByteOrder.LITTLE_ENDIAN).getDouble
            cells(c) = if (d == Sysmis) null else d
          } else {
            val sb = new java.io.ByteArrayOutputStream(v.width + 8)
            var seg = 0
            while (seg < elemsPerVar(c)) { sb.write(elems.next()); seg += 1 }
            val raw = sb.toByteArray.take(v.width)
            // fixed-width padding is SPACES; strip only those (a value
            // ending in \n must survive)
            val s = new String(raw, encoding)
            var e = s.length
            while (e > 0 && s.charAt(e - 1) == ' ') e -= 1
            cells(c) = s.substring(0, e)
          }
          c += 1
        }
        rows += Row(cells: _*)
        r += 1
      }
    }
    require(nCases < 0 || r == nCases,
      s"$path: case data truncated — expected $nCases cases, decoded $r")

    val schema = StructType(dict.map { v =>
      val name = longNames.getOrElse(v.shortName, v.shortName)
      StructField(name, if (v.width == 0) DoubleType else StringType)
    })
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.result(), math.max(1,
        math.min(spark.sparkContext.defaultParallelism, rows.result().size))),
      schema)
  }

  /** `.zsav` (compression 2): after the dictionary — a 24-byte zheader
    * (self offset, trailer offset, trailer length), zlib blocks, and a
    * trailer describing each block. The blocks' decompressed
    * concatenation is exactly the compression-1 bytecode stream, so
    * decode reuses [[bytecodeElements]]. */
  private def inflateZsav(b: Array[Byte], from: Int, path: String): Array[Byte] = {
    val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val zheaderOfs = buf.getLong(from)
    val ztrailerOfs = buf.getLong(from + 8)
    val ztrailerLen = buf.getLong(from + 16)
    require(zheaderOfs == from.toLong,
      s"$path: zsav zheader self-offset $zheaderOfs != actual $from")
    require(ztrailerOfs + ztrailerLen <= b.length && ztrailerLen >= 48,
      s"$path: zsav trailer out of range")
    val t = ztrailerOfs.toInt
    val nBlocks = buf.getInt(t + 20)
    require(ztrailerLen == 24L + 24L * nBlocks,
      s"$path: zsav trailer length $ztrailerLen != 24 + 24*$nBlocks")
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < nBlocks) {
      val d = t + 24 + 24 * i
      val compressedOfs = buf.getLong(d + 8)
      val uncompressedSize = buf.getInt(d + 16)
      val compressedSize = buf.getInt(d + 20)
      val inf = new java.util.zip.Inflater()
      inf.setInput(b, compressedOfs.toInt, compressedSize)
      val chunk = new Array[Byte](uncompressedSize)
      val got = inf.inflate(chunk)
      inf.end()
      require(got == uncompressedSize,
        s"$path: zsav block $i inflated to $got bytes, expected $uncompressedSize")
      out.write(chunk)
      i += 1
    }
    out.toByteArray
  }

  /** uncompressed: consecutive 8-byte elements from `from` */
  private def rawElements(b: Array[Byte], from: Int): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private var off = from
      def hasNext: Boolean = off + 8 <= b.length
      def next(): Array[Byte] = { val a = java.util.Arrays.copyOfRange(b, off, off + 8); off += 8; a }
    }

  /** compression 1: 8-byte command blocks; 253-literals follow their
    * block in order. Emits decoded 8-byte elements. */
  private def bytecodeElements(b: Array[Byte], from: Int, bias: Double): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private var off = from            // start of current command block
      private var cmdIdx = 8            // position within the command block (8 = need refill)
      private var litOff = 0            // next literal for the current block
      private var pending: Array[Byte] = _
      private val spaces = "        ".getBytes(StandardCharsets.US_ASCII)
      private val sysmis = {
        val a = new Array[Byte](8)
        ByteBuffer.wrap(a).order(ByteOrder.LITTLE_ENDIAN).putDouble(Sysmis); a
      }
      private var ended = false
      private var started = false
      advance()

      private def refill(): Unit = { // move to the block after this one's literals
        off = litOff; cmdIdx = 0
        litOff = off + 8
      }
      private def advance(): Unit = {
        pending = null
        while (pending == null && !ended) {
          if (cmdIdx == 8) {
            if (!started) { started = true; cmdIdx = 0; litOff = off + 8 }
            else refill()
            if (off + 8 > b.length) { ended = true; return }
          }
          val c = b(off + cmdIdx) & 0xff
          cmdIdx += 1
          c match {
            case 0   => () // padding
            case 252 => ended = true
            case 253 =>
              require(litOff + 8 <= b.length, "bytecode literal past end of file")
              pending = java.util.Arrays.copyOfRange(b, litOff, litOff + 8)
              litOff += 8
            case 254 => pending = spaces
            case 255 => pending = sysmis
            case v =>
              val a = new Array[Byte](8)
              ByteBuffer.wrap(a).order(ByteOrder.LITTLE_ENDIAN).putDouble(v - bias)
              pending = a
          }
        }
      }
      def hasNext: Boolean = pending != null
      def next(): Array[Byte] = { val p = pending; advance(); p }
    }
}
