package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Dependency-free reader for SAS XPORT (`.xpt`) transport files,
  * version 5 — the third stat-file scan the reference routes through
  * readstat (reference: src/TidierDB.jl:175-178). The format is fully
  * public (SAS Technical Note TS-140): a stream of 80-byte records —
  * library/member/descriptor headers, 140-byte NAMESTR variable
  * entries, an OBS header, then fixed-width observation records whose
  * numerics are IBM System/370 hexadecimal floating point.
  *
  * Supported: one member (dataset) per file — the overwhelmingly
  * common case — numeric variables at any declared length 2–8 (IBM
  * float, truncated tails zero-filled; missing codes `.`, `_`,
  * `A`–`Z` → NULL) and fixed-width character variables. Loud
  * failures: V8/V9 transport ("LIBV8" headers), multi-member files,
  * malformed NAMESTR sizes.
  *
  * Fixtures are cross-validated at generation time by pandas'
  * independent XPORT reader (tools/gen_xpt_fixtures.py), so the spec
  * interpretation here is pinned against a second implementation.
  *
  * Scale note: same stance as [[StataScan]]/[[SavScan]] — transport
  * files are single-machine artifacts; parsed driver-side, rows
  * parallelized.
  */
object XptScan {

  def read(spark: SparkSession, path: String): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(p).getLen
    require(len < 2L * 1024 * 1024 * 1024, s".xpt file too large for the driver-side reader ($len bytes)")
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    parse(spark, bytes, path)
  }

  private final case class Var(name: String, numeric: Boolean, length: Int, pos: Int)

  private def rec(b: Array[Byte], i: Int): String =
    new String(b, i * 80, 80, StandardCharsets.US_ASCII)

  private def parse(spark: SparkSession, b: Array[Byte], path: String): DataFrame = {
    require(b.length >= 80 * 6 && b.length % 80 == 0,
      s"$path is not an XPORT file (length not a multiple of 80-byte records)")
    val lib = rec(b, 0)
    require(lib.startsWith("HEADER RECORD*******LIB"),
      s"$path is not an XPORT file (no library header)")
    require(!lib.contains("LIBV8"), s"$path is a V8/V9 transport file — only V5 supported")

    // walk records to the MEMBER header (library header block is 3 records)
    var r = 3
    def header(i: Int): String = rec(b, i)
    require(header(r).startsWith("HEADER RECORD*******MEM"),
      s"$path: expected MEMBER header at record $r")
    // namestr entry size: the trailing digits of the member header
    // ("...01600000000140  " — descriptor size 160, namestr size 140)
    val namestrSize = header(r).substring(48, 78).trim.takeRight(4).toInt
    require(namestrSize == 140 || namestrSize == 136,
      s"$path: unsupported NAMESTR size $namestrSize")
    r += 1
    require(header(r).startsWith("HEADER RECORD*******DSC"),
      s"$path: expected DSCRPTR header at record $r")
    r += 3 // descriptor header + 2 member descriptor records
    require(header(r).startsWith("HEADER RECORD*******NAMESTR"),
      s"$path: expected NAMESTR header at record $r")
    val nVars = header(r).substring(54, 58).trim.toInt
    r += 1

    def be16(off: Int): Int = ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
    def be32(off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

    val namestrBase = r * 80
    val vars = (0 until nVars).map { i =>
      val o = namestrBase + i * namestrSize
      val ntype = be16(o)
      val nlng = be16(o + 4)
      val name = new String(b, o + 8, 8, StandardCharsets.US_ASCII).trim
      val npos = be32(o + 84)
      require(ntype == 1 || ntype == 2, s"$path: variable $name has unknown type $ntype")
      if (ntype == 1) require(nlng >= 2 && nlng <= 8,
        s"$path: numeric variable $name has unsupported length $nlng")
      Var(name, ntype == 1, nlng, npos)
    }
    // NAMESTR block is padded to a record boundary
    r += (nVars * namestrSize + 79) / 80
    require(header(r).startsWith("HEADER RECORD*******OBS"),
      s"$path: expected OBS header at record $r (multi-member files not supported)")
    r += 1

    val rowWidth = vars.map(_.length).sum
    val dataStart = r * 80
    val rows = Vector.newBuilder[Row]
    var off = dataStart
    var stop = false
    while (!stop && off + rowWidth <= b.length) {
      // the final record is blank-padded: a row of all spaces is padding
      var allBlank = true
      var j = 0
      while (allBlank && j < rowWidth) { if (b(off + j) != ' ') allBlank = false; j += 1 }
      if (allBlank) stop = true
      else {
        val cells = new Array[Any](vars.length)
        var c = 0
        while (c < vars.length) {
          val v = vars(c)
          val o = off + v.pos
          if (v.numeric) cells(c) = ibmToDouble(b, o, v.length)
          else {
            val s = new String(b, o, v.length, StandardCharsets.US_ASCII)
            var e = s.length
            while (e > 0 && s.charAt(e - 1) == ' ') e -= 1
            cells(c) = s.substring(0, e)
          }
          c += 1
        }
        rows += Row(cells: _*)
        off += rowWidth
      }
    }

    val schema = StructType(vars.map(v =>
      StructField(v.name, if (v.numeric) DoubleType else StringType)))
    val data = rows.result()
    spark.createDataFrame(
      spark.sparkContext.parallelize(data,
        math.max(1, math.min(spark.sparkContext.defaultParallelism, data.size))),
      schema)
  }

  /** IBM System/370 hexadecimal float → IEEE double. Layout: 1 sign
    * bit, 7-bit base-16 exponent (bias 64), 56-bit fraction in
    * [1/16, 1); declared lengths < 8 drop trailing fraction bytes
    * (zero-filled here). Missing codes: first byte `.`, `_` or `A`–`Z`
    * with a zero fraction → NULL (java.lang.Double so Row stores a
    * null, not 0.0). */
  private[graft] def ibmToDouble(b: Array[Byte], off: Int, len: Int): java.lang.Double = {
    val full = new Array[Byte](8)
    System.arraycopy(b, off, full, 0, len)
    val b0 = full(0) & 0xff
    var frac = 0L
    var i = 1
    while (i < 8) { frac = (frac << 8) | (full(i) & 0xff); i += 1 }
    if (frac == 0L) {
      if (b0 == '.' || b0 == '_' || (b0 >= 'A' && b0 <= 'Z')) return null
      if (b0 == 0) return java.lang.Double.valueOf(0.0)
      // zero fraction with a real exponent is value 0 by the format
      return java.lang.Double.valueOf(0.0)
    }
    val sign = if ((b0 & 0x80) != 0) -1.0 else 1.0
    val exp = (b0 & 0x7f) - 64
    java.lang.Double.valueOf(
      sign * (frac.toDouble / (1L << 56).toDouble) * math.pow(16.0, exp))
  }
}
