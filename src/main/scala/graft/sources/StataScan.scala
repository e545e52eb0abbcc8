package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Dependency-free reader for Stata `.dta` files, formats 117/118
  * (Stata 13+) — the stat-file scan the reference runs through the
  * readstat C library (reference: src/TidierDB.jl:175-178), declared
  * out-of-scope in round 1 and closed here for the most common modern
  * format. The container is tag-delimited sections
  * (`<stata_dta><header>…<data>…`) with fixed-width row-major records;
  * fixtures written by an independent real writer (pandas `to_stata`)
  * pin spec compliance in StataScanSpec.
  *
  * Supported: little-endian (LSF) 117/118, numeric types
  * byte/int/long/float/double with Stata missing-value sentinels → NULL,
  * fixed-width `str#` columns (UTF-8 in 118), any row/column count.
  * Loud failures: MSF byte order, `strL` columns, other releases.
  * Value labels and variable labels are ignored (documented) — the
  * DATA comes back typed.
  *
  * Scale note: a .dta file is a single-machine artifact (readstat — the
  * reference's engine — is single-node too); this parses driver-side
  * and parallelizes the rows. The fixed row width makes a distributed
  * `binaryRecords`-with-offset path possible if multi-GB exports ever
  * matter; not built until they do.
  */
object StataScan {

  def read(spark: SparkSession, path: String): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(p).getLen
    require(len < 2L * 1024 * 1024 * 1024, s".dta file too large for the driver-side reader ($len bytes)")
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    parse(spark, bytes, path)
  }

  private def find(b: Array[Byte], tag: String, from: Int = 0): Int = {
    val t = tag.getBytes(StandardCharsets.US_ASCII)
    var i = from
    while (i <= b.length - t.length) {
      var j = 0
      while (j < t.length && b(i + j) == t(j)) j += 1
      if (j == t.length) return i + t.length
      i += 1
    }
    throw new IllegalArgumentException(s"not a dta 117/118 file: section $tag missing")
  }

  private def parse(spark: SparkSession, b: Array[Byte], path: String): DataFrame = {
    require(b.length > 70 && new String(b, 0, 11, StandardCharsets.US_ASCII) == "<stata_dta>",
      s"$path is not a Stata 117/118 .dta file (older releases use an untagged binary header)")
    val release = new String(b, find(b, "<release>"), 3, StandardCharsets.US_ASCII).toInt
    require(release == 117 || release == 118,
      s"dta release $release not supported (117/118 only)")
    val order = new String(b, find(b, "<byteorder>"), 3, StandardCharsets.US_ASCII)
    require(order == "LSF", s"big-endian (MSF) .dta not supported")
    def buf(off: Int): ByteBuffer =
      ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).position(off).asInstanceOf[ByteBuffer]

    val k = buf(find(b, "<K>")).getShort() & 0xffff
    val nOff = find(b, "<N>")
    val n = if (release == 118) buf(nOff).getLong() else buf(nOff).getInt().toLong
    require(n <= Int.MaxValue, s"row count $n exceeds the driver-side reader's bound")

    val typesOff = find(b, "<variable_types>")
    val types = (0 until k).map(i => buf(typesOff + 2 * i).getShort() & 0xffff)
    val nameLen = if (release == 118) 129 else 33
    val namesOff = find(b, "<varnames>")
    val names = (0 until k).map { i =>
      val raw = new String(b, namesOff + nameLen * i, nameLen, StandardCharsets.UTF_8)
      raw.takeWhile(_ != 0.toChar)
    }

    val fields = types.zip(names).map {
      case (t, nm) if t >= 1 && t <= 2045 => StructField(nm, StringType)
      case (65526, nm) => StructField(nm, DoubleType)
      case (65527, nm) => StructField(nm, FloatType)
      case (65528, nm) => StructField(nm, IntegerType)
      case (65529, nm) => StructField(nm, ShortType)
      case (65530, nm) => StructField(nm, ByteType)
      case (32768, nm) => throw new IllegalArgumentException(
        s"column '$nm' is strL — not supported by the built-in .dta reader")
      case (t, nm) => throw new IllegalArgumentException(
        s"column '$nm' has unknown dta type code $t")
    }
    val schema = StructType(fields)
    val widths = types.map {
      case t if t >= 1 && t <= 2045 => t
      case 65526 => 8
      case 65527 => 4
      case 65528 => 4
      case 65529 => 2
      case 65530 => 1
      case _ => 0
    }
    val rowWidth = widths.sum

    val dataOff = find(b, "<data>")
    require(dataOff + n * rowWidth <= b.length, s"$path: data section truncated")
    val rows = (0 until n.toInt).map { r =>
      var off = dataOff + r * rowWidth
      val vals = new Array[Any](k)
      var c = 0
      while (c < k) {
        val t = types(c)
        vals(c) = t match {
          case s if s >= 1 && s <= 2045 =>
            // 118 stores str# as UTF-8; 117 as latin-1
            val cs = if (release == 118) StandardCharsets.UTF_8
                     else StandardCharsets.ISO_8859_1
            val str = new String(b, off, s, cs)
            str.takeWhile(_ != 0.toChar)
          // Stata missing sentinels occupy the top of each type's range
          case 65526 =>
            val v = buf(off).getDouble(); if (v >= 8.988e307) null else v
          case 65527 =>
            val v = buf(off).getFloat(); if (v >= 1.701e38f) null else v
          case 65528 =>
            val v = buf(off).getInt(); if (v >= 2147483621) null else v
          case 65529 =>
            val v = buf(off).getShort(); if (v >= 32741) null else v
          case 65530 =>
            val v = b(off); if (v >= 101) null else v
        }
        off += widths(c)
        c += 1
      }
      Row.fromSeq(vals.toSeq)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.length / 10000)), schema)
  }
}
