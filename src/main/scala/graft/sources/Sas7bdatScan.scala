package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.{Charset, StandardCharsets}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Dependency-free reader for SAS `.sas7bdat` datasets — the last of
  * the stat-file scans the reference routes through readstat
  * (reference: src/TidierDB.jl:175-178). The on-disk format is not
  * published by SAS but is publicly documented by the community
  * reverse-engineering effort (the sas7bdat description implemented by
  * the R `sas7bdat` package and pandas' pure-Python reader): a 1 KiB /
  * 8 KiB header, then fixed-size pages carrying subheaders (row size,
  * column size, column text / names / attributes) and fixed-width row
  * data.
  *
  * Supported: little-endian files, 32-bit AND 64-bit (U64) layouts,
  * uncompressed data, meta/mix/data page walks, full-width (8-byte
  * IEEE) numerics with the whole SAS missing family (any NaN payload)
  * → NULL, fixed-width char columns. Unknown subheader types are
  * SKIPPED (real files carry column-list / counts subheaders this
  * reader doesn't need). Loud failures: big-endian, RLE/RDC
  * compression (pointer compression flags or a `SASYZCR…` creator
  * signature), truncated (< 8-byte) numerics, malformed dictionaries.
  *
  * Fixtures are cross-validated at generation time by pandas'
  * independent reader (tools/gen_sas7bdat_fixtures.py) — the spec
  * interpretation is pinned against a second implementation, not a
  * self round-trip.
  *
  * Scale note: same stance as the other stat scans — single-machine
  * artifacts, parsed driver-side, rows parallelized.
  */
object Sas7bdatScan {

  private val Magic: Array[Byte] = Array(
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00, 0xc2, 0xea, 0x81, 0x60,
    0xb3, 0x14, 0x11, 0xcf, 0xbd, 0x92, 0x08, 0x00,
    0x09, 0xc7, 0x31, 0x8c, 0x18, 0x1f, 0x10, 0x11).map(_.toByte)

  def read(spark: SparkSession, path: String): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(p).getLen
    require(len < 2L * 1024 * 1024 * 1024,
      s".sas7bdat file too large for the driver-side reader ($len bytes)")
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    parse(spark, bytes, path)
  }

  private final case class Col(name: String, rowOffset: Long, width: Int, numeric: Boolean)

  private def parse(spark: SparkSession, b: Array[Byte], path: String): DataFrame = {
    require(b.length >= 1024, s"$path is not a .sas7bdat file (too short)")
    require(java.util.Arrays.equals(b.take(32), Magic),
      s"$path is not a .sas7bdat file (magic mismatch)")
    val u64 = b(32) == '3'
    val intLen = if (u64) 8 else 4
    val align1 = if (b(35) == '3') 4 else 0
    require(b(37) == 0x01, s"$path is big-endian — not supported")
    val encoding: Charset = (b(70) & 0xff) match {
      case 0 | 20 | 62 => StandardCharsets.UTF_8 // default / utf-8 / wlatin1≈
      case 29          => StandardCharsets.ISO_8859_1
      case other => throw new IllegalArgumentException(
        s"$path: unsupported character encoding code $other")
    }

    val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    def u16(off: Long): Int = buf.getShort(off.toInt) & 0xffff
    def u32(off: Long): Long = buf.getInt(off.toInt) & 0xffffffffL
    def uint(off: Long): Long = if (u64) buf.getLong(off.toInt) else u32(off)

    val headerLen = u32(196 + align1)
    val pageLen = u32(200 + align1)
    val pageCount = uint(204 + align1)
    require(headerLen >= 1024 && pageLen >= 256 && pageCount >= 1,
      s"$path: implausible header (headerLen=$headerLen pageLen=$pageLen pages=$pageCount)")
    require(headerLen + pageCount * pageLen <= b.length,
      s"$path: truncated — header promises ${headerLen + pageCount * pageLen} bytes, file has ${b.length}")

    val bitOffset = if (u64) 32 else 16
    val ptrLen = if (u64) 24 else 12

    var rowLength = -1L
    var rowCount = -1L
    var mixRowCount = 0L
    var nCols = -1
    var firstTextBlock = true
    val textBlocks = Vector.newBuilder[Array[Byte]]
    // (textIdx, nameOff, nameLen) in column order
    val namePtrs = Vector.newBuilder[(Int, Int, Int)]
    // (rowOffset, width, numeric)
    val attrs = Vector.newBuilder[(Long, Int, Boolean)]
    // (pageBase, rowStart, nRows) discovered row regions in page order
    val rowRegions = Vector.newBuilder[(Long, Long, Long)]

    def sigHas(off: Long, pattern: Int): Boolean = {
      var i = 0L
      while (i + 4 <= intLen) {
        if (buf.getInt((off + i).toInt) == pattern) return true
        i += 4
      }
      false
    }

    var page = 0L
    while (page < pageCount) {
      val base = headerLen + page * pageLen
      val pageType = u16(base + bitOffset)
      val blockCount = u16(base + bitOffset + 2)
      val subCount = u16(base + bitOffset + 4)
      val isMeta = pageType == 0 || pageType == 16384 || pageType == 1024
      val isMix = pageType == 512 || pageType == 640
      val isData = pageType == 256 || pageType == 384
      require(isMeta || isMix || isData,
        s"$path: page $page has unsupported type $pageType")
      if (isMeta || isMix) {
        var i = 0
        while (i < subCount) {
          val p0 = base + bitOffset + 8 + i.toLong * ptrLen
          val off = base + uint(p0)
          val len = uint(p0 + intLen)
          val compression = b((p0 + 2 * intLen).toInt) & 0xff
          if (len > 0 && compression != 1) { // 1 = truncated, skip
            require(compression == 0,
              s"$path: compressed subheader (compression=$compression) — RLE/RDC .sas7bdat not supported")
            if (sigHas(off, 0xF7F7F7F7)) {
              rowLength = uint(off + 5 * intLen)
              rowCount = uint(off + 6 * intLen)
              mixRowCount = uint(off + 15 * intLen)
            } else if (sigHas(off, 0xF6F6F6F6)) {
              nCols = uint(off + intLen).toInt
            } else if (buf.getInt(off.toInt) == 0xFFFFFFFD) { // column text
              val size = u16(off + intLen)
              val block = java.util.Arrays.copyOfRange(b, (off + intLen).toInt,
                (off + intLen + size).toInt)
              if (firstTextBlock) {
                firstTextBlock = false
                val head = new String(block.take(16), StandardCharsets.US_ASCII)
                require(!head.contains("SASYZCR"),
                  s"$path: compressed data (creator $head) — not supported")
              }
              textBlocks += block
            } else if ((0 until intLen).forall(j => b((off + j).toInt) == -1)) { // names: all FF
              val n = ((len - 2 * intLen - 12) / 8).toInt
              var k = 0
              while (k < n) {
                val e = off + intLen + 8L * (k + 1)
                namePtrs += ((u16(e), u16(e + 2), u16(e + 4)))
                k += 1
              }
            } else if (buf.getInt(off.toInt) == 0xFFFFFFFC) { // attributes
              val entry = intLen + 8
              val n = ((len - 2 * intLen - 12) / entry).toInt
              var k = 0
              while (k < n) {
                val e = off + intLen + 8 + k.toLong * entry
                val colOff = uint(e)
                val width = u32(off + 2 * intLen + 8 + k.toLong * entry).toInt
                val tpe = b((off + 2 * intLen + 14 + k.toLong * entry).toInt) & 0xff
                attrs += ((colOff, width, tpe == 1))
                k += 1
              }
            } // else: column-list / counts / format — not needed, skipped
          }
          i += 1
        }
      }
      if (isMix) {
        require(rowLength > 0, s"$path: mix page before row-size subheader")
        var rowStart = base + bitOffset + 8 + subCount.toLong * ptrLen
        rowStart += (8 - rowStart % 8) % 8
        val n = math.min(mixRowCount, rowCount)
        rowRegions += ((base, rowStart, n))
      } else if (isData) {
        require(rowLength > 0, s"$path: data page before row-size subheader")
        rowRegions += ((base, base + bitOffset + 8, blockCount.toLong))
      }
      page += 1
    }

    require(rowLength > 0 && rowCount >= 0, s"$path: row-size subheader missing")
    val names = namePtrs.result()
    val attrsV = attrs.result()
    val blocks = textBlocks.result()
    require(nCols > 0 && names.size == nCols && attrsV.size == nCols,
      s"$path: dictionary incomplete (cols=$nCols names=${names.size} attrs=${attrsV.size})")
    val cols = names.zip(attrsV).map { case ((ti, no, nl), (ro, w, num)) =>
      require(ti < blocks.size, s"$path: name text index $ti out of range")
      val name = new String(blocks(ti), no, nl, encoding).trim
      if (num) require(w == 8,
        s"$path: numeric column '$name' has width $w — truncated numerics not supported")
      Col(name, ro, w, num)
    }

    val rows = Vector.newBuilder[Row]
    var emitted = 0L
    rowRegions.result().foreach { case (pageBase, start, n) =>
      var r = 0L
      while (r < n && emitted < rowCount) {
        val ro = start + r * rowLength
        require(ro + rowLength <= pageBase + pageLen, s"$path: row overruns its page")
        val cells = new Array[Any](cols.size)
        var c = 0
        while (c < cols.size) {
          val col = cols(c)
          val o = (ro + col.rowOffset).toInt
          if (col.numeric) {
            val d = buf.getDouble(o)
            cells(c) = if (java.lang.Double.isNaN(d)) null else d // all SAS missing codes are NaN payloads
          } else {
            val s = new String(b, o, col.width, encoding)
            var e = s.length
            while (e > 0 && (s.charAt(e - 1) == ' ' || s.charAt(e - 1) == '\u0000')) e -= 1
            cells(c) = s.substring(0, e)
          }
          c += 1
        }
        rows += Row(cells: _*)
        emitted += 1
        r += 1
      }
    }
    require(emitted == rowCount,
      s"$path: row data truncated — dictionary promises $rowCount rows, pages carry $emitted")

    val schema = StructType(cols.map(c =>
      StructField(c.name, if (c.numeric) DoubleType else StringType)))
    val data = rows.result()
    spark.createDataFrame(
      spark.sparkContext.parallelize(data,
        math.max(1, math.min(spark.sparkContext.defaultParallelism, data.size))),
      schema)
  }
}
