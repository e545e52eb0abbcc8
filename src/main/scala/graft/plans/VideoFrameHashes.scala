package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native expression: uncompressed-AVI bytes → array of 64-bit
  * perceptual hashes, one per sampled frame ([[PerceptualImageHash]]'s
  * aHash/dHash applied to each `frameStride`-th frame's raw BI_RGB
  * raster). This is the video leg of the media near-dup triple:
  * re-encoded or brightness-shifted copies of a clip produce
  * frame-for-frame signatures within small Hamming distance, so
  * near-dup video detection composes with the same banded pigeonhole
  * join keyed by (frame index, signature chunk) —
  * [[graft.operators.Dedup.videoDupPairs]].
  *
  * The RIFF walk and the untrusted-corpus hardening (Long size math,
  * pixel ceiling before any raster work, truncated-chunk stop, NULL on
  * any malformation) mirror [[DecodeVideoFeatures]]; the cell grid and
  * exact integer binarization are [[PerceptualImageHash]]'s. DIB rows
  * are stored bottom-up for positive biHeight — frames are flipped to
  * visual order so a still of the same content hashes identically.
  *
  * Reference scope: TidierDB has no media operators
  * (`/root/reference/src/TidierDB.jl` is SQL verbs only) — this is
  * training-data-pipeline extension surface.
  */
case class VideoFrameHashes(
    child: Expression, kind: String, frameStride: Int = 1)
    extends UnaryExpression with CodegenFallback {

  require(kind == "ahash" || kind == "dhash",
    s"perceptual hash kind must be 'ahash' or 'dhash', got $kind")
  require(frameStride >= 1, s"frameStride must be >= 1, got $frameStride")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"video_frame_hashes expects binary, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    try VideoFrameHashes.frameHashes(b, kind, frameStride)
      .map(new GenericArrayData(_)).orNull
    catch { case scala.util.control.NonFatal(_) => null }
  }

  override protected def withNewChildInternal(newChild: Expression): VideoFrameHashes =
    copy(child = newChild)

  override def prettyName: String = s"video_frame_hashes_$kind"
}

object VideoFrameHashes {

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) | ((b(o + 2) & 0xffL) << 16) |
      ((b(o + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  def frameHashes(
      b: Array[Byte], kind: String, frameStride: Int): Option[Array[Long]] = {
    if (b == null || b.length < 24 || tag(b, 0) != "RIFF" || tag(b, 8) != "AVI ")
      return None

    var foundVids = false // latched — a later 'auds'/'txts' strl must not clear it
    var w = -1L; var h = -1L; var bitCount = -1; var compression = -1L
    var topDown = false
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]

    def walk(from: Long, to: Long, inStrl: Boolean, inMovi: Boolean, depth: Int): Unit = {
      if (depth > 8) return
      var curIsVids = false
      var off = from
      while (off + 8 <= to) {
        val id = tag(b, off.toInt)
        val size = u32(b, off.toInt + 4)
        val payload = off + 8
        if (payload + size > to) return // truncated chunk: stop cleanly
        id match {
          case "LIST" if size >= 4 =>
            val sub = tag(b, payload.toInt)
            if (sub == "hdrl" || sub == "movi" || sub == "strl" || sub == "rec ")
              walk(payload + 4, payload + size, sub == "strl",
                inMovi || sub == "movi", depth + 1)
          case "strh" if inStrl && size >= 36 =>
            curIsVids = tag(b, payload.toInt) == "vids"
            if (curIsVids) foundVids = true
          case "strf" if inStrl && curIsVids && size >= 40 && w < 0 =>
            val p = payload.toInt
            w = u32(b, p + 4)
            val hRaw = u32(b, p + 8).toInt
            if (hRaw == Int.MinValue) return
            h = math.abs(hRaw.toLong)
            topDown = hRaw < 0
            bitCount = u16(b, p + 14)
            compression = u32(b, p + 16)
          case fid if inMovi && (fid.endsWith("db") || fid.endsWith("dc")) =>
            frames += ((payload, size))
          case _ => ()
        }
        off = payload + size + (size & 1)
      }
    }
    walk(12L, b.length.toLong, inStrl = false, inMovi = false, depth = 0)

    if (!foundVids || w <= 0 || h <= 0) return None
    if (bitCount != 24 || compression != 0L) return None // BI_RGB 24bpp only
    if (w * h > ImageCodec.MaxPixels) return None
    if (frames.isEmpty) return None

    val wi = w.toInt; val hi = h.toInt
    val stride = ((w * 3 + 3) / 4) * 4
    val frameBytes = stride * h
    val gw = PerceptualImageHash.gridWidth(kind)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var fi = 0
    while (fi < frames.length) {
      if (fi % frameStride == 0) {
        val (fOff, fSize) = frames(fi)
        if (fSize < frameBytes || fOff + frameBytes > b.length) return None
        val graySum: (Int, Int) => Long = { (x, y) =>
          // bottom-up DIB: visual row y is stored row h-1-y
          val row = if (topDown) y else hi - 1 - y
          val o = (fOff + row * stride + x * 3).toInt
          ((b(o) & 0xff) + (b(o + 1) & 0xff) + (b(o + 2) & 0xff)).toLong
        }
        val (sums, counts) = PerceptualImageHash.cellSumsFrom(wi, hi, gw, 8, graySum)
        out += PerceptualImageHash.binarize(sums, counts, kind)
      }
      fi += 1
    }
    Some(out.toArray)
  }
}
