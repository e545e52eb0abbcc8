package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL video decode for uncompressed AVI (RIFF 'AVI ', 'vids' stream,
  * BI_RGB 24bpp DIB frames) — the video analog of
  * [[DecodeAudioFeatures]]: the one container/codec combination that
  * needs no codec library is parsed for real, entirely in the JVM.
  * Compressed video (H.264 etc.) stays behind the documented stub.
  *
  * The RIFF walk descends LIST chunks to find `avih`, the `vids`
  * stream's `strh`/`strf`, and the `movi` frame list; every `##db`/
  * `##dc` chunk is a frame. FRAME SAMPLING is built in: only every
  * `frameStride`-th frame's pixels are read (keyframe-style sampling —
  * the standard way a feature extractor touches a fraction of the
  * bytes), the rest contribute only to the frame count.
  *
  * Output: struct(format "avi", width, height, n_frames, fps,
  * sampled_frames, brightness) — brightness is the mean over sampled
  * frames' pixels of (R+G+B)/3, stride-aware (DIB rows pad to 4
  * bytes). NULL for anything that is not uncompressed-24bpp AVI or any
  * malformed/adversarial header (all size math in Long, pixel-count
  * ceiling before any work — same hardening as [[DecodeImageFeatures]]
  * after the round-2 overflow advisory).
  */
case class DecodeVideoFeatures(child: Expression, frameStride: Int = 1)
    extends UnaryExpression with CodegenFallback {

  require(frameStride >= 1, s"frameStride must be >= 1, got $frameStride")

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("n_frames", LongType),
    StructField("fps", DoubleType),
    StructField("sampled_frames", LongType),
    StructField("brightness", DoubleType)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"decode_video_features expects binary, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    try decode(b).orNull
    catch { case scala.util.control.NonFatal(_) => null }
  }

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) | ((b(o + 2) & 0xffL) << 16) |
      ((b(o + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def decode(b: Array[Byte]): Option[InternalRow] = {
    if (b.length < 24 || tag(b, 0) != "RIFF" || tag(b, 8) != "AVI ") return None

    var foundVids = false // latched — a later 'auds'/'txts' strl must not clear it
    var scale = -1L; var rate = -1L
    var w = -1L; var h = -1L; var bitCount = -1; var compression = -1L
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]

    // depth-limited recursive RIFF chunk walk over [from, to)
    def walk(from: Long, to: Long, inStrl: Boolean, inMovi: Boolean, depth: Int): Unit = {
      if (depth > 8) return
      // per-strl scope: does THIS strl's strh say 'vids'? (each strl is
      // its own walk() call, so a video+audio AVI — vids strl then auds
      // strl, the standard layout — keeps its strf routing separate)
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
            // descend into header and movi lists; strl scoping tracks
            // which stream's strf we're reading ('rec ' lists nest
            // frames inside movi)
            if (sub == "hdrl" || sub == "movi" || sub == "strl" || sub == "rec ")
              walk(payload + 4, payload + size, sub == "strl",
                inMovi || sub == "movi", depth + 1)
          case "strh" if inStrl && size >= 36 =>
            val p = payload.toInt
            curIsVids = tag(b, p) == "vids"
            if (curIsVids && !foundVids) {
              foundVids = true
              scale = u32(b, p + 20)
              rate = u32(b, p + 24)
            }
          case "strf" if inStrl && curIsVids && size >= 40 && w < 0 =>
            val p = payload.toInt
            w = u32(b, p + 4)
            // biHeight may be negative (top-down); brightness is
            // row-order independent, magnitude is what matters
            val hRaw = u32(b, p + 8).toInt // reinterpret as signed i32
            if (hRaw == Int.MinValue) return
            h = math.abs(hRaw.toLong)
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
    if (scale <= 0 || rate <= 0) return None
    if (w * h > ImageCodec.MaxPixels) return None // adversarial-header ceiling
    if (frames.isEmpty) return None

    val stride = ((w * 3 + 3) / 4) * 4 // Long math: no Int overflow
    val frameBytes = stride * h
    var sum = 0.0
    var sampled = 0L
    var fi = 0
    while (fi < frames.length) {
      if (fi % frameStride == 0) {
        val (fOff, fSize) = frames(fi)
        if (fSize < frameBytes || fOff + frameBytes > b.length) return None
        var y = 0L
        while (y < h) {
          val base = fOff + y * stride
          var x = 0L
          while (x < w) {
            val o = (base + x * 3).toInt
            sum += ((b(o) & 0xff) + (b(o + 1) & 0xff) + (b(o + 2) & 0xff)) / 3.0
            x += 1
          }
          y += 1
        }
        sampled += 1
      }
      fi += 1
    }
    Some(InternalRow(
      UTF8String.fromString("avi"), w, h, frames.length.toLong,
      rate.toDouble / scale, sampled, sum / (w * h * sampled)))
  }

  override protected def withNewChildInternal(newChild: Expression): DecodeVideoFeatures =
    copy(child = newChild)

  override def prettyName: String = "decode_video_features"
}
