package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL media decode, entirely in the JVM:
  *
  *  - BMP (`BM` magic): BITMAPINFOHEADER, uncompressed 24/32 bpp,
  *    bottom-up or top-down. Width/height from the header, brightness =
  *    mean over pixels of (R+G+B)/3 honoring the 4-byte row stride.
  *  - PPM binary (`P6`): ASCII header (whitespace + `#` comments),
  *    maxval ≤ 255; brightness = mean of (R+G+B)/3.
  *  - PGM binary (`P5`): same header, brightness = mean gray value.
  *  - Everything else falls through to the JDK's ImageIO readers
  *    ([[ImageCodec]]) — real codec decode for JPEG/PNG/GIF/TIFF/WBMP
  *    with zero external dependencies.
  *
  * Output: struct(format string, width long, height long, brightness
  * double); NULL for bytes no decoder accepts (and for any decode
  * failure — corrupt/truncated/adversarial bytes on an untrusted corpus
  * must never kill the job).
  *
  * Per-row work is a single pass over the pixel bytes — CodegenFallback
  * once-per-row, which tools/KernelBench measured at noise level for
  * heavyweight kernels like this; the expression composes as a normal
  * column, so decode stays inside the narrow scan stage (no shuffle,
  * partition-parallel).
  */
case class DecodeImageFeatures(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("brightness", DoubleType)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"decode_image_features expects binary, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    // catch-all: a corrupt header that slips past a bounds check must
    // degrade to NULL, not fail the task (untrusted corpus bytes)
    try decode(b).orNull
    catch { case scala.util.control.NonFatal(_) => null }
  }

  private def result(fmt: String, w: Long, h: Long, brightness: Double): InternalRow =
    InternalRow(UTF8String.fromString(fmt), w, h, brightness)

  private def decode(b: Array[Byte]): Option[InternalRow] = {
    val pure =
      if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') decodeBmp(b)
      else if (b.length >= 2 && b(0) == 'P' && (b(1) == '5' || b(1) == '6')) decodePnm(b)
      else None
    // anything the pure parsers don't take (incl. BMP variants outside
    // the 24/32bpp BI_RGB subset) gets a shot at the JDK codec readers
    pure.orElse(ImageCodec.decode(b).map(f =>
      result(f.format, f.width, f.height, f.brightness)))
  }

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def decodeBmp(b: Array[Byte]): Option[InternalRow] = {
    if (b.length < 54) return None
    val dataOff = le32(b, 10)
    val w = le32(b, 18)
    val hRaw = le32(b, 22) // negative = top-down; row order is irrelevant to the mean
    val hL = math.abs(hRaw.toLong) // Long abs: |Int.MinValue| stays positive
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    // BI_RGB only (0); 24 or 32 bpp — the codec-free subset
    if (w <= 0 || hL <= 0 || compression != 0 || (bpp != 24 && bpp != 32)) return None
    val bytesPerPx = bpp / 8
    // stride/size math in Long: a crafted header with w near 2^30 would
    // overflow Int (stride 0/negative slips the bounds check, then the
    // pixel loop indexes out of the array)
    val strideL = ((w.toLong * bytesPerPx + 3) / 4) * 4 // rows pad to 4 bytes
    if (dataOff < 0 || dataOff.toLong + strideL * hL > b.length) return None
    // bounds verified against b.length ≤ Int.MaxValue, so these fit Int
    val stride = strideL.toInt
    val h = hL.toInt
    var sum = 0.0
    var row = 0
    while (row < h) {
      var px = 0
      val base = dataOff + row * stride
      while (px < w) {
        val o = base + px * bytesPerPx
        // BMP stores BGR(A)
        sum += ((b(o) & 0xff) + (b(o + 1) & 0xff) + (b(o + 2) & 0xff)) / 3.0
        px += 1
      }
      row += 1
    }
    Some(result("bmp", w.toLong, h.toLong, sum / (w.toLong * h)))
  }

  /** P5/P6 header: magic, then whitespace-separated width, height,
    * maxval, with `#` comments allowed; one whitespace byte ends the
    * header, then raw samples. */
  private def decodePnm(b: Array[Byte]): Option[InternalRow] = {
    val gray = b(1) == '5'
    var i = 2
    def skipWs(): Boolean = {
      var progressed = false
      var go = true
      while (go && i < b.length) {
        val c = b(i)
        if (c == '#') { while (i < b.length && b(i) != '\n') i += 1; progressed = true }
        else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') { i += 1; progressed = true }
        else go = false
      }
      progressed
    }
    def readInt(): Int = {
      var v = 0; var any = false
      while (i < b.length && b(i) >= '0' && b(i) <= '9') { v = v * 10 + (b(i) - '0'); i += 1; any = true }
      if (any) v else -1
    }
    if (!skipWs()) return None
    val w = readInt(); if (!skipWs()) return None
    val h = readInt(); if (!skipWs()) return None
    val maxv = readInt()
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255) return None
    i += 1 // exactly ONE whitespace byte after maxval
    val n = w.toLong * h
    val samples = if (gray) n else n * 3
    if (i + samples > b.length) return None
    var sum = 0.0
    if (gray) {
      var k = 0
      while (k < n) { sum += (b(i + k) & 0xff); k += 1 }
    } else {
      var k = 0
      while (k < n) {
        val o = i + k * 3
        sum += ((b(o) & 0xff) + (b(o + 1) & 0xff) + (b(o + 2) & 0xff)) / 3.0
        k += 1
      }
    }
    Some(result(if (gray) "pgm" else "ppm", w.toLong, h.toLong, sum / n))
  }

  override protected def withNewChildInternal(newChild: Expression): DecodeImageFeatures =
    copy(child = newChild)

  override def prettyName: String = "decode_image_features"
}
