package graft.plans

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO
import scala.util.control.NonFatal

/** JDK-ImageIO-backed image decode — REAL codec decode for the formats
  * the JVM ships readers for (JPEG, PNG, GIF, TIFF, BMP, WBMP), zero
  * external dependencies. Shared by the per-row Catalyst expression
  * ([[DecodeImageFeatures]]) and the `mapPartitions` batch decoder
  * ([[graft.operators.Multimodal.batchProcess]]).
  *
  * Reference behavior this generalizes: TidierDB has no media decode at
  * all — this is part of the training-data-pipeline extension surface.
  *
  * Brightness is the mean over pixels (row-major) of (R+G+B)/3 in sRGB
  * as returned by `BufferedImage.getRGB` — for gray-valued RGB pixels
  * each term is an exact integer, so lossless formats (PNG) reproduce
  * analytic expectations bit-exactly; lossy formats (JPEG) land within
  * codec tolerance. Any failure (no reader, truncated stream, corrupt
  * header) returns None — the documented "unsupported bytes → NULL"
  * contract, never a task-killing throw on untrusted corpus bytes.
  */
object ImageCodec {

  // never spill decode temp files on executors — in-memory streams only
  ImageIO.setUseCache(false)

  final case class Features(format: String, width: Long, height: Long, brightness: Double)

  /** Decode ceiling: reject images whose HEADER declares more pixels
    * than this before any raster allocation — an adversarial header
    * (e.g. a BMP claiming 2^30×2^31) must not OOM an executor. 64M
    * pixels ≈ 256 MB ARGB, comfortably above real training images. */
  val MaxPixels: Long = 64L * 1024 * 1024

  def decode(b: Array[Byte]): Option[Features] = {
    if (b == null || b.length < 4) return None
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(b))
      if (iis == null) return None
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          // header-only dimension probe BEFORE the raster is allocated
          val wDecl = reader.getWidth(0).toLong
          val hDecl = reader.getHeight(0).toLong
          if (wDecl <= 0 || hDecl <= 0 || wDecl * hDecl > MaxPixels) return None
          val img = reader.read(0)
          if (img == null) return None
          val w = img.getWidth
          val h = img.getHeight
          if (w <= 0 || h <= 0) return None
          val fmt = reader.getFormatName.toLowerCase(java.util.Locale.ROOT)
          // row-major mean of (R+G+B)/3; one row buffer, no full-image copy
          var sum = 0.0
          val rowBuf = new Array[Int](w)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, rowBuf, 0, w)
            var x = 0
            while (x < w) {
              val p = rowBuf(x)
              sum += (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3.0
              x += 1
            }
            y += 1
          }
          Some(Features(fmt, w.toLong, h.toLong, sum / (w.toLong * h)))
        } finally reader.dispose()
      } finally iis.close()
    } catch { case NonFatal(_) => None }
  }

  /** Deterministic PNG bytes for tests/gates: encodes an RGB image whose
    * pixels are produced by `pixel(x, y) => gray value`, via the JDK's
    * own PNG writer (lossless — decode recovers the exact values). */
  def grayPng(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = pixel(x, y) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }
}
