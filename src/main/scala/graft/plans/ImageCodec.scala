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

  /** Deterministic uncompressed-AVI bytes for tests/gates: a RIFF
    * 'AVI ' container with one 'vids' BI_RGB 24bpp stream at
    * `rate/scale` fps; frame f's pixel (x, y) is the gray value
    * `pixel(f, x, y)` (B=G=R, bottom-up DIB rows, 4-byte stride). */
  def grayAvi(w: Int, h: Int, rate: Int, scale: Int,
      nFrames: Int, pixel: (Int, Int, Int) => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def fourcc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val stride = ((w * 3 + 3) / 4) * 4
    val frameBytes = stride * h
    val strhSize = 56; val strfSize = 40; val avihSize = 56
    val strlSize = 4 + (8 + strhSize) + (8 + strfSize)
    val hdrlSize = 4 + (8 + avihSize) + (8 + strlSize)
    val moviSize = 4 + nFrames * (8 + frameBytes)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    fourcc("RIFF"); le32(riffSize); fourcc("AVI ")
    fourcc("LIST"); le32(hdrlSize); fourcc("hdrl")
    fourcc("avih"); le32(avihSize)
    le32(1000000L * scale / rate) // usec/frame
    le32(0); le32(0); le32(0)
    le32(nFrames); le32(0); le32(1) // total frames, initial, streams
    le32(frameBytes); le32(w); le32(h)
    le32(0); le32(0); le32(0); le32(0) // reserved
    fourcc("LIST"); le32(strlSize); fourcc("strl")
    fourcc("strh"); le32(strhSize)
    fourcc("vids"); fourcc("DIB ")
    le32(0); le16(0); le16(0); le32(0) // flags, prio, lang, initial
    le32(scale); le32(rate); le32(0); le32(nFrames)
    le32(frameBytes); le32(0xffffffffL); le32(0) // bufsize, quality, samplesize
    le16(0); le16(0); le16(w); le16(h) // rcFrame
    fourcc("strf"); le32(strfSize)
    le32(40); le32(w); le32(h); le16(1); le16(24)
    le32(0); le32(frameBytes); le32(0); le32(0); le32(0); le32(0)
    fourcc("LIST"); le32(moviSize); fourcc("movi")
    var f = 0
    while (f < nFrames) {
      fourcc("00db"); le32(frameBytes)
      var y = h - 1 // bottom-up rows
      while (y >= 0) {
        var written = 0
        var x = 0
        while (x < w) {
          val v = pixel(f, x, y) & 0xff
          out.write(v); out.write(v); out.write(v)
          written += 3; x += 1
        }
        while (written < stride) { out.write(0); written += 1 }
        y -= 1
      }
      f += 1
    }
    out.toByteArray
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
