package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Native expression: image bytes → 64-bit perceptual hash (the
  * published aHash/dHash family used for near-duplicate image
  * detection in training-data pipelines — images that survive exact
  * byte dedup because of re-encoding, resizing, or watermarking hash
  * to signatures within small Hamming distance).
  *
  *  - `ahash`: 8×8 grid of grayscale cell means; bit(cy·8+cx) = 1 iff
  *    the cell mean exceeds the GLOBAL pixel mean (the "average hash").
  *  - `dhash`: 9×8 grid; bit(cy·8+cx) = 1 iff cell (cx,cy) mean >
  *    cell (cx+1,cy) mean (the "difference hash" — row-wise gradients,
  *    robust to uniform brightness shifts).
  *
  * Downsampling is deterministic AREA AVERAGING over floor-boundary
  * cells (never ImageIO's platform-tunable interpolators): cell (i)
  * spans source columns floor(i·w/G) until floor((i+1)·w/G). When the
  * image is narrower than the grid, each cell nearest-samples the
  * single pixel floor(i·w/G). All comparisons are exact integer
  * cross-multiplications of per-cell (sum, count) pairs — no floating
  * point anywhere, so signatures are bit-identical everywhere and an
  * external SQL oracle can reproduce them.
  *
  * Gray value per pixel = R+G+B (the ×3 scale cancels in every
  * comparison). NULL for undecodable bytes — same contract as
  * [[DecodeImageFeatures]]. Near-dup search composes with the same
  * pigeonhole chunk join as SimHash (`bit_count(a ^ b)` = Hamming).
  */
case class PerceptualImageHash(child: Expression, kind: String)
    extends UnaryExpression with CodegenFallback {

  require(kind == "ahash" || kind == "dhash",
    s"perceptual hash kind must be 'ahash' or 'dhash', got $kind")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"perceptual_image_hash expects binary, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    PerceptualImageHash.hash(input.asInstanceOf[Array[Byte]], kind)
      .map(Long.box).orNull

  override protected def withNewChildInternal(newChild: Expression): PerceptualImageHash =
    copy(child = newChild)

  override def prettyName: String = s"perceptual_image_hash_$kind"
}

object PerceptualImageHash {

  /** cell boundaries: floor(i·n/g) for i in 0..g (nearest-sample when
    * n < g: the empty floor range falls back to the single pixel) */
  private def bounds(n: Int, g: Int): Array[(Int, Int)] =
    Array.tabulate(g) { i =>
      val lo = (i.toLong * n / g).toInt
      val hi = ((i + 1).toLong * n / g).toInt
      if (hi > lo) (lo, hi) else (lo, lo + 1)
    }

  /** per-cell (graySum, pixelCount) over the grid — gray = R+G+B */
  private def cellSums(
      img: java.awt.image.BufferedImage,
      gw: Int, gh: Int): (Array[Long], Array[Long]) = {
    val w = img.getWidth; val h = img.getHeight
    val bx = bounds(w, gw); val by = bounds(h, gh)
    val sums = new Array[Long](gw * gh)
    val counts = new Array[Long](gw * gh)
    val rowBuf = new Array[Int](w)
    var cy = 0
    while (cy < gh) {
      val (y0, y1) = by(cy)
      var y = y0
      while (y < y1) {
        img.getRGB(0, y, w, 1, rowBuf, 0, w)
        var cx = 0
        while (cx < gw) {
          val (x0, x1) = bx(cx)
          var s = 0L
          var x = x0
          while (x < x1) {
            val p = rowBuf(x)
            s += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
            x += 1
          }
          val c = cy * gw + cx
          sums(c) += s
          counts(c) += (x1 - x0).toLong
          cx += 1
        }
        y += 1
      }
      cy += 1
    }
    (sums, counts)
  }

  /** grid width for a hash kind: aHash is 8×8, dHash 9×8 (one extra
    * column so every bit has a right neighbor) */
  private[plans] def gridWidth(kind: String): Int = if (kind == "ahash") 8 else 9

  /** sign-binarize per-cell (graySum, count) pairs into the 64-bit
    * signature — shared by the still-image path and the per-frame
    * video path ([[VideoFrameHashes]]). Exact integer
    * cross-multiplications throughout. */
  private[plans] def binarize(
      sums: Array[Long], counts: Array[Long], kind: String): Long = {
    if (kind == "ahash") {
      var total = 0L; var n = 0L
      var i = 0
      while (i < 64) { total += sums(i); n += counts(i); i += 1 }
      var sig = 0L
      i = 0
      while (i < 64) {
        // mean_c > mean_global  ⇔  sum_c · n > total · count_c (exact)
        if (sums(i) * n > total * counts(i)) sig |= (1L << i)
        i += 1
      }
      sig
    } else {
      var sig = 0L
      var cy = 0
      while (cy < 8) {
        var cx = 0
        while (cx < 8) {
          val l = cy * 9 + cx
          val r = l + 1
          if (sums(l) * counts(r) > sums(r) * counts(l))
            sig |= (1L << (cy * 8 + cx))
          cx += 1
        }
        cy += 1
      }
      sig
    }
  }

  /** cell (graySum, count) pairs over an arbitrary pixel accessor —
    * the raw-raster path (video DIB frames); the BufferedImage path
    * keeps its row-buffered loop in [[cellSums]] */
  private[plans] def cellSumsFrom(
      w: Int, h: Int, gw: Int, gh: Int,
      graySum: (Int, Int) => Long): (Array[Long], Array[Long]) = {
    val bx = bounds(w, gw); val by = bounds(h, gh)
    val sums = new Array[Long](gw * gh)
    val counts = new Array[Long](gw * gh)
    var cy = 0
    while (cy < gh) {
      val (y0, y1) = by(cy)
      var cx = 0
      while (cx < gw) {
        val (x0, x1) = bx(cx)
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += graySum(x, y); x += 1 }
          y += 1
        }
        val c = cy * gw + cx
        sums(c) = s
        counts(c) = (x1 - x0).toLong * (y1 - y0)
        cx += 1
      }
      cy += 1
    }
    (sums, counts)
  }

  def hash(bytes: Array[Byte], kind: String): Option[Long] =
    ImageCodec.decodeImage(bytes).map { img =>
      val (sums, counts) = cellSums(img, gridWidth(kind), 8)
      binarize(sums, counts, kind)
    }
}
