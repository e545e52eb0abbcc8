package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Native expression: WAV PCM bytes → 64-bit acoustic fingerprint by
  * sign-of-energy-difference binarization (the published
  * Haitsma–Kalker robust-hash idea, simplified to time-domain window
  * energies so every step is exact integer arithmetic): split the
  * interleaved sample stream into 65 windows, bit w = 1 iff window w's
  * mean |sample| exceeds window w+1's. Re-encoded or gain-scaled
  * copies of a recording (no clipping) produce the IDENTICAL
  * fingerprint — positive gain multiplies every window energy by the
  * same factor, and the comparisons are scale-free — so near-dup audio
  * detection composes with the same banded Hamming join as SimHash and
  * the perceptual image hash ([[graft.operators.Dedup.audioDupPairs]]).
  *
  * Window boundaries are floor(w·n/65) (nearest-sample fallback below
  * 65 samples) — the same deterministic cell scheme as
  * [[PerceptualImageHash]]. Mean comparisons are exact 128-bit
  * cross-multiplications (`Math.multiplyHigh`): window counts differ,
  * and e·n reaches 2^77 at the format's limits, so a Long product
  * would silently wrap. NULL for anything that is not uncompressed
  * integer-PCM WAV — same contract as [[DecodeAudioFeatures]].
  *
  * Reference scope: TidierDB has no media operators at all
  * (`/root/reference/src/TidierDB.jl` covers SQL verbs only) — this is
  * part of the training-data-pipeline extension surface.
  */
case class AudioFingerprint(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"audio_fingerprint expects binary, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    AudioFingerprint.fingerprint(input.asInstanceOf[Array[Byte]])
      .map(Long.box).orNull

  override protected def withNewChildInternal(newChild: Expression): AudioFingerprint =
    copy(child = newChild)

  override def prettyName: String = "audio_fingerprint"
}

object AudioFingerprint {

  val Windows = 65 // 64 adjacent-difference bits

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) | ((b(o + 2) & 0xffL) << 16) |
      ((b(o + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** exact compare of nonnegative a·b vs c·d in 128 bits */
  private def crossGt(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val hi1 = Math.multiplyHigh(a, b); val lo1 = a * b
    val hi2 = Math.multiplyHigh(c, d); val lo2 = c * d
    hi1 > hi2 || (hi1 == hi2 && java.lang.Long.compareUnsigned(lo1, lo2) > 0)
  }

  def fingerprint(b: Array[Byte]): Option[Long] = {
    if (b == null || b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE")
      return None
    try {
      // RIFF chunk walk — same traversal contract as DecodeAudioFeatures
      var off = 12L
      var fmtOff = -1L
      var dataOff = -1L
      var dataLen = -1L
      while (off + 8 <= b.length && (fmtOff < 0 || dataOff < 0)) {
        val id = tag(b, off.toInt)
        val size = u32(b, off.toInt + 4)
        if (id == "fmt ") fmtOff = off + 8
        else if (id == "data") { dataOff = off + 8; dataLen = size }
        off += 8 + size + (size & 1)
      }
      if (fmtOff < 0 || dataOff < 0 || fmtOff + 16 > b.length) return None
      val audioFormat = u16(b, fmtOff.toInt)
      val channels = u16(b, fmtOff.toInt + 2)
      val bits = u16(b, fmtOff.toInt + 14)
      if (audioFormat != 1 || channels < 1) return None
      if (bits != 8 && bits != 16) return None
      val bytesPerSample = bits / 8
      val avail = math.min(dataLen, b.length - dataOff)
      val nAll = avail / bytesPerSample // interleaved stream, channel-agnostic
      if (nAll <= 0) return None

      // per-window Σ|sample| and counts over floor-boundary windows
      val sums = new Array[Long](Windows)
      val counts = new Array[Long](Windows)
      var w = 0
      while (w < Windows) {
        val lo = (w.toLong * nAll / Windows)
        val hiRaw = ((w + 1).toLong * nAll / Windows)
        val hi = if (hiRaw > lo) hiRaw else lo + 1 // nearest-sample fallback
        var s = 0L
        var i = lo
        while (i < hi) {
          val o = (dataOff + i * bytesPerSample).toInt
          val v: Long =
            if (bits == 16) (u16(b, o) << 16 >> 16).toLong
            else (b(o) & 0xff).toLong - 128L
          s += math.abs(v)
          i += 1
        }
        sums(w) = s
        counts(w) = hi - lo
        w += 1
      }
      var sig = 0L
      w = 0
      while (w < 64) {
        // mean_w > mean_{w+1}  ⇔  sum_w·count_{w+1} > sum_{w+1}·count_w
        if (crossGt(sums(w), counts(w + 1), sums(w + 1), counts(w))) sig |= (1L << w)
        w += 1
      }
      Some(sig)
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}
