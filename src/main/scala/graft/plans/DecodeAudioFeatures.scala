package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL audio decode for WAV (RIFF/WAVE) PCM payloads, entirely in the
  * JVM — upgrades the audio half of the multimodal story from stub to
  * real for the one container format that needs no codec: the RIFF
  * chunk walk finds `fmt ` and `data`, and uncompressed integer PCM
  * (format tag 1, 8 or 16 bits, any channel count) is summarized in a
  * single pass over the sample bytes.
  *
  * Output: struct(format "wav", sample_rate, channels, bits,
  * n_samples (per channel), duration_ms, peak, rms) — peak is
  * max |sample| and rms the root mean square over ALL channels, both
  * in raw sample units (16-bit signed / 8-bit unsigned-centered per
  * the WAV spec). NULL for anything that is not uncompressed-PCM WAV
  * (float/ADPCM/compressed tags included) or any malformed header —
  * corrupt bytes on an untrusted corpus degrade to NULL, never kill
  * the task.
  *
  * Same CodegenFallback-once-per-row shape as
  * [[DecodeImageFeatures]]; composes as a normal column, so decode
  * stays inside the narrow scan stage (no shuffle).
  */
case class DecodeAudioFeatures(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType),
    StructField("sample_rate", LongType),
    StructField("channels", LongType),
    StructField("bits", LongType),
    StructField("n_samples", LongType),
    StructField("duration_ms", DoubleType),
    StructField("peak", LongType),
    StructField("rms", DoubleType)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"decode_audio_features expects binary, got ${other.sql}")
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
    if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    // chunk walk: chunks are (4-byte id, 4-byte LE size, payload,
    // odd sizes padded to even)
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
    val sampleRate = u32(b, fmtOff.toInt + 4)
    val bits = u16(b, fmtOff.toInt + 14)
    if (audioFormat != 1 || channels < 1 || sampleRate <= 0) return None
    if (bits != 8 && bits != 16) return None
    val bytesPerSample = bits / 8
    val avail = math.min(dataLen, b.length - dataOff)
    if (avail <= 0) return None
    val frameBytes = bytesPerSample.toLong * channels
    val nFrames = avail / frameBytes
    if (nFrames <= 0) return None
    val nAll = nFrames * channels
    var peak = 0L
    var sumSq = 0.0
    var i = 0L
    while (i < nAll) {
      val o = (dataOff + i * bytesPerSample).toInt
      // 16-bit WAV is signed LE; 8-bit is unsigned, centered at 128
      val s: Long =
        if (bits == 16) (u16(b, o) << 16 >> 16).toLong
        else (b(o) & 0xff).toLong - 128L
      val a = math.abs(s)
      if (a > peak) peak = a
      sumSq += s.toDouble * s.toDouble
      i += 1
    }
    val rms = math.sqrt(sumSq / nAll)
    Some(InternalRow(
      UTF8String.fromString("wav"), sampleRate, channels.toLong, bits.toLong,
      nFrames, nFrames.toDouble * 1000.0 / sampleRate, peak, rms))
  }

  override protected def withNewChildInternal(newChild: Expression): DecodeAudioFeatures =
    copy(child = newChild)

  override def prettyName: String = "decode_audio_features"
}
