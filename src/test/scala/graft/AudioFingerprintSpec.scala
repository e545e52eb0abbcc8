package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}
import graft.plans.AudioFingerprint

/** Acoustic fingerprint (sign-of-energy-difference) + audio near-dup
  * pairs. The anchor test re-derives the expected signature
  * INDEPENDENTLY from the definition on a sample count that is an
  * exact multiple of the window count (so windows are equal-size and
  * the bits reduce to plain Σ|s| comparisons). Invariance tests assert
  * the exact-arithmetic claims: positive gain without clipping leaves
  * the fingerprint IDENTICAL, not merely close. */
class AudioFingerprintSpec extends SparkSpec {

  private def wav(samples: Seq[Short], rate: Int = 8000): Array[Byte] =
    SparkEntry.wavBytes(rate, samples)

  private def fp(b: Array[Byte]): Option[Long] = AudioFingerprint.fingerprint(b)

  test("signature matches the hand-derived equal-window definition") {
    // 260 samples = 65 windows × 4 — equal windows, bits are plain sums
    val s = (0 until 260).map(i => (((7 * (13 + i) * 97) % 2003) - 1001).toShort)
    val expected = {
      val e = (0 until 65).map(w => (0 until 4).map(j => math.abs(s(4 * w + j).toLong)).sum)
      (0 until 64).foldLeft(0L)((acc, w) => if (e(w) > e(w + 1)) acc | (1L << w) else acc)
    }
    assert(fp(wav(s)).contains(expected))
    assert(expected != 0L)
  }

  test("constant signal fingerprints to 0 (no strict winner)") {
    assert(fp(wav(Seq.fill(130)(500.toShort))).contains(0L))
  }

  test("positive gain without clipping is exactly invariant") {
    val s = (0 until 260).map(i => (((i * 31) % 997) - 498).toShort)
    val scaled = s.map(v => (v * 3).toShort) // |v| ≤ 498·3 < 32768: no clip
    assert(fp(wav(s)).isDefined)
    assert(fp(wav(s)) == fp(wav(scaled)))
  }

  test("sample-count change (resample-like) keeps the hash defined and close") {
    // duplicate every sample (2× "sample rate"): windows see the same
    // energy profile, so the fingerprint is exactly preserved
    val s = (0 until 260).map(i => (((i * 57) % 1753) - 876).toShort)
    val doubled = s.flatMap(v => Seq(v, v))
    assert(fp(wav(s)) == fp(wav(doubled)))
  }

  test("short streams (below 65 samples) use nearest-sample fallback") {
    val s = (0 until 10).map(i => ((i * 731) % 1001 - 500).toShort)
    assert(fp(wav(s)).isDefined)
  }

  test("non-WAV and corrupt bytes give NULL, never a throw") {
    assert(fp(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)).isEmpty)
    assert(fp("RIFFxxxxWAVE".getBytes ++ Array.fill[Byte](40)(9)).isEmpty)
  }

  test("SQL surface agrees with the Column API") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val s = (0 until 130).map(i => (((i * 37) % 1499) - 749).toShort)
    val df = Seq((1L, wav(s))).toDF("id", "audio")
    df.createOrReplaceTempView("afp_rows")
    val viaSql = spark.sql(
      "SELECT audio_fingerprint(audio) AS h FROM afp_rows").head.getLong(0)
    val viaCol = df.select(Multimodal.audioFingerprint(col("audio"))).head.getLong(0)
    assert(viaSql == viaCol)
  }

  test("audioDupPairs finds gain-scaled near-dups, skips undecodable") {
    import spark.implicits._
    val base = (0 until 260).map(i => (((i * 31) % 997) - 498).toShort)
    val gain = base.map(v => (v * 2).toShort)
    val poke = base.updated(17, 10000.toShort) // one loud click
    val other = (0 until 260).map(i => (((i * 113) % 1901) - 950).toShort)
    val junk = Array[Byte](3, 1, 4, 1, 5)
    val df = Seq(
      (1L, wav(base)), (2L, wav(gain)), (3L, wav(poke)),
      (4L, wav(other)), (5L, junk)).toDF("id", "audio")
    val pairs = Dedup.audioDupPairs(df, "id", "audio", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // exact gain invariance: hamming 0
    assert(pairs.contains((1L, 3L))) // local click: few bits flip
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
    assert(!pairs.contains((1L, 4L)))
  }
}
