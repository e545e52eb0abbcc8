package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Objective-side corpus transforms — the step that turns clean text
  * into (input, target) training pairs. No reference-engine analog;
  * published recipes (Raffel et al. 2020 "T5" §3.1.4 span corruption;
  * Bavarian et al. 2022 "FIM" infilling), re-expressed DETERMINISTIC:
  * every "random" choice is the 60-bit unit hash of (seed, doc, slot),
  * exact integer arithmetic only — so the pairs are reproducible
  * bit-for-bit across engines/partitionings/reruns (the property a
  * resumable 100 TB data job actually needs; true RNG state is neither
  * restart-stable nor auditable).
  *
  * Both transforms are pure column expressions over the token array —
  * fully narrow, fused with the scan, stream-safe, zero shuffle.
  */
object Corruption {

  /** T5-style span corruption, BLOCKED deterministic variant: the
    * token stream splits into fixed blocks of `blockLen`; each full-
    * enough block masks ONE contiguous span of exactly `spanLen`
    * tokens at a hash-chosen offset, replaced by the block's sentinel
    * `<extra_id_j>`; the target is the sentinel-prefixed dropped
    * tokens. `spanLen/blockLen` IS the noise density (T5 defaults
    * 3/20 = 0.15 with mean span 3), hit exactly on every full block
    * instead of in expectation — blocks shorter than `spanLen` (the
    * doc tail) stay unmasked.
    *
    * Output columns: `input_text` (corrupted, single-space joined),
    * `target_text` (sentinel + span per masked block), `n_masked`.
    * Empty docs pass through with empty strings.
    */
  def spanCorruptBlocked(
      df: DataFrame,
      idCol: String,
      textCol: String,
      seed: String,
      blockLen: Int = 20,
      spanLen: Int = 3): DataFrame = {
    require(blockLen >= 2, s"blockLen must be >= 2, got $blockLen")
    require(spanLen >= 1 && spanLen < blockLen,
      s"spanLen must be in [1, blockLen), got $spanLen (blockLen $blockLen)")
    val id = col(idCol)
    val tk = col("__tk")
    val n = size(tk)
    // ceil(n / blockLen) exactly: int `div` (a plain `/` on int columns
    // is DOUBLE division in Spark)
    val nBlocks = expr(s"(size(__tk) + ${blockLen - 1}) div $blockLen").cast("int")
    // per block j (0-based): length of the block, masked?, span offset
    def blockLenJ(j: Column): Column = least(lit(blockLen), n - j * blockLen)
    def maskable(j: Column): Column = blockLenJ(j) >= spanLen
    def off(j: Column): Column =
      pmod(Sampling.unitHashInt(seed, Seq(id, j)), blockLenJ(j) - spanLen + 1)
    def sentinel(j: Column): Column =
      concat(lit("<extra_id_"), j.cast("string"), lit(">"))

    // per block: [pre-span tokens] ++ [sentinel] ++ [post-span tokens]
    val inputParts = transform(sequence(lit(0), nBlocks - 1), j => {
      val start = j * blockLen + 1 // 1-based slice start
      when(maskable(j),
        concat(
          slice(tk, start, off(j)),
          array(sentinel(j)),
          slice(tk, start + off(j) + spanLen, blockLenJ(j) - off(j) - spanLen)))
        .otherwise(slice(tk, start, blockLenJ(j)))
    })
    val targetParts = transform(sequence(lit(0), nBlocks - 1), j => {
      val start = j * blockLen + 1
      when(maskable(j),
        concat(array(sentinel(j)), slice(tk, start + off(j), lit(spanLen))))
        .otherwise(array().cast("array<string>"))
    })
    val nMasked = aggregate(
      sequence(lit(0), nBlocks - 1), lit(0L),
      (acc, j) => acc + when(maskable(j), lit(spanLen.toLong)).otherwise(lit(0L)))

    df.withColumn("__tk", graft.functions.TextFns.tokens(col(textCol)))
      .withColumn("input_text",
        when(n > 0, concat_ws(" ", flatten(inputParts))).otherwise(lit("")))
      .withColumn("target_text",
        when(n > 0, concat_ws(" ", flatten(targetParts))).otherwise(lit("")))
      .withColumn("n_masked", when(n > 0, nMasked).otherwise(lit(0L)))
      .drop("__tk")
  }

  /** FIM (fill-in-the-middle) split: two hash-chosen cut points divide
    * the token stream into prefix / middle / suffix; emitted in PSM
    * order with the published sentinels (`<fim_prefix>` prefix
    * `<fim_suffix>` suffix `<fim_middle>` middle) — the document-level
    * transform code models apply to `fimRate` of the corpus (the rest
    * pass through unchanged, `fim_applied = false`).
    *
    * Cut arithmetic is exact: `c1 = h1 mod (n+1)`, `c2 = c1 + (h2 mod
    * (n - c1 + 1))` — every (c1 ≤ c2) pair reachable, pure function of
    * (seed, doc). The apply decision is the same exact-threshold
    * Bernoulli as [[Sampling.hashSample]] (`h0·100 < rate%·2^60·100`
    * avoided — compare `h0 < floor(rate·2^60)` with a rational rate).
    */
  def fimSplit(
      df: DataFrame,
      idCol: String,
      textCol: String,
      seed: String,
      fimRateNum: Int = 1,
      fimRateDen: Int = 2): DataFrame = {
    require(fimRateNum >= 0 && fimRateDen >= 1 && fimRateNum <= fimRateDen,
      s"fim rate must be a rational in [0,1], got $fimRateNum/$fimRateDen")
    val tk = graft.functions.TextFns.tokens(col(textCol))
    val id = col(idCol)
    val n = size(tk)
    // exact threshold: h < 2^60 · num/den  ⇔  h·den < num·2^60
    val apply = Sampling.unitHashInt(s"$seed#apply", Seq(id)).cast("decimal(38,0)") *
      lit(fimRateDen) < lit(fimRateNum).cast("decimal(38,0)") *
      lit(1152921504606846976L)
    val c1 = pmod(Sampling.unitHashInt(s"$seed#c1", Seq(id)), (n + 1).cast("long"))
      .cast("int")
    val c2 = (c1 + pmod(Sampling.unitHashInt(s"$seed#c2", Seq(id)),
      (n - c1 + 1).cast("long")).cast("int"))
    val joined = (c: Column) => concat_ws(" ", c)
    val prefix = joined(slice(tk, lit(1), c1))
    val middle = joined(slice(tk, c1 + 1, c2 - c1))
    val suffix = joined(slice(tk, c2 + 1, n - c2))
    df.withColumn("fim_applied", apply && n > 0)
      .withColumn("fim_text",
        when(apply && n > 0,
          concat(lit("<fim_prefix>"), prefix, lit("<fim_suffix>"), suffix,
            lit("<fim_middle>"), middle))
          .otherwise(joined(tk)))
  }
}
