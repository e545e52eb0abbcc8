package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling for training-data pipelines.
  *
  * Every sampler here is a pure function of (seed, row key): re-running
  * the pipeline — on a different cluster, partitioning, or day —
  * selects the SAME rows, which is what makes corpus releases
  * reproducible and lets downstream stages join against a sample by
  * key. That rules out `rand()`/`TABLESAMPLE` (partition-order
  * dependent) and is why everything routes through a portable md5-based
  * unit hash (the same 60-bit construction as the oracle-verified
  * MinHash pipeline, so any engine with md5 reproduces the selection
  * bit-for-bit).
  *
  * 100 TB shape: `hashSample` is a narrow codegen'd filter fused into
  * the scan — no shuffle, no state. `stratifiedSampleN` is one window
  * over a shuffle on the group key (the standard distributed top-k);
  * `mixCorpora` is a union of narrow filters.
  */
object Sampling {

  /** the raw 60-bit integer behind [[unitHash]] — for callers that
    * need EXACT threshold tests (cross-multiplied integer compares
    * instead of double division, see [[mixCorporaByTokens]]) */
  def unitHashInt(seed: String, keys: Seq[Column]): Column =
    conv(substring(md5(concat_ws("\u0001",
      lit(seed) +: keys.map(k => coalesce(k.cast("string"), lit("\u0000"))): _*)), 1, 15), 16, 10)
      .cast("long")

  /** Deterministic hash in [0, 1): md5 of (seed, key columns) → top 60
    * bits as a long → scaled by 2^-60. Uniform, independent across
    * seeds, portable across engines (mirror: `md5(seed || chr(1) ||
    * key…)`). Keys join on the 0x01 separator with NULL mapped to
    * 0x00 — a bare "|" separator would collide ("a|b") with
    * ("a","b") and NULL with "" (same hardening as Dedup.exactDedup),
    * silently correlating samples that should be independent.
    */
  def unitHash(seed: String, keys: Seq[Column]): Column =
    unitHashInt(seed, keys).cast("double") / lit(1152921504606846976.0) // 2^60

  /** Keep each row with probability `fraction`, deterministically in
    * the row's key: row survives iff unitHash(seed, keys) < fraction.
    * Exact-in-expectation Bernoulli sampling; narrow (no shuffle).
    */
  def hashSample(df: DataFrame, fraction: Double, seed: String, keyCols: Seq[String]): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1], got $fraction")
    require(keyCols.nonEmpty, "hashSample needs at least one key column")
    df.filter(unitHash(seed, keyCols.map(df.col)) < lit(fraction))
  }

  /** Exactly-n-per-group deterministic sample: within each group, rank
    * rows by (unitHash(seed, key), key) and keep the first `n`. Groups
    * smaller than n keep everything. One shuffle on the group keys.
    */
  def stratifiedSampleN(
      df: DataFrame,
      groupCols: Seq[String],
      n: Int,
      seed: String,
      keyCol: String): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(groupCols.nonEmpty, "stratifiedSampleN needs group columns")
    val rn = "__sample_rn"
    val w = Window
      .partitionBy(groupCols.map(df.col): _*)
      .orderBy(unitHash(seed, Seq(df.col(keyCol))).asc, df.col(keyCol).asc)
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= n)
      .drop(rn)
  }

  /** Deterministic weighted UPSAMPLING — the "2.5 epochs of source X"
    * mixing primitive: every row is repeated `floor(weight)` times,
    * plus one more iff its unit hash falls under the fractional part,
    * so the expected multiplicity is exactly `weight` and the
    * realized multiset is a pure function of (seed, key) — stable
    * across partitionings, engines and re-runs. `copy` (0-based)
    * disambiguates the repeats for downstream shuffling; pair with
    * [[shuffleDeterministic]] on (key, copy) so epochs interleave
    * instead of clustering. Narrow: sequence+explode, no shuffle.
    */
  def upsampleByWeight(
      df: DataFrame,
      weight: Double,
      seed: String,
      keyCols: Seq[String],
      copyCol: String = "copy"): DataFrame = {
    require(weight > 0.0, s"weight must be positive, got $weight")
    require(keyCols.nonEmpty, "upsampleByWeight needs key columns")
    val whole = math.floor(weight).toLong
    val frac = weight - whole
    val copies =
      (when(unitHash(seed, keyCols.map(df.col)) < lit(frac), lit(whole + 1))
        .otherwise(lit(whole))).cast("int")
    // copies can be 0 (weight < 1): sequence(0,-1) DESCENDS rather than
    // returning empty (same trap as RangeJoinRule's band explode), so
    // guard with an empty array — plain explode then drops the row
    val arr = when(copies > lit(0), sequence(lit(0), copies - lit(1)))
      .otherwise(array().cast("array<int>"))
    df.withColumn(copyCol, explode(arr))
  }

  /** Deterministic k-way corpus split (train/val/test, any k): each
    * row lands in EXACTLY one split as a pure function of (seed, key)
    * — reproducible across engines, partitionings and re-runs, and
    * docs added later never reshuffle earlier assignments. Fractions
    * are enforced with exact integer thresholds on the 60-bit unit
    * hash (`floor(cumFraction · 2^60)`), so the boundary comparison is
    * engine-portable — no double-rounding lottery. Adds `splitCol`
    * with the split name; fully narrow, no shuffle.
    */
  def splitCorpus(
      df: DataFrame,
      seed: String,
      keyCols: Seq[String],
      splits: Seq[(String, Double)],
      splitCol: String = "split"): DataFrame = {
    require(keyCols.nonEmpty, "splitCorpus needs key columns")
    require(splits.size >= 2, s"need at least 2 splits, got ${splits.size}")
    require(splits.map(_._1).distinct.size == splits.size, "split names must be distinct")
    require(splits.forall(_._2 > 0), "split fractions must be positive")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val scale = BigDecimal(2).pow(60)
    val cum = splits.map(_._2).scanLeft(BigDecimal(0))(_ + BigDecimal(_)).tail
    val thresholds = cum.init.map(c =>
      (c * scale).setScale(0, scala.math.BigDecimal.RoundingMode.FLOOR).toLong)
    val h = unitHashInt(seed, keyCols.map(df.col))
    var label: Column = lit(splits.last._1)
    thresholds.zip(splits.map(_._1)).reverse.foreach { case (t, name) =>
      label = when(h < lit(t), lit(name)).otherwise(label)
    }
    df.withColumn(splitCol, label)
  }

  /** Deterministic global shuffle — the "randomize training order"
    * step before sharding a corpus. Every row's position is a pure
    * function of (seed, key): `orderBy(unitHash(seed, keys), keys)`,
    * so the order survives re-runs, cluster changes, and engine swaps
    * (same md5 construction as [[hashSample]]).
    *
    * Scale: one global sort = sample-based RANGE partitioning + one
    * shuffle, fully parallel — there is deliberately NO global
    * row_number here (that would serialize into one task; writers
    * shard by partition instead, `df.write` preserves sort order
    * within files). `exposeAs` materializes the position hash as a
    * column when downstream wants it (or an engine-portable audit).
    */
  def shuffleDeterministic(
      df: DataFrame,
      seed: String,
      keyCols: Seq[String],
      exposeAs: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty, "shuffleDeterministic needs key columns")
    val h = unitHash(seed, keyCols.map(df.col))
    exposeAs match {
      case Some(name) =>
        df.withColumn(name, h)
          .orderBy(col(name) +: keyCols.map(df.col): _*)
      case None =>
        df.orderBy(h +: keyCols.map(df.col): _*)
    }
  }

  /** Weighted corpus mixing: union the sources, each thinned to its
    * fraction — the "data mixture" step of a training run, e.g.
    * `Seq(web -> 0.3, code -> 1.0, books -> 0.8)`. Schemas must union
    * by name; each source keeps its own deterministic selection (the
    * seed is salted with the source index so identical keys in
    * different sources draw independently).
    */
  def mixCorpora(
      sources: Seq[(DataFrame, Double)],
      seed: String,
      keyCols: Seq[String]): DataFrame = {
    require(sources.nonEmpty, "mixCorpora needs at least one source")
    sources.zipWithIndex.map { case ((src, frac), i) =>
      if (frac >= 1.0) src else hashSample(src, frac, s"$seed#$i", keyCols)
    }.reduce(_.unionByName(_))
  }

  /** Mix corpora to TOKEN-share targets — the form a training run
    * actually specifies ("30% web, 50% code, 20% books" means tokens,
    * not documents). Given relative integer weights `w_i`, the largest
    * mixture with no upsampling keeps `T = min_i(t_i·W/w_i)` total
    * tokens (the binding source survives whole); every other source is
    * thinned to fraction `w_i·t_k / (w_k·t_i)` of its docs,
    * deterministically by the same salted unit hash as [[mixCorpora]].
    * Doc-level Bernoulli thinning hits the token share in expectation
    * (exactly what weighted mixing means operationally).
    *
    * Every selection decision is an EXACT integer compare —
    * `h·w_k·t_i < w_i·t_k·2^60` in DECIMAL(38,0) (≤10^35, no
    * rounding) — so the mixture is reproducible bit-for-bit on any
    * engine with md5, partition layout, or rerun; no double threshold
    * anywhere. Cost: one token-sum aggregate per source (each a
    * narrow scan + single-row agg), then narrow filters + union.
    */
  def mixCorporaByTokens(
      sources: Seq[(DataFrame, Long)],
      seed: String,
      keyCols: Seq[String],
      textCol: String): DataFrame = {
    require(sources.nonEmpty, "mixCorporaByTokens needs at least one source")
    sources.foreach { case (_, w) =>
      require(w > 0, s"weights must be positive, got $w") }
    mixSelect(sources.map(_._1), tokenTotals(sources.map(_._1), textCol),
      sources.map(_._2), seed, keyCols)
  }

  /** one narrow scan + single-row token-sum aggregate per source */
  private[graft] def tokenTotals(sources: Seq[DataFrame], textCol: String): Seq[Long] =
    sources.map { df =>
      val t = df.agg(coalesce(sum(graft.functions.TextFns.tokenCount(col(textCol))),
        lit(0L))).head().getLong(0)
      require(t > 0, "every source needs at least one token")
      t
    }

  /** the shared mixing core: binding source whole, every other source
    * thinned by the exact-integer-compare Bernoulli selection (see
    * [[mixCorporaByTokens]] for the algebra and its overflow audit —
    * weights must stay ≤ ~10^7 so h·w·t fits DECIMAL(38,0)) */
  private def mixSelect(
      dfs: Seq[DataFrame],
      totals: Seq[Long],
      ws: Seq[Long],
      seed: String,
      keyCols: Seq[String]): DataFrame = {
    // binding source k = argmin t_i/w_i, exact cross-multiplied compare
    // (strict < keeps the LOWEST index on ties)
    val k = (1 until dfs.length).foldLeft(0) { (best, i) =>
      if (BigInt(totals(i)) * ws(best) < BigInt(totals(best)) * ws(i)) i else best
    }
    val (tk, wk) = (totals(k), ws(k))
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    dfs.zipWithIndex.map { case (df, i) =>
      if (i == k) df
      else df.filter(
        dec(unitHashInt(s"$seed#$i", keyCols.map(df.col))) * dec(lit(wk)) * dec(lit(totals(i)))
          < dec(lit(ws(i))) * dec(lit(tk)) * dec(lit(1152921504606846976L)))
    }.reduce(_.unionByName(_))
  }

  /** exact floor q-th root of a nonnegative BigInt (binary search —
    * inputs are bounded driver-side per-source scalars) */
  private[graft] def nthRootFloor(x: BigInt, q: Int): BigInt = {
    require(q >= 1 && x >= 0)
    if (q == 1 || x <= 1) return x // 0^q=0, 1^q=1
    var lo = BigInt(0)
    var hi = BigInt(1) << (x.bitLength / q + 1)
    while (lo < hi) { // invariant: lo^q <= x < (hi+1)^q
      val mid = (lo + hi + 1) >> 1
      if (mid.pow(q) <= x) lo = mid else hi = mid - 1
    }
    lo
  }

  /** UniMax / mT5-style TEMPERATURE weights over per-source token
    * totals: `w_i ∝ t_i^(p/q)` for α = p/q ∈ (0, 1] — the standard
    * way a multilingual/multi-source mixture is flattened (α = 1
    * reproduces natural proportions, α → 0 approaches uniform; mT5
    * ships α = 0.3 ≈ 3/10, XLM-R α = 0.7). EXACT integer arithmetic
    * end to end: `t_i^(p/q)` is the floor q-th root of
    * `t_i^p · 10^(6q)` (a pure-integer quantity an external engine
    * reproduces exactly — no `pow`, no transcendental), then weights
    * are normalized so the largest is 10^6, keeping the selection
    * algebra inside DECIMAL(38,0) at any corpus size. A source whose
    * weight would round to 0 (share < 10^-6 of the largest) fails
    * loudly rather than silently vanish from the mixture.
    */
  def temperatureWeights(
      tokenTotals: Seq[Long], alphaNum: Int, alphaDen: Int): Seq[Long] = {
    require(alphaNum >= 1 && alphaDen >= alphaNum,
      s"temperature alpha must be a rational in (0, 1], got $alphaNum/$alphaDen")
    require(alphaDen <= 12, s"alpha denominator capped at 12, got $alphaDen")
    tokenTotals.foreach(t => require(t > 0, "every source needs at least one token"))
    val raw = tokenTotals.map(t =>
      nthRootFloor(BigInt(t).pow(alphaNum) * BigInt(1000000L).pow(alphaDen), alphaDen))
    val mx = raw.max
    val ws = raw.map(r => ((r * 1000000L) / mx).toLong)
    ws.zipWithIndex.foreach { case (w, i) =>
      require(w > 0,
        s"temperature weight for source $i rounds to 0 (token share < 1e-6 of " +
          "the largest source at this alpha) — drop the source or raise alpha")
    }
    ws
  }

  /** Temperature-sampled corpus mixing: [[temperatureWeights]] over
    * the sources' token totals feeding the same exact-integer
    * selection as [[mixCorporaByTokens]] — `Seq(web, wiki, code)` at
    * α = 1/2 keeps the binding (most-upweighted-relative) source whole
    * and thins the rest toward the flattened shares. One token-sum
    * aggregate per source, then narrow filters + union: no shuffle,
    * reproducible bit-for-bit across engines and partitionings.
    */
  def mixCorporaByTemperature(
      sources: Seq[DataFrame],
      alphaNum: Int,
      alphaDen: Int,
      seed: String,
      keyCols: Seq[String],
      textCol: String): DataFrame = {
    require(sources.nonEmpty, "mixCorporaByTemperature needs at least one source")
    val totals = tokenTotals(sources, textCol)
    mixSelect(sources, totals,
      temperatureWeights(totals, alphaNum, alphaDen), seed, keyCols)
  }
}
