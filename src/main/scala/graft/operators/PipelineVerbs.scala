package graft.operators

import graft.TidierFrame
import graft.functions.TextFns

/** Fluent verb-chain surface for the training-data pipeline suite —
  * the same `TidierFrame => TidierFrame` shape as the reference-parity
  * verbs, so a pipeline reads as ONE chain:
  *
  * {{{
  * Tidier.read(spark, "docs.parquet")
  *   .dropBlockedTerms("text", badWords)
  *   .dedupExact("doc_id", Seq("text"))
  *   .hashSample(0.5, "seed", Seq("doc_id"))
  *   .chunkBySentences("text", maxTokens = 512)
  *   .fimSplit("doc_id", "chunk", "seed")
  * }}}
  *
  * Each wrapper delegates to the operator object (single source of
  * truth — semantics, scale notes and gates live there) and CLEARS
  * grouping/window state like any other plan-replacing verb. Operators
  * needing a second frame (mixing, decontamination, joins against
  * benchmarks) stay on their objects — a fluent arity-2 verb would
  * just rename the argument.
  */
private[graft] trait PipelineVerbs { self: TidierFrame =>

  // ---- dedup -----------------------------------------------------------

  /** [[Dedup.exactDedup]]: keep the lowest-id row per content. */
  def dedupExact(idCol: String, contentCols: Seq[String]): TidierFrame =
    reset(Dedup.exactDedup(df, idCol, contentCols))

  // ---- sampling / splitting -------------------------------------------

  /** [[Sampling.hashSample]]: deterministic Bernoulli keep. */
  def hashSample(fraction: Double, seed: String, keyCols: Seq[String]): TidierFrame =
    reset(Sampling.hashSample(df, fraction, seed, keyCols))

  /** [[Sampling.splitCorpus]]: adds the deterministic k-way split column. */
  def splitCorpus(seed: String, keyCols: Seq[String],
      splits: Seq[(String, Double)], splitCol: String = "split"): TidierFrame =
    reset(Sampling.splitCorpus(df, seed, keyCols, splits, splitCol))

  /** [[Sampling.shuffleDeterministic]]: seeded global training order. */
  def shuffleDeterministic(seed: String, keyCols: Seq[String]): TidierFrame =
    reset(Sampling.shuffleDeterministic(df, seed, keyCols))

  // ---- filtering -------------------------------------------------------

  /** [[graft.functions.TextFns.dropBlockedTerms]]: C4-style bad-words filter. */
  def dropBlockedTerms(textCol: String, terms: Seq[String]): TidierFrame =
    reset(TextFns.dropBlockedTerms(df, textCol, terms))

  /** [[graft.functions.TextFns.dropBlockedDomains]]: URL blocklist scrub. */
  def dropBlockedDomains(urlCol: String, blocked: Seq[String]): TidierFrame =
    reset(TextFns.dropBlockedDomains(df, urlCol, blocked))

  /** [[Repetition.dropRepetitive]]: duplicate-n-gram quality filter. */
  def dropRepetitive(idCol: String, textCol: String, n: Int = 2,
      maxDupFrac: Double = 0.75, maxTopFrac: Double = 0.3): TidierFrame =
    reset(Repetition.dropRepetitive(df, idCol, textCol, n, maxDupFrac, maxTopFrac))

  // ---- chunking / objectives ------------------------------------------

  /** [[Chunking.chunkByTokens]]: sliding fixed-token windows. */
  def chunkByTokens(textCol: String, maxTokens: Int, overlap: Int = 0): TidierFrame =
    reset(Chunking.chunkByTokens(df, textCol, maxTokens, overlap))

  /** [[Chunking.chunkBySentences]]: greedy whole-sentence packing. */
  def chunkBySentences(textCol: String, maxTokens: Int): TidierFrame =
    reset(Chunking.chunkBySentences(df, textCol, maxTokens))

  /** [[Corruption.spanCorruptBlocked]]: deterministic T5 span corruption. */
  def spanCorrupt(idCol: String, textCol: String, seed: String,
      blockLen: Int = 20, spanLen: Int = 3): TidierFrame =
    reset(Corruption.spanCorruptBlocked(df, idCol, textCol, seed, blockLen, spanLen))

  /** [[Corruption.fimSplit]]: PSM fill-in-the-middle split. */
  def fimSplit(idCol: String, textCol: String, seed: String,
      fimRateNum: Int = 1, fimRateDen: Int = 2): TidierFrame =
    reset(Corruption.fimSplit(df, idCol, textCol, seed, fimRateNum, fimRateDen))

  // ---- events ----------------------------------------------------------

  /** [[Events.assignSessions]]: gap sessionization (adds session_id). */
  def assignSessions(userCol: String, tsCol: String, gapSeconds: Long,
      orderCol: String): TidierFrame =
    reset(Events.assignSessions(df, userCol, tsCol, gapSeconds, orderCol))

  /** [[Events.funnel]]: per-user greedy-earliest stage chain. */
  def funnel(userCol: String, tsCol: String, typeCol: String,
      steps: Seq[String], withinSeconds: Option[Long] = scala.None): TidierFrame =
    reset(Events.funnel(df, userCol, tsCol, typeCol, steps, withinSeconds))
}
