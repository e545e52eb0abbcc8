package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Repetition-based quality filtering — the "duplicate n-gram" family
  * of heuristics (Gopher/MassiveText-style) that catches boilerplate,
  * keyword stuffing, and degenerate generations that per-token quality
  * scores miss. The reference engine has no analog; published recipe.
  *
  * 100 TB shape: one narrow tokenize+shingle pass fused with the scan,
  * then two aggregations — one keyed on (doc, gram) with map-side
  * partial counts, one on doc. Both keys are high-cardinality and
  * uniform (gram strings are doc-local), so there is no hot-key risk;
  * payloads after the first groupBy are (gram, count) pairs, never the
  * document text.
  */
object Repetition {

  /** Per-document n-gram repetition report:
    *  - `n_grams`      total n-gram occurrences (tokens - n + 1)
    *  - `distinct_ngrams`
    *  - `dup_ngram_frac` = 1 - distinct/total — mass of repeated grams
    *  - `top_gram`     most frequent n-gram (ties → lexicographically
    *    largest, so the pick is engine-independent)
    *  - `top_gram_frac` = occurrences × gram chars / doc chars — the
    *    character mass claimed by the single most repeated phrase (may
    *    exceed 1 for overlapping grams; it is a score, not a ratio)
    * Documents with fewer than `n` tokens are absent.
    */
  def repetitionReport(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 2): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    // the shingle pass is the expensive stage — spread small inputs
    // (single-file parquet = one split); no-op when splits >= cores
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    val src = if (df.rdd.getNumPartitions < parallelism) df.repartition(parallelism) else df
    val grams = src
      .select(col(idCol), length(col(textCol)).cast("long").as("__nch"),
        explode(TextFns.wordShingles(col(textCol), n)).as("__gram"))
    val counts = grams
      .groupBy(col(idCol), col("__nch"), col("__gram"))
      .agg(count(lit(1)).as("__cnt"))
    // The fractions must be bit-identical across engines (the driver
    // hash-compares against DuckDB), so round-half-up(a/b · 10^6) is
    // computed as pure BIGINT arithmetic — (2·a·10^6 + b) div (2·b) —
    // followed by ONE IEEE division by 10^6 (deterministic for exact
    // integer operands). Double division before round() is a last-ULP
    // lottery between engines. BIGINT headroom: per-document gram
    // counts; overflows only past ~4.6e12 grams in one document.
    counts
      .groupBy(col(idCol), col("__nch"))
      .agg(
        sum("__cnt").as("n_grams"),
        count(lit(1)).as("distinct_ngrams"),
        // max of (count, gram) struct = highest count, ties broken by
        // largest gram — deterministic without a second shuffle
        max(struct(col("__cnt"), col("__gram"))).as("__top"))
      .select(
        col(idCol),
        col("n_grams"),
        col("distinct_ngrams"),
        (expr("((n_grams - distinct_ngrams) * 2000000 + n_grams) div (2 * n_grams)")
          .cast("double") / lit(1000000.0)).as("dup_ngram_frac"),
        col("__top.__gram").as("top_gram"),
        (expr("(__top.__cnt * length(__top.__gram) * 2000000 + __nch) div (2 * __nch)")
          .cast("double") / lit(1000000.0)).as("top_gram_frac"))
  }

  /** Corpus minus repetitive documents: drops docs whose duplicate-gram
    * fraction exceeds `maxDupFrac` or whose top gram claims more than
    * `maxTopFrac` of the characters. Docs too short to have an n-gram
    * are KEPT (no evidence of repetition).
    */
  def dropRepetitive(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 2,
      maxDupFrac: Double = 0.75,
      maxTopFrac: Double = 0.3): DataFrame = {
    val bad = repetitionReport(df, idCol, textCol, n)
      .filter(col("dup_ngram_frac") > maxDupFrac || col("top_gram_frac") > maxTopFrac)
      .select(idCol)
    df.join(bad, Seq(idCol), "left_anti")
  }
}
