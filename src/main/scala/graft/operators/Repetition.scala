package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** The FULL Gopher/MassiveText repetition rule set (Rae et al. 2021,
    * Table A1) — one row per document with all 14 published signals:
    *
    *  - `dup_line_frac` / `dup_para_frac`: fraction of non-empty
    *    lines (split `\n`) / paragraphs (split `\n\n`) that repeat an
    *    earlier identical unit: `(total - distinct) / total`.
    *  - `dup_line_char_frac` / `dup_para_char_frac`: character mass of
    *    the repeats: `Σ (cnt-1)·len(unit) / Σ cnt·len(unit)`.
    *  - `top_{2,3,4}gram_char_frac`: characters claimed by the single
    *    most frequent word n-gram — `max(cnt·len(gram))` over the
    *    doc's grams, over the normalized text length (tokens joined by
    *    one space). Overlaps are allowed to double-count, per paper.
    *  - `dup_{5..10}gram_char_frac`: characters inside the UNION of
    *    the character spans (in the normalized text) of every n-gram
    *    that occurs more than once — overlap-aware: a character under
    *    two duplicated grams counts once. A separator is covered iff
    *    one gram covers both its neighbor tokens.
    *
    * Missing evidence (doc shorter than n tokens, single line) scores
    * 0 — absence of repetition signal never penalizes.
    *
    * 100 TB shape (round 10): FULLY NARROW — zero shuffles, zero
    * joins. The aggregation key of the natural formulation is
    * `(doc, n, unit-hash)`, and every such group lives inside ONE
    * document, so the per-unit counting happens IN-ROW in the native
    * [[graft.plans.GopherUnitStats]] kernel (one pass over the
    * document's lines, paragraphs and all nine gram sizes; ~9·tokens
    * hash-map updates per doc) — nothing per-token ever reaches a
    * shuffle (the previous explode-then-groupBy shape shipped ~9 rows
    * per TOKEN through two full shuffles, priced at 28 s/sf0.1-pass by
    * the round-10 full-evaluation bench; this form runs it in ~2 s).
    * The n≥5 span-union char mass is the native
    * [[graft.plans.SpanUnionChars]] interval merge over each n's
    * sorted duplicate starts, also in-row. The shuffled formulation is
    * kept as [[gopherRepetitionSignalsShuffled]] and spec-asserted
    * identical.
    */
  def gopherRepetitionSignals(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.graftshim.GraftShim
    val spark = df.sparkSession
    val parallelism = spark.sparkContext.defaultParallelism
    val src0 = if (df.rdd.getNumPartitions < parallelism) df.repartition(parallelism) else df

    val tk = TextFns.tokens(col(textCol))
    val nonEmpty = (xs: Column) => filter(xs, x => length(x) > 0)
    val base = src0.select(col(idCol), tk.as("__tk"),
      nonEmpty(split(col(textCol), "\n")).as("__ln"),
      nonEmpty(split(col(textCol), "\n\n")).as("__pa"))

    val statsCol = GraftShim.column(graft.plans.GopherUnitStats(
      GraftShim.expression(col("__tk")), GraftShim.expression(col("__ln")),
      GraftShim.expression(col("__pa")), 2, 10, 5))
    // one named struct column per n (≤11 elements to filter over —
    // interpreted HOF cost is per-DOC, not per-token); NULL when the
    // doc has no units of that n (try_: ANSI element_at is loud on the
    // empty filter result)
    val named = base
      .withColumn("__st", statsCol)
      .withColumn("__nch", length(concat_ws(" ", col("__tk"))).cast("long"))
      .select(col(idCol) +: col("__tk") +: col("__nch") +:
        (0 to 10).map(n =>
          try_element_at(filter(col("__st"), s => s.getField("n") === lit(n)), lit(1))
            .as(s"__s$n")): _*)

    // exact round-half-up(num/den · 10^6) in pure BIGINT, then ONE
    // IEEE divide by 10^6 — the cross-engine-exact recipe used
    // throughout (see repetitionReport). The outer coalesce catches a
    // NULL numerator over a live denominator (doc has tokens but no
    // units of that n) — no evidence scores 0.
    def fr(num: String, den: String): Column =
      coalesce(
        when(expr(den) > 0,
          expr(s"(($num) * 2000000 + ($den)) div (2 * ($den))").cast("double") /
            lit(1000000.0))
          .otherwise(lit(0.0)),
        lit(0.0))

    def coveredChars(starts: Column, toks: Column, w: Int): Column =
      coalesce(GraftShim.column(graft.plans.SpanUnionChars(
        GraftShim.expression(starts), GraftShim.expression(toks), w)), lit(0L))

    named.select(
      col(idCol) +: col("__nch") +:
        (Seq(
          fr("__s0.total - __s0.dcnt", "__s0.total").as("dup_line_frac"),
          fr("__s0.dupch", "__s0.totch").as("dup_line_char_frac"),
          fr("__s1.total - __s1.dcnt", "__s1.total").as("dup_para_frac"),
          fr("__s1.dupch", "__s1.totch").as("dup_para_char_frac"),
          fr("__s2.topch", "__nch").as("top_2gram_char_frac"),
          fr("__s3.topch", "__nch").as("top_3gram_char_frac"),
          fr("__s4.topch", "__nch").as("top_4gram_char_frac")) ++
          (5 to 10).map { n =>
            coveredChars(
              coalesce(col(s"__s$n.starts"), array().cast("array<int>")),
              col("__tk"), n).as(s"__cov$n")
          }): _*)
      .select(col(idCol) +:
        (Seq("dup_line_frac", "dup_line_char_frac", "dup_para_frac",
          "dup_para_char_frac", "top_2gram_char_frac", "top_3gram_char_frac",
          "top_4gram_char_frac").map(col) ++
          (5 to 10).map(n =>
            fr(s"__cov$n", "__nch").as(s"dup_${n}gram_char_frac"))): _*)
  }

  /** Published Gopher repetition thresholds (Rae et al. 2021 Table A1);
    * a document is dropped when ANY signal exceeds its limit. */
  val GopherRepetitionLimits: Seq[(String, Double)] = Seq(
    "dup_line_frac" -> 0.30, "dup_para_frac" -> 0.30,
    "dup_line_char_frac" -> 0.20, "dup_para_char_frac" -> 0.20,
    "top_2gram_char_frac" -> 0.20, "top_3gram_char_frac" -> 0.18,
    "top_4gram_char_frac" -> 0.16,
    "dup_5gram_char_frac" -> 0.15, "dup_6gram_char_frac" -> 0.14,
    "dup_7gram_char_frac" -> 0.13, "dup_8gram_char_frac" -> 0.12,
    "dup_9gram_char_frac" -> 0.11, "dup_10gram_char_frac" -> 0.10)

  /** Corpus minus documents failing any of the 13 published repetition
    * limits (override via `limits`). Pairs with `TextFns.gopherFilter`
    * (document-shape rules) for the complete MassiveText quality gate. */
  def dropRepetitiveGopher(
      df: DataFrame,
      idCol: String,
      textCol: String,
      limits: Seq[(String, Double)] = GopherRepetitionLimits): DataFrame = {
    val sig = gopherRepetitionSignals(df, idCol, textCol)
    val bad = sig
      .filter(limits.map { case (c, t) => col(c) > t }.reduce(_ || _))
      .select(idCol)
    df.join(bad, Seq(idCol), "left_anti")
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

  /** the composable higher-order-function formulation of one n's gram
    * unit rows — kept as the reference the [[graft.plans.GramUnitRows]]
    * kernel must agree with (RepetitionSpec), the dotHof/cosineHof
    * pattern */
  /** the original explode-then-groupBy formulation of
    * [[gopherRepetitionSignals]] — ~9 unit rows per TOKEN through two
    * shuffles, built from the composable HOF pieces. Kept as the
    * reference the in-row kernel path must agree with (RepetitionSpec
    * asserts signal-for-signal equality); never the production path. */
  private[graft] def gopherRepetitionSignalsShuffled(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val tk = TextFns.tokens(col(textCol))
    val nonEmpty = (xs: Column) => filter(xs, x => length(x) > 0)
    def unitRows(kind: Int, units: Column): Column =
      transform(units, u => struct(
        lit(kind).as("n"), lit(null).cast("int").as("pos"),
        TextFns.portableHash(u).as("uh"), length(u).cast("long").as("ul")))

    val base = df.select(col(idCol), tk.as("__tk"),
      nonEmpty(split(col(textCol), "\n")).as("__ln"),
      nonEmpty(split(col(textCol), "\n\n")).as("__pa"))
    val exploded = base.select(
      col(idCol),
      length(concat_ws(" ", col("__tk"))).cast("long").as("__nch"),
      explode(concat(
        unitRows(0, col("__ln")) +: unitRows(1, col("__pa")) +:
          (2 to 10).map(n => gramRowsHof(col("__tk"), n, 5)): _*)).as("__u"))
      .select(col(idCol), col("__nch"), col("__u.n").as("__n"),
        col("__u.pos").as("__pos"), col("__u.uh").as("__uh"), col("__u.ul").as("__ul"))

    val counts = exploded
      .groupBy(col(idCol), col("__n"), col("__uh"))
      .agg(first(col("__ul")).as("__ul"), count(lit(1)).as("__cnt"),
        sort_array(collect_list(col("__pos"))).as("__ps"),
        first(col("__nch")).as("__nch"))
    val perN = counts
      .groupBy(col(idCol), col("__n"))
      .agg(
        sum("__cnt").as("__total"),
        count(lit(1)).as("__distinct"),
        sum((col("__cnt") - 1) * col("__ul")).as("__dupch"),
        sum(col("__cnt") * col("__ul")).as("__totch"),
        max(col("__cnt") * col("__ul")).as("__topch"),
        sort_array(flatten(collect_list(when(col("__cnt") >= 2, col("__ps")))))
          .as("__starts"),
        first(col("__nch")).as("__nch"))

    def fr(num: String, den: String): Column =
      when(expr(den) > 0,
        expr(s"(($num) * 2000000 + ($den)) div (2 * ($den))").cast("double") /
          lit(1000000.0))
        .otherwise(lit(0.0))

    val flat = perN.select(
      col(idCol), col("__n"),
      fr("__total - __distinct", "__total").as("__fa"),
      fr("__dupch", "__totch").as("__fb"),
      fr("__topch", "__nch").as("__ft"),
      col("__starts"))

    val startsMap = flat
      .filter(col("__n") >= 5 && size(col("__starts")) > 0)
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("__n"), col("__starts"))))
        .as("__sm"))

    val spanFracs = base
      .join(startsMap, Seq(idCol), "left")
      .select(
        col(idCol) +:
          length(concat_ws(" ", col("__tk"))).cast("long").as("__nch") +:
          (5 to 10).map { n =>
            coveredCharsHof(
              coalesce(element_at(col("__sm"), n), array().cast("array<int>")),
              col("__tk"), n).as(s"__cov$n")
          }: _*)
    val spanOut = spanFracs.select(col(idCol) +: (5 to 10).map(n =>
      fr(s"__cov$n", "__nch").as(s"dup_${n}gram_char_frac")): _*)

    def pick(n: Int, c: String): Column =
      coalesce(max(when(col("__n") === n, col(c))), lit(0.0))
    val flatOut = flat
      .groupBy(col(idCol))
      .agg(
        pick(0, "__fa").as("dup_line_frac"),
        pick(0, "__fb").as("dup_line_char_frac"),
        pick(1, "__fa").as("dup_para_frac"),
        pick(1, "__fb").as("dup_para_char_frac"),
        pick(2, "__ft").as("top_2gram_char_frac"),
        pick(3, "__ft").as("top_3gram_char_frac"),
        pick(4, "__ft").as("top_4gram_char_frac"))

    val zeroes = Seq(
      "dup_line_frac", "dup_line_char_frac", "dup_para_frac",
      "dup_para_char_frac", "top_2gram_char_frac", "top_3gram_char_frac",
      "top_4gram_char_frac")
    spanOut
      .join(flatOut, Seq(idCol), "left")
      .select(col(idCol) +:
        (zeroes.map(c => coalesce(col(c), lit(0.0)).as(c)) ++
          (5 to 10).map(n => col(s"dup_${n}gram_char_frac"))): _*)
  }

  /** the fold formulation of the span-union char mass — the reference
    * [[graft.plans.SpanUnionChars]] must agree with (RepetitionSpec) */
  private[graft] def coveredCharsHof(starts: Column, toks: Column, w: Int): Column = {
    val zero = struct(lit(0).as("e"), lit(0L).as("c"))
    val folded = aggregate(
      starts,
      zero,
      (acc, s) => {
        val e = acc.getField("e"); val c = acc.getField("c")
        val disjoint = s >= e
        val contained = (s + w) <= e
        val addDisjoint = length(concat_ws(" ", slice(toks, s, lit(w)))).cast("long")
        val addOverlap =
          lit(1L) + length(concat_ws(" ", slice(toks, e, s + w - e))).cast("long")
        struct(
          when(contained, e).otherwise(s + w).as("e"),
          when(contained, c)
            .when(disjoint, c + addDisjoint)
            .otherwise(c + addOverlap).as("c"))
      },
      acc => acc.getField("c"))
    coalesce(folded, lit(0L))
  }

  private[graft] def gramRowsHof(tk: Column, n: Int, posFromN: Int): Column = {
    val g = (i: Column) => concat_ws(" ", slice(tk, i, lit(n)))
    def pos(i: Column): Column =
      if (n >= posFromN) i.cast("int") else lit(null).cast("int")
    when(size(tk) >= n,
      transform(sequence(lit(1), size(tk) - n + 1),
        i => struct(lit(n).as("n"), pos(i).as("pos"),
          TextFns.portableHash(g(i)).as("uh"), length(g(i)).cast("long").as("ul"))))
      .otherwise(array().cast("array<struct<n:int,pos:int,uh:bigint,ul:bigint>>"))
  }
}
