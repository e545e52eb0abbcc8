package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Trained byte-pair-encoding tokenizer model: an ordered merge list
  * (rank = position) plus the derived vocabulary. Serializable — the
  * encode expression ships it to executors inside the task binary
  * (~20 bytes/merge, so a 50k-merge model is ~1 MB: broadcast once per
  * stage, never per row).
  *
  * Symbols are Unicode code points (surrogate pairs stay joined), each
  * word carries a terminal `</w>` symbol (Sennrich-style), so merges
  * can capture whole words and decode can restore word boundaries.
  *
  * @param truncated     the word histogram was cut at `maxDistinctWords`
  *                      (training saw the most frequent words only —
  *                      merge QUALITY degrades gracefully, encode still
  *                      handles every word at the char level)
  * @param distinctWords distinct words actually trained on
  */
case class BpeModel(
    merges: Vector[(String, String)],
    alphabet: Vector[String],
    truncated: Boolean,
    distinctWords: Long) {

  /** (left, right) → merge rank; lower rank = applied earlier. A pair
    * can reappear in `merges` when later merge products collide with
    * earlier symbols — the FIRST rank wins (it applied first). */
  @transient lazy val ranks: Map[(String, String), Int] = {
    val m = mutable.HashMap.empty[(String, String), Int]
    merges.iterator.zipWithIndex.foreach { case (p, r) =>
      if (!m.contains(p)) m += p -> r
    }
    m.toMap
  }

  /** token string → id. Alphabet first (sorted, ids 0..), then each
    * merge's product in rank order (first producer wins). */
  @transient lazy val vocab: Map[String, Int] = {
    val m = mutable.LinkedHashMap.empty[String, Int]
    alphabet.sorted.foreach(s => if (!m.contains(s)) m += s -> m.size)
    merges.foreach { case (a, b) =>
      val t = a + b
      if (!m.contains(t)) m += t -> m.size
    }
    m.toMap
  }

  def vocabSize: Int = vocab.size

  override def toString: String =
    s"BpeModel(merges=${merges.size}, alphabet=${alphabet.size}, " +
      s"vocab=$vocabSize, distinctWords=$distinctWords, truncated=$truncated)"
}

/** Real BPE tokenizer with the 100 TB-correct split of work:
  *
  *   1. `train`: ONE distributed shuffle builds the word histogram
  *      (`explode(tokens) → groupBy(word) → count`) — the corpus is
  *      touched exactly once, and what comes back to the driver is the
  *      histogram (≤ `maxDistinctWords` rows), not the corpus. Merge
  *      learning then runs driver-side over the histogram — the same
  *      architecture every production BPE trainer uses (a merge
  *      decision needs GLOBAL pair counts, so it is inherently
  *      sequential; the histogram makes each step O(affected words),
  *      not O(corpus)).
  *   2. `encode`: embarrassingly parallel — a native Catalyst
  *      expression ([[graft.plans.BpeEncode]]) with the model shipped
  *      in the task binary and a per-thread word→tokens memo (word
  *      frequencies are Zipfian, so the memo hit rate is ~99% on
  *      natural text).
  *
  * Reference analog: TidierDB has no tokenizer; this is part of the
  * beyond-reference training-data surface (SURVEY §2.12). Exact token
  * counts feed `Packing`/`Chunking` in place of
  * `TextFns.tokenCountApprox`.
  */
object Bpe {

  /** Learn `numMerges` merges from the corpus' word histogram.
    *
    * Pre-tokenization matches [[TextFns.tokens]] exactly (lowercase,
    * whitespace split, empties dropped) so `decode(encode(text))`
    * reconstructs the whitespace-normalized text verbatim.
    *
    * Deterministic: merge choice breaks count ties lexicographically;
    * the histogram truncation boundary orders by (count desc, word asc).
    *
    * @param maxDistinctWords driver-memory bound on the histogram
    *        (rows, not corpus bytes). 1M words ≈ tens of MB on the
    *        driver. When the corpus exceeds it the model records
    *        `truncated = true` — a visible flag, not a silent cap.
    * @param minPairCount stop early once the best pair occurs fewer
    *        than this many times (weighted by word frequency)
    */
  def train(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      maxDistinctWords: Int = 1000000,
      minPairCount: Long = 2L): BpeModel = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(maxDistinctWords >= 1, s"maxDistinctWords must be >= 1, got $maxDistinctWords")
    val hist = df
      .select(explode(TextFns.tokens(col(textCol))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w").asc)
      .limit(maxDistinctWords + 1)
      .collect()
    val truncated = hist.length > maxDistinctWords
    val kept = if (truncated) hist.take(maxDistinctWords) else hist
    trainFromHistogram(
      kept.iterator.map(r => (r.getString(0), r.getLong(1))),
      numMerges, minPairCount,
      truncated = truncated, distinctWords = kept.length.toLong)
  }

  /** Driver-side merge learning over a word histogram. Exposed for
    * tests and for callers that already materialized a vocabulary
    * table (`TextFns.termDocFreq`-shaped input works). */
  def trainFromHistogram(
      histogram: Iterator[(String, Long)],
      numMerges: Int,
      minPairCount: Long = 2L,
      truncated: Boolean = false,
      distinctWords: Long = -1L): BpeModel = {
    // words as mutable symbol buffers + their corpus frequencies
    val words = mutable.ArrayBuffer.empty[Array[String]]
    val freqs = mutable.ArrayBuffer.empty[Long]
    val alphabet = mutable.SortedSet.empty[String]
    histogram.foreach { case (w, c) =>
      val syms = splitSymbols(w)
      alphabet ++= syms
      words += syms
      freqs += c
    }

    // pair → weighted count, kept in sync with an ordered set so the
    // argmax is O(log P) per update instead of an O(P) scan per merge
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    // ordering: count DESC, then pair lexicographic ASC (determinism)
    implicit val ord: Ordering[((String, String), Long)] =
      Ordering.by { case ((a, b), c) => (-c, a, b) }
    val queue = mutable.TreeSet.empty[((String, String), Long)]
    // pair → indices of words that (at some point) contained it; stale
    // entries are tolerated (the merge walk re-checks adjacency), so
    // decrements never have to hunt for the index entry
    val pairWords = mutable.HashMap.empty[(String, String), mutable.BitSet]

    def bump(p: (String, String), delta: Long, wordIdx: Int): Unit = {
      val old = pairCount.getOrElse(p, 0L)
      if (old != 0L) queue.remove((p, old))
      val nw = old + delta
      if (nw > 0L) { pairCount(p) = nw; queue.add((p, nw)) }
      else pairCount.remove(p)
      if (delta > 0L && wordIdx >= 0)
        pairWords.getOrElseUpdate(p, mutable.BitSet.empty) += wordIdx
    }

    var i = 0
    while (i < words.length) {
      val s = words(i); val f = freqs(i)
      var j = 0
      while (j < s.length - 1) { bump((s(j), s(j + 1)), f, i); j += 1 }
      i += 1
    }

    val merges = Vector.newBuilder[(String, String)]
    var made = 0
    var continue = true
    while (made < numMerges && continue && queue.nonEmpty) {
      val (best, cnt) = queue.head
      if (cnt < minPairCount) continue = false
      else {
        merges += best
        val merged = best._1 + best._2
        val members = pairWords.remove(best).getOrElse(mutable.BitSet.empty)
        members.foreach { wi =>
          val s = words(wi); val f = freqs(wi)
          // left-to-right greedy replace of (a,b) with ab, updating
          // neighbor pair counts around each replacement
          var changed = false
          val out = mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < s.length) {
            if (j < s.length - 1 && s(j) == best._1 && s(j + 1) == best._2) {
              val prev = if (out.nonEmpty) out.last else null
              val next = if (j + 2 < s.length) s(j + 2) else null
              if (prev != null) { bump((prev, best._1), -f, -1); bump((prev, merged), f, wi) }
              bump(best, -f, -1)
              if (next != null) {
                // the (b, next) pair disappears; careful when next
                // starts another occurrence of (a,b): its left symbol
                // is consumed pairs-wise either way
                bump((best._2, next), -f, -1)
                bump((merged, next), f, wi)
              }
              out += merged
              j += 2
              changed = true
            } else { out += s(j); j += 1 }
          }
          if (changed) words(wi) = out.toArray
        }
        // the (merged, next) increments above can double-count when the
        // merge created a new adjacent occurrence that the NEXT loop
        // turn immediately rewrites — the walk above already handles it
        // by recomputing pairs from the rewritten buffer on later
        // merges; within one merge the accounting is exact because the
        // scan is left-to-right and consumes both members
        made += 1
      }
    }

    BpeModel(merges.result(), alphabet.toVector, truncated,
      if (distinctWords >= 0) distinctWords else words.length.toLong)
  }

  /** word → symbol array: Unicode code points + terminal `</w>`.
    *
    * Content `'<'` and U+E001 code points are escaped (see
    * [[BpeModel.Esc]]) so the terminal marker can never alias real
    * text — `decode(encode(t)) == concat_ws(" ", tokens(t))` holds for
    * EVERY input, including scraped HTML/XML containing literal
    * `"</w>"` (spec-pinned). */
  private[graft] def splitSymbols(word: String): Array[String] = {
    val out = new mutable.ArrayBuffer[String](word.length + 1)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      if (cp == '<') out += BpeModel.EscLt
      else if (cp == BpeModel.Esc) out += BpeModel.EscEsc
      else out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out += BpeModel.EndOfWord
    out.toArray
  }

  /** text → BPE token strings (array&lt;string&gt;), narrow/one pass */
  def encode(model: BpeModel, text: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftShim
    GraftShim.column(graft.plans.BpeEncode(GraftShim.expression(text), model))
  }

  /** text → vocab ids (array&lt;int&gt;); symbols outside the trained
    * alphabet encode as -1 (callers map OOV to their reserved id) */
  def encodeIds(model: BpeModel, text: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftShim
    GraftShim.column(
      graft.plans.BpeEncode(GraftShim.expression(text), model, emitIds = true))
  }

  /** exact token count under the trained model — drop-in for
    * [[TextFns.tokenCountApprox]] in `Packing`/`Chunking` budgets */
  def tokenCount(model: BpeModel, text: Column): Column =
    size(encode(model, text)).cast("long")

  /** BPE tokens → whitespace-normalized text. Inverse of [[encode]]
    * composed with [[TextFns.tokens]] normalization:
    * `decode(encode(t)) == concat_ws(" ", tokens(t))` for every input
    * (spec + gate-pinned). Built from codegen'd string primitives.
    *
    * Every content `'<'` was escaped at [[splitSymbols]], so a `"</w>"`
    * whose `'<'` is not escape-led is ALWAYS the terminal symbol
    * (lookbehind), and the two escape pairs are then unescaped —
    * leftmost-first non-overlapping replacement resolves runs
    * unambiguously because an escape pair never ends with the escape
    * char. */
  def decode(tokens: Column): Column =
    trim(regexp_replace(regexp_replace(regexp_replace(
      array_join(tokens, ""),
      "(?<!" + BpeModel.Esc + ")" + BpeModel.EndOfWord, " "),
      lit(BpeModel.EscLt), lit("<")),
      lit(BpeModel.EscEsc), lit(BpeModel.Esc.toString)))

  /** persist as plain parquet tables — (rank, left, right) merges,
    * (idx, symbol) alphabet (one row per symbol: no join/split
    * separator a pathological corpus symbol could collide with), and a
    * one-row meta table — readable by any engine, no custom format */
  def save(spark: SparkSession, model: BpeModel, path: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "left", "right")
      .write.mode("overwrite").parquet(s"$path/merges")
    model.alphabet.zipWithIndex
      .map { case (sym, i) => (i, sym) }
      .toDF("idx", "symbol")
      .write.mode("overwrite").parquet(s"$path/alphabet")
    Seq((model.truncated, model.distinctWords))
      .toDF("truncated", "distinct_words")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  def load(spark: SparkSession, path: String): BpeModel = {
    val merges = spark.read.parquet(s"$path/merges")
      .orderBy("rank").collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toVector
    val alphabet = spark.read.parquet(s"$path/alphabet")
      .orderBy("idx").collect()
      .map(_.getAs[String]("symbol")).toVector
    val meta = spark.read.parquet(s"$path/meta").head()
    BpeModel(merges, alphabet,
      meta.getAs[Boolean]("truncated"), meta.getAs[Long]("distinct_words"))
  }
}

object BpeModel {
  /** terminal symbol closing every word (Sennrich-style) */
  val EndOfWord = "</w>"

  /** escape lead (private-use char) making [[EndOfWord]] detection
    * injective in the joined decode string: content `'<'` is stored as
    * the two-char symbol [[EscLt]], content U+E001 as [[EscEsc]] — so
    * a `'<'` NOT preceded by the escape char is always the terminal
    * marker's, never real text. Escape pairs end in `'<'`/`'x'` (never
    * the escape char itself), so leftmost-first unescaping resolves
    * runs unambiguously. */
  val Esc = ''
  val EscLt = "<"
  val EscEsc = "x"
}
