package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Trained unigram-LM tokenizer model (Kudo 2018, the SentencePiece
  * `--model_type=unigram` algorithm): a piece inventory with log
  * probabilities; encoding is the Viterbi-best segmentation of each
  * word under the model.
  *
  * Pieces are strings over the SAME symbol alphabet as [[BpeModel]]
  * (Unicode code points with `'<'`/escape-char escaping + the terminal
  * `</w>` word marker — see [[Bpe.splitSymbols]]), so [[Bpe.decode]]
  * is the shared inverse: `decode(encode(t)) == concat_ws(" ",
  * tokens(t))` for every input.
  *
  * Serializable — the encode expression ships it in the task binary
  * (~30 bytes/piece: a 32k-piece model is ~1 MB, broadcast once per
  * stage, never per row).
  *
  * @param pieces    (piece, natural-log probability), sorted by
  *                  (logProb desc, piece asc); ids are vector positions
  * @param truncated word histogram was cut at `maxDistinctWords`
  */
case class UnigramModel(
    pieces: Vector[(String, Double)],
    truncated: Boolean,
    distinctWords: Long) {

  @transient lazy val logProb: Map[String, Double] = pieces.toMap

  /** piece → id (vector position) */
  @transient lazy val vocab: Map[String, Int] =
    pieces.iterator.map(_._1).zipWithIndex.toMap

  /** longest piece, in SYMBOLS (code points), bounds the Viterbi scan */
  @transient lazy val maxPieceSymbols: Int =
    if (pieces.isEmpty) 1
    else pieces.iterator.map(p => Unigram.symbolLength(p._1)).max

  def vocabSize: Int = pieces.size

  override def toString: String =
    s"UnigramModel(pieces=$vocabSize, distinctWords=$distinctWords, " +
      s"truncated=$truncated)"
}

/** Unigram-LM tokenizer with the same 100 TB-correct split of work as
  * [[Bpe]]:
  *
  *   1. `train`: ONE distributed shuffle builds the word histogram —
  *      the corpus is touched exactly once; what reaches the driver is
  *      ≤ `maxDistinctWords` (word, count) rows. Seed-substring
  *      extraction, EM, and pruning then run driver-side over the
  *      histogram (an EM step needs GLOBAL expected counts, so it is
  *      inherently a small sequential loop over a bounded table — the
  *      same architecture SentencePiece itself uses on its training
  *      sample).
  *   2. `encode`: embarrassingly parallel — a native Catalyst
  *      expression ([[graft.plans.UnigramEncode]]) runs memoized
  *      per-word Viterbi with the model shipped in the task binary.
  *
  * Training follows Kudo 2018 §3.2: seed inventory of frequent
  * substrings scored by count×length; alternating EM (expected piece
  * counts via forward–backward over each word's segmentation lattice,
  * in log space) and pruning (drop the lowest-expected-count share of
  * multi-symbol pieces — the count-based simplification of the
  * likelihood-loss prune; single-symbol pieces are never pruned, so
  * every word stays encodable). Fully deterministic: fixed iteration
  * order everywhere, ties broken lexicographically.
  */
object Unigram {

  /** symbol (code-point-with-escapes) length of a piece string — the
    * unit the Viterbi lattice positions count */
  private[graft] def symbolLength(piece: String): Int = {
    var i = 0
    var n = 0
    while (i < piece.length) {
      val cp = piece.codePointAt(i)
      i += Character.charCount(cp)
      // an escape char is fused with its following symbol char
      if (cp == BpeModel.Esc && i < piece.length) i += Character.charCount(piece.codePointAt(i))
      else if (cp == '<' && piece.startsWith(BpeModel.EndOfWord, i - 1)) i += 3 // "</w>"
      n += 1
    }
    n
  }

  /** Learn a `vocabSize`-piece model from the corpus' word histogram.
    *
    * @param vocabSize        target piece-inventory size (floor: the
    *                         alphabet — single symbols are never pruned)
    * @param maxPieceSymbols  longest candidate piece, in symbols
    * @param seedFactor       seed inventory size = seedFactor × vocabSize
    * @param emRounds         prune rounds; each runs 2 EM iterations
    * @param maxDistinctWords driver-memory bound on the histogram
    */
  def train(
      df: DataFrame,
      textCol: String,
      vocabSize: Int,
      maxPieceSymbols: Int = 8,
      seedFactor: Int = 4,
      emRounds: Int = 4,
      maxDistinctWords: Int = 1000000): UnigramModel = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
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
      vocabSize, maxPieceSymbols, seedFactor, emRounds,
      truncated = truncated, distinctWords = kept.length.toLong)
  }

  /** Driver-side training over a word histogram (exposed for tests). */
  def trainFromHistogram(
      histogram: Iterator[(String, Long)],
      vocabSize: Int,
      maxPieceSymbols: Int = 8,
      seedFactor: Int = 4,
      emRounds: Int = 4,
      truncated: Boolean = false,
      distinctWords: Long = -1L): UnigramModel = {
    // words as symbol arrays + frequencies
    val words = mutable.ArrayBuffer.empty[Array[String]]
    val freqs = mutable.ArrayBuffer.empty[Long]
    histogram.foreach { case (w, c) =>
      words += Bpe.splitSymbols(w)
      freqs += c
    }

    // ---- seed inventory: frequent substrings scored by count×length --
    val subCount = mutable.HashMap.empty[String, Long]
    val singles = mutable.SortedSet.empty[String]
    var wi = 0
    while (wi < words.length) {
      val s = words(wi); val f = freqs(wi)
      var i = 0
      while (i < s.length) {
        singles += s(i)
        val sb = new java.lang.StringBuilder
        var j = i
        while (j < s.length && j - i < maxPieceSymbols) {
          sb.append(s(j))
          val sub = sb.toString
          subCount(sub) = subCount.getOrElse(sub, 0L) + f
          j += 1
        }
        i += 1
      }
      wi += 1
    }
    val seedSize = math.max(vocabSize.toLong * seedFactor, singles.size.toLong)
    // multi-symbol candidates by (count×len desc, piece asc); singles always in
    val multi = subCount.iterator
      .filter { case (p, _) => !singles.contains(p) }
      .toArray
      .sortBy { case (p, c) => (-c * symbolLength(p), p) }
      .take((seedSize - singles.size).max(0L).toInt)
    var inv: mutable.LinkedHashMap[String, Double] = {
      val m = mutable.LinkedHashMap.empty[String, Double]
      var total = 0.0
      singles.foreach(p => total += subCount.getOrElse(p, 1L).toDouble)
      multi.foreach { case (_, c) => total += c.toDouble }
      val logTotal = math.log(total)
      singles.foreach(p =>
        m += p -> (math.log(subCount.getOrElse(p, 1L).toDouble) - logTotal))
      multi.foreach { case (p, c) => m += p -> (math.log(c.toDouble) - logTotal) }
      m
    }

    // ---- EM + prune rounds ------------------------------------------
    val floorVocab = singles.size
    val target = math.max(vocabSize, floorVocab)
    var round = 0
    var done = false
    while (!done) {
      var em = 0
      while (em < 2) { inv = emStep(words, freqs, inv, maxPieceSymbols, singles); em += 1 }
      if (inv.size <= target || round >= emRounds) done = true
      else {
        // prune the lowest-probability 20% of multi-symbol pieces (or
        // straight to target if closer)
        val multiNow = inv.iterator.filter { case (p, _) => !singles.contains(p) }.toArray
        val excess = inv.size - target
        val drop = math.min(multiNow.length, math.max(excess, multiNow.length / 5))
        if (drop <= 0) done = true
        else {
          val doomed = multiNow.sortBy { case (p, lp) => (lp, p) }.take(drop)
            .map(_._1).toSet
          val kept = mutable.LinkedHashMap.empty[String, Double]
          inv.foreach { case (p, lp) => if (!doomed.contains(p)) kept += p -> lp }
          inv = kept
        }
      }
      round += 1
    }
    // final exact cut to target if EM rounds ran out above it
    if (inv.size > target) {
      val multiNow = inv.iterator.filter { case (p, _) => !singles.contains(p) }.toArray
      val doomed = multiNow.sortBy { case (p, lp) => (lp, p) }
        .take(inv.size - target).map(_._1).toSet
      val kept = mutable.LinkedHashMap.empty[String, Double]
      inv.foreach { case (p, lp) => if (!doomed.contains(p)) kept += p -> lp }
      inv = kept
    }

    val pieces = inv.toVector.sortBy { case (p, lp) => (-lp, p) }
    UnigramModel(pieces, truncated,
      if (distinctWords >= 0) distinctWords else words.length.toLong)
  }

  /** one EM iteration: expected piece counts by forward–backward over
    * every word's segmentation lattice (log domain), then re-normalize.
    * Unreachable symbols keep a floor count so the lattice never dies. */
  private def emStep(
      words: mutable.ArrayBuffer[Array[String]],
      freqs: mutable.ArrayBuffer[Long],
      inv: mutable.LinkedHashMap[String, Double],
      maxPieceSymbols: Int,
      singles: mutable.SortedSet[String]): mutable.LinkedHashMap[String, Double] = {
    val expected = mutable.HashMap.empty[String, Double]
    var wi = 0
    while (wi < words.length) {
      val s = words(wi); val f = freqs(wi).toDouble
      val m = s.length
      // edges(j) = list of (i, piece, logp) ending at j
      val alpha = Array.fill(m + 1)(Double.NegativeInfinity)
      val beta = Array.fill(m + 1)(Double.NegativeInfinity)
      alpha(0) = 0.0
      beta(m) = 0.0
      // forward
      var j = 1
      while (j <= m) {
        var i = math.max(0, j - maxPieceSymbols)
        var acc = Double.NegativeInfinity
        while (i < j) {
          if (alpha(i) != Double.NegativeInfinity) {
            val lp = inv.getOrElse(joinRange(s, i, j), Double.NegativeInfinity)
            if (lp != Double.NegativeInfinity) acc = logAdd(acc, alpha(i) + lp)
          }
          i += 1
        }
        alpha(j) = acc
        j += 1
      }
      val z = alpha(m)
      if (z != Double.NegativeInfinity) {
        // backward
        var i2 = m - 1
        while (i2 >= 0) {
          var jj = math.min(m, i2 + maxPieceSymbols)
          var acc = Double.NegativeInfinity
          while (jj > i2) {
            if (beta(jj) != Double.NegativeInfinity) {
              val lp = inv.getOrElse(joinRange(s, i2, jj), Double.NegativeInfinity)
              if (lp != Double.NegativeInfinity) acc = logAdd(acc, lp + beta(jj))
            }
            jj -= 1
          }
          beta(i2) = acc
          i2 -= 1
        }
        // expected counts
        var i3 = 0
        while (i3 < m) {
          var jj = i3 + 1
          val maxJ = math.min(m, i3 + maxPieceSymbols)
          while (jj <= maxJ) {
            val p = joinRange(s, i3, jj)
            val lp = inv.getOrElse(p, Double.NegativeInfinity)
            if (lp != Double.NegativeInfinity &&
                alpha(i3) != Double.NegativeInfinity &&
                beta(jj) != Double.NegativeInfinity) {
              val e = math.exp(alpha(i3) + lp + beta(jj) - z) * f
              if (e > 0) expected(p) = expected.getOrElse(p, 0.0) + e
            }
            jj += 1
          }
          i3 += 1
        }
      }
      wi += 1
    }
    // M-step over the CURRENT inventory in its fixed order; pieces with
    // no expected mass drop out (singles keep a floor so every symbol
    // stays encodable)
    val floor = 1e-10
    var total = 0.0
    val counts = mutable.LinkedHashMap.empty[String, Double]
    inv.foreach { case (p, _) =>
      val c0 = expected.getOrElse(p, 0.0)
      val c = if (singles.contains(p)) math.max(c0, floor) else c0
      if (c > 0) { counts += p -> c; total += c }
    }
    val logTotal = math.log(total)
    val out = mutable.LinkedHashMap.empty[String, Double]
    counts.foreach { case (p, c) => out += p -> (math.log(c) - logTotal) }
    out
  }

  private def joinRange(s: Array[String], i: Int, j: Int): String = {
    if (j - i == 1) return s(i)
    val sb = new java.lang.StringBuilder
    var k = i
    while (k < j) { sb.append(s(k)); k += 1 }
    sb.toString
  }

  private def logAdd(a: Double, b: Double): Double = {
    if (a == Double.NegativeInfinity) return b
    if (b == Double.NegativeInfinity) return a
    val hi = math.max(a, b); val lo = math.min(a, b)
    hi + math.log1p(math.exp(lo - hi))
  }

  /** text → unigram token strings (array&lt;string&gt;), narrow */
  def encode(model: UnigramModel, text: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftShim
    GraftShim.column(graft.plans.UnigramEncode(GraftShim.expression(text), model))
  }

  /** text → vocab ids (array&lt;int&gt;); OOV symbols encode as -1 */
  def encodeIds(model: UnigramModel, text: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftShim
    GraftShim.column(
      graft.plans.UnigramEncode(GraftShim.expression(text), model, emitIds = true))
  }

  /** exact token count under the trained model */
  def tokenCount(model: UnigramModel, text: Column): Column =
    size(encode(model, text)).cast("long")

  /** tokens → whitespace-normalized text — the symbol alphabet is
    * shared with BPE, so the inverse is [[Bpe.decode]] itself */
  def decode(tokens: Column): Column = Bpe.decode(tokens)

  /** persist as plain parquet — (id, piece, log_prob) + one-row meta */
  def save(spark: SparkSession, model: UnigramModel, path: String): Unit = {
    import spark.implicits._
    model.pieces.zipWithIndex
      .map { case ((p, lp), i) => (i, p, lp) }
      .toDF("id", "piece", "log_prob")
      .write.mode("overwrite").parquet(s"$path/pieces")
    Seq((model.truncated, model.distinctWords))
      .toDF("truncated", "distinct_words")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  def load(spark: SparkSession, path: String): UnigramModel = {
    val pieces = spark.read.parquet(s"$path/pieces")
      .orderBy("id").collect()
      .map(r => (r.getAs[String]("piece"), r.getAs[Double]("log_prob"))).toVector
    val meta = spark.read.parquet(s"$path/meta").head()
    UnigramModel(pieces,
      meta.getAs[Boolean]("truncated"), meta.getAs[Long]("distinct_words"))
  }
}
