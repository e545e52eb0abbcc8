package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Document chunking: split long documents into overlapping
  * fixed-token windows — the step between corpus cleaning and
  * tokenization that turns arbitrary-length documents into
  * context-window-sized training/retrieval units. The reference engine
  * has no analog; semantics follow the standard sliding-window recipe.
  *
  * Windows start every `maxTokens - overlap` tokens; the last window
  * may be short. A document shorter than `maxTokens` yields exactly one
  * chunk (itself); an empty/whitespace document yields none.
  *
  * 100 TB shape: entirely NARROW — tokenize, window-count, and the
  * chunk explode all fuse with the scan; output rows stay in the input
  * partitioning (no shuffle anywhere). Fan-out is bounded by
  * doc_tokens / stride, so `spark.sql.files.maxPartitionBytes` remains
  * the only sizing knob.
  */
object Chunking {

  /** One row per (document, window): `chunk_id` (long, 0-based),
    * `chunk` (the window's text, tokens re-joined with single spaces),
    * `chunk_tokens` (long). All other input columns pass through.
    */
  def chunkByTokens(
      df: DataFrame,
      textCol: String,
      maxTokens: Int,
      overlap: Int = 0): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap")
    val stride = maxTokens - overlap
    val tk = "__chunk_tk"
    val nc = "__chunk_nc"
    val withToks = df
      .withColumn(tk, TextFns.tokens(col(textCol)))
      .filter(size(col(tk)) > 0)
      // ceil((tokens - overlap) / stride), at least one window; `div`
      // keeps the sequence() bounds integral
      .withColumn(nc,
        greatest(lit(1), expr(s"(size($tk) - $overlap + ${stride - 1}) div $stride").cast("int")))
    val slice0 = expr(s"slice($tk, cast(__chunk_id * $stride + 1 as int), $maxTokens)")
    withToks
      .withColumn("__chunk_id", explode(sequence(lit(0), col(nc) - 1)))
      .withColumn("chunk_id", col("__chunk_id").cast("long"))
      .withColumn("chunk", array_join(slice0, " "))
      .withColumn("chunk_tokens", size(slice0).cast("long"))
      .drop(tk, nc, "__chunk_id")
  }

  /** Content-defined chunking (CDC — the rolling-fingerprint boundary
    * rule of dedup storage systems, applied to token streams): a chunk
    * boundary falls AFTER token position p whenever the portable hash
    * of the `windowTokens`-token window ending at p is ≡ 0
    * (mod 2^maskBits). Boundaries depend only on local content, so an
    * insertion early in a document shifts chunk CONTENT but not the
    * boundaries downstream of it — shifted-duplicate documents still
    * produce mostly identical chunks (exactly what fixed-stride
    * windows cannot do, and why CDC feeds chunk-level exact dedup).
    * Expected chunk length ≈ 2^maskBits tokens; no minimum/maximum
    * clamps (clamps would make boundaries sequential — this form stays
    * stateless per position and therefore NARROW, no shuffle).
    *
    * Output: one row per (document, chunk): `chunk_id` (0-based,
    * consecutive), `chunk`, `chunk_tokens`; other columns pass
    * through. Documents shorter than `windowTokens` yield one chunk.
    */
  def chunkByContent(
      df: DataFrame,
      textCol: String,
      windowTokens: Int = 3,
      maskBits: Int = 4): DataFrame = {
    require(windowTokens >= 1, s"windowTokens must be >= 1, got $windowTokens")
    require(maskBits >= 1 && maskBits <= 30, s"maskBits must be in [1,30], got $maskBits")
    val m = 1L << maskBits
    val tk = "__cdc_tk"
    df.withColumn(tk, TextFns.tokens(col(textCol)))
      .filter(size(col(tk)) > 0)
      // boundary positions: hash of the window ending at p ≡ 0 (mod m)
      .withColumn("__cdc_bs",
        when(size(col(tk)) >= windowTokens,
          filter(sequence(lit(windowTokens), size(col(tk))),
            p => pmod(TextFns.portableHash(
              concat_ws(" ",
                slice(col(tk), p - (windowTokens - 1), lit(windowTokens)))),
              lit(m)) === 0))
        .otherwise(array().cast("array<int>")))
      // chunk k spans (bs[k] + 1 .. bs[k+1]) with sentinels 0 and n;
      // only the FINAL chunk can be empty (boundary exactly at n)
      .withColumn("__cdc_c", explode(filter(
        transform(sequence(lit(0), size(col("__cdc_bs"))), k =>
          struct(
            k.cast("long").as("cid"),
            when(k === 0, lit(1))
              .otherwise(element_at(col("__cdc_bs"), k) + 1).as("s"),
            when(k < size(col("__cdc_bs")), element_at(col("__cdc_bs"), k + 1))
              .otherwise(size(col(tk))).as("e"))),
        c => c.getField("e") >= c.getField("s"))))
      .withColumn("chunk_id", col("__cdc_c.cid"))
      .withColumn("chunk",
        concat_ws(" ", slice(col(tk), col("__cdc_c.s"),
          col("__cdc_c.e") - col("__cdc_c.s") + 1)))
      .withColumn("chunk_tokens",
        (col("__cdc_c.e") - col("__cdc_c.s") + 1).cast("long"))
      .drop(tk, "__cdc_bs", "__cdc_c")
  }

  /** Sentence segmentation — trimmed runs up to (and including) a
    * terminator run `[.!?]+`, via `regexp_extract_all` with an
    * alternation BOTH java.util.regex and RE2 evaluate identically
    * (greedy, leftmost-first, no lookaround — RE2 has none, so a
    * lookbehind split would not be mirrorable). Abbreviation dots
    * ("e.g.") do split — the standard trade of regex segmenters;
    * callers needing better boundaries pre-protect abbreviations. */
  def sentences(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    filter(
      transform(regexp_extract_all(text, lit("[^.!?]+[.!?]+|[^.!?]+"), lit(0)),
        s => trim(s)),
      s => s =!= "")

  /** SENTENCE-AWARE chunking (the retrieval/RAG-side splitter): pack
    * whole sentences greedily into chunks of at most `maxTokens`
    * whitespace tokens — a sentence that would overflow the current
    * chunk starts the next one; a single sentence longer than the
    * budget gets a chunk of its own (sentences are never split). Same
    * output shape as [[chunkByTokens]] (`chunk_id`, `chunk`,
    * `chunk_tokens`); empty docs yield no rows.
    *
    * 100 TB shape: the greedy fold is a per-document `aggregate` HOF
    * over the sentence array — entirely NARROW, fused with the scan,
    * no shuffle; fan-out bounded by sentences per doc.
    */
  def chunkBySentences(
      df: DataFrame,
      textCol: String,
      maxTokens: Int): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    val sents = "__sent_arr"
    // fold state: (chunks: array<string>, cur: string, curTok: long);
    // token count of a sentence = its whitespace token count
    def ntok(s: org.apache.spark.sql.Column) = size(TextFns.tokens(s)).cast("long")
    val zero = struct(
      array().cast("array<string>").as("chunks"),
      lit("").as("cur"), lit(0L).as("curTok"))
    val folded = aggregate(
      col(sents),
      zero,
      (acc, s) => {
        val chunks = acc.getField("chunks")
        val cur = acc.getField("cur")
        val curTok = acc.getField("curTok")
        val ts = ntok(s)
        val overflow = curTok > 0 && curTok + ts > maxTokens
        struct(
          when(overflow, concat(chunks, array(cur))).otherwise(chunks).as("chunks"),
          when(overflow, s)
            .when(curTok === 0, s)
            .otherwise(concat(cur, lit(" "), s)).as("cur"),
          when(overflow, ts).otherwise(curTok + ts).as("curTok"))
      },
      acc => when(acc.getField("curTok") > 0,
        concat(acc.getField("chunks"), array(acc.getField("cur"))))
        .otherwise(acc.getField("chunks")))
    df.withColumn(sents, sentences(col(textCol)))
      .filter(size(col(sents)) > 0)
      .withColumn("__sent_chunks", folded)
      .select(col("*"), posexplode(col("__sent_chunks")).as(Seq("__pos", "chunk")))
      .withColumn("chunk_id", col("__pos").cast("long"))
      .withColumn("chunk_tokens", ntok(col("chunk")))
      .drop(sents, "__sent_chunks", "__pos")
  }
}
