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
}
