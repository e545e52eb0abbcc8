package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
  * pick raw-corpus documents that look like a target corpus by the
  * likelihood ratio of two hashed-n-gram bag models. The published
  * recipe, re-expressed Spark-first:
  *
  *  1. features: unigrams + bigrams hashed into `nBuckets` (the
  *     paper's 10k-bucket hashed n-gram space);
  *  2. fit bucket distributions p̂ (target) and q̂ (raw) by counting —
  *     one explode + groupBy per corpus, the only shuffles here;
  *  3. importance weight `log w(x) = Σ_i [log p̂ − log q̂](bucket_i)`
  *     — evaluated as an exact BIGINT sum of per-bucket MICRO-units
  *     (`lw_micro = round((log p̂_b − log q̂_b)·10⁶)`), so scoring is
  *     deterministic and hash-gateable; the one place a transcendental
  *     enters is the per-BUCKET table build, not the per-document sum;
  *  4. select: exact top-k (`resampleTopK`, deterministic ties by id)
  *     or Gumbel top-k (`resampleGumbel` — the paper's sampling-
  *     without-replacement; noise is a pure function of (seed, id)).
  *
  * Scoring is a fully narrow codegen'd `aggregate` HOF over the token
  * array (same shape as [[TextFns.linearTextScore]]): the weight table
  * collapses to ONE broadcast map row, no explode, no join, no
  * shuffle. 100 TB: the raw corpus is touched by exactly one narrow
  * pass + one top-k.
  */
object Dsir {

  /** unigram + bigram feature-bucket stream of one document — the
    * native [[graft.plans.HashedNgramBuckets]] kernel (one tight loop
    * per row; the interpreted per-element md5 chain was the slowest
    * headline query before it). Bucket contract identical to
    * `TextFns.tokenBucket(seed+"u"/"b")`. */
  private def bucketStream(text: Column, nBuckets: Int, seed: String): Column = {
    import org.apache.spark.sql.graftshim.GraftShim
    GraftShim.column(graft.plans.HashedNgramBuckets(
      GraftShim.expression(text), nBuckets, seed + "u", Some(seed + "b")))
  }

  /** hashed n-gram bucket distribution of a corpus: (bucket, cnt) —
    * the training pass for p̂ / q̂. One explode + one groupBy on the
    * uniform bucket key. */
  def bucketCounts(
      df: DataFrame,
      textCol: String,
      nBuckets: Int,
      seed: String = "dsir"): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    df.select(explode(bucketStream(col(textCol), nBuckets, seed)).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** per-bucket micro log-ratio table from two bucket distributions:
    * `lw_micro(b) = round(10⁶·(ln((cT_b+α)/(totT+α·B)) −
    * ln((cR_b+α)/(totR+α·B))))` with add-α smoothing over all B
    * buckets. The ln evaluation happens HERE, once per bucket — the
    * resulting integers are the model; document scoring never touches
    * a transcendental. */
  def logRatioWeights(
      target: DataFrame,
      raw: DataFrame,
      nBuckets: Int,
      alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val t = target.select(col(target.columns.head).cast("int").as("bucket"),
      col(target.columns(1)).cast("long").as("ct"))
    val r = raw.select(col(raw.columns.head).cast("int").as("bucket"),
      col(raw.columns(1)).cast("long").as("cr"))
    val totT = t.agg(sum("ct")).head().getLong(0)
    val totR = r.agg(sum("cr")).head().getLong(0)
    t.join(r, Seq("bucket"), "full")
      .select(col("bucket"),
        round((log((coalesce(col("ct"), lit(0L)) + alpha) /
          (totT + alpha * nBuckets)) -
          log((coalesce(col("cr"), lit(0L)) + alpha) /
            (totR + alpha * nBuckets))) * 1e6)
          .cast("long").as("lw_micro"))
  }

  /** importance scores: df + `n_feats` (unigram + bigram occurrences)
    * + `score_micro` (exact BIGINT Σ lw_micro over the doc's feature
    * stream) + `score` (score_micro / 10⁶ — ONE IEEE division of an
    * exact integer). Missing buckets weigh 0; empty docs score 0. */
  def importanceScore(
      docs: DataFrame,
      textCol: String,
      weights: DataFrame,
      nBuckets: Int,
      seed: String = "dsir"): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    docs.crossJoin(broadcast(TextFns.denseWeightRow(weights, nBuckets)))
      .withColumn("__bk", bucketStream(col(textCol), nBuckets, seed))
      .withColumn("n_feats", size(col("__bk")).cast("long"))
      .withColumn("score_micro",
        aggregate(col("__bk"), lit(0L),
          (acc, b) => acc + element_at(col("__wa"), b + 1)))
      .withColumn("score", col("score_micro").cast("double") / lit(1000000.0))
      .drop("__wa", "__bk")
  }

  /** exact deterministic selection: the k highest importance scores,
    * ties by ascending id — a TakeOrdered top-k, never a global sort. */
  def resampleTopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      weights: DataFrame,
      nBuckets: Int,
      k: Int,
      seed: String = "dsir"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    importanceScore(docs, textCol, weights, nBuckets, seed)
      .orderBy(col("score_micro").desc, col(idCol))
      .limit(k)
  }

  /** Gumbel top-k — the paper's importance RESAMPLING without
    * replacement: key_i = score_i + Gumbel(0,1)_i with the noise a
    * pure function of (seed, id) (`g = −ln(−ln(u))`, u the portable
    * 60-bit unit hash), so the selected multiset is reproducible
    * across runs and partitionings. Noise is double-valued —
    * distributional machinery, spec-gated (the exact integer path
    * above is the hash-gated one). */
  def resampleGumbel(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      weights: DataFrame,
      nBuckets: Int,
      k: Int,
      seed: String = "dsir"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = Sampling.unitHash(seed + ":gumbel", Seq(col(idCol)))
    importanceScore(docs, textCol, weights, nBuckets, seed)
      .withColumn("__key", col("score") - log(-log(u)))
      .orderBy(col("__key").desc, col(idCol))
      .limit(k)
      .drop("__key")
  }
}
