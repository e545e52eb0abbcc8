package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** End-to-end training-data pipeline compositions — the "use all the
  * pieces together" layer on top of TextFns/Dedup (north-star
  * extension; each stage is individually oracle-gated, and the composed
  * pipeline has its own gate query).
  */
object Pipelines {

  /** Corpus cleaning: quality floor → language allowlist → exact dedup
    * → near-dup clustering → keep one representative per cluster.
    *
    * Stage shapes (all previously verified in isolation):
    *  1. quality/language filters: narrow, per-document.
    *  2. exact dedup: one shuffle on content hash (Dedup.exactDedup).
    *  3. near-dup pairs: MinHash banding (Dedup.minHashDupPairs) — the
    *     only wide stage of consequence.
    *  4. clusters: pointer-jumping connected components over the pair
    *     graph (Dedup.dupClustersClosure); survivors = docs that are
    *     their own cluster representative (or in no cluster at all).
    *
    * Returns the surviving rows of `docs` (original columns).
    */
  def cleanCorpus(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minQuality: Double = 0.5,
      langs: Seq[String] = Seq("en"),
      shingleSize: Int = 3,
      numHashes: Int = 12,
      bands: Int = 6,
      jaccardThreshold: Double = 0.7): DataFrame = {
    val filtered = Dedup.exactDedup(
      docs
        .filter(TextFns.qualityScore(docs.col(textCol)) >= minQuality)
        .filter(TextFns.langId(docs.col(textCol)).isin(langs.map(lit): _*)),
      idCol, Seq(textCol))
    // Materialize.None: the pair set is consumed exactly once (by the
    // clustering step), so the eager cache-and-release dance would only
    // add jobs — and post-native-expression the shingle pass is cheap
    // enough to fold into the one consuming action
    val pairs = Dedup.minHashDupPairs(
      filtered, idCol, textCol,
      shingleSize = shingleSize, numHashes = numHashes, bands = bands,
      threshold = jaccardThreshold, materialize = Dedup.Materialize.None)
    val dropped = Dedup.dupClustersClosure(pairs)
      .filter(col("id") =!= col("rep"))
      .select(col("id").as(idCol))
    filtered.join(dropped, Seq(idCol), "left_anti")
  }
}
