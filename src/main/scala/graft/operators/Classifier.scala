package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Distributed TRAINING for the fastText-style hashed-bag linear
  * classifier whose inference path is [[TextFns.linearTextScore]] —
  * the CCNet/FineWeb quality-classifier loop closed in-engine:
  * label a seed set (e.g. target-domain vs crawl), train here, filter
  * the corpus with [[TextFns.filterByLinearScore]].
  *
  * Full-batch logistic gradient descent. Per iteration:
  * one narrow scoring pass (the same codegen'd HOF + broadcast weight
  * map as inference) computes each doc's sigmoid error, then ONE
  * explode + groupBy(bucket) accumulates gradients. That is 2 jobs an
  * iteration over the seed set — which is the bounded corpus sample
  * (CCNet trains on ~100k docs), not the 100 TB crawl.
  *
  * DETERMINISM: the model must not depend on partitioning. Double
  * summation is order-dependent, so per-doc gradient contributions are
  * cast to DECIMAL(38,18) (an exact, order-independent sum domain) and
  * the weight step is rounded back to integer MICRO-units on the
  * driver. Weights live as BIGINT micros end-to-end — training twice,
  * or on a repartitioned seed set, yields bit-identical models, and
  * the trained table drops straight into the hash-gated inference
  * kernel.
  */
object Classifier {

  final case class LinearModel(weights: Map[Int, Long], biasMicro: Long) {
    def weightsDF(spark: SparkSession): DataFrame = {
      import spark.implicits._
      weights.toSeq.sortBy(_._1).toDF("bucket", "weight_micro")
    }
  }

  /** persist the integer-micro model as one JSON (the [[graft.operators.LangId]]
    * persistence discipline — train once on the bounded seed set,
    * reuse across filtering jobs) */
  def save(spark: SparkSession, model: LinearModel, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("format", "graft-linear-classifier-v1")
    root.put("biasMicro", model.biasMicro)
    val w = root.putObject("weights")
    model.weights.toSeq.sortBy(_._1).foreach { case (b, v) => w.put(b.toString, v) }
    val out = fs.create(p, true)
    try out.write(mapper.writeValueAsBytes(root)) finally out.close()
  }

  def load(spark: SparkSession, path: String): LinearModel = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val bytes = try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(bytes)
    require(node.path("format").asText() == "graft-linear-classifier-v1",
      s"$path is not a graft linear classifier (format=${node.path("format").asText()})")
    import scala.jdk.CollectionConverters._
    val weights = node.get("weights").fields().asScala
      .map(e => e.getKey.toInt -> e.getValue.asLong()).toMap
    LinearModel(weights, node.get("biasMicro").asLong())
  }

  /** train on (text, label∈{0,1}) rows; returns integer-micro weights.
    *
    * @param lrMicro learning-rate in micro-units per unit gradient
    *        (lr = lrMicro/10⁶; the update is
    *        `w -= round(lrMicro · grad / nDocs)`)
    */
  def train(
      docs: DataFrame,
      textCol: String,
      labelCol: String,
      nBuckets: Int,
      iters: Int = 20,
      lrMicro: Long = 4000000L,
      seed: String = "cls"): LinearModel = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(lrMicro > 0, s"lrMicro must be positive, got $lrMicro")
    val spark = docs.sparkSession
    import spark.implicits._

    // bucket the tokens ONCE (native kernel, one loop per row) — every
    // iteration then works on the cached int stream
    val base = docs
      .select(col(labelCol).cast("double").as("__y"),
        TextFns.tokenBucketStream(col(textCol), nBuckets, seed).as("__bk"))
      .filter(size(col("__bk")) > 0)
      .cache()
    val nDocs = base.count()
    require(nDocs > 0, "no non-empty documents to train on")

    val w = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
    var bias = 0L
    val dec = "decimal(38,18)"

    for (_ <- 1 to iters) {
      val wdf = w.toSeq.toDF("bucket", "weight_micro")
      // dense array lookup: O(1) per token vs MapType's linear scan
      val warr = TextFns.denseWeightRow(wdf, nBuckets)
      val s = aggregate(col("__bk"), lit(0L), (acc, b) =>
        acc + element_at(col("__wa"), b + 1))
      val dl = size(col("__bk")).cast("long")
      // sigmoid error on the exact-integer logit; per-doc factor is the
      // shared term of every bucket gradient: (σ − y) / n_tokens
      val scored = base.crossJoin(broadcast(warr))
        .withColumn("__logit",
          (s + lit(bias) * dl).cast("double") / (dl * lit(1000000L)).cast("double"))
        .withColumn("__err", lit(1.0) / (lit(1.0) + exp(-col("__logit"))) - col("__y"))
        .select(col("__bk"), col("__err"),
          (col("__err") / dl.cast("double")).cast(dec).as("__f"))
      val grads = scored
        .select(explode(col("__bk")).as("__b"), col("__f"))
        .groupBy("__b")
        .agg(sum(col("__f")).as("__g"))
        .collect()
        .map(r => r.getInt(0) -> r.getDecimal(1))
      val biasGrad = scored
        .agg(sum(col("__err").cast(dec)))
        .head().getDecimal(0)

      grads.foreach { case (b, g) =>
        val step = (BigDecimal(g) * lrMicro / nDocs)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        w(b) = w(b) - step
      }
      bias -= (BigDecimal(biasGrad) * lrMicro / nDocs)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    base.unpersist()
    LinearModel(w.toMap.filter(_._2 != 0L), bias)
  }
}
