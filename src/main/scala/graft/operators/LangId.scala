package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim

/** Real-model language identification: a character-n-gram multinomial
  * Naive Bayes classifier (the public-knowledge workhorse behind
  * langid.py / CLD-style detectors; Cavnar-Trenkle 1994 n-gram text
  * categorization). Replaces the 5-language marker-word heuristic
  * (`TextFns.langId`) as the quality path for everything keyed by
  * `lang` — mixing, release profiles, per-language dedup. The
  * reference has no langid at all; this is LLM-pipeline-mandate
  * surface, not parity surface.
  *
  * DESIGN (determinism first, like [[Classifier]]):
  *  - features: hashed character n-grams, the md5 bucket formula every
  *    oracle inlines ([[graft.plans.HashedNgramBuckets]] contract);
  *  - training: per-(lang, bucket) COUNTS — exact integers, any
  *    partitioning — then Laplace-smoothed log-probabilities derived
  *    ON THE DRIVER in integer micro-units
  *    (`round_half_up(1e6 · ln((cnt+1)/(total+nBuckets)))`, StrictMath,
  *    one place — no distributed float summation anywhere);
  *  - inference: ONE native kernel pass per row
  *    ([[graft.plans.CharNgramNbScore]]), pure BIGINT accumulation,
  *    argmax with first-lang-wins ties.
  *  Training twice, or on a repartitioned corpus, yields bit-identical
  *  models; [[LangIdSpec]] pins distributed == plain-Scala reference.
  *
  * SCALE: the only collect is the (lang × bucket) count table —
  * model-bounded (≤ |langs| · nBuckets rows, e.g. 8 × 2048), never
  * corpus-sized. Inference is narrow, no shuffle, weights ride the
  * expression (≤ ~128 KB serialized once per task).
  */
object LangId {

  /** Dense integer-micro NB model. `weightsMicro(j)(b)` already holds
    * the smoothed log-prob for EVERY bucket (unseen buckets get the
    * cnt=0 smoothing mass), so inference is a plain array read. */
  final case class NbModel(
      langs: Seq[String],
      n: Int,
      nBuckets: Int,
      seed: String,
      priorsMicro: Array[Long],
      weightsMicro: Array[Array[Long]]) {

    override def equals(o: Any): Boolean = o match {
      case m: NbModel =>
        m.langs == langs && m.n == n && m.nBuckets == nBuckets &&
          m.seed == seed &&
          java.util.Arrays.equals(m.priorsMicro, priorsMicro) &&
          m.weightsMicro.length == weightsMicro.length &&
          m.weightsMicro.zip(weightsMicro).forall { case (a, b) =>
            java.util.Arrays.equals(a, b)
          }
      case _ => false
    }
    override def hashCode(): Int =
      (langs, n, nBuckets, seed, priorsMicro.toSeq).hashCode()
  }

  /** predicted language column — 'und' when the text has no n-gram */
  def predict(model: NbModel, text: Column): Column =
    GraftShim.column(graft.plans.CharNgramNbScore(
      GraftShim.expression(text), model.n, model.nBuckets, model.seed,
      model.langs, model.priorsMicro, model.weightsMicro))

  /** Distributed training: one narrow kernel pass (text → bucket
    * stream), one explode + groupBy(lang, bucket) count — a single
    * shuffle whose output is model-bounded — then driver-side weight
    * derivation shared verbatim with [[trainRef]]. */
  def train(docs: DataFrame, textCol: String, langCol: String,
            n: Int = 3, nBuckets: Int = 2048, seed: String = "lid"): NbModel = {
    val bk = GraftShim.column(graft.plans.CharNgramBuckets(
      GraftShim.expression(col(textCol)), n, nBuckets, seed))
    val counts = docs
      .select(col(langCol).cast("string").as("__lang"), bk.as("__bk"))
      .select(col("__lang"), explode(col("__bk")).as("__b"))
      .groupBy("__lang", "__b")
      .count()
      .collect() // ≤ |langs| × nBuckets rows — model-bounded, not corpus-bounded
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    val docCounts = docs
      .groupBy(col(langCol).cast("string").as("__lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    deriveWeights(counts, docCounts, n, nBuckets, seed)
  }

  /** Plain-Scala reference trainer over an in-memory (lang, text)
    * corpus — same features, same counts, same derivation: the model
    * EQUALS [[train]]'s on the same data (LangIdSpec pins it). Also the
    * oracle-build path: static seed corpora train here without a
    * SparkSession, and the literal weights go into gate SQL. */
  def trainRef(corpus: Seq[(String, String)],
               n: Int = 3, nBuckets: Int = 2048, seed: String = "lid"): NbModel = {
    val counts = scala.collection.mutable.Map.empty[(String, Int), Long]
      .withDefaultValue(0L)
    val docCounts = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    corpus.foreach { case (lang, text) =>
      docCounts(lang) += 1L
      graft.plans.CharNgramBuckets.bucketsOf(text, n, nBuckets, seed)
        .foreach(b => counts((lang, b)) += 1L)
    }
    deriveWeights(counts.toMap, docCounts.toMap, n, nBuckets, seed)
  }

  /** Persist a trained model (train once on the bounded seed corpus,
    * reuse across the 100 TB inference jobs): one JSON file through the
    * Hadoop FS API, so any fs:// the cluster sees works. The dense
    * weight arrays are ≲ a few hundred KB — driver-sized by the same
    * bound that makes training's collect safe. */
  def save(spark: org.apache.spark.sql.SparkSession, model: NbModel, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("format", "graft-langid-nb-v1")
    root.put("n", model.n)
    root.put("nBuckets", model.nBuckets)
    root.put("seed", model.seed)
    val langsArr = root.putArray("langs")
    model.langs.foreach(langsArr.add)
    val priorsArr = root.putArray("priorsMicro")
    model.priorsMicro.foreach(priorsArr.add)
    val wArr = root.putArray("weightsMicro")
    model.weightsMicro.foreach { row =>
      val r = wArr.addArray(); row.foreach(r.add)
    }
    val out = fs.create(p, true)
    try out.write(mapper.writeValueAsBytes(root)) finally out.close()
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): NbModel = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val bytes = try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(bytes)
    require(node.path("format").asText() == "graft-langid-nb-v1",
      s"$path is not a graft langid model (format=${node.path("format").asText()})")
    import scala.jdk.CollectionConverters._
    NbModel(
      node.get("langs").elements().asScala.map(_.asText()).toSeq,
      node.get("n").asInt(),
      node.get("nBuckets").asInt(),
      node.get("seed").asText(),
      node.get("priorsMicro").elements().asScala.map(_.asLong()).toArray,
      node.get("weightsMicro").elements().asScala.map(
        _.elements().asScala.map(_.asLong()).toArray).toArray)
  }

  /** exact micro-log: round_half_up(1e6 · ln(num/den)) — StrictMath so
    * the result is platform-pinned (fdlibm), driver-only */
  private def lnMicro(num: Long, den: Long): Long =
    BigDecimal(1000000.0 * StrictMath.log(num.toDouble / den.toDouble))
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def deriveWeights(
      counts: Map[(String, Int), Long],
      docCounts: Map[String, Long],
      n: Int, nBuckets: Int, seed: String): NbModel = {
    val langs = docCounts.keys.toSeq.sorted
    require(langs.nonEmpty, "no labeled documents to train on")
    val nDocs = docCounts.values.sum
    val priors = langs.map(l => lnMicro(docCounts(l), nDocs)).toArray
    val weights = langs.map { l =>
      val total = counts.collect { case ((`l`, _), c) => c }.sum
      Array.tabulate(nBuckets) { b =>
        lnMicro(counts.getOrElse((l, b), 0L) + 1L, total + nBuckets)
      }
    }.toArray
    NbModel(langs, n, nBuckets, seed, priors, weights)
  }
}
