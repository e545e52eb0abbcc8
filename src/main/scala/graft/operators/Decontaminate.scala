package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Benchmark decontamination: find (and drop) training documents that
  * share word n-grams with an evaluation/benchmark set — the standard
  * test-set-contamination sweep a training-data pipeline runs before
  * every corpus release. The reference engine has no analog; the
  * operator follows the published recipe (exact n-gram overlap, n≈8-13
  * for real corpora) on top of graft's oracle-verified hashed-shingle
  * kernel (plans/HashedWordShingles.scala).
  *
  * 100 TB shape: the corpus side is ONE narrow codegen pass (text →
  * distinct 60-bit hashed n-grams, ~8 bytes each, strings never leave
  * the scan stage) followed by an explode; the benchmark side —
  * typically MBs against a corpus of TBs — collapses to a distinct
  * gram set and BROADCASTS, so the probe is a map-side hash join with
  * no corpus shuffle at all. The only shuffle is the per-doc count
  * aggregation, keyed on doc id (uniform). Set
  * `broadcastBenchmark = false` when the "benchmark" is itself huge;
  * the join then sort-merges on the gram key.
  */
object Decontaminate {

  /** Per-document contamination report: documents of `corpus` sharing
    * at least one hashed word `n`-gram with `benchmark`, with
    * `total_ngrams` (distinct grams in the doc), `shared_ngrams`
    * (distinct grams also present anywhere in the benchmark), and
    * `contamination` = shared/total. Documents with zero overlap (or
    * fewer than `n` tokens) are absent.
    */
  def contaminationReport(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      benchTextCol: String,
      n: Int = 8,
      broadcastBenchmark: Boolean = true): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val grams = corpus
      .select(col(idCol), TextFns.hashedWordShingles(col(textCol), n).as("__g"))
      .filter(size(col("__g")) > 0)
      .select(col(idCol), size(col("__g")).cast("long").as("total_ngrams"),
        explode(col("__g")).as("__gram"))
    val benchGrams = benchmark
      .select(explode(TextFns.hashedWordShingles(col(benchTextCol), n)).as("__gram"))
      .distinct()
    val probe = if (broadcastBenchmark) broadcast(benchGrams) else benchGrams
    grams
      .join(probe, Seq("__gram"))
      // HashedWordShingles emits DISTINCT grams per doc, so a plain
      // count is already a distinct-gram count
      .groupBy(col(idCol), col("total_ngrams"))
      .agg(count(lit(1)).as("shared_ngrams"))
      .withColumn("contamination",
        round(col("shared_ngrams").cast("double") / col("total_ngrams"), 6))
      .select(idCol, "total_ngrams", "shared_ngrams", "contamination")
  }

  /** Fully NARROW strict decontamination: drops every document sharing
    * at least one hashed n-gram with the benchmark, whose distinct gram
    * set is collected driver-side (8 bytes/gram — benchmark sets are
    * MBs against corpora of TBs) and shipped as an array literal. No
    * join, no shuffle, no state — one codegen'd filter fused with the
    * scan, so it runs IDENTICALLY on batch and streaming frames (the
    * per-doc-ratio [[contaminationReport]] aggregation cannot stream in
    * append mode; this form is the streaming-safe strict equivalent).
    */
  def dropContaminatedNarrow(
      corpus: DataFrame,
      benchmark: DataFrame,
      textCol: String,
      benchTextCol: String,
      n: Int = 8): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val grams = benchmark
      .select(explode(TextFns.hashedWordShingles(col(benchTextCol), n)).as("g"))
      .distinct()
      .collect().map(_.getLong(0))
    corpus.filter(!arrays_overlap(
      TextFns.hashedWordShingles(col(textCol), n), typedLit(grams)))
  }

  /** Distinct hashed n-grams of `benchmark` aggregated into a Bloom
    * filter (Spark's native sketch, built with the Catalyst
    * `BloomFilterAggregate` so probe hashing is guaranteed to match),
    * returned as its serialized bytes. `fpp` at `expectedItems` sizes
    * the bits via the standard optimal formula. */
  def benchmarkBloom(
      benchmark: DataFrame,
      benchTextCol: String,
      n: Int,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01): Array[Byte] = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1), got $fpp")
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftshim.GraftShim
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    val grams = benchmark
      .select(explode(TextFns.hashedWordShingles(col(benchTextCol), n)).as("__g"))
      .distinct()
    val agg = GraftShim.column(
      new BloomFilterAggregate(
        GraftShim.expression(col("__g")),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    grams.agg(agg.as("__bf")).head().getAs[Array[Byte]](0)
  }

  /** `might_contain(bloom, value)` over a serialized Bloom filter —
    * the filter literal deserializes once per task, not per row. */
  def mightContain(bloom: Array[Byte], value: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graftshim.GraftShim
    GraftShim.column(BloomFilterMightContain(
      Literal.create(bloom, org.apache.spark.sql.types.BinaryType),
      GraftShim.expression(value)))
  }

  /** [[contaminationReport]] behind a Bloom pre-filter — the 100 TB
    * probe shape when even the hashed benchmark gram SET is too big to
    * broadcast raw (a Bloom at 1% fpp is ~1.2 bytes/gram vs 8):
    * documents whose gram array has no Bloom hit — the overwhelming
    * majority — are eliminated by a NARROW filter fused into the scan
    * and never explode into the join/aggregation at all; Bloom false
    * positives then wash out in the exact verify, so the report is
    * IDENTICAL to [[contaminationReport]]'s (no false negatives, and
    * the same gate oracle applies verbatim). */
  def contaminationReportBloom(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      benchTextCol: String,
      n: Int = 8,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01,
      broadcastBenchmark: Boolean = true): DataFrame = {
    val bloom = benchmarkBloom(benchmark, benchTextCol, n, expectedItems, fpp)
    val candidates = corpus.filter(
      exists(TextFns.hashedWordShingles(col(textCol), n),
        g => mightContain(bloom, g)))
    contaminationReport(
      candidates, benchmark, idCol, textCol, benchTextCol, n, broadcastBenchmark)
  }

  /** Corpus minus contaminated documents: drops every document whose
    * contamination ratio EXCEEDS `maxContamination` (0.0 = any shared
    * n-gram drops the doc, the usual strict setting).
    */
  def dropContaminated(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      benchTextCol: String,
      n: Int = 8,
      maxContamination: Double = 0.0,
      broadcastBenchmark: Boolean = true): DataFrame = {
    val bad = contaminationReport(
        corpus, benchmark, idCol, textCol, benchTextCol, n, broadcastBenchmark)
      .filter(col("contamination") > maxContamination)
      .select(idCol)
    corpus.join(bad, Seq(idCol), "left_anti")
  }

  /** SEMANTIC decontamination — the embedding-space complement of the
    * n-gram probes above: drop every corpus row whose embedding is
    * within `minCosine` of ANY benchmark embedding (paraphrased eval
    * questions that exact n-gram overlap misses). Published recipe
    * (the embedding-similarity decontamination used alongside n-gram
    * checks in recent LLM data reports); no reference-engine analog.
    *
    * 100 TB shape: an eval benchmark is thousands of vectors — it
    * BROADCASTS. The join is a broadcast nested-loop LEFT ANTI with the
    * cosine predicate: the corpus never shuffles, never materializes a
    * pair table, and short-circuits per row on the first hit. Cost is
    * |corpus|·|bench| fused narrow comparisons — the exact-recall
    * baseline; screen with [[graft.operators.Similarity.embeddingNearDupPairs]]'
    * banded LSH first when the benchmark outgrows a broadcast. */
  def dropContaminatedSemantic(
      corpus: DataFrame,
      embCol: String,
      bench: DataFrame,
      benchEmbCol: String,
      minCosine: Double): DataFrame = {
    require(minCosine > 0.0 && minCosine <= 1.0,
      s"minCosine must be in (0, 1], got $minCosine")
    val b = bench.select(col(benchEmbCol).as("__bench_emb"))
    corpus.join(
      org.apache.spark.sql.functions.broadcast(b),
      graft.operators.Similarity.cosine(corpus.col(embCol), col("__bench_emb"))
        >= minCosine,
      "left_anti")
  }
}
