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

  /** Which member of a duplicate cluster survives.
    *  - [[RepPolicy.MinId]]: the lowest id (cheap, deterministic — the
    *    reference-style default).
    *  - [[RepPolicy.Best]]: the member maximizing `score(filtered)`
    *    (ties → lowest id) — what production corpus pipelines actually
    *    want ("keep the highest-quality copy, drop the rest"). Costs
    *    one narrow score pass over cluster MEMBERS only (a tiny
    *    fraction of the corpus) plus a per-cluster window. */
  sealed trait RepPolicy
  object RepPolicy {
    case object MinId extends RepPolicy
    final case class Best(score: DataFrame => org.apache.spark.sql.Column) extends RepPolicy
  }

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
      jaccardThreshold: Double = 0.7,
      materialize: Dedup.Materialize = Dedup.Materialize.Cache,
      saltBuckets: Int = 0, // 0 = auto-detect band skew (ScaleOps.autoSaltBuckets)
      localEdgeLimit: Long = 2000000L,
      repPolicy: RepPolicy = RepPolicy.MinId): DataFrame = {
    import Dedup.Materialize
    val filteredRaw = Dedup.exactDedup(
      docs
        .filter(TextFns.qualityScore(docs.col(textCol)) >= minQuality)
        .filter(TextFns.langId(docs.col(textCol)).isin(langs.map(lit): _*)),
      idCol, Seq(textCol))
    // `filtered` feeds TWO consumers (the shingle pass inside
    // minHashDupPairs and the final left_anti) and the shingle output
    // feeds three more plan branches; without materialization Catalyst
    // replays the quality/langid/window subtree once per branch — 4×
    // the corpus scan at any scale. Materialize it ONCE (cache at
    // interactive scale, bucketed table for the no-executor-memory
    // path), derive everything from the handle, release after the
    // survivor set is computed.
    val (filtered, release) = Dedup.materialized(filteredRaw, materialize, idCol)
    val inner = materialize match {
      // the shingle payload needs its own table name, not filtered's
      case Materialize.BucketedTable(t, n) => Materialize.BucketedTable(t + "__shingles", n)
      case other => other
    }
    val pairs = Dedup.minHashDupPairs(
      filtered, idCol, textCol,
      shingleSize = shingleSize, numHashes = numHashes, bands = bands,
      threshold = jaccardThreshold, materialize = inner,
      saltBuckets = saltBuckets)
    // dupClustersClosure is eager in both paths (driver union-find
    // collects; the distributed loop counts each round), so `pairs` is
    // fully consumed once it returns and its cache can go immediately.
    val clusters = Dedup.dupClustersClosure(pairs, localEdgeLimit = localEdgeLimit)
    pairs.unpersist()
    val dropped = repPolicy match {
      case RepPolicy.MinId =>
        clusters
          .filter(col("id") =!= col("rep"))
          .select(col("id").as(idCol))
      case RepPolicy.Best(score) =>
        // score only the cluster MEMBERS (clusters is tiny next to the
        // corpus): semi-shaped join pulls scores from the materialized
        // filtered frame, then one per-cluster window picks the keeper
        val scored = filtered
          .select(filtered.col(idCol).as("id"), score(filtered).as("__score"))
        val members = clusters.select("id", "rep").join(scored, Seq("id"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("rep")).orderBy(col("__score").desc, col("id").asc)
        members
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") =!= 1)
          .select(col("id").as(idCol))
    }
    val survivors = filtered.join(dropped, Seq(idCol), "left_anti")
    materialize match {
      case Materialize.Cache =>
        // eager: consume the filtered cache now, keep only the result,
        // free the intermediates — repeated calls can't accumulate
        // cached corpora. Callers release with result.unpersist().
        val out = survivors.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        out.count()
        clusters.unpersist()
        release()
        out
      case _ =>
        // None: fully lazy, caller owns caching. BucketedTable: the
        // survivors read `filtered` back from disk — nothing pinned in
        // executor memory, so the frame stays lazy. (`clusters` keeps
        // its small per-duplicate-node cache alive in the distributed
        // path until the caller's action.)
        survivors
    }
  }

  /** End-to-end training-data preparation: quality floor → language
    * allowlist → exact dedup → strict benchmark decontamination →
    * sliding-window chunking. The output is the training-unit table
    * (one row per chunk) a tokenizer/packer consumes next.
    *
    * Unlike [[cleanCorpus]] this chain is BRANCH-FREE — each stage
    * feeds exactly one consumer — so it composes into a single lazy
    * plan with NO materialization points: the only shuffle is exact
    * dedup's content-hash window; decontamination is the narrow
    * Bloom-free strict form (benchmark grams collected once,
    * driver-side) and chunking is a narrow explode. One scan, one
    * shuffle, at any scale.
    */
  def prepareTrainingData(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      minQuality: Double = 0.5,
      langs: Seq[String] = Seq("en"),
      contaminationN: Int = 8,
      maxTokens: Int = 512,
      overlap: Int = 0): DataFrame = {
    val filtered = Dedup.exactDedup(
      docs
        .filter(TextFns.qualityScore(docs.col(textCol)) >= minQuality)
        .filter(TextFns.langId(docs.col(textCol)).isin(langs.map(lit): _*)),
      idCol, Seq(textCol))
    val clean = Decontaminate.dropContaminatedNarrow(
      filtered, benchmark, textCol, benchTextCol, contaminationN)
    Chunking.chunkByTokens(clean, textCol, maxTokens, overlap)
  }

  /** Semantic deduplication (SemDeDup-style): drop documents whose
    * EMBEDDINGS are near-duplicates, keeping one representative per
    * cosine-similarity cluster — catches paraphrases and translations
    * that token-level MinHash can't see.
    *
    * Shape: banded sign-LSH candidate pairs + exact cosine verify
    * ([[Similarity.embeddingNearDupPairs]] — equi-joins only, never
    * all-pairs), transitive clusters via pointer jumping
    * ([[Dedup.dupClustersClosure]]), then one left_anti against the
    * dropped set. `docs` itself is scanned twice (once feeding the
    * LSH index, once for the left_anti) — for a raw parquet source
    * that is the right trade at scale (re-scan beats pinning the
    * corpus in memory); pre-materialize upstream if `docs` is an
    * expensive computed frame.
    */
  def semanticDedup(
      docs: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double,
      lsh: Similarity.RandomHyperplaneLsh,
      bands: Int = 4,
      materialize: Dedup.Materialize = Dedup.Materialize.Cache,
      localEdgeLimit: Long = 2000000L,
      repPolicy: RepPolicy = RepPolicy.MinId,
      saltBuckets: Int = 0, // 0 = auto-detect band skew (ScaleOps.autoSaltBuckets)
      autoSaltThreshold: Long = 4096L,
      pairCapPerBucket: Long = 512L): DataFrame = {
    val pairs = Similarity.embeddingNearDupPairs(
      docs, idCol, embCol, threshold, lsh, bands, materialize,
      saltBuckets = saltBuckets, autoSaltThreshold = autoSaltThreshold,
      pairCapPerBucket = pairCapPerBucket)
    val clusters = Dedup.dupClustersClosure(pairs, localEdgeLimit = localEdgeLimit)
    pairs.unpersist()
    val dropped = repPolicy match {
      case RepPolicy.MinId =>
        clusters.filter(col("id") =!= col("rep")).select(col("id").as(idCol))
      case RepPolicy.Best(score) =>
        val scored = docs
          .select(docs.col(idCol).as("id"), score(docs).as("__score"))
        val members = clusters.select("id", "rep").join(scored, Seq("id"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("rep")).orderBy(col("__score").desc, col("id").asc)
        members
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") =!= 1)
          .select(col("id").as(idCol))
    }
    // lazy result — `clusters`' small per-duplicate-node cache (the
    // distributed path) stays alive until the caller's action, same
    // contract as cleanCorpus' non-Cache modes
    docs.join(dropped, Seq(idCol), "left_anti")
  }

  /** Per-language corpus profile — the release-report aggregate a
    * pipeline emits after cleaning: document and token counts, length
    * and quality statistics, exact-duplicate rate. One narrow scoring
    * pass fused with the scan, then ONE shuffle on the language key
    * (map-side partial aggregation; output cardinality = #languages).
    * Exact-duplicate counting rides the same aggregation via a
    * distinct-count over the content fingerprint.
    *
    * Doubles route through DECIMAL sums (exact at any partition count /
    * aggregation order — see q1_agg) so the profile is reproducible
    * run-to-run at 100 TB, not just at test scale.
    */
  /** Fluency-filtered corpus (CCNet-style perplexity bucketing, keep-
    * the-fluent edition): drop documents whose n-gram LM fluency under
    * a reference-corpus model falls below `minFluency`. Documents too
    * short to score (no n-gram — fluency NULL) are KEPT: no evidence
    * against them. The comparison is exact across engines because
    * [[NgramLm.scoreDocs]] produces bit-identical fluency values
    * (integer-scaled smoothing).
    *
    * Scale: the model tables broadcast by default (reference corpora
    * are bounded); the corpus side is one scoring pass + a left_anti on
    * the doc key. */
  def dropDisfluent(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: NgramLm.Model,
      minFluency: Double,
      broadcastModel: Boolean = true): DataFrame = {
    val bad = NgramLm.scoreDocs(docs, idCol, textCol, model,
        broadcastModel = broadcastModel)
      .filter(col("fluency").isNotNull && col("fluency") < minFluency)
      .select(idCol)
    docs.join(bad, Seq(idCol), "left_anti")
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): each doc
    * lands in `head` / `middle` / `tail` by its LM fluency against two
    * calibrated cutoffs (CCNet computes cutoffs offline per language
    * from a sample, then buckets the crawl; `head` = most fluent).
    * Unscoreable docs (shorter than the model order) get `unscored` —
    * no evidence, kept distinct from `tail`.
    *
    * The comparison is engine-safe: [[NgramLm.scoreDocs]] fluency is
    * bit-identical across engines (exact integer smoothing, one
    * cast+divide), so thresholding on it is deterministic. Narrow on
    * the corpus side — one scoring pass, no extra shuffle.
    */
  def perplexityBuckets(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: NgramLm.Model,
      cutLow: Double,
      cutHigh: Double,
      broadcastModel: Boolean = true): DataFrame = {
    require(cutLow <= cutHigh, s"cutLow $cutLow must be <= cutHigh $cutHigh")
    NgramLm.scoreDocs(docs, idCol, textCol, model, broadcastModel = broadcastModel)
      .withColumn("ppl_bucket",
        when(col("fluency").isNull, lit("unscored"))
          .when(col("fluency") >= cutHigh, lit("head"))
          .when(col("fluency") >= cutLow, lit("middle"))
          .otherwise(lit("tail")))
  }

  /** calibration helper: (qLow, qHigh) fluency quantiles of a corpus
    * under `model`, via the mergeable approx-percentile sketch (exact
    * percentile of a 100 TB corpus would need a global sort; CCNet
    * itself calibrates on a sample). Returns the two cutoffs. */
  def fluencyCutoffs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: NgramLm.Model,
      qLow: Double = 1.0 / 3,
      qHigh: Double = 2.0 / 3): (Double, Double) = {
    require(qLow < qHigh, s"qLow $qLow must be < qHigh $qHigh")
    val r = NgramLm.scoreDocs(docs, idCol, textCol, model)
      .filter(col("fluency").isNotNull)
      .agg(percentile_approx(col("fluency"), lit(qLow), lit(10000)),
        percentile_approx(col("fluency"), lit(qHigh), lit(10000)))
      .head()
    (r.getDouble(0), r.getDouble(1))
  }

  def corpusProfile(docs: DataFrame, textCol: String, langCol: String): DataFrame = {
    val toks = TextFns.tokenCount(col(textCol))
    val q = TextFns.qualityScore(col(textCol))
    docs
      .select(col(langCol).as("lang"), toks.as("__tok"), q.as("__q"),
        length(col(textCol)).cast("long").as("__chars"),
        md5(col(textCol)).as("__fp"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("__tok").as("n_tokens"),
        sum("__chars").as("n_chars"),
        round((sum(col("__tok").cast("decimal(25,2)")).cast("double")
          / count(lit(1))), 6).as("avg_tokens"),
        round((sum(col("__q").cast("decimal(25,6)")).cast("double")
          / count(lit(1))), 6).as("avg_quality"),
        countDistinct("__fp").as("n_unique"),
        round(lit(1.0) - countDistinct("__fp").cast("double") / count(lit(1)), 6)
          .as("dup_rate"))
  }

  /** [[corpusProfile]] with the distinct-fingerprint count replaced by
    * HyperLogLog++ (`approx_count_distinct`, relative error `rsd`) —
    * the 100 TB path: exact COUNT(DISTINCT) must shuffle every
    * fingerprint to dedupe it, while the sketch keeps the profile a
    * pure one-shuffle map-side-partial aggregation whose state per
    * language is a few KB regardless of corpus size. `n_unique` /
    * `dup_rate` become estimates; everything else is exact.
    */
  def corpusProfileApprox(
      docs: DataFrame, textCol: String, langCol: String, rsd: Double = 0.02): DataFrame = {
    val toks = TextFns.tokenCount(col(textCol))
    val q = TextFns.qualityScore(col(textCol))
    docs
      .select(col(langCol).as("lang"), toks.as("__tok"), q.as("__q"),
        length(col(textCol)).cast("long").as("__chars"),
        md5(col(textCol)).as("__fp"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("__tok").as("n_tokens"),
        sum("__chars").as("n_chars"),
        round((sum(col("__tok").cast("decimal(25,2)")).cast("double")
          / count(lit(1))), 6).as("avg_tokens"),
        round((sum(col("__q").cast("decimal(25,6)")).cast("double")
          / count(lit(1))), 6).as("avg_quality"),
        approx_count_distinct(col("__fp"), rsd).as("n_unique"),
        round(lit(1.0) - approx_count_distinct(col("__fp"), rsd).cast("double")
          / count(lit(1)), 6).as("dup_rate"))
  }

  /** Incremental corpus ingestion — the daily-crawl pattern: dedup a
    * new batch exactly (keep the lowest id per content hash), drop
    * everything whose content already lives in the corpus, append the
    * survivors as one transactional Delta commit. The corpus table
    * persists `content_hash` alongside the data, so subsequent ingests
    * never re-hash or even re-read the text of the existing corpus:
    * the membership probe scans ONE 32-char column (parquet column
    * pruning) of the index, not the documents.
    *
    * Scale shape: one in-batch shuffle on the content hash (the dedup
    * window), then one anti-join of batch hashes against the pruned
    * corpus hash column — the batch is the small side; with the corpus
    * table bucketed by `content_hash` ([[ScaleOps.saveBucketed]]) even
    * that shuffle drops to the batch alone. The append itself is a
    * conditional Delta commit ([[graft.sources.DeltaWrite.append]]) —
    * a racing ingest fails loudly instead of double-inserting.
    *
    * Invariant maintained: `content_hash` is unique across the table
    * (dedup-within-batch + anti-join-against-table, and batches are
    * serialized by the conditional commit).
    *
    * @return the rows actually appended (batch columns +
    *         `content_hash`) — recomputes the plan if re-executed, so
    *         treat it as a record of this call, not a live view
    */
  def ingestIncrement(
      spark: org.apache.spark.sql.SparkSession,
      corpusPath: String,
      batch: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    import graft.sources.{DeltaScan, DeltaWrite}
    val hashed = batch.withColumn("content_hash",
      Dedup.contentHash(Seq(batch.col(textCol))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("content_hash").orderBy(col(idCol).asc)
    val deduped = hashed
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val fs = new org.apache.hadoop.fs.Path(corpusPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(new org.apache.hadoop.fs.Path(corpusPath, "_delta_log"))
    val fresh =
      if (!exists) deduped
      else {
        val existing = DeltaScan.read(spark, corpusPath).select("content_hash")
        deduped.join(existing, Seq("content_hash"), "left_anti")
      }
    // restore caller column order, hash last
    val out = fresh.select(
      (batch.columns.map(col) :+ col("content_hash")).toIndexedSeq: _*)
    if (exists) DeltaWrite.append(spark, out, corpusPath)
    else DeltaWrite.create(spark, out, corpusPath)
    out
  }

  /** Crawl-archive bytes → clean text rows, fully narrow: explode the
    * WARC records out of a binary column ([[Multimodal.parseWarc]]),
    * keep successful `text/html` responses, decode the HTTP body and
    * run densitometric main-content extraction ([[Extract]]). The
    * whole chain is ONE narrow projection — it fuses with the scan,
    * runs unchanged on a stream, and composes with every downstream
    * prep op (quality filters, dedup, chunking).
    *
    * Output: the caller's columns (minus `blobCol`) + record_id,
    * target_uri, text, n_blocks, n_content_blocks.
    */
  def crawlExtract(df: DataFrame, blobCol: String): DataFrame = {
    val keep = df.columns.filterNot(_ == blobCol).map(col).toSeq
    df.select(keep :+
      explode(Multimodal.parseWarc(col(blobCol))).as("__r"): _*)
      .filter(col("__r.warc_type") === "response" &&
        col("__r.http_status") === 200 &&
        col("__r.http_content_type").startsWith("text/html"))
      .select(keep ++ Seq(
        col("__r.record_id").as("record_id"),
        col("__r.target_uri").as("target_uri"),
        decode(col("__r.payload"), "UTF-8").as("__html")): _*)
      .transform(d => Extract.extractMainContent(d, "__html", "text"))
      .drop("__html")
  }

  /** [[ingestIncrement]] extended with NEAR-duplicate screening — the
    * full daily-crawl pattern: a new batch is exact-deduped, probed
    * against the corpus, near-dedup'd within itself, then probed
    * against a PERSISTED MinHash band index of everything already
    * ingested — the existing corpus text is NEVER rescanned or
    * re-shingled.
    *
    * Order of stages (each mirrored exactly by the oracle):
    *  1. in-batch exact dedup (min id per content hash);
    *  2. cross-batch exact: anti-join against the corpus
    *     `content_hash` column (one pruned-column probe);
    *  3. in-batch near-dup: banded MinHash pairs + exact-Jaccard
    *     verify + transitive closure — cluster minimum survives;
    *  4. cross-batch near-dup: the batch's band keys join the index's
    *     `bands` table (band, id); candidates verify by exact Jaccard
    *     against the index's `bases` table (id, hashed shingles).
    *     A batch doc near-duplicating ANY ingested doc is dropped.
    *
    * The index lives beside the corpus as two Delta tables
    * (`indexPath/bands`, `indexPath/bases`) appended under the same
    * conditional-commit protocol. Commit ORDER is corpus first — a
    * crash between commits leaves the index missing rows for ingested
    * docs (recoverable: re-create `indexPath` and re-ingest nothing —
    * or rebuild by re-shingling the corpus once), never rows for docs
    * that don't exist.
    *
    * 100 TB: the per-increment cost is the batch's own shingling plus
    * one band-key join against an index whose rows are (32-char key,
    * id) — the corpus-sized state the increment touches is the pruned
    * `content_hash` column and the band index, both tiny next to the
    * text. Banding keeps candidate verification proportional to
    * actual collisions (never all-pairs).
    */
  def ingestIncrementNearDup(
      spark: org.apache.spark.sql.SparkSession,
      corpusPath: String,
      indexPath: String,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 12,
      bands: Int = 6,
      threshold: Double = 0.5): DataFrame = {
    import graft.sources.{DeltaScan, DeltaWrite}
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    val fs = new org.apache.hadoop.fs.Path(corpusPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def isDelta(p: String) =
      fs.exists(new org.apache.hadoop.fs.Path(p, "_delta_log"))
    val corpusExists = isDelta(corpusPath)
    val bandsPath = s"$indexPath/bands"
    val basesPath = s"$indexPath/bases"
    val indexExists = isDelta(bandsPath)

    // 1. in-batch exact
    val hashed = batch.withColumn("content_hash",
      Dedup.contentHash(Seq(batch.col(textCol))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("content_hash").orderBy(col(idCol).asc)
    val exDeduped = hashed
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    // 2. cross-batch exact (pruned single-column probe)
    val fresh =
      if (!corpusExists) exDeduped
      else exDeduped.join(
        DeltaScan.read(spark, corpusPath).select("content_hash"),
        Seq("content_hash"), "left_anti")
    val freshC = fresh.cache() // batch-sized; reused by 3 plan branches

    // shingle + signature ONCE, in a single cache: bases (60-bit hashed
    // shingles) feed the exact-Jaccard verify and the bases index;
    // the minhash signature feeds every band derivation. Band keys are
    // NOT cached — exploding 6 md5s per doc from the cached signature
    // is narrow and cheaper than a second cache materialization job
    // (iterative-workflow wall time is job count, not row count).
    val based = freshC
      .select(col(idCol).as("__id"),
        graft.functions.TextFns
          .hashedWordShingles(col(textCol), shingleSize).as("__bases"))
      .filter(size(col("__bases")) > 0)
      .withColumn("__sig", Dedup.minHashFromBases(col("__bases"), numHashes))
      .cache()
    val sigBands = based
      .select(col("__id"),
        explode(Dedup.bandKeys(col("__sig"), numHashes, bands)).as("__band"))

    def verified(cand: DataFrame, basesB: DataFrame): DataFrame =
      cand
        .join(based.select(col("__id").as("id_a"), col("__bases").as("__ba")),
          Seq("id_a"))
        .join(basesB, Seq("id_b"))
        .withColumn("jaccard",
          size(array_intersect(col("__ba"), col("__bb"))).cast("double") /
            size(array_union(col("__ba"), col("__bb"))))
        .filter(col("jaccard") >= threshold)

    // 3. in-batch near-dup closure
    val l = sigBands.select(col("__band"), col("__id").as("id_a"))
    val r = sigBands.select(col("__band"), col("__id").as("id_b"))
    val cand = l.join(r, Seq("__band"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val inPairs = verified(cand,
      based.select(col("__id").as("id_b"), col("__bases").as("__bb")))
      .select("id_a", "id_b", "jaccard")
    val reps = Dedup.dupClustersClosure(inPairs)
    val dropIn = reps.filter(col("rep") < col("id")).select(col("id").as(idCol))
    val afterIn = freshC.join(dropIn, Seq(idCol), "left_anti")

    // 4. cross-batch near-dup probe against the persisted index
    val afterCross =
      if (!indexExists) afterIn
      else {
        val survBands = sigBands.join(
          afterIn.select(col(idCol).as("__id")), Seq("__id"))
        val candX = survBands
          .join(DeltaScan.read(spark, bandsPath)
            .select(col("band").as("__band"), col("id").as("id_b")), Seq("__band"))
          .select(col("__id").as("id_a"), col("id_b")).distinct()
        val dropX = verified(candX,
          DeltaScan.read(spark, basesPath)
            .select(col("id").as("id_b"), col("bases").as("__bb")))
          .select(col("id_a").as(idCol)).distinct()
        afterIn.join(dropX, Seq(idCol), "left_anti")
      }

    // 5. commit corpus FIRST (source of truth), then the index
    val out = afterCross.select(
      (batch.columns.map(col) :+ col("content_hash")).toIndexedSeq: _*)
    val outC = out.cache()
    // one count on the cached batch (materializes it — a job the first
    // write would run anyway) sizes ALL output files: a small increment
    // must not shatter into one file per task (32 tiny files × 3 tables
    // per ingest = footer/open overhead dominating the commit), and a
    // big one must not funnel through one writer. Row-per-file targets
    // approximate ~128 MB parquet at typical widths (docs ~1 KB/row,
    // band index ~50 B/row, bases ~1 KB/row).
    val nOut = outC.count()
    def sized(df: DataFrame, rows: Long, rowsPerFile: Long): DataFrame = {
      val want = math.max(1L, math.min(rows / rowsPerFile + 1, 4096L)).toInt
      val have = df.rdd.getNumPartitions
      if (want < have) df.coalesce(want) else df
    }
    if (corpusExists) DeltaWrite.append(spark, sized(outC, nOut, 131072L), corpusPath)
    else DeltaWrite.create(spark, sized(outC, nOut, 131072L), corpusPath)
    val keptIds = outC.select(col(idCol).as("__id"))
    val newIdxBands = sized(
      sigBands.join(keptIds, Seq("__id"))
        .select(col("__band").as("band"), col("__id").as("id")),
      nOut * bands, 2000000L)
    val newIdxBases = sized(
      based.join(keptIds, Seq("__id"))
        .select(col("__id").as("id"), col("__bases").as("bases")),
      nOut, 131072L)
    if (indexExists) {
      DeltaWrite.append(spark, newIdxBands, bandsPath)
      DeltaWrite.append(spark, newIdxBases, basesPath)
    } else {
      DeltaWrite.create(spark, newIdxBands, bandsPath)
      DeltaWrite.create(spark, newIdxBases, basesPath)
    }
    freshC.unpersist(); based.unpersist()
    outC
  }
}
