package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`) —
  * north-star extension (SURVEY §7.3 item 6).
  *
  * Two tiers:
  *  - `topKByCosine` — exact brute force: O(n·d) narrow scan + top-k
  *    (TakeOrdered — no full sort, no shuffle of the corpus). The
  *    correctness baseline and still the right choice when the corpus
  *    fits one pass (100 TB of 64-dim floats ≈ one column scan).
  *  - `RandomHyperplaneLsh` — sign-LSH bucketing: queries touch only
  *    matching buckets (+ optional 1-bit multiprobe), then exact rerank.
  *    Bucket assignment is a narrow transformation; the bucketed table
  *    can be written partitioned-by-bucket so a query prunes partitions.
  */
object Similarity {

  /** elementwise-deterministic cosine similarity between two numeric
    * array columns, computed in double (sequential fold — reproducible
    * across engines). Backed by the native codegen'd
    * [[graft.plans.CosineSimilarity]] expression; Spark's own
    * higher-order functions are CodegenFallback (interpreted), see the
    * expression's scaladoc. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftShim
    GraftShim.column(graft.plans.CosineSimilarity(
      GraftShim.expression(a), GraftShim.expression(b)))
  }

  /** elementwise-deterministic dot product (sequential double fold) —
    * native codegen'd [[graft.plans.DotProduct]]; same rationale as
    * [[cosine]]. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftShim
    GraftShim.column(graft.plans.DotProduct(
      GraftShim.expression(a), GraftShim.expression(b)))
  }

  /** the composable higher-order-function formulations — kept as the
    * reference implementations the custom expressions must agree with */
  def dotHof(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0d), (acc, v) => acc + v)

  def cosineHof(a: Column, b: Column): Column = {
    def norm(x: Column): Column =
      sqrt(aggregate(transform(x, p => p.cast("double") * p.cast("double")),
        lit(0d), (acc, v) => acc + v))
    dotHof(a, b) / (norm(a) * norm(b))
  }

  /** SQL registration: `cosine_similarity(a, b)` / `dot_product(a, b)`
    * callable from spark.sql */
  def registerSqlFunctions(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.graftshim.GraftShim.registerFunction(
      spark, "cosine_similarity",
      exprs => graft.plans.CosineSimilarity(exprs(0), exprs(1)))
    org.apache.spark.sql.graftshim.GraftShim.registerFunction(
      spark, "dot_product",
      exprs => graft.plans.DotProduct(exprs(0), exprs(1)))
  }

  /** literal embedding column from a driver-side query vector */
  def vecLit(v: Seq[Float]): Column = array(v.map(x => lit(x)): _*)

  /** Exact top-k by cosine similarity to a query vector. */
  def topKByCosine(
      df: DataFrame,
      embCol: String,
      query: Seq[Float],
      k: Int,
      idCol: String = "vec_id"): DataFrame =
    df.select(
        col(idCol),
        round(cosine(col(embCol), vecLit(query)), 6).as("sim"))
      .orderBy(desc("sim"), col(idCol))
      .limit(k)

  /** ColBERT-style LATE-INTERACTION (MaxSim) retrieval: documents carry
    * an ARRAY of token vectors; the score against a multi-vector query
    * is `Σ_q max_d cos(q, d)` — each query token claims its best
    * document token (Khattab & Zaharia 2020). This is the
    * token-granular retrieval shape single-vector cosine can't express
    * (exact phrase/term matching survives pooling).
    *
    * 100 TB shape: fully NARROW scoring — per row one HOF pass per
    * query token over the document's token vectors (the codegen'd
    * cosine kernel inside), no explode, no join, no shuffle; top-k is
    * TakeOrdered. |query| is bounded (a query's tokens), so per-row
    * cost is |q_tokens|·|d_tokens| kernel calls. Score is rounded to 6
    * decimals for cross-engine order stability (same contract as
    * [[topKByCosine]]); rows with no token vectors are excluded (no
    * evidence). Pre-filter candidates with [[topKByCosine]] over
    * pooled vectors or the LSH/IVF indexes when the corpus outgrows a
    * full scan — MaxSim is the re-ranker in that stack.
    */
  def maxSimTopK(
      df: DataFrame,
      tokVecsCol: String,
      query: Seq[Seq[Float]],
      k: Int,
      idCol: String = "vec_id"): DataFrame = {
    require(query.nonEmpty, "maxSimTopK needs at least one query token vector")
    require(k >= 1, s"k must be >= 1, got $k")
    // nanvl: cosine of a ZERO vector is NaN, and both array_max and a
    // descending sort treat NaN as the LARGEST double — one zero-padded
    // token would otherwise catapult its document to rank 1. A zero
    // vector has no direction: its similarity contribution is 0.
    val score = query.map(q =>
        array_max(transform(col(tokVecsCol),
          d => nanvl(cosine(vecLit(q), d), lit(0.0)))))
      .reduce(_ + _)
    df.filter(size(col(tokVecsCol)) > 0)
      .select(col(idCol), round(score, 6).as("maxsim"))
      .orderBy(desc("maxsim"), col(idCol))
      .limit(k)
  }

  /** Symmetric per-vector int8 quantization — the memory-reduction path
    * for ANN serving at corpus scale: a 64-dim float vector (256 B)
    * becomes 64 bytes + one double scale (4× smaller; 100 TB of
    * embeddings → 25 TB resident). q_i = round(v_i · 127 / max|v|),
    * scale = max|v| / 127, so v_i ≈ q_i · scale and the integer dot
    * product ranks candidates without touching floats (exact int64
    * arithmetic — reproducible on any engine, unlike float sums).
    * All-zero vectors quantize to all-zero with scale 0.
    *
    * Narrow transformation (no shuffle); the quantized column is
    * codegen-friendly array math end to end.
    */
  def quantizeInt8(
      df: DataFrame,
      embCol: String,
      qCol: String = "qvec",
      scaleCol: String = "qscale"): DataFrame = {
    val maxabs = "__graft_maxabs"
    df.withColumn(maxabs,
        array_max(transform(col(embCol), x => abs(x.cast("double")))))
      .withColumn(qCol,
        when(col(maxabs) === 0d,
          transform(col(embCol), _ => lit(0).cast("tinyint")))
        .otherwise(transform(col(embCol),
          x => round(x.cast("double") * lit(127.0) / col(maxabs)).cast("tinyint"))))
      .withColumn(scaleCol,
        when(col(maxabs) === 0d, lit(0d)).otherwise(col(maxabs) / lit(127.0)))
      .drop(maxabs)
  }

  /** Exact int64 dot product of two quantized (integer array) columns.
    * |q_i| ≤ 127 so a 2^39-dim vector would be needed to overflow —
    * safely exact at any real dimensionality. */
  def quantizedDot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (p, q) => p.cast("long") * q.cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** Top-k by quantized dot product against a quantized query vector —
    * the integer-ranking stage of a quantized ANN pipeline (candidates
    * would then be reranked with [[cosine]] on the float column when
    * exact scores matter). TakeOrdered top-k: no corpus shuffle. */
  def topKByQuantizedDot(
      df: DataFrame,
      qCol: String,
      queryQ: Seq[Byte],
      k: Int,
      idCol: String = "vec_id"): DataFrame =
    df.select(
        col(idCol),
        quantizedDot(col(qCol), array(queryQ.map(x => lit(x)): _*)).as("qdot"))
      .orderBy(desc("qdot"), col(idCol))
      .limit(k)

  /** Reconstruction-space cosine from quantized vectors + scales:
    * cos(a,b) of the dequantized vectors. The per-vector scales cancel
    * in cosine, so this is computable from the int8 arrays alone —
    * useful when the float column has been dropped entirely. */
  def quantizedCosine(qa: Column, qb: Column): Column = {
    def norm2(x: Column): Column =
      aggregate(transform(x, p => p.cast("long") * p.cast("long")),
        lit(0L), (acc, v) => acc + v)
    quantizedDot(qa, qb).cast("double") /
      (sqrt(norm2(qa).cast("double")) * sqrt(norm2(qb).cast("double")))
  }

  /** Deterministic pseudo-random hyperplanes: component (p, i) is a
    * seeded uniform in [-0.5, 0.5). No RNG state — reproducible across
    * sessions and cluster sizes. */
  final case class RandomHyperplaneLsh(dim: Int, numPlanes: Int, seed: Long = 42L) {
    val planes: Array[Array[Double]] = {
      val rnd = new scala.util.Random(seed)
      Array.fill(numPlanes, dim)(rnd.nextDouble() - 0.5)
    }

    /** bucket id = sign bits of the plane dot products, packed in a
      * long. Each plane product is the native codegen'd
      * [[graft.plans.DotProduct]] against a literal plane array — the
      * index build stays inside WholeStageCodegen instead of paying the
      * interpreted-HOF tax numPlanes times per row. */
    def bucket(emb: Column): Column = {
      val bits = planes.zipWithIndex.map { case (plane, p) =>
        val d = Similarity.dot(emb, array(plane.map(lit): _*))
        when(d >= 0d, shiftleft(lit(1L), p)).otherwise(lit(0L))
      }
      bits.reduce(_ + _)
    }

    /** interpreted-HOF formulation of [[bucket]] — spec reference only */
    def bucketHof(emb: Column): Column = {
      val bits = planes.zipWithIndex.map { case (plane, p) =>
        val d = Similarity.dotHof(emb, array(plane.map(lit): _*))
        when(d >= 0d, shiftleft(lit(1L), p)).otherwise(lit(0L))
      }
      bits.reduce(_ + _)
    }

    /** Add the bucket column; write the result partitioned/bucketed by
      * `bucket` so queries prune. */
    def index(df: DataFrame, embCol: String): DataFrame =
      df.withColumn("bucket", bucket(col(embCol)))

    /** Materialize the index partitioned BY BUCKET: an `annTopK` over
      * the re-read frame pushes its `bucket IN (probes)` filter into
      * partition pruning — a radius-2 probe of a 2^numPlanes-bucket
      * index reads ~(1 + p + p(p-1)/2)/2^p of the files, not the
      * corpus. This is the 100 TB serving path: build once, prune per
      * query. */
    def writeIndex(df: DataFrame, embCol: String, path: String): Unit =
      index(df, embCol).write.mode("overwrite").partitionBy("bucket").parquet(path)

    /** Re-open a written index (partition column `bucket` restored). */
    def readIndex(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
      spark.read.parquet(path)

    /** ANN top-k: search the query's bucket plus all buckets within
      * `multiprobeRadius` bit flips, exact-rerank candidates. Radius 2
      * (default) probes 1 + p + p(p-1)/2 buckets — recall climbs
      * steeply while reads stay a small fraction of the corpus. */
    def annTopK(
        indexed: DataFrame,
        embCol: String,
        query: Seq[Float],
        k: Int,
        idCol: String = "vec_id",
        multiprobeRadius: Int = 2): DataFrame = {
      val qBucket = bucketOf(query)
      val r1 = (0 until numPlanes).map(b => qBucket ^ (1L << b))
      val r2 =
        if (multiprobeRadius >= 2)
          for { i <- 0 until numPlanes; j <- i + 1 until numPlanes }
            yield qBucket ^ (1L << i) ^ (1L << j)
        else Nil
      val probes = (qBucket +: (r1 ++ r2)).distinct
      indexed
        .filter(col("bucket").isin(probes: _*))
        .select(col(idCol), round(cosine(col(embCol), vecLit(query)), 6).as("sim"))
        .orderBy(desc("sim"), col(idCol))
        .limit(k)
    }

    /** Batched multiprobe ANN: [[annTopK]] for a whole QUERY SET in one
      * declarative plan — no per-query driver loop. `queries` carries
      * (`query_id`, `qvec`); each query's probe buckets are computed
      * EXECUTOR-side (bucket bits via the codegen'd [[bucket]] kernel,
      * multiprobe expansion = XOR against a literal flip-mask array),
      * the bounded probes frame broadcasts into the index join, and
      * per-query rank/limit is a window over only the probed
      * candidates. Identical (rounded cosine, id) total order to the
      * loop form — same top-k sets by construction. */
    def annTopKAll(
        indexed: DataFrame,
        embCol: String,
        queries: DataFrame,
        k: Int,
        idCol: String = "vec_id",
        multiprobeRadius: Int = 2): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val r1 = (0 until numPlanes).map(b => 1L << b)
      val r2 =
        if (multiprobeRadius >= 2)
          for { i <- 0 until numPlanes; j <- i + 1 until numPlanes }
            yield (1L << i) | (1L << j)
        else Nil
      val masks = (0L +: (r1 ++ r2)).distinct
      // distinct masks ⇒ distinct (qbucket XOR mask) per query: the
      // probes frame needs no dedup
      val probes = queries
        .withColumn("__qb", bucket(col("qvec")))
        .select(col("query_id"), col("qvec"), col("__qb"),
          explode(array(masks.map(lit): _*)).as("__m"))
        .select(col("query_id"), col("qvec"),
          expr("__qb ^ __m").as("__probe_bucket"))
      indexed
        .join(broadcast(probes), col("bucket") === col("__probe_bucket"))
        .select(col("query_id"), col(idCol),
          round(Similarity.cosine(col(embCol), col("qvec")), 6).as("sim"))
        .withColumn("__rn", row_number().over(
          Window.partitionBy("query_id").orderBy(desc("sim"), col(idCol))))
        .filter(col("__rn") <= k)
        .select("query_id", idCol, "sim")
    }

    /** driver-side bucket computation for a query vector */
    def bucketOf(v: Seq[Float]): Long =
      planes.zipWithIndex.map { case (plane, p) =>
        val dot = v.zip(plane).map { case (x, w) => x.toDouble * w }.sum
        if (dot >= 0) 1L << p else 0L
      }.sum
  }

  /** IVF index (inverted file): KMeans-partition the corpus; a query
    * probes only the `nprobe` nearest cells. The classic ANN scale
    * path: the index build is one MLlib KMeans fit (sample-based at
    * 100 TB) + one narrow assignment pass; write the result partitioned
    * by `cell` and a probe reads `nprobe/k` of the data. */
  final case class IvfIndex(
      centers: Array[Array[Double]],
      indexed: DataFrame)

  /** Materialize an IVF index partitioned BY CELL (`<path>/data`) with
    * the centroids alongside (`<path>/centers`): an `ivfTopK` over the
    * re-loaded index prunes to the `nprobe` probed cell partitions. */
  def saveIvfIndex(idx: IvfIndex, path: String): Unit = {
    idx.indexed.write.mode("overwrite").partitionBy("cell").parquet(s"$path/data")
    val spark = idx.indexed.sparkSession
    import spark.implicits._
    idx.centers.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell_id", "center")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centers")
  }

  def loadIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex = {
    val centers = spark.read.parquet(s"$path/centers")
      .orderBy("cell_id").collect() // [lint:bounded] k cell centroids (model state, k chosen at build)
      .map(r => r.getSeq[Double](1).toArray)
    IvfIndex(centers, spark.read.parquet(s"$path/data"))
  }

  def ivfIndex(df: DataFrame, embCol: String, k: Int, seed: Long = 42L): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feat = df.withColumn("__features",
      array_to_vector(transform(col(embCol), x => x.cast("double"))))
    val model = new KMeans()
      .setK(k).setSeed(seed).setFeaturesCol("__features").setPredictionCol("cell")
      .fit(feat)
    val indexed = model.transform(feat).drop("__features")
    IvfIndex(model.clusterCenters.map(_.toArray), indexed)
  }

  def ivfTopK(
      idx: IvfIndex,
      embCol: String,
      query: Seq[Float],
      k: Int,
      nprobe: Int,
      idCol: String = "vec_id"): DataFrame = {
    // nearest centroids computed driver-side (centers are tiny)
    val qd = query.map(_.toDouble).toArray
    val cells = idx.centers.zipWithIndex
      .map { case (c, i) =>
        val d = c.zip(qd).map { case (a, b) => (a - b) * (a - b) }.sum
        (i, d)
      }
      .sortBy(_._2).take(nprobe).map(_._1)
    idx.indexed
      .filter(col("cell").isin(cells: _*))
      .select(col(idCol), round(cosine(col(embCol), vecLit(query)), 6).as("sim"))
      .orderBy(desc("sim"), col(idCol))
      .limit(k)
  }

  /** cap · 2^k, saturating at Long.MaxValue (the CASE-chain bounds of
    * the second-level band split — must match any external mirror
    * bit-for-bit, so integer shifts only, no floating point) */
  def capBound(cap: Long, k: Int): Long = {
    val shifted = cap << k
    if ((shifted >> k) != cap || shifted < 0L) Long.MaxValue else shifted
  }

  /** Embedding-cosine near-duplicate pairs: LSH-bucket join (docs in the
    * same bucket) then exact cosine verify — same
    * signature/bucket/verify shape as Dedup.minHashDupPairs. */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double,
      lsh: RandomHyperplaneLsh,
      bands: Int = 1,
      materialize: Dedup.Materialize = Dedup.Materialize.Cache,
      saltBuckets: Int = 1,
      autoSaltThreshold: Long = 4096L,
      pairCapPerBucket: Long = 512L): DataFrame = {
    require(saltBuckets >= 0, s"saltBuckets must be >= 0 (0 = auto), got $saltBuckets")
    require(pairCapPerBucket >= 1,
      s"pairCapPerBucket must be >= 1, got $pairCapPerBucket")
    // Banded sign-LSH (same pigeonhole shape as MinHash banding): split
    // the hyperplanes into `bands` groups; two docs become a candidate
    // pair when ALL sign bits of at least one band agree. More bands →
    // higher recall at a given plane count (1-(1-s^r)^b) while each
    // band join stays an exact-match equi join — never all-pairs.
    require(bands > 0 && lsh.numPlanes % bands == 0,
      s"numPlanes (${lsh.numPlanes}) must be a positive multiple of bands ($bands)")
    // materialize: both join sides read the bucketed index — otherwise
    // the numPlanes×dim bucket dot products would run once per branch
    val based = lsh.index(df.select(col(idCol).as("id"), col(embCol).as("emb")), "emb")
    val (indexed, release) = Dedup.materialized(based, materialize, "id")
    val planesPerBand = lsh.numPlanes / bands
    val bandMask = (1L << planesPerBand) - 1
    // SECOND-LEVEL BAND SPLIT (the quadratic cap): a band bucket of m
    // members emits m² candidate pairs — salting spreads the work but
    // cannot cap it, so a near-dup-dense corpus (template documents,
    // near-zero embeddings) goes quadratic with corpus size. Past
    // `pairCapPerBucket` members, a bucket is split by k additional
    // sign bits drawn from the OTHER bands' planes (k = just enough to
    // bring the expected sub-bucket under the cap), so per-bucket pair
    // emission is bounded by ~cap·m instead of m². Dense buckets are
    // exactly where extra signature agreement is cheapest: true
    // near-dups agree on most planes, while the unrelated bulk of an
    // over-full bucket is what the extra bits shear away. Recall for
    // BORDERLINE pairs in dense buckets drops (adaptive precision —
    // the band OR still gives them `bands` chances); the cap is a
    // scale-safety contract, sized so sub-bucket pair work stays
    // bounded as the corpus grows.
    val maxExtra = lsh.numPlanes - planesPerBand
    val bandArr = array((0 until bands).map { b =>
      // the signature bits OUTSIDE band b, packed: (high bits << b·ppb) | low bits
      val high = shiftright(col("bucket"), (b + 1) * planesPerBand)
      val low =
        if (b == 0) lit(0L)
        else col("bucket").bitwiseAND(lit((1L << (b * planesPerBand)) - 1))
      struct(lit(b).as("band_id"),
        shiftright(col("bucket"), b * planesPerBand).bitwiseAND(bandMask).as("bkey"),
        shiftleft(high, b * planesPerBand).bitwiseOR(low).as("others"))
    }: _*)
    val banded0 = indexed.withColumn("__b", explode(bandArr))
      .select(col("id"), col("__b.band_id").as("band_id"),
        col("__b.bkey").as("bkey"), col("__b.others").as("others"))
    // one aggregation pass sizes every bucket (map-side combine: the
    // shuffle is #distinct-buckets rows, never corpus-sized); k is the
    // integer-exact smallest split bringing cnt under the cap
    val kCol = {
      val first = when(col("count") <= lit(pairCapPerBucket), lit(0))
      (1 until maxExtra).foldLeft(first) { (acc, k) =>
        acc.when(col("count") <= lit(capBound(pairCapPerBucket, k)), lit(k))
      }.otherwise(lit(maxExtra))
    }
    val counts = banded0.groupBy("band_id", "bkey").count()
      .withColumn("__k", kCol)
    val banded = banded0
      .join(counts.select("band_id", "bkey", "__k"), Seq("band_id", "bkey"))
      .withColumn("sub", col("others").bitwiseAND(
        (pow(lit(2.0), col("__k")) - lit(1.0)).cast("long")))
      .select("id", "band_id", "bkey", "sub")
    // candidate ids only through the band self-join; pairs distinct
    // BEFORE re-fetching embedding payloads (a pair colliding in k bands
    // would otherwise pay k cosine evaluations and drag the vectors
    // through the wide stage). saltBuckets splits hot (band_id, bkey,
    // sub) keys — even capped sub-buckets can sit on few tasks — across
    // that many tasks (0 = histogram-probe the banded frame first; the
    // probe reads the materialized index, not the raw corpus).
    val joinKeys = Seq("band_id", "bkey", "sub")
    val resolvedSalt =
      if (saltBuckets == 0)
        ScaleOps.autoSaltBucketsKeys(banded, joinKeys, autoSaltThreshold)
      else saltBuckets
    val l = banded.select(col("band_id"), col("bkey"), col("sub"), col("id").as("id_a"))
    val r = banded.select(col("band_id"), col("bkey"), col("sub"), col("id").as("id_b"))
    val joined =
      if (resolvedSalt <= 1) l.join(r, joinKeys)
      else {
        val (sl, sr, keys) = ScaleOps.saltedForJoinKeys(l, r, joinKeys, resolvedSalt)
        sl.join(sr, keys)
      }
    val cand = joined
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val pairs = cand
      .join(indexed.select(col("id").as("id_a"), col("emb").as("emb_a")), Seq("id_a"))
      .join(indexed.select(col("id").as("id_b"), col("emb").as("emb_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("emb_a"), col("emb_b")), 6).as("sim"))
      .filter(col("sim") >= threshold)
    Dedup.finish(pairs, materialize, release)
  }

  /** RECALL@k measurement for an approximate retrieval path — the
    * tuning loop every ANN deployment needs (you size numPlanes /
    * probes / nlist by MEASURED recall on a held-out query set, not by
    * guessing): for each query, the fraction of the EXACT brute-force
    * top-k ([[topKByCosine]]) the approximate path recovers.
    *
    * Both sides rank by the same total order (cosine rounded to 6
    * decimals, then id), so the top-k SETS are deterministic and the
    * report is exact integers — gate-able across engines.
    *
    * Scale shape: the query set is BOUNDED (an eval set, like
    * decontamination benchmarks) — the driver loop issues one narrow
    * scan + TakeOrdered pair per query and collects only 2k ids per
    * query. The corpus is never shuffled and never collected. For
    * corpus-sized query sets, self-join the index instead
    * ([[embeddingNearDupPairs]] shape).
    *
    * @param approxOf the ANN path under test: query vector → (idCol,
    *                 sim) frame, e.g. `v => lsh.annTopK(indexed,
    *                 "embedding", v, k)`
    * @return one row per query: (query_id, hits, k) — recall@k =
    *         hits / k
    */
  def recallReport(
      df: DataFrame,
      embCol: String,
      queryIds: Seq[Long],
      k: Int,
      approxOf: Seq[Float] => DataFrame,
      idCol: String = "vec_id",
      maxQueries: Int = 64): DataFrame = {
    require(queryIds.nonEmpty, "need at least one query id")
    require(k >= 1, s"k must be >= 1, got $k")
    // each query id costs one exact-top-k job + one approx job from
    // the driver — fine for a handful, pathological for a sweep; the
    // batched form runs any query-set size in one composed plan
    require(queryIds.size <= maxQueries,
      s"recallReport's loop form issues 2 driver jobs PER QUERY — " +
        s"${queryIds.size} queries exceeds maxQueries=$maxQueries; use " +
        "recallReportBatch (one composed plan for the whole query set), " +
        "or raise maxQueries explicitly if you accept the job storm")
    val spark = df.sparkSession
    import spark.implicits._
    // ONE job fetches every query vector (was one filter+head job per
    // query — a third of the loop's driver jobs for the same rows);
    // the per-query exact/approx job pair is the loop form's contract
    val qVecs = df.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol), col(embCol))
      .collect() // [lint:bounded] ≤ maxQueries rows
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val rows = queryIds.map { qid =>
      val q = qVecs.getOrElse(qid,
        throw new NoSuchElementException(s"query id $qid not found in corpus"))
      val exact = topKByCosine(df, embCol, q, k, idCol)
        .select(idCol).collect().map(_.getLong(0)).toSet
      val approx = approxOf(q)
        .select(idCol).collect().map(_.getLong(0)).toSet
      (qid, (exact & approx).size.toLong, k.toLong)
    }
    rows.toDF("query_id", "hits", "k")
  }

  /** Batched exact top-k: [[topKByCosine]] for a whole query set in one
    * declarative plan. `queries` carries (`query_id`, `qvec`) and is
    * BROADCAST into a cross join — the corpus is scanned ONCE (vs once
    * per query in the loop form) and only the narrow scored (query_id,
    * id, sim) rows shuffle for the per-query window rank. Shuffle
    * volume is |corpus| × |queries| ~24-byte rows: the eval-set shape
    * (bounded |queries|). Same (rounded cosine, id) total order as
    * [[topKByCosine]] — identical top-k sets. */
  def topKByCosineAll(
      df: DataFrame,
      embCol: String,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.select(col(idCol), col(embCol))
      .crossJoin(broadcast(queries))
      .select(col("query_id"), col(idCol),
        round(cosine(col(embCol), col("qvec")), 6).as("sim"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("sim"), col(idCol))))
      .filter(col("__rn") <= k)
      .select("query_id", idCol, "sim")
  }

  /** Batched [[recallReport]]: the whole query set in ONE composed plan
    * — exact side scans the corpus once ([[topKByCosineAll]]), the
    * approximate side is any batched retrieval of the same (query_id,
    * id) shape (e.g. [[RandomHyperplaneLsh.annTopKAll]]), hits are an
    * equi-join + count. A 10k-query tuning sweep is O(2 passes), not
    * 20k driver-issued jobs. Produces the same (query_id, hits, k)
    * rows as the loop form — spec-proven equal.
    *
    * @param annAll batched ANN path: queries frame (query_id, qvec) →
    *               per-query top-k candidates carrying (query_id, idCol)
    */
  def recallReportBatch(
      df: DataFrame,
      embCol: String,
      queryIds: Seq[Long],
      k: Int,
      annAll: DataFrame => DataFrame,
      idCol: String = "vec_id"): DataFrame = {
    require(queryIds.nonEmpty, "need at least one query id")
    require(k >= 1, s"k must be >= 1, got $k")
    val queries = df.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(embCol).as("qvec"))
    val exact = topKByCosineAll(df, embCol, queries, k, idCol)
      .select("query_id", idCol)
    val approx = annAll(queries).select(col("query_id"), col(idCol))
    val hits = exact.join(approx, Seq("query_id", idCol))
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    // left join back so zero-hit queries still report (hits = 0)
    queries.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        lit(k.toLong).as("k"))
  }
}
