package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Deduplication operators for training-data pipelines (north-star
  * extension; SURVEY §7.3 item 6). All variants follow the same
  * scale shape:
  *
  *   1. per-row signature (narrow, codegen'd, no shuffle)
  *   2. candidate generation via bucket join (ONE shuffle on the bucket
  *      key — never an O(n²) cross join)
  *   3. exact verification only on candidates (tiny fraction of pairs)
  *
  * At 100 TB the bucket join is the only wide stage; skewed buckets
  * (e.g. boilerplate shingles) are bounded by the band construction and
  * can be salted / AQE-skew-handled.
  */
object Dedup {

  /** The 128-bit content identity used by exact dedup and incremental
    * ingest: md5 over the columns joined with a \u0001 separator and
    * NULL mapped to \u0000 — bare concatenation would collide
    * ("ab","") with ("a","b") and NULL with "", silently deleting
    * distinct rows. For a single non-null string column this is plain
    * `md5(col)` (mirrorable as such). */
  def contentHash(contentCols: Seq[Column]): Column =
    md5(concat_ws("\u0001",
      contentCols.map(c => coalesce(c.cast("string"), lit("\u0000"))): _*))

  /** Exact dedup: keep the lowest-id row per identical content hash.
    * One shuffle on the 128-bit content hash; ties broken by id so the
    * survivor set is deterministic. */
  def exactDedup(df: DataFrame, idCol: String, contentCols: Seq[String]): DataFrame = {
    val h = contentHash(contentCols.map(df.col))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(h).orderBy(df.col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** How a pair-finder materializes its per-row signature payload —
    * the piece that is read by 2-3 plan branches (signature pass + both
    * verify joins) and must NOT be recomputed per branch.
    *
    *  - [[Materialize.Cache]] (default): eager MEMORY_AND_DISK cache
    *    through the CacheManager — released by the finisher, and an
    *    evicted block recomputes from source (unlike localCheckpoint,
    *    whose truncated lineage turns eviction into data loss). Right
    *    for interactive/bench scale.
    *  - [[Materialize.BucketedTable]]: write-then-read a parquet table
    *    bucketed+sorted by `id` via [[ScaleOps.saveBucketed]] — the
    *    100 TB path: nothing pinned in executor memory, and the verify
    *    joins on id hit the bucketed layout without a shuffle of the
    *    payload side.
    *  - [[Materialize.None]]: fully lazy; the caller owns caching.
    */
  sealed trait Materialize
  object Materialize {
    case object Cache extends Materialize
    final case class BucketedTable(table: String, numBuckets: Int) extends Materialize
    case object None extends Materialize
  }

  /** @return (materialized frame, release thunk to free it) */
  private[operators] def materialized(
      df: DataFrame, m: Materialize, idCol: String): (DataFrame, () => Unit) = m match {
    case Materialize.Cache =>
      val c = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count() // eager
      (c, () => { c.unpersist(); () })
    case Materialize.BucketedTable(t, n) =>
      ScaleOps.saveBucketed(df, t, Seq(idCol), n, sortKeys = Seq(idCol))
      (df.sparkSession.table(t), () => ())
    case Materialize.None => (df, () => ())
  }

  /** Eager-result-and-release contract (pair finders): when the inputs
    * were materialized, run the whole pipeline ONCE now, keep only the
    * (small) cached pair result, and free the intermediate blocks —
    * repeated calls in one session can't accumulate cached corpora.
    * Callers drop the result's own cache with `result.unpersist()`.
    * With [[Materialize.None]] the result stays fully lazy. */
  private[operators] def finish(pairs: DataFrame, m: Materialize, release: () => Unit): DataFrame =
    m match {
      case Materialize.None => pairs
      case _ =>
        val out = pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        out.count() // eager — consumes the materialized inputs now
        release()
        out
    }

  /** Universal-hash family over a Mersenne prime: h_i(x) = (a_i·x + b_i)
    * mod p. ONE expensive portable hash per shingle (the base), then
    * `numHashes` cheap arithmetic mixes — 12× fewer md5 evaluations
    * than seed-prefixed hashing, and still bit-reproducible in SQL. */
  val MinHashP: Long = 2147483647L // 2^31 - 1
  def hashParams(numHashes: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numHashes)((rnd.nextInt(Int.MaxValue - 1).toLong + 1, rnd.nextInt(Int.MaxValue).toLong))
  }

  /** 60-bit portable hashes of the (already-distinct) shingle set — the
    * ONE md5 pass. These longs stand in for the shingles everywhere
    * downstream: signature mixes AND the exact-Jaccard verify (Jaccard
    * over the hashed sets equals string Jaccard up to 2^-60 collisions,
    * and the DuckDB oracle mirrors the hashing so the gate is exact). */
  def hashedShingles(shingles: Column): Column =
    array_distinct(transform(shingles, s => TextFns.portableHash(s)))

  /** signature from materialized 60-bit hashes: each is first reduced
    * mod p (so a·x + b stays < 2^62), then mixed per hash function */
  def minHashFromBases(bases: Column, numHashes: Int, seed: Long = 42L): Column = {
    import org.apache.spark.sql.graftshim.GraftShim
    // native kernel (graft.plans.MinHashSignature): one codegen'd pass
    // over the bases computes all k running mins — bit-identical to the
    // k-fold array_min(transform(...)) HOF it replaces, minus the
    // numHashes × |bases| interpreted lambda dispatches
    GraftShim.column(
      graft.plans.MinHashSignature(GraftShim.expression(bases), numHashes, seed))
  }

  /** convenience: signature straight from the shingle array. Prefer
    * materializing `hashedShingles` as a column first in multi-use plans
    * so the md5 pass isn't duplicated per plan branch. */
  def minHashSignature(shingles: Column, numHashes: Int): Column =
    minHashFromBases(hashedShingles(shingles), numHashes)

  /** LSH banding: split the signature into `bands` groups of
    * `numHashes/bands` values; band key = md5(bandIdx ++ values).
    * Two docs collide on a band key iff that band of their signatures
    * is identical. */
  def bandKeys(sig: Column, numHashes: Int, bands: Int): Column = {
    require(bands > 0 && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands) — " +
        "otherwise band keys degenerate (constant key = all-pairs cross join) " +
        "or trailing hashes are silently dropped")
    val rows = numHashes / bands
    array((0 until bands).map { b =>
      md5(concat_ws(",",
        (lit(s"$b") +: (0 until rows).map(r => element_at(sig, b * rows + r + 1).cast("string"))): _*))
    }: _*)
  }

  /** Near-duplicate PAIRS via MinHash + LSH + exact-Jaccard verify.
    *
    * @return (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold
    */
  /** `saltBuckets`: 1 = no salting, N>1 = manual salt factor for hot
    * band keys, 0 = AUTO — histogram-probe the band key
    * ([[ScaleOps.autoSaltBuckets]], one cheap agg on the materialized
    * signature frame) and salt only if some band exceeds
    * `autoSaltThreshold` docs (a band with n docs is an n² join task;
    * boilerplate-heavy corpora routinely put thousands of docs on one
    * band). */
  def minHashDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 12,
      bands: Int = 6,
      threshold: Double = 0.5,
      materialize: Materialize = Materialize.Cache,
      saltBuckets: Int = 1,
      autoSaltThreshold: Long = 4096L): DataFrame = {
    require(saltBuckets >= 0, s"saltBuckets must be >= 0 (0 = auto), got $saltBuckets")
    // Small inputs often arrive as fewer splits than cores (a single
    // parquet file at bench scale); the shingling pass is the expensive
    // stage, so spread it. At corpus scale input splits >> cores and
    // this is a no-op.
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    val src = if (df.rdd.getNumPartitions < parallelism) df.repartition(parallelism) else df
    // ONE native pass (HashedWordShingles) tokenizes, shingles, and
    // md5-hashes each doc down to a compact set of 60-bit longs — the
    // ONLY payload kept. The strings never leave this stage, so the
    // materialized state is ~8 bytes/shingle, and both the signature
    // mixes and the exact verify below run on cheap long arrays.
    // Materializing here (eager checkpoint or bucketed table) truncates
    // the md5-heavy lineage: without it Catalyst re-runs the hashing
    // once per downstream plan branch.
    val based = src
      .select(src.col(idCol).as("id"),
        TextFns.hashedWordShingles(src.col(textCol), shingleSize).as("bases"))
      .filter(size(col("bases")) > 0)
    val (hashed, release) = materialized(based, materialize, "id")
    val sig = hashed
      .withColumn("sig", minHashFromBases(col("bases"), numHashes))
      .withColumn("band", explode(bandKeys(col("sig"), numHashes, bands)))
      .select("band", "id")
    // candidate ids only through the band self-join (pairs distinct
    // BEFORE re-fetching hashed-shingle payloads — keeps the wide stage
    // narrow). saltBuckets > 1 splits hot band keys (boilerplate-heavy
    // corpora put thousands of docs on one band) across that many tasks
    // via ScaleOps.saltedForJoin — the replicated side guarantees the
    // pair set is IDENTICAL to the unsalted join, only the task-level
    // skew changes.
    val resolvedSalt =
      if (saltBuckets == 0) ScaleOps.autoSaltBuckets(sig, "band", autoSaltThreshold)
      else saltBuckets
    val l = sig.select(col("band"), col("id").as("id_a"))
    val r = sig.select(col("band"), col("id").as("id_b"))
    val joined =
      if (resolvedSalt <= 1) l.join(r, Seq("band"))
      else {
        val (sl, sr, keys) = ScaleOps.saltedForJoin(l, r, "band", resolvedSalt)
        sl.join(sr, keys)
      }
    val cand = joined
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val withSh = cand
      .join(hashed.select(col("id").as("id_a"), col("bases").as("b_a")), Seq("id_a"))
      .join(hashed.select(col("id").as("id_b"), col("bases").as("b_b")), Seq("id_b"))
    val pairs = withSh
      .withColumn("jaccard",
        size(array_intersect(col("b_a"), col("b_b"))).cast("double") /
          size(array_union(col("b_a"), col("b_b"))))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
    finish(pairs, materialize, release)
  }

  /** Collapse dup pairs into clusters by min-representative propagation:
    * every id maps to the smallest id it is paired with (one pass).
    * See dupClustersClosure for the transitive fixpoint. */
  def dupClusters(pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("id_b").as("id"), col("id_a").as("rep"))
    edges.groupBy("id").agg(min("rep").as("rep"))
  }

  /** Connected components over the dup-pair graph by iterated min-label
    * propagation WITH pointer jumping: each round every node adopts the
    * minimum of (its rep, its neighbors' reps, its rep's rep). The
    * neighbor step alone converges in O(component diameter) rounds; the
    * rep-of-rep "jump" halves the remaining label-tree depth each round,
    * giving true O(log n) convergence — a diameter-2^16 chain finishes
    * in ~17 rounds, not 2^16. Each round is two id-keyed joins + one
    * aggregate (all shuffles on the same key), labels are
    * localCheckpoint'ed (lineage truncated, prior round unpersisted);
    * non-convergence within maxIter throws rather than returning wrong
    * cluster labels.
    *
    * @return (id, rep) for every node appearing in `pairs`, rep = min
    *         id of its component
    */
  def dupClustersClosure(
      pairs: DataFrame, maxIter: Int = 20, localEdgeLimit: Long = 2000000L): DataFrame = {
    require(localEdgeLimit >= 0 && localEdgeLimit <= Int.MaxValue - 1,
      s"localEdgeLimit must be in [0, ${Int.MaxValue - 1}], got $localEdgeLimit — " +
        "the edge fetch goes through a 32-bit LIMIT; pass 0 to force the distributed path")
    val spark = pairs.sparkSession
    // Near-dup PAIRS are the output of a massive reduction — usually
    // orders of magnitude smaller than the corpus. Below
    // `localEdgeLimit` edges (~100 bytes of Row overhead each → ≤
    // ~200 MB driver at the default) a driver-side union-find answers
    // in ONE job instead of an iterative join loop whose many small
    // jobs maximize exposure to scheduler / block-manager hiccups. The
    // distributed loop remains for genuinely huge pair graphs.
    //
    // Ids keep their ORIGINAL type in both paths (same output schema):
    // the union-find runs on the raw values with an ordering that
    // matches Spark's own `min`/`least` for that type — integrals by
    // value, strings by unsigned UTF-8 bytes (UTF8String.binaryCompare,
    // NOT java.lang.String's UTF-16 order, which disagrees above the
    // BMP). Types without a pinned matching order fall through to the
    // distributed path, where Spark itself does the comparing.
    val idType = pairs.schema("id_a").dataType
    import org.apache.spark.sql.types._
    val localOrd: Option[Ordering[Any]] = idType match {
      case ByteType | ShortType | IntegerType | LongType =>
        Some(Ordering.by((v: Any) => v.asInstanceOf[Number].longValue))
      case StringType =>
        Some(new Ordering[Any] {
          def compare(a: Any, b: Any): Int = {
            val x = a.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
            val y = b.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
            var i = 0; val n = math.min(x.length, y.length)
            while (i < n) {
              val d = (x(i) & 0xff) - (y(i) & 0xff)
              if (d != 0) return d
              i += 1
            }
            x.length - y.length
          }
        })
      case _ => scala.None
    }
    // ONE action decides the path AND fetches the edges: collect through
    // a limit of localEdgeLimit+1 — bounded driver memory, and no
    // separate count job (each extra job is pure exposure to scheduler
    // hiccups in an iterative op). If the graph exceeds the limit the
    // fetched prefix is discarded and the distributed loop recomputes —
    // the price of not running a separate count.
    val limited =
      if (localOrd.isDefined && localEdgeLimit > 0)
        pairs.select("id_a", "id_b").limit(localEdgeLimit.toInt + 1).collect()
      else Array.empty[org.apache.spark.sql.Row]
    if (localOrd.isDefined && localEdgeLimit > 0 && limited.length <= localEdgeLimit) {
      implicit val ord: Ordering[Any] = localOrd.get
      val es = limited.map(r => (r.get(0), r.get(1)))
      val parent = scala.collection.mutable.HashMap.empty[Any, Any]
      def find(x: Any): Any = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != r) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { // union by MIN id so the rep is the component minimum
          if (ord.lt(ra, rb)) parent(rb) = ra else parent(ra) = rb
        }
        parent.getOrElseUpdate(a, find(a)); parent.getOrElseUpdate(b, find(b))
      }
      val nodes = es.iterator.flatMap { case (a, b) => Iterator(a, b) }.toSet
      val schema = StructType(Seq(
        StructField("id", idType, nullable = false),
        StructField("rep", idType, nullable = false)))
      val rows = nodes.toSeq.sorted
        .map(x => org.apache.spark.sql.Row(x, find(x)))
      return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
    }

    // Distributed path: min-label propagation + pointer jumping. Each
    // round must BOTH cache its result (read by 3 plan branches next
    // round) AND truncate the logical plan — persist alone leaves the
    // lineage in the plan and the analyzer goes exponential (~3× plan
    // growth per round); localCheckpoint truncates but its blocks can't
    // be freed and evict to data loss. So: persist + eager count for
    // the data, then wrap the round in a LogicalRDD leaf
    // (createDataFrame over the cached RDD) — truncated plan,
    // releasable cache, recompute via RDD lineage on eviction.
    def eager(d: DataFrame): (DataFrame, DataFrame) = {
      val c = d.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count()
      // InternalRow leaf (no Row round-trip per round) — see GraftShim
      (org.apache.spark.sql.graftshim.GraftShim.internalDf(c), c)
    }
    // undirected edge list, plus self-loops so roots survive aggregation
    val (edges, edgesCache) = eager(
      pairs.select(col("id_a").as("a"), col("id_b").as("b"))
        .union(pairs.select(col("id_b").as("a"), col("id_a").as("b")))
        .distinct())
    var (labels, labelsCache) = eager(
      edges.groupBy(col("a").as("id"))
        .agg(least(min(col("b")), first(col("a"))).as("rep")))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // propagate: rep = min(rep, neighbors' reps)
      val neighborReps = edges
        .join(labels.withColumnsRenamed(Map("id" -> "b", "rep" -> "nrep")), Seq("b"))
        .groupBy(col("a").as("id")).agg(min(col("nrep")).as("prop"))
      val propagated = labels.join(neighborReps, Seq("id"), "left")
        .select(col("id"), least(col("rep"), coalesce(col("prop"), col("rep"))).as("rep"))
      // jump: rep = min(rep, rep's rep) — pointer halving on the label
      // forest (every rep is itself a node id, so the lookup total-joins)
      val (next, nextCache) = eager(propagated
        .join(
          propagated.select(col("id").as("__rid"), col("rep").as("__rrep")),
          propagated.col("rep") === col("__rid"), "left")
        .select(col("id"), least(col("rep"), coalesce(col("__rrep"), col("rep"))).as("rep")))
      val changed = next.join(labels.withColumnRenamed("rep", "old"), Seq("id"))
        .filter(col("rep") =!= col("old")).limit(1).count()
      labelsCache.unpersist()
      labels = next
      labelsCache = nextCache
      converged = changed == 0
      iter += 1
    }
    edgesCache.unpersist()
    if (!converged) throw new IllegalStateException(
      s"dupClustersClosure did not converge in $maxIter rounds — " +
        "with pointer jumping rounds grow ~log2(component size); raise maxIter " +
        "for astronomically deep label forests")
    // the persisted handle (not the leaf) so callers can unpersist it
    labelsCache
  }

  /** SimHash: `numBits`-bit signature; bit i is the sign of the sum of
    * ±1 contributions of each token's hash bit i. Pure higher-order
    * expressions (numBits × |tokens| bit tests per doc).
    *
    * Takes a MATERIALIZED token-hash array column — pass
    * `transform(tokens, xxhash64)` via withColumn first; an inline
    * expression would be re-evaluated per bit (numBits×). */
  def simHashFromHashes(hashes: Column, numBits: Int = 64): Column = {
    require(numBits >= 1 && numBits <= 64, s"numBits must be in [1,64], got $numBits")
    // bit positions unrolled Scala-side (shift amounts must be static);
    // the per-bit sums are disjoint, so their + is exact bitwise OR
    val bitCols = (0 until numBits).map { i =>
      val bitSum = aggregate(
        hashes,
        lit(0L),
        (a, h) => a + when(shiftright(h, i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(bitSum >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Convenience for one-shot use; see simHashFromHashes for the
    * per-row recompute trap. */
  def simHash(text: Column): Column =
    simHashFromHashes(transform(TextFns.tokens(text), t => xxhash64(t)))

  /** SimHash near-dup candidates: band the 64 bits into 4 × 16-bit
    * chunks; docs within Hamming distance 3 must agree on ≥1 chunk
    * (pigeonhole), so an exact-match join per chunk finds all of them.
    * Verify with true Hamming distance via bit_count(xor). */
  def simHashDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      numBits: Int = 64,
      chunks: Int = 4,
      portable: Boolean = false,
      materialize: Materialize = Materialize.Cache,
      saltBuckets: Int = 1,
      autoSaltThreshold: Long = 4096L): DataFrame = {
    require(numBits % chunks == 0 && numBits <= 64 && chunks > 0,
      s"numBits ($numBits) must be a positive multiple of chunks ($chunks), <= 64")
    // pigeonhole guarantee: two docs within Hamming distance < `chunks`
    // must agree on >= 1 chunk; candidates beyond that rely on luck.
    // portable=true swaps xxhash64 for the md5-derived 60-bit hash so a
    // SQL oracle can reproduce the signature bit-for-bit. The signature
    // is ONE native pass per row (plans/SimHash64 — bit-identical to
    // the simHashFromHashes HOF formulation, which costs numBits
    // interpreted passes per row).
    // materialize: both sides of the chunk self-join read the signatures
    val based = df
      .select(df.col(idCol).as("id"),
        TextFns.simHash(df.col(textCol), numBits, portable).as("sig"))
    val (sigs, release) = materialized(based, materialize, "id")
    finish(hammingJoin(sigs, maxHamming, numBits, chunks, saltBuckets, autoSaltThreshold),
      materialize, release)
  }

  /** Pigeonhole Hamming self-join over a 64-bit signature frame
    * `(id, sig)`: band into `chunks` equal slices, exact-match join per
    * slice (any pair within Hamming < chunks shares ≥1 slice), verify
    * with the true `bit_count(xor)`. Shared by SimHash text near-dup
    * and perceptual-hash image near-dup — identical scale shape: one
    * shuffle on (chunk_id, chunk), never all-pairs. */
  private def hammingJoin(
      sigs: DataFrame, maxHamming: Int, numBits: Int, chunks: Int,
      saltBuckets: Int = 1, autoSaltThreshold: Long = 4096L): DataFrame = {
    require(saltBuckets >= 0, s"saltBuckets must be >= 0 (0 = auto), got $saltBuckets")
    val chunkBits = numBits / chunks
    val mask = (1L << chunkBits) - 1
    val chunkArr = array((0 until chunks).map { c =>
      struct(lit(c).as("chunk_id"),
        shiftright(col("sig"), c * chunkBits).bitwiseAND(mask).as("chunk"))
    }: _*)
    val chunked = sigs.withColumn("__c", explode(chunkArr))
      .select(col("id"), col("sig"), col("__c.chunk_id").as("chunk_id"), col("__c.chunk").as("chunk"))
    val l = chunked.select(col("chunk_id"), col("chunk"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = chunked.select(col("chunk_id"), col("chunk"), col("id").as("id_b"), col("sig").as("sig_b"))
    // band keys are power-law distributed on real crawls (boilerplate
    // puts thousands of near-identical signatures on one (chunk_id,
    // chunk) key → an n² hot task); salting splits the hot key across
    // `saltBuckets` tasks with the pair set IDENTICAL by construction
    // (the replicated side meets every salt)
    val resolvedSalt =
      if (saltBuckets == 0)
        ScaleOps.autoSaltBucketsKeys(chunked, Seq("chunk_id", "chunk"), autoSaltThreshold)
      else saltBuckets
    val joined =
      if (resolvedSalt <= 1) l.join(r, Seq("chunk_id", "chunk"))
      else {
        val (sl, sr, keys) =
          ScaleOps.saltedForJoinKeys(l, r, Seq("chunk_id", "chunk"), resolvedSalt)
        sl.join(sr, keys)
      }
    joined
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Near-duplicate IMAGE pairs via perceptual hash: re-encoded,
    * brightness-shifted, or lightly-watermarked copies of an image
    * survive exact byte dedup but land within small Hamming distance of
    * each other's aHash/dHash ([[graft.plans.PerceptualImageHash]]).
    * Undecodable payloads (NULL signature) are excluded — they can't be
    * perceptually compared; route them to exact byte dedup instead.
    * Same banded pigeonhole join as [[simHashDupPairs]] — one shuffle,
    * never all-pairs, so the 100 TB shape holds. */
  def imageDupPairs(
      df: DataFrame,
      idCol: String,
      mediaCol: String,
      kind: String = "dhash",
      maxHamming: Int = 3,
      chunks: Int = 4,
      materialize: Materialize = Materialize.Cache,
      saltBuckets: Int = 1): DataFrame =
    signatureDupPairs(df, idCol,
      Multimodal.imageHash(df.col(mediaCol), kind), maxHamming, chunks, materialize,
      saltBuckets)

  /** Near-duplicate AUDIO pairs via the gain-invariant acoustic
    * fingerprint ([[graft.plans.AudioFingerprint]]): re-encoded or
    * volume-normalized copies of a recording land within small Hamming
    * distance. Same pigeonhole shape and NULL-signature exclusion as
    * [[imageDupPairs]]. */
  def audioDupPairs(
      df: DataFrame,
      idCol: String,
      mediaCol: String,
      maxHamming: Int = 3,
      chunks: Int = 4,
      materialize: Materialize = Materialize.Cache,
      saltBuckets: Int = 1): DataFrame =
    signatureDupPairs(df, idCol,
      Multimodal.audioFingerprint(df.col(mediaCol)), maxHamming, chunks, materialize,
      saltBuckets)

  /** Near-duplicate VIDEO pairs via per-frame perceptual hashes
    * ([[graft.plans.VideoFrameHashes]]), frame-index-ALIGNED: candidate
    * generation pigeonhole-joins on (frame index, signature chunk), so
    * two clips pair up when ≥ `minMatches` of their aligned sampled
    * frames land within `maxHamming` bits. Alignment keeps the join
    * narrow (a frame only meets the SAME index's frames — no cross
    * product over frame pairs) and matches the re-encode/
    * brightness-shift dup model; offset clips are a recall trade-off,
    * documented. Output: (id_a, id_b, n_matches, max_hamming).
    * Undecodable payloads explode to zero rows and drop out. */
  def videoDupPairs(
      df: DataFrame,
      idCol: String,
      mediaCol: String,
      kind: String = "ahash",
      frameStride: Int = 1,
      maxHamming: Int = 3,
      minMatches: Long = 1L,
      chunks: Int = 4,
      materialize: Materialize = Materialize.Cache): DataFrame = {
    require(64 % chunks == 0 && chunks > 0, s"chunks ($chunks) must divide 64")
    val based = df.select(
      df.col(idCol).as("id"),
      posexplode(Multimodal.videoFrameHashes(df.col(mediaCol), kind, frameStride))
        .as(Seq("frame_idx", "sig")))
    val (sigs, release) = materialized(based, materialize, "id")
    val chunkBits = 64 / chunks
    val mask = (1L << chunkBits) - 1
    val chunkArr = array((0 until chunks).map { c =>
      struct(lit(c).as("chunk_id"),
        shiftright(col("sig"), c * chunkBits).bitwiseAND(mask).as("chunk"))
    }: _*)
    val chunked = sigs.withColumn("__c", explode(chunkArr))
      .select(col("id"), col("frame_idx"), col("sig"),
        col("__c.chunk_id").as("chunk_id"), col("__c.chunk").as("chunk"))
    val l = chunked.select(col("frame_idx"), col("chunk_id"), col("chunk"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val r = chunked.select(col("frame_idx"), col("chunk_id"), col("chunk"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    val framePairs = l.join(r, Seq("frame_idx", "chunk_id", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("frame_idx"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
    val pairs = framePairs.groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_matches"), max(col("hamming")).as("max_hamming"))
      .filter(col("n_matches") >= minMatches)
    finish(pairs, materialize, release)
  }

  /** shared driver for media near-dup: compute a 64-bit signature
    * column, drop NULLs (undecodable payloads can't be perceptually
    * compared — route those to exact byte dedup), pigeonhole-join */
  private def signatureDupPairs(
      df: DataFrame,
      idCol: String,
      sig: Column,
      maxHamming: Int,
      chunks: Int,
      materialize: Materialize,
      saltBuckets: Int = 1,
      autoSaltThreshold: Long = 4096L): DataFrame = {
    require(64 % chunks == 0 && chunks > 0, s"chunks ($chunks) must divide 64")
    val based = df
      .select(df.col(idCol).as("id"), sig.as("sig"))
      .filter(col("sig").isNotNull)
    val (sigs, release) = materialized(based, materialize, "id")
    finish(hammingJoin(sigs, maxHamming, 64, chunks, saltBuckets, autoSaltThreshold),
      materialize, release)
  }

  /** n-gram Jaccard similarity for a candidate pair set (exact verify
    * primitive; also usable standalone on a pre-filtered subset). */
  def ngramJaccard(shA: Column, shB: Column): Column =
    size(array_intersect(shA, shB)).cast("double") / size(array_union(shA, shB))

  /** EXACT set-similarity self-join by PREFIX FILTERING (Chaudhuri 2006
    * SSJoin / Xiao 2008 PPJoin, distributed per Vernica 2010): every
    * pair with Jaccard(sets) ≥ num/den — recall 1.0 BY CONSTRUCTION,
    * the deterministic complement of the probabilistic MinHash/SimHash
    * banding paths (use those when approximate recall is acceptable
    * and sets are huge; use this when the pair list must be complete).
    *
    * The theorem: order every set by one GLOBAL token order and keep
    * only each set's first `|s| − ⌈t·|s|⌉ + 1` tokens (its "prefix");
    * any pair with J ≥ t shares at least one prefix token. Rarest-first
    * ordering makes prefixes collide as little as the data allows —
    * the candidate join is an equi join on prefix tokens, never
    * all-pairs. A length filter (`den·min ≥ num·max`, exact cross
    * multiply) prunes before the distinct; exact verification keeps
    * `|A∩B|·den ≥ num·|A∪B|`. ⌈t·n⌉ = (num·n + den − 1) div den —
    * integer-exact, so the candidate set and the final pair list are
    * engine- and partitioning-independent.
    *
    * 100 TB shape: one token-frequency aggregation (the term-count
    * shuffle every similarity engine pays once), one doc-key regroup to
    * order the sets, one prefix-token equi join, one pair-key refetch —
    * the [[minHashDupPairs]] shape with exact recall. Zipf means hot
    * prefix tokens are RARE tokens (by construction), so the join keys
    * are near-uniform.
    *
    * @param setCol array column treated as a set (deduped here)
    * @return (id_a, id_b, jaccard) — jaccard exact-rounded to 6 dp via
    *         the BIGINT round-half-up recipe (cross-engine identical)
    */
  def similarityJoinPrefix(
      df: DataFrame,
      idCol: String,
      setCol: Column,
      thresholdNum: Long,
      thresholdDen: Long,
      materialize: Materialize = Materialize.Cache): DataFrame = {
    require(thresholdNum > 0 && thresholdNum <= thresholdDen,
      s"threshold must be a rational in (0,1], got $thresholdNum/$thresholdDen")
    val sets0 = df
      .select(df.col(idCol).as("id"), array_distinct(setCol).as("toks"))
      .filter(size(col("toks")) > 0)
    // one global rarest-first order: (corpus frequency, token) asc
    val toks = sets0.select(col("id"), explode(col("toks")).as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("f"))
    val ordered = toks.join(freq, Seq("tok"))
      .groupBy("id")
      .agg(transform(
        sort_array(collect_list(struct(col("f"), col("tok")))),
        s => s.getField("tok")).as("toks"))
      .withColumn("n", size(col("toks")))
      // prefix length: n − ⌈t·n⌉ + 1, ceil as exact integer arithmetic
      .withColumn("p",
        col("n") - expr(s"(${thresholdNum}L * n + ${thresholdDen - 1}L) div ${thresholdDen}L")
          + 1)
    val (sets, release) = materialized(ordered, materialize, "id")
    val pref = sets.select(col("id"), col("n"),
      explode(slice(col("toks"), lit(1), col("p").cast("int"))).as("tok"))
    val cand = pref.select(col("tok"), col("id").as("id_a"), col("n").as("n_a"))
      .join(pref.select(col("tok"), col("id").as("id_b"), col("n").as("n_b")), Seq("tok"))
      .filter(col("id_a") < col("id_b"))
      // length filter: J ≥ t needs den·min(n_a,n_b) ≥ num·max(n_a,n_b)
      .filter(least(col("n_a"), col("n_b")) * thresholdDen >=
        greatest(col("n_a"), col("n_b")) * thresholdNum)
      // n_a/n_b are functions of the ids — carrying them through the
      // distinct is free and saves re-deriving sizes after the refetch
      .select("id_a", "id_b", "n_a", "n_b")
      .distinct()
    val pairs = cand
      .join(sets.select(col("id").as("id_a"), col("toks").as("t_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("toks").as("t_b")), Seq("id_b"))
      .withColumn("__i", size(array_intersect(col("t_a"), col("t_b"))).cast("long"))
      .withColumn("__u", col("n_a") + col("n_b") - col("__i"))
      .filter(col("__i") * thresholdDen >= col("__u") * thresholdNum)
      .select(col("id_a"), col("id_b"),
        (expr("(__i * 2000000 + __u) div (2 * __u)").cast("double") /
          lit(1000000.0)).as("jaccard"))
    finish(pairs, materialize, release)
  }

  /** Paragraph-level dedup (CCNet / RefinedWeb-style boilerplate
    * removal): any paragraph whose TRIMMED text repeats at least
    * `minRepeats` times across the corpus (cookie banners, nav bars,
    * subscribe footers) is removed from EVERY document; the survivors
    * are reassembled in original order. Whitespace-only paragraphs are
    * structural and always kept — they neither count nor match.
    *
    * Output: (idCol, textCol cleaned, `n_paragraphs`,
    * `n_dropped`). Documents whose every paragraph was boilerplate
    * stay, with empty text — the caller decides their fate (a quality
    * filter usually does).
    *
    * 100 TB shape: posexplode (narrow) → one count shuffle keyed on the
    * paragraph fingerprint → anti-join against the REPEATED-ONLY
    * fingerprint set (tiny by Zipf — AQE broadcasts it) → one doc-key
    * shuffle to reassemble. The document text never rides through the
    * count shuffle — only (fingerprint, count) pairs do.
    */
  def dropRepeatedParagraphs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minRepeats: Int = 3,
      sep: String = "\n"): DataFrame = {
    require(minRepeats >= 2, s"minRepeats must be >= 2, got $minRepeats")
    require(sep.nonEmpty, "separator must be non-empty")
    val paras = df
      .select(col(idCol), posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("__pos", "__para")))
      .withColumn("__fp",
        when(trim(col("__para")) === "", lit(null))
          .otherwise(md5(trim(col("__para")))))
    val boilerplate = paras
      .filter(col("__fp").isNotNull)
      .groupBy("__fp").agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minRepeats)
      .select("__fp")
    val kept = paras.join(boilerplate, Seq("__fp"), "left_anti")
    val perDoc = kept
      .groupBy(idCol)
      .agg(
        concat_ws(sep,
          transform(array_sort(collect_list(struct(col("__pos"), col("__para")))),
            s => s.getField("__para"))).as("__clean"),
        count(lit(1)).as("__kept"))
    df.select(col(idCol),
        (size(split(col(textCol), java.util.regex.Pattern.quote(sep)))).as("n_paragraphs"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__clean"), lit("")).as(textCol),
        col("n_paragraphs").cast("long").as("n_paragraphs"),
        (col("n_paragraphs") - coalesce(col("__kept"), lit(0L))).cast("long").as("n_dropped"))
  }

  /** Exact repeated-substring span removal (token granularity — the
    * substring-level complement of [[dropRepeatedParagraphs]], after
    * Lee et al. 2022's "Deduplicating Training Data Makes Language
    * Models Better": exact duplicate SPANS, not whole documents, carry
    * most of the duplication mass in web corpora). Any token k-gram
    * that occurs at least `minRepeats` times corpus-wide marks its k
    * token positions as boilerplate in EVERY document; marked positions
    * are dropped and each document is reassembled from the survivors in
    * order. Overlapping repeated grams merge naturally (position-set
    * union). Whole-document near-dups should be removed first (this
    * operator targets residual boilerplate: license headers, nav
    * footers, quoted reply chains).
    *
    * Output: (idCol, textCol cleaned — single-space rejoined lowercase
    * tokens, the same normalization [[graft.functions.TextFns.tokens]]
    * applies, `n_tokens`, `n_dropped`). Documents shorter than k tokens
    * pass through untouched (no gram can start in them).
    *
    * 100 TB shape: gram fingerprints are 128-bit md5 of the joined
    * token window — only (fingerprint, position) pairs ride the count
    * shuffle, never text. The repeated-only fingerprint set is tiny by
    * Zipf (AQE broadcasts the probe join); per-doc start positions come
    * back as one int-array via a doc-key shuffle, and the rebuild is a
    * narrow higher-order-function pass (no exploded token rows ever
    * shuffle). Worst case per doc is |starts|·n_tokens comparisons —
    * boilerplate-saturated docs should be caught by the repetition
    * filter upstream.
    */
  def dropRepeatedSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      minRepeats: Int = 2): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(minRepeats >= 2, s"minRepeats must be >= 2, got $minRepeats")
    val toks = graft.functions.TextFns.tokens(col(textCol))
    val grams = df
      .select(col(idCol), toks.as("__tk"))
      .filter(size(col("__tk")) >= k)
      .select(col(idCol),
        explode(transform(sequence(lit(1), size(col("__tk")) - k + 1),
          i => struct(i.as("s"),
            md5(concat_ws(" ", slice(col("__tk"), i, lit(k)))).as("gh"))))
          .as("__g"))
      .select(col(idCol), col("__g.s").as("__s"), col("__g.gh").as("__gh"))
    val repeated = grams
      .groupBy("__gh").agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minRepeats)
      .select("__gh")
    val startsPerDoc = grams
      .join(repeated, Seq("__gh"))
      .groupBy(idCol)
      .agg(collect_set(col("__s")).as("__starts"))
    df.join(startsPerDoc, Seq(idCol), "left")
      .select(col(idCol), toks.as("__tk"),
        coalesce(col("__starts"), array().cast("array<int>")).as("__st"))
      .withColumn("__kept",
        filter(
          transform(col("__tk"), (t, i) => struct(t.as("t"), (i + 1).as("p"))),
          x => !exists(col("__st"),
            s => x.getField("p") >= s && x.getField("p") < s + k)))
      .select(col(idCol),
        concat_ws(" ", transform(col("__kept"), x => x.getField("t"))).as(textCol),
        size(col("__tk")).cast("long").as("n_tokens"),
        (size(col("__tk")) - size(col("__kept"))).cast("long").as("n_dropped"))
  }
}
