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

  /** Exact dedup: keep the lowest-id row per identical content hash.
    * One shuffle on the 128-bit content hash; ties broken by id so the
    * survivor set is deterministic. */
  def exactDedup(df: DataFrame, idCol: String, contentCols: Seq[String]): DataFrame = {
    // values joined with a \u0001 separator and NULL mapped to \u0000:
    // bare concatenation would collide ("ab","") with ("a","b") and NULL
    // with "" - silently deleting distinct rows
    val h = md5(concat_ws("\u0001",
      contentCols.map(c => coalesce(df.col(c).cast("string"), lit("\u0000"))): _*))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(h).orderBy(df.col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
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

  /** base hashes: portable md5-derived value mod p, one per shingle */
  def minHashBases(shingles: Column): Column =
    transform(shingles, s => pmod(TextFns.portableHash(s), lit(MinHashP)))

  /** signature from materialized base hashes (a_i·x + b_i stays < 2^62) */
  def minHashFromBases(bases: Column, numHashes: Int, seed: Long = 42L): Column = {
    val params = hashParams(numHashes, seed)
    array(params.map { case (a, b) =>
      array_min(transform(bases, x => pmod(x * lit(a) + lit(b), lit(MinHashP))))
    }: _*)
  }

  /** convenience: signature straight from the shingle array. Prefer
    * materializing `minHashBases` as a column first in multi-use plans
    * so the md5 pass isn't duplicated per plan branch. */
  def minHashSignature(shingles: Column, numHashes: Int): Column =
    minHashFromBases(minHashBases(shingles), numHashes)

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
  def minHashDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 12,
      bands: Int = 6,
      threshold: Double = 0.5): DataFrame = {
    // persist: the shingle arrays feed BOTH the signature pass and the
    // two verify-side joins — without it Catalyst recomputes the
    // md5-heavy shingling once per plan branch (4×). At cluster scale
    // this materialization is the signature checkpoint.
    val shingled = df
      .select(df.col(idCol).as("id"), TextFns.tokens(df.col(textCol)).as("__tk"))
      .withColumn("sh", array_distinct(TextFns.wordShinglesFromTokens(col("__tk"), shingleSize)))
      .drop("__tk")
      .filter(size(col("sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize bases then signature as columns: inlining would splice
    // the md5 pass into every hash function and the whole signature into
    // every band key (numHashes × bands recompute)
    val sig = shingled
      .withColumn("bases", minHashBases(col("sh")))
      .withColumn("sig", minHashFromBases(col("bases"), numHashes))
      .withColumn("band", explode(bandKeys(col("sig"), numHashes, bands)))
      .select("band", "id")
    // candidate ids only through the band self-join (pairs distinct
    // BEFORE re-fetching shingle payloads — keeps the wide stage narrow)
    val l = sig.select(col("band"), col("id").as("id_a"))
    val r = sig.select(col("band"), col("id").as("id_b"))
    val cand = l.join(r, Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val withSh = cand
      .join(shingled.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(shingled.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
    withSh
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Collapse dup pairs into clusters by min-representative propagation:
    * every id maps to the smallest id it is paired with (one pass).
    * See dupClustersClosure for the transitive fixpoint. */
  def dupClusters(pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("id_b").as("id"), col("id_a").as("rep"))
    edges.groupBy("id").agg(min("rep").as("rep"))
  }

  /** Connected components over the dup-pair graph by iterated
    * min-label propagation (star contraction): each node adopts the
    * minimum representative among itself and its neighbors' current
    * representatives, repeated to fixpoint. Converges in
    * O(log n) rounds on path graphs, 1-2 rounds on the star-shaped
    * clusters near-dup detection produces. Each round is one
    * self-join + aggregate — all shuffles on the id key. Each round's
    * labels are localCheckpoint'ed (lineage truncated, prior round
    * unpersisted); non-convergence within maxIter throws rather than
    * returning wrong cluster labels.
    *
    * @return (id, rep) for every node appearing in `pairs`, rep = min
    *         id of its component
    */
  def dupClustersClosure(pairs: DataFrame, maxIter: Int = 16): DataFrame = {
    // undirected edge list, plus self-loops so roots survive aggregation
    val edges = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
      .union(pairs.select(col("id_b").as("a"), col("id_a").as("b")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.groupBy(col("a").as("id"))
      .agg(least(min(col("b")), first(col("a"))).as("rep"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // propagate: my new rep = min(my rep, reps of my neighbors)
      val neighborReps = edges
        .join(labels.withColumnsRenamed(Map("id" -> "b", "rep" -> "nrep")), Seq("b"))
        .groupBy(col("a").as("id")).agg(min(col("nrep")).as("prop"))
      val next = labels.join(neighborReps, Seq("id"), "left")
        .select(col("id"), least(col("rep"), coalesce(col("prop"), col("rep"))).as("rep"))
        .localCheckpoint() // truncates lineage; eager
      val changed = next.join(labels.withColumnRenamed("rep", "old"), Seq("id"))
        .filter(col("rep") =!= col("old")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    if (!converged) throw new IllegalStateException(
      s"dupClustersClosure did not converge in $maxIter rounds — component " +
        "diameter exceeds 2^maxIter; raise maxIter")
    labels
  }

  /** SimHash: 64-bit signature; bit i is the sign of the sum of ±1
    * contributions of each token's xxhash64 bit i. Pure higher-order
    * expressions (64 × |tokens| bit tests per doc, all codegen'd). */
  /** 64 bit-sums over a MATERIALIZED token-hash array column — pass
    * `transform(tokens, xxhash64)` via withColumn first; an inline
    * expression would be re-evaluated per bit (64×). */
  def simHashFromHashes(hashes: Column): Column = {
    // bit positions unrolled Scala-side (shift amounts must be static);
    // the 64 per-bit sums are disjoint, so their + is exact bitwise OR
    val bitCols = (0 until 64).map { i =>
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
      maxHamming: Int = 3): DataFrame = {
    // persist: both sides of the chunk self-join read the signatures —
    // unpersisted, the 64 per-bit aggregate passes would run twice
    val sigs = df
      .select(df.col(idCol).as("id"),
        transform(TextFns.tokens(df.col(textCol)), t => xxhash64(t)).as("__h"))
      .withColumn("sig", simHashFromHashes(col("__h")))
      .select("id", "sig")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val chunkArr = array((0 until 4).map { c =>
      struct(lit(c).as("chunk_id"),
        shiftright(col("sig"), c * 16).bitwiseAND(0xFFFFL).as("chunk"))
    }: _*)
    val chunked = sigs.withColumn("__c", explode(chunkArr))
      .select(col("id"), col("sig"), col("__c.chunk_id").as("chunk_id"), col("__c.chunk").as("chunk"))
    val l = chunked.select(col("chunk_id"), col("chunk"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = chunked.select(col("chunk_id"), col("chunk"), col("id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("chunk_id", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** n-gram Jaccard similarity for a candidate pair set (exact verify
    * primitive; also usable standalone on a pre-filtered subset). */
  def ngramJaccard(shA: Column, shB: Column): Column =
    size(array_intersect(shA, shB)).cast("double") / size(array_union(shA, shB))
}
