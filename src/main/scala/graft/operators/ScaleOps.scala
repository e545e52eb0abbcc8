package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cluster-scale physical-layout helpers (SCALE.md round-2 items,
  * pulled into round 1): bucketed materialization for repeated
  * co-located joins, and key salting for user-declared hot keys.
  */
object ScaleOps {

  /** Materialize as a bucketed, sorted table: joins/aggregations on the
    * bucket keys against other tables bucketed the same way need NO
    * shuffle (Catalyst recognizes the matching HashPartitioning). The
    * standard answer to "this fact table is joined on this key by every
    * query, stop shuffling 100 TB each time". */
  def saveBucketed(
      df: DataFrame,
      table: String,
      bucketKeys: Seq[String],
      numBuckets: Int,
      sortKeys: Seq[String] = Nil): Unit = {
    require(bucketKeys.nonEmpty, "need at least one bucket key")
    val w = df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketKeys.head, bucketKeys.tail: _*)
    val sorted =
      if (sortKeys.nonEmpty) w.sortBy(sortKeys.head, sortKeys.tail: _*) else w
    sorted.format("parquet").saveAsTable(table)
  }

  /** Salted equi-join for skewed keys: the skewed (large) side gets a
    * random salt in [0, buckets); the small side is exploded ×buckets so
    * every salted key finds its match. Turns one hot-key straggler
    * partition into `buckets` even ones. AQE's skew handling covers
    * sort-merge joins automatically — this is for the cases it can't
    * see (e.g. skew introduced after an earlier stage) or when the
    * build side must replicate anyway.
    *
    * @return (salted large side, exploded small side, join keys to use)
    */
  def saltedForJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      buckets: Int,
      seed: Long = 42L): (DataFrame, DataFrame, Seq[String]) =
    saltedForJoinKeys(large, small, Seq(key), buckets, seed)

  /** Multi-key variant (e.g. the pigeonhole Hamming join's
    * (chunk_id, chunk) band key). */
  def saltedForJoinKeys(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      buckets: Int,
      seed: Long = 42L): (DataFrame, DataFrame, Seq[String]) = {
    require(buckets > 1, "salting needs buckets > 1")
    require(keys.nonEmpty, "salting needs at least one join key")
    val saltedLarge = large.withColumn(
      "__salt", (rand(seed) * buckets).cast("int"))
    val explodedSmall = small.withColumn(
      "__salt", explode(sequence(lit(0), lit(buckets - 1))))
    (saltedLarge, explodedSmall, keys :+ "__salt")
  }

  /** Histogram-probe a join key and pick a salt factor: ONE cheap
    * aggregation (partial/final count on the key — the probe is a
    * rounding error next to the join it protects), then a driver
    * decision. Returns 1 (no salting) while the hottest key holds at
    * most `hotKeyThreshold` rows; above that, enough buckets to bound
    * the per-(key,salt) task at ~`hotKeyThreshold` rows, capped at
    * `maxBuckets` (salting replicates the small side ×buckets — past
    * the task-count win that replication is pure overhead).
    *
    * Probe the MATERIALIZED side of the join: on an uncached frame the
    * extra action replays the upstream plan. */
  def autoSaltBuckets(
      df: DataFrame,
      key: String,
      hotKeyThreshold: Long = 4096L,
      maxBuckets: Int = 64): Int =
    autoSaltBucketsKeys(df, Seq(key), hotKeyThreshold, maxBuckets)

  /** Multi-key probe variant. */
  def autoSaltBucketsKeys(
      df: DataFrame,
      keys: Seq[String],
      hotKeyThreshold: Long = 4096L,
      maxBuckets: Int = 64): Int = {
    require(hotKeyThreshold >= 1, s"hotKeyThreshold must be >= 1, got $hotKeyThreshold")
    require(keys.nonEmpty, "probe needs at least one key")
    val mx = df.groupBy(keys.map(col): _*).count()
      .agg(max(col("count")).as("mx")).first()
    val hot = if (mx.isNullAt(0)) 0L else mx.getLong(0)
    if (hot <= hotKeyThreshold) 1
    else math.min(maxBuckets.toLong, (hot + hotKeyThreshold - 1) / hotKeyThreshold).toInt
  }

  /** Convenience: salted inner equi-join, salt column dropped. */
  def saltedInnerJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      buckets: Int,
      seed: Long = 42L): DataFrame = {
    val (l, s, keys) = saltedForJoin(large, small, key, buckets, seed)
    l.join(s, keys, "inner").drop("__salt")
  }

  /** Z-order (Morton) interleaved key over non-negative integer
    * dimension columns — the multi-dimensional clustering key behind
    * "OPTIMIZE ZORDER BY": sorting by it keeps rows close in EVERY
    * dimension close in the file order, so parquet min/max stats prune
    * files for predicates on ANY of the dimensions, not just the lead
    * sort column.
    *
    * Each column contributes its low `bitsPerCol` bits (values are
    * masked; map real domains to compact non-negative ints first —
    * e.g. `dense_rank` buckets or epoch-days). bitsPerCol·n must stay
    * ≤ 63 so the key fits one signed long. Pure shift/mask Column
    * arithmetic — codegen'd, narrow, engine-portable. */
  def zorderValue(cols: Seq[Column], bitsPerCol: Int): Column = {
    require(cols.nonEmpty, "need at least one dimension column")
    require(bitsPerCol >= 1 && bitsPerCol * cols.size <= 63,
      s"bitsPerCol * nCols must fit a signed long, got $bitsPerCol * ${cols.size}")
    val n = cols.size
    val terms = for {
      (c, ci) <- cols.zipWithIndex
      b <- 0 until bitsPerCol
    } yield shiftleft(
      shiftright(c.cast("long"), b).bitwiseAND(lit(1L)),
      b * n + ci)
    terms.reduce(_ bitwiseOR _)
  }

  /** Write `df` parquet clustered by the Z-order of `dims`:
    * range-partition on the interleaved key (`numFiles` output files,
    * distributed sort — no single-task funnel), sort within partitions,
    * drop the key, write. Readers filtering on any dim combination
    * skip files via parquet min/max. */
  def zorderWrite(
      df: DataFrame,
      path: String,
      dims: Seq[Column],
      bitsPerCol: Int,
      numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val z = "__graft_z"
    df.withColumn(z, zorderValue(dims, bitsPerCol))
      .repartitionByRange(numFiles, col(z))
      .sortWithinPartitions(z)
      .drop(z)
      .write.mode("overwrite").parquet(path)
  }
}
