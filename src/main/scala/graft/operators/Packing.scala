package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing: assign documents to fixed-token-budget bins — the
  * step that turns a cleaned corpus into training context windows.
  * Greedy first-fit-in-order within each group: rows are visited in
  * `orderCol` order; a row joins the current bin iff it fits
  * (`fill + tokens <= budget`), else it opens the next bin. A row
  * larger than the whole budget gets a bin of its own (it is never
  * split — chunking oversized docs is the tokenizer's job upstream).
  * Bin ids start at 0 within each group, so (group, bin) is the packed
  * sequence key.
  *
  * Semantics are deliberately SEQUENTIAL PER GROUP — that is what makes
  * the assignment deterministic and engine-reproducible (the DuckDB
  * oracle rebuilds it with a recursive CTE). The scale unit is the
  * group, not the corpus: each group is packed by one streaming pass
  * over its sorted rows (constant state: current bin + fill), groups
  * pack in parallel. At 100 TB you shard the corpus into packing groups
  * (source, date, hash(doc) % k, ...) sized to a task — the natural
  * layout anyway, since a training shard IS such a group. One giant
  * group = one task; that is a caller-visible semantics choice, same as
  * any ORDER-dependent fold.
  */
object Packing {

  /** Adds `binCol` (long, 0-based per group). Rows flow in
    * `(groupCols, orderCol)` order; `tokensCol` must be numeric
    * (NULL counts as 0). `orderCol` should be unique per group for a
    * fully deterministic packing.
    */
  def packGreedy(
      df: DataFrame,
      groupCols: Seq[String],
      orderCol: String,
      tokensCol: String,
      budget: Long,
      binCol: String = "bin"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(groupCols.nonEmpty,
      "packGreedy needs group columns (shard a global pack into hash groups)")
    val gIdx = groupCols.map(df.schema.fieldIndex)
    val tIdx = df.schema.fieldIndex(tokensCol)
    val sorted = df
      .repartition(groupCols.map(df.col): _*)
      .sortWithinPartitions((groupCols :+ orderCol).map(df.col): _*)
    val outSchema = df.schema.add(binCol, LongType, nullable = false)
    // one streaming pass per partition; groups are contiguous after the
    // repartition+sort, so state is just (current group, bin, fill)
    sorted.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var bin = 0L
      var fill = 0L
      it.map { row =>
        val k = gIdx.map(row.get)
        val t = row.get(tIdx) match {
          case null         => 0L
          case x: Number    => x.longValue()
          case other        => throw new IllegalArgumentException(
            s"tokens column must be numeric, got $other")
        }
        if (k != curKey) { curKey = k; bin = 0L; fill = t }
        else if (fill + t <= budget) fill += t
        else { bin += 1L; fill = t }
        Row.fromSeq(row.toSeq :+ bin)
      }
    }(Encoders.row(outSchema))
  }

  /** Packed-bin summary: one row per (group, bin) with its document
    * count and token fill — the shape a writer consumes to emit one
    * training sequence per bin.
    */
  def packSummary(
      packed: DataFrame,
      groupCols: Seq[String],
      tokensCol: String,
      binCol: String = "bin"): DataFrame =
    packed
      .groupBy((groupCols :+ binCol).map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol).cast("long")).as("fill_tokens"))

  /** TRAINING-SHARD EXPORT — the last mile of the data pipeline: write
    * sequences (any frame with a token-array column, e.g.
    * `Bpe.encodeIds` output or packed windows) as `numShards`
    * hive-partitioned shard directories plus a per-shard manifest.
    *
    *  - shard assignment is a PURE FUNCTION of (seed, key): exact
    *    integer bucketing `shard = h·numShards div 2^60` on the 60-bit
    *    unit hash (DECIMAL(38,0) — `h·numShards` overflows BIGINT from
    *    numShards ≥ 16) — reproducible across engines, partitionings
    *    and reruns, and every shard is an unbiased 1/numShards sample
    *    of the corpus (loaders can train on a shard prefix);
    *  - within a shard, rows are laid down in deterministic training
    *    order: the salted `__pos` hash ([[graft.operators.Sampling
    *    .shuffleDeterministic]]'s construction), ties by key;
    *  - ONE shuffle total: repartition on shard, sort within
    *    partitions, `partitionBy(shard)` write (each shard's rows are
    *    contiguous in one task, so a shard's files hold its training
    *    order end to end);
    *  - the returned MANIFEST is derived by reading BACK what landed
    *    (not from the input plan): per shard `n_seqs`, `n_tokens`,
    *    `key_checksum` (exact Σ xxhash64 of the key — order-free) — so
    *    a short write surfaces as a manifest mismatch, not silence.
    *
    * 100 TB shape: assignment/order are narrow projections; the single
    * shuffle moves each row once to its shard writer; shard count
    * chooses file granularity (pick `corpus / numShards ≈ 256 MB–1 GB`).
    */
  def writeTokenShards(
      df: DataFrame,
      path: String,
      numShards: Int,
      seed: String,
      keyCols: Seq[String],
      tokensCol: String): DataFrame = {
    require(numShards >= 1 && numShards <= 1000000,
      s"numShards must be in [1, 1e6], got $numShards")
    require(keyCols.nonEmpty, "writeTokenShards needs key columns")
    val spark = df.sparkSession
    val keyed = df
      .withColumn("__h", Sampling.unitHashInt(seed, keyCols.map(df.col)))
      // exact floor via integral divide on DECIMAL — a decimal `/`
      // would ROUND at its result scale and can bump a just-below-
      // boundary hash into the next shard before the cast truncates
      .withColumn("shard",
        expr(s"CAST((CAST(__h AS DECIMAL(38,0)) * $numShards) " +
          "DIV 1152921504606846976 AS INT)"))
      .withColumn("__pos", Sampling.unitHashInt(s"$seed#order", keyCols.map(df.col)))
      .drop("__h")
    keyed
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard") +: col("__pos") +: keyCols.map(col): _*)
      .drop("__pos")
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    // order-free exact checksum over the PORTABLE unit hash (bounded:
    // each term < 10^9, so the BIGINT sum holds past 9e9 rows/shard;
    // an external engine reproduces it from md5 alone)
    val term = pmod(Sampling.unitHashInt(s"$seed#ck", keyCols.map(col)), lit(1000000000L))
    spark.read.parquet(path)
      .groupBy(col("shard").cast("int").as("shard"))
      .agg(
        count(lit(1)).as("n_seqs"),
        coalesce(sum(size(col(tokensCol)).cast("long")), lit(0L)).as("n_tokens"),
        coalesce(sum(term), lit(0L)).as("key_checksum"))
  }
}
