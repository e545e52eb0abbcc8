package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** STORAGE-PARTITIONED (bucket-aligned) JOIN — the join lever hidden
  * partitioning unlocks: two Iceberg tables both laid out
  * `bucket(N, key)` on the same key with the same N put every row of a
  * given key in the SAME bucket ordinal on both sides (the spec pins
  * one hash: murmur3_x86_32, [[IcebergTransforms.bucketOf]], and
  * int/long/date/timestamp hash identically). Joining bucket k against
  * bucket k is therefore complete — no global shuffle is ever needed
  * to co-locate the keys, because the WRITERS already did it.
  *
  * Execution shape: one join per bucket ordinal, unioned.
  *
  *  - `broadcastRight = true` (default): each right bucket is
  *    broadcast to its matching left bucket's scan. The left (fact)
  *    side is NEVER exchanged — the plan is a union of N
  *    BroadcastHashJoins directly over the fact-side file scans
  *    (asserted in BucketJoinSpec). The broadcast budget scales with
  *    N: each bucket ships 1/N of the dimension, so a dimension N×
  *    the single-broadcast limit still joins shuffle-free. This is
  *    the 100 TB fact-to-dimension shape.
  *  - `broadcastRight = false`: per-bucket shuffled joins — one giant
  *    N-way shuffle becomes N independent small joins (1/N state per
  *    join, skew bounded per bucket, failed buckets retry alone).
  *    For big-big joins where neither side's buckets broadcast.
  *
  * Both sides read through the full delete-applied reader
  * ([[IcebergScan.readFiltered]]), so position/equality deletes and
  * MOR images on either table are honored. Rows with a NULL key live
  * in the null partition: they never equi-join (SQL semantics), are
  * skipped for `inner`, and are preserved with null right columns for
  * `left`.
  *
  * Plan-size note: the union grows with N (bucket count), which is a
  * table-layout constant chosen at design time (typically 16-512) —
  * not data-dependent. At N beyond ~1000 prefer fewer, larger buckets;
  * the guard below is loud about it. */
object BucketJoin {

  /** join types this aligned form supports */
  private val JoinTypes = Set("inner", "left", "left_outer")

  /** bucket-aligned join of two Iceberg tables on `key`. Requires both
    * tables' default partition spec to carry `bucket(N, key)` with the
    * SAME N and hash-compatible key types. `extraKeys` adds further
    * equi-join columns for COMPOSITE keys — alignment only needs the
    * bucketed column (rows agreeing on `key` are co-located whatever
    * the other columns say), so the extra conditions just ride each
    * per-bucket join. Returns key columns, left columns, right columns
    * (duplicate non-key names keep Spark's usual disambiguation
    * rules). */
  def join(spark: SparkSession, leftPath: String, rightPath: String,
      key: String, joinType: String = "inner",
      broadcastRight: Boolean = true,
      extraKeys: Seq[String] = Nil): DataFrame = {
    require(JoinTypes.contains(joinType),
      s"bucket-aligned join supports ${JoinTypes.mkString("/")}, got '$joinType'")
    require(!extraKeys.contains(key), s"'$key' is already the bucket key")

    val (lSchema, lBucket) = bucketFieldOf(spark, leftPath, key, "left")
    val (rSchema, rBucket) = bucketFieldOf(spark, rightPath, key, "right")
    require(lBucket.param == rBucket.param,
      s"bucket counts differ: left bucket(${lBucket.param}, $key) vs " +
        s"right bucket(${rBucket.param}, $key) — storage-partitioned joins " +
        "need identical N (re-bucket one side)")
    requireHashCompatible(lBucket.source.dataType, rBucket.source.dataType, key)
    require(lBucket.param <= 4096,
      s"bucket(${lBucket.param}) union plan would carry ${lBucket.param} " +
        "branches — use fewer, larger buckets")

    val leftByBucket = filesByBucket(spark, leftPath, lBucket.specName)
    val rightByBucket = filesByBucket(spark, rightPath, rBucket.specName)

    def side(path: String, files: Seq[String], schema: StructType): DataFrame =
      if (files.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else IcebergScan.readFiltered(spark, path, scala.None, Some(files.toSet))

    // which bucket ordinals produce output: inner needs both sides
    // populated; left needs every populated left bucket (incl. the
    // null-key partition, which joins an empty right → null columns)
    val buckets: Seq[Option[Int]] = {
      val l = leftByBucket.keySet
      val r = rightByBucket.keySet
      (if (joinType == "inner") l.filter(b => b.isDefined && r.contains(b)) else l)
        .toSeq.sortBy(_.getOrElse(-1))
    }

    val joinCols = key +: extraKeys
    extraKeys.foreach { k =>
      require(lSchema.fieldNames.contains(k) && rSchema.fieldNames.contains(k),
        s"extra join key '$k' must be a column of both tables")
    }
    val pieces = buckets.map { b =>
      val l = side(leftPath, leftByBucket.getOrElse(b, Seq.empty), lSchema)
      val rFiles = if (b.isEmpty) Seq.empty // null keys never equi-match
                   else rightByBucket.getOrElse(b, Seq.empty)
      val r0 = side(rightPath, rFiles, rSchema)
      val r = if (broadcastRight) broadcast(r0) else r0
      l.join(r, joinCols, if (joinType == "inner") "inner" else "left")
    }
    if (pieces.isEmpty) { // no aligned buckets: empty result, joined schema
      val l = side(leftPath, Seq.empty, lSchema)
      val r = side(rightPath, Seq.empty, rSchema)
      l.join(r, joinCols, if (joinType == "inner") "inner" else "left")
    } else pieces.reduce(_ unionByName _)
  }

  /** the spec's bucket field over `key`, or loud */
  private def bucketFieldOf(spark: SparkSession, path: String, key: String,
      sideName: String): (StructType, IcebergTransforms.PartField) = {
    val (schema, fields) = IcebergScan.partitionFields(spark, path)
    val pf = fields.find(f => f.transform == "bucket" && f.source.name == key)
      .getOrElse(throw new IllegalArgumentException(
        s"$sideName table $path is not bucket-partitioned on '$key' " +
          s"(spec: ${fields.map(_.transformJson).mkString(", ")}); " +
          "create it with partitionBy = Seq(\"bucket(N, " + key + ")\")"))
    (schema, pf)
  }

  /** int/long/date/timestamp all hash as 8-byte little-endian longs
    * (spec Appendix B) — mixing them keeps co-location; strings hash
    * as UTF-8 and only align with strings */
  private def requireHashCompatible(l: DataType, r: DataType, key: String): Unit = {
    val longFamily: Set[DataType] =
      Set(IntegerType, LongType, DateType, TimestampType, TimestampNTZType)
    val ok = (longFamily.contains(l) && longFamily.contains(r)) ||
      (l == StringType && r == StringType)
    require(ok, s"join key '$key' types ${l.sql} vs ${r.sql} do not hash " +
      "to the same buckets — the aligned join would silently drop matches")
  }

  /** live data files grouped by bucket ordinal (None = the NULL-key
    * partition). Driver-side metadata only — one manifest walk, the
    * same planning state every scan already builds. */
  private def filesByBucket(spark: SparkSession, path: String,
      specName: String): Map[Option[Int], Seq[String]] = {
    val (_, entries) = IcebergScan.currentEntries(spark, path)
    val data = entries.filter(_.content == 0)
    data.foreach { e =>
      require(e.partition.contains(specName),
        s"data file ${e.path} carries no '$specName' partition value — " +
          "the table's files predate the bucket spec (rewrite via compact " +
          "before using the aligned join)")
    }
    data.groupBy(e => e.partition(specName) match {
      case null => scala.None
      case i: java.lang.Integer => Some(i.intValue())
      case other => throw new IllegalArgumentException(
        s"bucket partition value of ${e.path} is ${other.getClass.getName}, " +
          "expected int")
    }).map { case (b, es) => b -> es.map(_.path) }
  }
}
