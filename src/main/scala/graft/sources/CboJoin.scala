package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** STATS-DRIVEN JOIN PLANNING over path-addressed Iceberg scans — the
  * one cost-based lever Catalyst cannot pull here: our readers hand
  * Spark an opaque union of parquet scans, so its size estimates see
  * neither the manifest-recorded live bytes/row counts (deletes and
  * time travel applied) nor the ANALYZE NDV sketches
  * ([[IcebergNdv.analyze]], Puffin `statistics`), nor the fact that
  * both sides share a `bucket(N, key)` layout. This module reads all
  * three from PLANNING STATE (no data file is opened) and picks the
  * join strategy:
  *
  *  1. **bucket-aligned** — both sides `bucket(N, key)` with equal N
  *     and hash-compatible types: delegate to [[BucketJoin.join]]
  *     (zero co-location shuffle; the writers already paid it).
  *  2. **semi-distinct-broadcast** — for `left_semi`/`left_anti`, the
  *     right side participates only through its DISTINCT key tuples:
  *     estimated build size = NDV(keys) × key width, which the NDV
  *     stats price exactly where raw bytes mislead (a billion-row
  *     fact table with 50k distinct keys broadcasts fine). The join
  *     runs against `right.select(keys).distinct()` broadcast —
  *     semantically identical for semi/anti.
  *  3. **broadcast-left/right** — the smaller side's estimated
  *     in-memory size (manifest live bytes × `inflation`, parquet →
  *     row format) fits the budget and the join type can broadcast
  *     that side.
  *  4. **shuffle** — neither applies; plain shuffled equi-join.
  *
  * Output-cardinality estimate (`outRowsEst` = |L|·|R| / max(ndv_L,
  * ndv_R), the classic System-R containment rule) rides the returned
  * [[Decision]] so callers can log or gate on expected fan-out.
  *
  * 100 TB shape: every input here is O(metadata) — live bytes and row
  * counts come from the one manifest walk [[IcebergScan.planTable]]
  * already does, NDV from table-metadata blob properties. No sampling
  * job, no data scan, no driver collect of data rows. */
object CboJoin {

  /** default budget for a broadcast build side, as an ESTIMATED
    * IN-MEMORY size (after `inflation`); var + env for ops override */
  @volatile var maxBroadcastBytes: Long =
    sys.env.get("GRAFT_CBO_BROADCAST_MAX_BYTES").map(_.toLong)
      .getOrElse(256L << 20)

  /** parquet-bytes → in-memory row-format expansion factor */
  val DefaultInflation = 4.0

  /** planning-state summary of one side (all O(metadata)) */
  final case class SideStats(
      rows: Long,
      liveBytes: Long,
      ndv: Map[String, Long],
      bucketOn: Map[String, (Int, DataType)])

  /** the chosen strategy + the numbers it was chosen on */
  final case class Decision(
      strategy: String, // bucket-aligned | semi-distinct-broadcast |
                        // broadcast-left | broadcast-right | shuffle
      reason: String,
      left: SideStats,
      right: SideStats,
      outRowsEst: Option[Long])

  /** one side's stats from the planning walk + registered NDV (the
    * NDV map is empty when the current snapshot was never ANALYZEd) */
  def sideStats(spark: SparkSession, path: String): SideStats =
    sideStats(spark, IcebergScan.planTable(spark, path), path)

  private def sideStats(spark: SparkSession,
      planned: IcebergScan.PlannedTable, path: String): SideStats = {
    val data = IcebergScan.dedupedDataEntries(planned)
    val ndv = IcebergNdv.tableStatistics(spark, path)
      .map(_.map(c => c.column -> c.ndv).toMap).getOrElse(Map.empty)
    val buckets = IcebergScan.partitionFieldsOf(planned)
      .filter(_.transform == "bucket")
      .map(pf => pf.source.name -> ((pf.param, pf.source.dataType))).toMap
    SideStats(data.map(_.rows).sum, data.map(_.bytes).sum, ndv, buckets)
  }

  /** width estimate of one key value inside a broadcast HashedRelation */
  private def keyWidth(dt: DataType): Long = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | DateType | TimestampType | TimestampNTZType |
         BooleanType => 8L
    case _: DecimalType => 16L
    case _ => 24L // strings/binary: payload + offsets, a priced guess
  }

  private def hashCompatible(l: DataType, r: DataType): Boolean = {
    val longFamily: Set[DataType] =
      Set(IntegerType, LongType, DateType, TimestampType, TimestampNTZType)
    (longFamily.contains(l) && longFamily.contains(r)) ||
      (l == StringType && r == StringType)
  }

  /** plan + execute the join; returns the frame and the decision */
  def plan(spark: SparkSession, leftPath: String, rightPath: String,
      keys: Seq[(String, String)], how: String = "inner",
      broadcastBytes: Long = maxBroadcastBytes,
      inflation: Double = DefaultInflation): (DataFrame, Decision) = {
    require(keys.nonEmpty, "cbo join needs at least one equi key")
    val jt = how match {
      case "left_outer" => "left"
      case "right_outer" => "right"
      case "full_outer" => "full"
      case t => t
    }
    require(Set("inner", "left", "right", "full", "left_semi", "left_anti")(jt),
      s"cbo join supports inner/left/right/full/left_semi/left_anti, got '$how'")
    val lPlanned = IcebergScan.planTable(spark, leftPath)
    val rPlanned = IcebergScan.planTable(spark, rightPath)
    val ls = sideStats(spark, lPlanned, leftPath)
    val rs = sideStats(spark, rPlanned, rightPath)
    val (lk0, rk0) = keys.head
    val outRowsEst = for {
      nl <- ls.ndv.get(lk0); nr <- rs.ndv.get(rk0)
      if nl > 0 || nr > 0
    } yield {
      // containment rule on the FIRST key; further keys only shrink it
      val d = math.max(nl, nr).max(1L)
      val prod = BigInt(ls.rows) * BigInt(rs.rows) / d
      if (prod > Long.MaxValue) Long.MaxValue else prod.toLong
    }
    def decide(strategy: String, reason: String) =
      Decision(strategy, reason, ls, rs, outRowsEst)

    def rawJoin(broadcastSide: Option[String]): DataFrame = {
      val l = IcebergScan.readPlanned(spark, lPlanned, scala.None).alias("__l")
      val r0 = IcebergScan.readPlanned(spark, rPlanned, scala.None).alias("__r")
      val r = r0
      val cond = keys.map { case (lk, rk) => l(lk) === r(rk) }.reduce(_ && _)
      broadcastSide match {
        case Some("right") => l.join(broadcast(r), cond, jt)
        case Some("left") => broadcast(l).join(r, cond, jt)
        case _ => l.join(r, cond, jt)
      }
    }

    // 1. storage-partitioned: both sides bucketed on the (single) key
    val aligned = if (keys.size >= 1 && lk0 == rk0 &&
        Set("inner", "left", "right", "full")(jt)) {
      (ls.bucketOn.get(lk0), rs.bucketOn.get(rk0)) match {
        case (Some((ln, ldt)), Some((rn, rdt)))
            if ln == rn && hashCompatible(ldt, rdt) =>
          Some((BucketJoin.join(spark, leftPath, rightPath, lk0, jt,
            extraKeys = keys.tail.collect { case (a, b) if a == b => a }),
            decide("bucket-aligned",
              s"both sides bucket($ln, $lk0): zero co-location shuffle")))
        case _ => scala.None
      }
    } else scala.None
    aligned.foreach { case (df, d) => return (df, d) }

    def memEst(s: SideStats): Long = {
      val v = s.liveBytes * inflation
      if (v > Long.MaxValue.toDouble) Long.MaxValue else v.toLong
    }

    // 2. semi/anti: the right side joins through DISTINCT keys only —
    // NDV × width prices the real build size
    if (jt == "left_semi" || jt == "left_anti") {
      val distinctEst = keys.map { case (_, rk) =>
        rs.ndv.get(rk).map(n => n * keyWidth(rPlanned.schema(rk).dataType))
      }
      // all keys priced: the distinct tuple count is at most the
      // PRODUCT of per-key NDVs, but bounded by rows — use min(product,
      // rows) × Σ widths as the build estimate
      if (distinctEst.forall(_.isDefined)) {
        val widths = keys.map { case (_, rk) =>
          keyWidth(rPlanned.schema(rk).dataType) }.sum
        val tuples = keys.map { case (_, rk) => BigInt(rs.ndv(rk).max(1L)) }
          .product.min(BigInt(rs.rows.max(1L)))
        val est = (tuples * widths).min(BigInt(Long.MaxValue)).toLong
        if (est <= broadcastBytes) {
          val l = IcebergScan.readPlanned(spark, lPlanned, scala.None).alias("__l")
          val rKeys = IcebergScan.readPlanned(spark, rPlanned, scala.None)
            .select(keys.map { case (_, rk) => col(rk) }: _*).distinct().alias("__r")
          val cond = keys.map { case (lk, rk) => l(lk) === rKeys(rk) }.reduce(_ && _)
          return (l.join(broadcast(rKeys), cond, jt),
            decide("semi-distinct-broadcast",
              s"distinct right keys ≈ $tuples × $widths B = $est B ≤ $broadcastBytes B"))
        }
      }
      // fall through to the generic broadcast/shuffle decision (a
      // semi/anti can still broadcast the whole right relation)
    }

    // 3. broadcast the smaller ELIGIBLE side
    val canBcRight = Set("inner", "left", "left_semi", "left_anti")(jt)
    val canBcLeft = Set("inner", "right")(jt)
    val (lMem, rMem) = (memEst(ls), memEst(rs))
    val pick: Option[String] =
      if (canBcRight && rMem <= broadcastBytes && (!canBcLeft || rMem <= lMem))
        Some("right")
      else if (canBcLeft && lMem <= broadcastBytes) Some("left")
      else scala.None
    pick match {
      case Some(side) =>
        val est = if (side == "right") rMem else lMem
        (rawJoin(pick), decide(s"broadcast-$side",
          s"$side side ≈ $est B in memory ≤ $broadcastBytes B budget"))
      case scala.None =>
        (rawJoin(scala.None), decide("shuffle",
          s"left ≈ $lMem B, right ≈ $rMem B — no side fits the " +
            s"$broadcastBytes B broadcast budget"))
    }
  }

  /** [[plan]] returning just the frame */
  def join(spark: SparkSession, leftPath: String, rightPath: String,
      keys: Seq[(String, String)], how: String = "inner",
      broadcastBytes: Long = maxBroadcastBytes,
      inflation: Double = DefaultInflation): DataFrame =
    plan(spark, leftPath, rightPath, keys, how, broadcastBytes, inflation)._1
}
