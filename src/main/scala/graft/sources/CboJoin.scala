package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** STATS-DRIVEN JOIN PLANNING over path-addressed Iceberg AND Delta
  * scans — the one cost-based lever Catalyst cannot pull here: our
  * readers hand Spark an opaque union of parquet scans, so its size
  * estimates see neither the recorded live bytes/row counts (Iceberg
  * manifests; Delta add-file stats minus DV cardinalities — deletes
  * and time travel applied) nor the ANALYZE NDV sketches
  * ([[IcebergNdv.analyze]] via Puffin `statistics`;
  * [[DeltaNdv.analyze]] via the graft.statistics domain), nor the
  * fact that both sides share a `bucket(N, key)` layout (Iceberg
  * layouts only). This module reads all three from PLANNING STATE (no
  * data file is opened) and picks the join strategy:
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
    // format dispatch: ONE metadata walk per side ([[sideState]]);
    // stats, schema, pricing, and the read all answer from it. Delta
    // sides price from the log (rows/NDV exact, bytes cross-checked)
    // and never claim bucket alignment (empty bucketOn)
    val lS = sideState(spark, leftPath)
    val rS = sideState(spark, rightPath)
    val ls = statsOf(spark, lS)
    val rs = statsOf(spark, rS)
    val (lk0, rk0) = keys.head
    val outRowsEst = for {
      nl <- ls.ndv.get(lk0); nr <- rs.ndv.get(rk0)
      if (nl > 0 || nr > 0) && ls.rows >= 0L && rs.rows >= 0L
    } yield {
      // containment rule on the FIRST key; further keys only shrink it
      val d = math.max(nl, nr).max(1L)
      val prod = BigInt(ls.rows) * BigInt(rs.rows) / d
      if (prod > Long.MaxValue) Long.MaxValue else prod.toLong
    }
    def decide(strategy: String, reason: String) =
      Decision(strategy, reason, ls, rs, outRowsEst)

    def rawJoin(broadcastSide: Option[String]): DataFrame = {
      val l = readState(spark, lS, scala.None).alias("__l")
      val r = readState(spark, rS, scala.None).alias("__r")
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

    val rSchema = rS match {
      case IcebergSide(_, planned) => planned.schema
      case DeltaSide(_, st) => st.schema
    }

    // 2. semi/anti: the right side joins through DISTINCT keys only —
    // NDV × width prices the real build size
    if (jt == "left_semi" || jt == "left_anti") {
      val distinctEst = keys.map { case (_, rk) =>
        rs.ndv.get(rk).map(n => n * keyWidth(rSchema(rk).dataType))
      }
      // all keys priced: the distinct tuple count is at most the
      // PRODUCT of per-key NDVs, but bounded by rows — use min(product,
      // rows) × Σ widths as the build estimate. rows must be KNOWN:
      // an unpriceable side (rows = -1) would collapse the min to ~1
      // tuple and broadcast a possibly huge side on a guess
      if (distinctEst.forall(_.isDefined) && rs.rows >= 0L) {
        val widths = keys.map { case (_, rk) =>
          keyWidth(rSchema(rk).dataType) }.sum
        val tuples = keys.map { case (_, rk) => BigInt(rs.ndv(rk).max(1L)) }
          .product.min(BigInt(rs.rows.max(1L)))
        val est = (tuples * widths).min(BigInt(Long.MaxValue)).toLong
        if (est <= broadcastBytes) {
          val l = readState(spark, lS, scala.None).alias("__l")
          val rKeys = readState(spark, rS, scala.None)
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
    val (lMem, rMem) = (
      memEstOf(spark, lS, ls, inflation).getOrElse(Long.MaxValue),
      memEstOf(spark, rS, rs, inflation).getOrElse(Long.MaxValue))
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

  // ---------------------------------------------------------------------
  // RUNTIME JOIN PRUNING — the dynamic-partition-pruning / runtime-filter
  // lever for path-addressed lakehouse scans. Catalyst's own DPP and
  // InjectRuntimeFilter never reach these plans (the readers hand Spark
  // an opaque union of parquet scans with no join-aware file listing),
  // so the fact side of a star join would scan EVERY live file no matter
  // how selective the dimension is. These planners evaluate the (small,
  // possibly filtered) dim side first, derive a key-domain filter from
  // what it actually contains, and hand that filter to the fact scan's
  // manifest/footer pruner — fact files whose column bounds cannot
  // intersect the dim's keys are never opened.
  // ---------------------------------------------------------------------

  /** max distinct dim-side values collected PER KEY for an IN-set
    * runtime filter; past this the filter degrades to the dim key's
    * [min, max] range (still O(1)-sized, still sound). */
  @volatile var maxRuntimeFilterKeys: Int =
    sys.env.get("GRAFT_CBO_RUNTIME_FILTER_MAX_KEYS").map(_.toInt)
      .getOrElse(8192)

  private def isDelta(spark: SparkSession, p: String): Boolean = {
    val log = new org.apache.hadoop.fs.Path(p, "_delta_log")
    log.getFileSystem(spark.sessionState.newHadoopConf()).exists(log)
  }

  /** one side's planning handle, computed ONCE per planner call — an
    * Iceberg planned table (one manifest walk) or a Delta live state
    * (one log replay); every later question (read, file count, stats,
    * pricing) answers from it instead of re-walking the metadata. The
    * dominant planning cost at 100 TB is exactly these walks. */
  private sealed trait SideState { def path: String }
  private final case class IcebergSide(path: String,
      planned: IcebergScan.PlannedTable) extends SideState
  private final case class DeltaSide(path: String,
      st: DeltaScan.LiveState) extends SideState

  private def sideState(spark: SparkSession, p: String): SideState =
    if (isDelta(spark, p)) DeltaSide(p, DeltaScan.liveState(spark, p))
    else IcebergSide(p, IcebergScan.planTable(spark, p))

  /** format-dispatched read over the pre-computed state — both scans
    * take the same `skippingFilter` contract (manifest bounds /
    * add-file stats / partition-transform ranges prune files before
    * any task plans) */
  private def readState(spark: SparkSession, s: SideState,
      f: Option[Column]): DataFrame = s match {
    case IcebergSide(_, planned) =>
      IcebergScan.readPlannedFiltered(spark, planned, f)
    case DeltaSide(p, st) => DeltaScan.readFromState(spark, p, st, f)
  }

  private def countDataFiles(s: SideState): Int = s match {
    case IcebergSide(_, planned) =>
      IcebergScan.dedupedDataEntries(planned).size
    case DeltaSide(_, st) => st.files.size
  }

  /** planning-state stats of one side. DELTA: exact live rows from
    * add-file `stats.numRecords` minus DV cardinalities
    * ([[MetaAgg.liveRows]], the one source of truth), priced into
    * memory as rows × schema row width (the log's add sizes are
    * parquet-encoded, not broadcast-relation bytes), NDV from the
    * [[DeltaNdv]] ANALYZE domain when current; rows = -1 when some
    * live file lacks stats (a foreign writer) — the side is
    * unpriceable and callers must never broadcast it on a guess. */
  private def statsOf(spark: SparkSession, s: SideState): SideStats = s match {
    case IcebergSide(p, planned) => sideStats(spark, planned, p)
    case DeltaSide(p, st) =>
      val rows = MetaAgg.liveRows(st).getOrElse(-1L)
      val width = st.schema.fields.map(f => keyWidth(f.dataType)).sum
      val ndv = DeltaNdv.tableStatistics(spark, p)
        .map(_.map(c => c.column -> c.ndv).toMap).getOrElse(Map.empty)
      SideStats(rows, if (rows < 0L) -1L else rows * width, ndv, Map.empty)
  }

  /** bound on the per-file FS stat calls the Delta pricing cross-check
    * may issue — a table with more live files than this and a small
    * row estimate stays unpriceable rather than un-bounded */
  private val MaxPricingStatFiles = 4096

  /** estimated in-memory broadcast size of one side from its state +
    * already-computed stats, or None when planning state cannot price
    * it — an unpriceable side is never broadcast on a guess */
  private def memEstOf(spark: SparkSession, s: SideState,
      stats: SideStats, inflation: Double): Option[Long] = s match {
    case IcebergSide(_, _) =>
      val v = stats.liveBytes * inflation
      Some(if (v > Long.MaxValue.toDouble) Long.MaxValue else v.toLong)
    case DeltaSide(p, st) =>
      // rows × schema width UNDERESTIMATES text-heavy rows (strings
      // price at a fixed guess); cross-check against the actual
      // parquet bytes × inflation — take the max — with the FS stat
      // calls bounded by file count
      if (stats.liveBytes < 0L) scala.None
      else if (st.files.size > MaxPricingStatFiles) scala.None
      else {
        val fs = new org.apache.hadoop.fs.Path(p)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val parquetBytes = st.files.map(f =>
          fs.getFileStatus(new org.apache.hadoop.fs.Path(f.path)).getLen).sum
        val inflated = parquetBytes * inflation
        val cross = if (inflated > Long.MaxValue.toDouble) Long.MaxValue
          else inflated.toLong
        Some(math.max(stats.liveBytes, cross))
      }
  }

  /** the dim side's OBSERVED key domain as a pair of filters — one on
    * the FACT key (for the skipping filter + row predicate) and the
    * same domain on the DIM key (re-applied to the join-side dim so
    * both sides agree on the domain even if the dim re-evaluates
    * nondeterministically between the collect and the join — the
    * consistency Spark's own DPP gets from exchange reuse): an IN-set
    * when the dim has at most [[maxRuntimeFilterKeys]] distinct
    * non-null values on `dimKey`, its [min, max] range past that, and
    * `false` for an empty dim (the fact scan prunes to nothing). Every
    * variant keeps a SUPERSET of the fact rows that can equi-match the
    * domain-restricted dim, so inner/semi results are bit-identical to
    * the unpruned join of the same sides; NULL fact keys never
    * equi-match and may drop. */
  private def keyDomainFilter(dim: DataFrame, factKey: String,
      dimKey: String): (Column, Column, String, Long) = {
    val vals = dim.select(col(dimKey)).where(col(dimKey).isNotNull)
      .distinct().limit(maxRuntimeFilterKeys + 1)
      .collect() // [lint:bounded] limit caps the collect at maxRuntimeFilterKeys+1 rows
      .map(_.get(0))
    if (vals.isEmpty)
      (lit(false), lit(false), s"$factKey: dim side is empty", 0L)
    else if (vals.length <= maxRuntimeFilterKeys)
      (col(factKey).isin(vals.toSeq: _*), col(dimKey).isin(vals.toSeq: _*),
        s"$factKey IN {${vals.length} dim keys}", vals.length.toLong)
    else {
      val mm = dim.agg(min(col(dimKey)), max(col(dimKey)))
        .head() // [lint:bounded] single-row global aggregate
      (col(factKey) >= lit(mm.get(0)) && col(factKey) <= lit(mm.get(1)),
        col(dimKey) >= lit(mm.get(0)) && col(dimKey) <= lit(mm.get(1)),
        s"$factKey BETWEEN ${mm.get(0)} AND ${mm.get(1)} " +
          s"(dim exceeds $maxRuntimeFilterKeys distinct)",
        vals.length.toLong)
    }
  }

  /** RUNTIME-PRUNED broadcast join: evaluate the filtered dim, derive
    * [[keyDomainFilter]]s for every equi key, AND them into the fact
    * scan's skipping filter (file-level pruning via manifest bounds /
    * Delta add-file stats / partition-transform ranges) AND into a row
    * predicate (parquet row-group pruning + codegen'd residual), then
    * join — broadcasting the dim when planning state prices it inside
    * the budget, shuffled otherwise. Sound for `inner` and `left_semi`
    * only — the
    * join types where a fact row that cannot match never reaches the
    * output. Works on Iceberg and Delta paths alike (dispatch by
    * `_delta_log` presence).
    *
    * 100 TB shape: the dim collect is capped at
    * [[maxRuntimeFilterKeys]]+1 rows per key; the fact side is never
    * scanned unpruned — a date-window dim at TPC-H shapes rules out
    * the bulk of fact files from manifest bounds before the first task
    * launches, the exact effect Spark's DPP gives hive-partitioned
    * tables and its runtime bloom filters give shuffled joins. */
  def planPruned(spark: SparkSession, factPath: String, dimPath: String,
      keys: Seq[(String, String)], how: String = "inner",
      dimFilter: Option[Column] = scala.None): (DataFrame, Decision) = {
    require(keys.nonEmpty, "runtime-pruned join needs at least one equi key")
    require(Set("inner", "left_semi")(how),
      s"runtime pruning of the fact side is sound only for inner/left_semi " +
        s"joins (a pruned fact row must never reach the output), got '$how'")
    val factS = sideState(spark, factPath)
    val dimS = sideState(spark, dimPath)
    val dim0 = readState(spark, dimS, scala.None)
    val dim = dimFilter.map(dim0.where).getOrElse(dim0)
    val domains = keys.map { case (fk, dk) => keyDomainFilter(dim, fk, dk) }
    val filter = domains.map(_._1).reduce(_ && _)
    val total = countDataFiles(factS)
    val fact = readState(spark, factS, Some(filter)).where(filter).alias("__l")
    val kept = fact.inputFiles.length
    // the join-side dim carries the SAME domain restriction the fact
    // filter was derived from — see keyDomainFilter's consistency note
    val dimB = dim.where(domains.map(_._2).reduce(_ && _)).alias("__r")
    val cond = keys.map { case (fk, dk) => fact(fk) === dimB(dk) }.reduce(_ && _)
    // the dim broadcasts only when planning state PRICES it inside the
    // budget (a capped key domain bounds distinct keys, not dim rows
    // or width); an unpriceable or oversized dim joins shuffled — the
    // runtime pruning already happened either way, and AQE may still
    // convert at execution. Pricing reads the UNFILTERED table's
    // planning state, so a dimFilter only ever makes the true side
    // smaller than priced — conservative, never optimistic
    val dimStats = statsOf(spark, dimS)
    val dimFits = memEstOf(spark, dimS, dimStats, DefaultInflation)
      .exists(_ <= maxBroadcastBytes)
    val out =
      if (dimFits) fact.join(broadcast(dimB), cond, how)
      else fact.join(dimB, cond, how)
    (out, Decision(
      if (dimFits) "runtime-pruned-broadcast" else "runtime-pruned-shuffle",
      s"fact files kept $kept/$total; " + domains.map(_._3).mkString("; "),
      statsOf(spark, factS), dimStats, scala.None))
  }

  /** one dimension of a star join: fact.`factKey` = dim.`dimKey`,
    * with an optional dim-side predicate evaluated BEFORE the key
    * domain is observed (a filtered dim prunes harder) */
  final case class DimSpec(path: String, factKey: String, dimKey: String,
      filter: Option[Column] = scala.None, how: String = "inner")

  /** the star planner's audit trail: dims in chosen join order, each
    * with its estimated fact-fraction (|observed dim keys| / NDV(fact
    * key), the containment rule — 1.0 when the fact key was never
    * ANALYZEd), its join strategy, and the fact file counts. Entries
    * key by dim PATH; a role-playing dimension (same path joined on
    * two fact keys) keys by `path#factKey` so the entries stay
    * distinguishable. */
  final case class StarDecision(
      order: Seq[String],
      fraction: Map[String, Double],
      strategy: Map[String, String],
      factFilesKept: Int,
      factFilesTotal: Int)

  /** audit-map key for one dim: the path alone when unique, else
    * disambiguated by the fact key (role-playing dimensions) */
  private def dimLabel(d: DimSpec, all: Seq[DimSpec]): String =
    if (all.count(_.path == d.path) == 1) d.path
    else s"${d.path}#${d.factKey}"

  /** STAR-SCHEMA JOIN PLANNING: one fact table inner-joined to N
    * dimensions. Three stats-driven levers in one operator:
    *
    *  1. **runtime pruning** — every INNER dim's observed key domain
    *     ([[keyDomainFilter]]) ANDs into the fact scan's skipping
    *     filter, so only fact files that can match every inner dim
    *     open.
    *  2. **join ORDER** — dims join most-selective-first, ranked by
    *     the containment estimate |dim keys| / NDV(fact key) (from
    *     ANALYZE stats; unANALYZEd keys rank last at 1.0; a domain
    *     past [[maxRuntimeFilterKeys]] counts the capped observation,
    *     so two very-unselective dims rank equal and keep their given
    *     order — selectivity ordering matters precisely when domains
    *     are small). Catalyst reorders only plans whose sizes it can
    *     see; these scans are opaque to it, so the ordering must
    *     happen here.
    *  3. **broadcast by stats** — each dim broadcasts when its
    *     manifest-priced in-memory estimate fits the budget, else
    *     falls back to a shuffled join (AQE may still convert).
    *
    * Dims join `inner` (default) or `left` (enrichment): ONLY inner
    * dims contribute to the fact's skipping filter and the fact's
    * selectivity ordering — a left dim must keep unmatched fact rows,
    * so it can never prune, and it always joins AFTER every inner dim
    * (it cannot shrink the intermediate). Returns the joined frame
    * plus the full [[StarDecision]] audit. */
  def planStar(spark: SparkSession, factPath: String, dims: Seq[DimSpec],
      broadcastBytes: Long = maxBroadcastBytes,
      inflation: Double = DefaultInflation): (DataFrame, StarDecision) = {
    require(dims.nonEmpty, "star join needs at least one dimension")
    dims.foreach(d => require(Set("inner", "left")(d.how),
      s"star dims join inner or left, got '${d.how}' for ${d.path}"))
    val factS = sideState(spark, factPath)
    val factNdv: Map[String, Long] = statsOf(spark, factS).ndv
    // evaluate each INNER dim once: state + filtered frame + key
    // domain + fraction; left dims skip the domain work entirely (they
    // cannot prune, so observing their keys buys nothing)
    val evaluated = dims.map { d =>
      val dS = sideState(spark, d.path)
      val dim0 = readState(spark, dS, scala.None)
      val dim = d.filter.map(dim0.where).getOrElse(dim0)
      if (d.how == "left") (d, dS, dim, scala.None: Option[Column], 1.0)
      else {
        val (domainF, dimF, _, observed) = keyDomainFilter(dim, d.factKey, d.dimKey)
        val fraction = factNdv.get(d.factKey) match {
          case Some(n) if n > 0 => math.min(1.0, observed.toDouble / n)
          case _ => 1.0
        }
        // join-side dim restricted to its own observed domain — see
        // keyDomainFilter's consistency note
        (d, dS, dim.where(dimF), Some(domainF), fraction)
      }
    }
    val (inner, leftDims) = evaluated.partition(_._1.how == "inner")
    val ordered = inner.sortBy { case (_, _, _, _, fr) => fr } ++ leftDims
    val skipping = inner.flatMap(_._4).reduceOption(_ && _)
    val total = countDataFiles(factS)
    val fact0 = readState(spark, factS, skipping)
    val fact = skipping.map(fact0.where).getOrElse(fact0)
    val kept = fact.inputFiles.length
    val factAliased = fact.alias("__f")
    var acc = factAliased
    val strategies = scala.collection.mutable.LinkedHashMap[String, String]()
    ordered.zipWithIndex.foreach { case ((d, dS, dim, _, _), i) =>
      val dimB = dim.alias(s"__d$i")
      // resolve the fact key by EXPRESSION ID through the join chain —
      // a dim sharing the key's name must not make it ambiguous
      val cond = factAliased(d.factKey) === dimB(d.dimKey)
      val fits = memEstOf(spark, dS, statsOf(spark, dS), inflation)
        .exists(_ <= broadcastBytes)
      val label = dimLabel(d, dims)
      acc =
        if (fits) { strategies(label) = "broadcast"; acc.join(broadcast(dimB), cond, d.how) }
        else { strategies(label) = "shuffle"; acc.join(dimB, cond, d.how) }
    }
    (acc, StarDecision(ordered.map(e => dimLabel(e._1, dims)),
      evaluated.map(e => dimLabel(e._1, dims) -> e._5).toMap,
      strategies.toMap, kept, total))
  }
}
