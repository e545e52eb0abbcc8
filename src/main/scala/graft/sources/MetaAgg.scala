package graft.sources

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, max, min}
import org.apache.spark.sql.types._

/** METADATA-ONLY AGGREGATES — `count(*)` and column `min`/`max`
  * answered from the lakehouse PLANNING state (Delta log stats /
  * Iceberg manifest entries) without opening a single data file.
  *
  * Why this matters at 100 TB: both formats already carry exact
  * per-file row counts and column bounds in their metadata — the same
  * fields the scan planner prunes with ([[DeltaScan]] `stats`,
  * [[IcebergScan.FileEntry]] `record_count`/`lower`/`upper`, spec
  * §Manifests; Delta protocol §Per-file Statistics). A bare
  * `count(*)` or `min(ts)`/`max(ts)` over a petabyte table is
  * therefore an O(metadata) driver computation, not a cluster-wide
  * scan — the classic warehouse trick external engines (Trino,
  * Spark's own DSv2 aggregate pushdown) apply to these formats.
  *
  * Correctness stance: EXACT or fall back. Every answer is either
  * provably equal to what the full scan would return, or the method
  * runs the real scan and says so (`metadataOnly = false` in the
  * result). The conditions under which metadata is trusted:
  *
  *  - count/Delta: every live file carries `stats.numRecords`
  *    (graft's writer always does; the protocol makes it optional for
  *    foreign writers). Deletion vectors subtract exactly: the add
  *    action's DV descriptor records its cardinality and at most one
  *    DV is live per file.
  *  - count/Iceberg: live data entries' `record_count` summed; v3
  *    Puffin deletion vectors subtract their manifest-recorded
  *    cardinality when they reference a live data file and pass the
  *    reader's sequence rule (delete.seq >= data.seq) — the spec
  *    guarantees at most one DV per data file and DV positions are
  *    unique within it. Parquet position-delete files and equality
  *    deletes cannot be counted without reading them (duplicate
  *    (file,pos) pairs across delete files and dead-file references
  *    are legal), so they fall back.
  *  - min/max: only for fixed-width types whose bounds both formats
  *    record EXACTLY (integers, float/double, date, timestamp) —
  *    string bounds may be TRUNCATED by the writer (Iceberg spec
  *    §Binary single-value serialization allows prefix bounds; Delta
  *    writers truncate long strings with no marker), so strings
  *    always fall back. Any row-level delete falls back (it may have
  *    removed the extreme row). A file that is all-NULL in the column
  *    contributes nothing; a file with no usable bound falls back.
  *
  * The fallback is the ordinary delete-applied read — never a wrong
  * answer, just a priced one. */
object MetaAgg {

  /** an aggregate answer + whether it was served from metadata alone */
  final case class Meta[T](value: T, metadataOnly: Boolean)

  // ---- count(*) --------------------------------------------------------

  /** exact row count of a Delta table; metadata-only when every live
    * file carries `stats.numRecords` */
  def countDelta(spark: SparkSession, tablePath: String): Meta[Long] =
    countDeltaMetaOnly(spark, tablePath).map(Meta(_, metadataOnly = true))
      .getOrElse(
        Meta(DeltaScan.read(spark, tablePath).count(), metadataOnly = false))

  /** the metadata branch of [[countDelta]] alone — NEVER scans data
    * (None = metadata cannot prove the answer); safe to call from
    * planning-time code like [[graft.plans.MetaAggRewriteRule]] */
  def countDeltaMetaOnly(spark: SparkSession, tablePath: String): Option[Long] =
    liveRows(DeltaScan.liveState(spark, tablePath))

  /** the same arithmetic over an ALREADY-replayed state — the single
    * source of truth for exact-live-rows; also consumed by
    * [[CboJoin]]'s Delta side pricing (which holds a state anyway) */
  private[sources] def liveRows(st: DeltaScan.LiveState): Option[Long] = {
    val recs = st.files.map(_.stats.flatMap(ParquetStats.parse)
      .map(_.numRecords).filter(_ >= 0L))
    if (recs.forall(_.isDefined)) {
      val physical = recs.iterator.flatten.sum
      val deleted = st.files.iterator.flatMap(_.dv).map(_.cardinality).sum
      Some(physical - deleted)
    } else scala.None
  }

  /** exact row count of an Iceberg table; metadata-only when row-level
    * deletes are absent or are v3 deletion vectors */
  def countIceberg(spark: SparkSession, tablePath: String): Meta[Long] =
    countIcebergMetaOnly(spark, tablePath).map(Meta(_, metadataOnly = true))
      .getOrElse(
        Meta(IcebergScan.read(spark, tablePath).count(), metadataOnly = false))

  /** the metadata branch of [[countIceberg]] alone — never scans */
  def countIcebergMetaOnly(spark: SparkSession, tablePath: String): Option[Long] = {
    val planned = IcebergScan.planTable(spark, tablePath)
    val data = IcebergScan.dedupedDataEntries(planned)
    val dataRows = data.iterator.map(_.rows).sum
    val pos = IcebergScan.dedupeEntries(planned.entries.filter(_.content == 1))
    val hasEq = planned.entries.exists(_.content == 2)
    val (dvs, parquetPos) = pos.partition(_.fileFormat == "PUFFIN")
    if (!hasEq && parquetPos.isEmpty &&
        dvs.forall(d => d.refDataFile.isDefined) &&
        dvs.map(_.refDataFile.get).distinct.size == dvs.size) {
      val seqByFile = data.iterator
        .map(f => IcebergScan.normalizePath(f.path) -> f.seq).toMap
      val deleted = dvs.iterator.flatMap { d =>
        seqByFile.get(IcebergScan.normalizePath(d.refDataFile.get))
          .filter(fseq => d.seq >= fseq).map(_ => d.rows)
      }.sum
      Some(dataRows - deleted)
    } else scala.None
  }

  /** exact `count(col)` (non-null count) of a Delta table: per-file
    * `numRecords - nullCount[col]` — metadata-only when every live file
    * records both and no DV is live (a DV might have deleted null or
    * non-null rows; the per-file split is unknowable from cardinality) */
  def countColumnDelta(spark: SparkSession, tablePath: String,
      column: String): Meta[Long] = {
    val st = DeltaScan.liveState(spark, tablePath)
    require(st.schema.fieldNames.contains(column),
      s"column '$column' is not in the table schema ${st.schema.simpleString}")
    def fallback = Meta(DeltaScan.read(spark, tablePath)
      .filter(col(column).isNotNull).count(), metadataOnly = false)
    if (st.partCols.contains(column) || st.files.exists(_.dv.isDefined))
      return fallback
    val key = if (st.columnMapped) DeltaScan.physicalName(st.schema(column)) else column
    val per = st.files.map(_.stats.flatMap(ParquetStats.parse).flatMap(s =>
      if (s.numRecords < 0L) scala.None
      else s.nullCount.get(key).map(n => s.numRecords - n)))
    if (per.exists(_.isEmpty)) fallback
    else Meta(per.iterator.flatten.sum, metadataOnly = true)
  }

  /** Iceberg twin of [[countColumnDelta]]: manifest `value_counts` are
    * not tracked by this writer, but `record_count - null_value_counts`
    * is the same number; identity-partitioned columns count their
    * non-null partitions' record counts directly */
  def countColumnIceberg(spark: SparkSession, tablePath: String,
      column: String): Meta[Long] = {
    val planned = IcebergScan.planTable(spark, tablePath)
    require(planned.schema.fieldNames.contains(column),
      s"column '$column' is not in the table schema ${planned.schema.simpleString}")
    def fallback = Meta(IcebergScan.read(spark, tablePath)
      .filter(col(column).isNotNull).count(), metadataOnly = false)
    if (planned.entries.exists(_.content != 0)) return fallback
    val idOpt = {
      val it = IcebergScan.currentSchema(planned.meta).get("fields").elements()
      var found: Option[Int] = scala.None
      while (it.hasNext && found.isEmpty) {
        val f = it.next()
        if (f.get("name").asText() == column) found = Some(f.get("id").asInt())
      }
      found
    }
    if (idOpt.isEmpty) return fallback
    val identityPf = IcebergScan.partitionFieldsOf(planned)
      .find(pf => pf.isIdentity && pf.source.name == column)
    val per = IcebergScan.dedupedDataEntries(planned).map { e =>
      identityPf match {
        case Some(pf) => e.partition.get(pf.specName).map {
          case null => 0L // NULL partition: zero non-null values
          case _ => e.rows
        }
        case scala.None => e.nullCounts.get(idOpt.get).map(n => e.rows - n)
      }
    }
    if (per.exists(_.isEmpty)) fallback
    else Meta(per.iterator.flatten.sum, metadataOnly = true)
  }

  /** per-partition-tuple exact row counts of a Delta table from the
    * log alone (the ad-hoc twin of Iceberg's partition-statistics
    * file): partition values come from the add actions, counts from
    * their stats, DV cardinalities subtract per file. Returns a frame
    * of the partition columns (table types) + `n_rows` — driver-built
    * from O(partitions) state; metadata-only unless a live file lacks
    * `numRecords` (then one grouped count over the real read). */
  def countByPartitionDelta(spark: SparkSession,
      tablePath: String): Meta[org.apache.spark.sql.DataFrame] = {
    val st = DeltaScan.liveState(spark, tablePath)
    require(st.partCols.nonEmpty, s"$tablePath is not partitioned")
    val recs = st.files.map(f => f -> f.stats.flatMap(ParquetStats.parse)
      .map(_.numRecords).filter(_ >= 0L))
    if (recs.forall(_._2.isDefined)) {
      val pvKey: String => String =
        if (st.columnMapped) c => DeltaScan.physicalName(st.schema(c))
        else identity
      // group on the NORMALIZED tuple (the hive null marker and a true
      // JSON null are the same partition — a foreign log may mix them)
      def tupleOf(pv: Map[String, String]): Seq[String] =
        st.partCols.map(c => pv.get(pvKey(c))
          .filterNot(v => v == null || v == "__HIVE_DEFAULT_PARTITION__")
          .orNull)
      val grouped = recs.groupBy(r => tupleOf(r._1.pv)).toSeq.map { case (tuple, fs) =>
        org.apache.spark.sql.Row.fromSeq(tuple :+
          (fs.iterator.map(_._2.get).sum -
            fs.iterator.flatMap(_._1.dv).map(_.cardinality).sum))
      }
      val strDf = spark.createDataFrame(
        spark.sparkContext.parallelize(grouped, 1),
        StructType(st.partCols.map(c => StructField(c, StringType)) :+
          StructField("n_rows", LongType, nullable = false)))
      Meta(strDf.select(st.partCols.map(c =>
        col(c).cast(st.schema(c).dataType).as(c)) :+ col("n_rows"): _*),
        metadataOnly = true)
    } else Meta(
      DeltaScan.read(spark, tablePath)
        .groupBy(st.partCols.map(col): _*)
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_rows")),
      metadataOnly = false)
  }

  // ---- min / max -------------------------------------------------------

  /** types whose recorded bounds are exact (never truncated).
    * `timestampsExact = false` for Delta JSON stats: upstream
    * delta-spark records timestamp min/max truncated to MILLISECONDS
    * with the max rounded UP, so a foreign-written table's recorded
    * max can sit ~1ms above the true value — trusting it would break
    * the module's exact-or-fallback contract (same reason string
    * bounds always fall back). Iceberg manifest bounds serialize the
    * full micros long, so that path keeps the fast path. */
  private def exactBoundType(dt: DataType,
      timestampsExact: Boolean = true): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | DateType => true
    case TimestampType | TimestampNTZType => timestampsExact
    case _ => false
  }

  /** `(min, max)` of `column` over a Delta table as Spark external
    * values (null/null when no non-null value exists); metadata-only
    * when no DVs are live, the column is a stats-covered data column
    * of an exact-bound type, and every live file either bounds it or
    * is provably all-NULL in it */
  def minMaxDelta(spark: SparkSession, tablePath: String,
      column: String): Meta[(Any, Any)] =
    minMaxDeltaMetaOnly(spark, tablePath, column)
      .map(Meta(_, metadataOnly = true)).getOrElse {
        val r = DeltaScan.read(spark, tablePath)
          .agg(min(col(column)), max(col(column))).head() // [lint:bounded] one row
        Meta((r.get(0), r.get(1)), metadataOnly = false)
      }

  /** the metadata branch of [[minMaxDelta]] alone — never scans */
  def minMaxDeltaMetaOnly(spark: SparkSession, tablePath: String,
      column: String): Option[(Any, Any)] = {
    val st = DeltaScan.liveState(spark, tablePath)
    require(st.schema.fieldNames.contains(column),
      s"column '$column' is not in the table schema ${st.schema.simpleString}")
    val field = st.schema(column)
    // partition columns live in directory names, not stats; DVs may
    // have deleted the extreme row; strings may be truncated
    if (!exactBoundType(field.dataType, timestampsExact = false) ||
        st.partCols.contains(column) ||
        st.files.exists(_.dv.isDefined)) return scala.None
    val key = if (st.columnMapped) DeltaScan.physicalName(field) else column
    // per file: Some(None) = all-null (contributes nothing),
    // Some(Some(lo, hi)) = usable bounds, None = unknown -> fallback
    val per: Seq[Option[Option[(Any, Any)]]] =
      st.files.map(_.stats.flatMap(ParquetStats.parse) match {
        case scala.None => scala.None
        case Some(s) =>
          if (s.numRecords >= 0L && s.nullCount.get(key).contains(s.numRecords))
            Some(scala.None)
          else (s.min.get(key), s.max.get(key)) match {
            case (Some(lo), Some(hi)) => Some(Some((lo, hi)))
            case _ => scala.None
          }
      })
    if (per.exists(_.isEmpty)) scala.None
    else reduceBounds(field.dataType, per.flatten.flatten).map(_.value)
  }

  /** Iceberg twin of [[minMaxDelta]]: manifest-carried bounds, or the
    * exact identity-partition value where the layout moved the column
    * out of the data files; any row-level delete falls back */
  def minMaxIceberg(spark: SparkSession, tablePath: String,
      column: String): Meta[(Any, Any)] =
    minMaxIcebergMetaOnly(spark, tablePath, column)
      .map(Meta(_, metadataOnly = true)).getOrElse {
        val r = IcebergScan.read(spark, tablePath)
          .agg(min(col(column)), max(col(column))).head() // [lint:bounded] one row
        Meta((r.get(0), r.get(1)), metadataOnly = false)
      }

  /** the metadata branch of [[minMaxIceberg]] alone — never scans */
  def minMaxIcebergMetaOnly(spark: SparkSession, tablePath: String,
      column: String): Option[(Any, Any)] = {
    val planned = IcebergScan.planTable(spark, tablePath)
    require(planned.schema.fieldNames.contains(column),
      s"column '$column' is not in the table schema ${planned.schema.simpleString}")
    val field = planned.schema(column)
    if (!exactBoundType(field.dataType) ||
        planned.entries.exists(_.content != 0)) return scala.None
    val id: Int = {
      val it = IcebergScan.currentSchema(planned.meta).get("fields").elements()
      var found: Option[Int] = scala.None
      while (it.hasNext && found.isEmpty) {
        val f = it.next()
        if (f.get("name").asText() == column) found = Some(f.get("id").asInt())
      }
      found.getOrElse(return scala.None)
    }
    // an identity spec field over this column makes the partition value
    // an exact per-file bound (spec: lower = upper = the value) — the
    // hive layout strips the column from the data files, so this is the
    // only bound source there
    val identityPf = IcebergScan.partitionFieldsOf(planned)
      .find(pf => pf.isIdentity && pf.source.name == column)
    val data = IcebergScan.dedupedDataEntries(planned)
    val per: Seq[Option[Option[(Any, Any)]]] = data.map { e =>
      identityPf match {
        case Some(pf) => e.partition.get(pf.specName) match {
          case scala.None => scala.None // pre-evolution file: no value — unknown
          case Some(null) => Some(scala.None) // true NULL partition: all-null
          case Some(v) => IcebergStats.encodeValue(field.dataType, v)
            .flatMap(IcebergStats.decode(field.dataType, _))
            .map(d => Some((d, d)))
        }
        case scala.None =>
          if (e.rows >= 0L && e.nullCounts.get(id).contains(e.rows))
            Some(scala.None)
          else (e.lower.get(id).flatMap(IcebergStats.decode(field.dataType, _)),
                e.upper.get(id).flatMap(IcebergStats.decode(field.dataType, _))) match {
            case (Some(lo), Some(hi)) => Some(Some((lo, hi)))
            case _ => scala.None
          }
      }
    }
    if (per.exists(_.isEmpty)) scala.None
    else reduceBounds(field.dataType, per.flatten.flatten).map(_.value)
  }

  // ---- shared bound folding + typed conversion -------------------------

  /** fold per-file (lo, hi) pairs (in the pruner's comparable domain:
    * BigDecimal for numerics, sortable ISO strings for date/timestamp)
    * into one typed (min, max); None when a value fails to convert
    * (caller falls back) */
  private def reduceBounds(dt: DataType,
      bounds: Seq[(Any, Any)]): Option[Meta[(Any, Any)]] = {
    if (bounds.isEmpty) return Some(Meta((null, null), metadataOnly = true))
    val los = bounds.map(b => comparableKey(dt, b._1))
    val his = bounds.map(b => comparableKey(dt, b._2))
    if (los.exists(_.isEmpty) || his.exists(_.isEmpty)) return scala.None
    val lo = bounds(los.map(_.get).zipWithIndex.minBy(_._1)._2)._1
    val hi = bounds(his.map(_.get).zipWithIndex.maxBy(_._1)._2)._2
    for (l <- typedValue(dt, lo); h <- typedValue(dt, hi))
      yield Meta((l, h), metadataOnly = true)
  }

  /** one orderable key per comparable-domain value */
  private def comparableKey(dt: DataType, v: Any): Option[BigDecimal] = (dt, v) match {
    case (_, d: JBigDecimal) => Some(BigDecimal(d))
    case (DateType, s: String) =>
      scala.util.Try(java.time.LocalDate.parse(s).toEpochDay).toOption
        .map(BigDecimal(_))
    case (TimestampType | TimestampNTZType, s: String) =>
      toMicros(s).map(BigDecimal(_))
    case _ => scala.None
  }

  /** comparable-domain value → the Spark external type */
  private def typedValue(dt: DataType, v: Any): Option[Any] = (dt, v) match {
    case (ByteType, d: JBigDecimal) => scala.util.Try(d.byteValueExact(): Any).toOption
    case (ShortType, d: JBigDecimal) => scala.util.Try(d.shortValueExact(): Any).toOption
    case (IntegerType, d: JBigDecimal) => scala.util.Try(d.intValueExact(): Any).toOption
    case (LongType, d: JBigDecimal) => scala.util.Try(d.longValueExact(): Any).toOption
    case (FloatType, d: JBigDecimal) => Some(d.floatValue())
    case (DoubleType, d: JBigDecimal) => Some(d.doubleValue())
    case (DateType, s: String) =>
      scala.util.Try(java.sql.Date.valueOf(java.time.LocalDate.parse(s)): Any).toOption
    case (TimestampType, s: String) => toMicros(s).map { us =>
      val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      ts
    }
    case (TimestampNTZType, s: String) => toMicros(s).map { us =>
      java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
        (Math.floorMod(us, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
    }
    case _ => scala.None
  }

  /** parse a stats timestamp — graft's fixed-width micros form, bare
    * ISO local, or a foreign writer's zoned ISO — to epoch micros */
  private def toMicros(s: String): Option[Long] = {
    val t = if (s.contains(' ') && !s.contains('T')) s.replace(' ', 'T') else s
    val inst =
      scala.util.Try(java.time.OffsetDateTime.parse(t).toInstant).orElse(
        scala.util.Try(java.time.LocalDateTime.parse(t)
          .toInstant(java.time.ZoneOffset.UTC))).toOption
    inst.map(i => Math.addExact(
      Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L))
  }
}
