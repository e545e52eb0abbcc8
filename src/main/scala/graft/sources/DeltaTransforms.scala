package graft.sources

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.types._

import graft.sources.IcebergTransforms.PartField

/** DELTA GENERATED-COLUMN PARTITIONING — the Delta twin of Iceberg's
  * hidden partitioning. Delta's mechanism is different by design: the
  * derived column is a REAL schema column whose field metadata carries
  * `delta.generationExpression` (a Spark SQL expression over other
  * columns), the table partitions by that column, and every writer
  * must materialize the expression's value on every row it writes.
  * The reader-side payoff is the same as Iceberg's: a filter on the
  * SOURCE column (`ts >= X`) prunes files through the bounds each
  * file's partition VALUE implies for the source — the same
  * [[IcebergTransforms.sourceBounds]] mapping, fed from
  * `add.partitionValues` strings instead of manifest records.
  *
  * This module is the shared vocabulary:
  *  - [[genSql]]: the canonical generation expression per transform
  *    (day/month/year/hour/truncate — plain Spark SQL any Delta engine
  *    can evaluate; `bucket` is NOT offered on Delta because the
  *    Iceberg spec hash is not expressible as a portable SQL
  *    generation expression)
  *  - [[parseGenExpr]]: generation expression string → [[PartField]]
  *    (the metadata is the ONLY source of truth; expressions written
  *    by other engines that don't match the recognized shapes still
  *    DERIVE correctly on write — they just don't source-prune)
  *  - [[decodePartValue]]: one `partitionValues` string → the typed
  *    partition value [[IcebergTransforms.sourceBounds]] consumes
  *  - [[comparable]]: a source-internal bound value → the pruner's
  *    comparison domain (numbers as BigDecimal; dates/timestamps as
  *    their sortable serialized forms, matching [[ParquetStats]])
  *
  * All temporal expressions assume the engine's pinned UTC session
  * (set in every entry point); `CAST(ts AS DATE)` under UTC equals the
  * Iceberg day ordinal's date. */
object DeltaTransforms {

  /** metadata key the Delta protocol defines for generated columns */
  val GenExprKey = "delta.generationExpression"

  /** table property recording the session timezone generation
    * expressions were evaluated under (graft stamps "UTC" at create).
    * Pruning on a session-TZ-dependent shape (day/month/year over a
    * TimestampType source) is only sound when this says UTC — a table
    * written under another TZ yields partition values whose UTC-derived
    * source bounds exclude rows actually in the file. */
  val WriteTimezoneKey = "graft.write.timezone"

  /** can a partition VALUE of this transform soundly imply source
    * bounds WITHOUT knowing the writer's session timezone?
    * `hour` computes on unix_seconds (TZ-independent even on
    * TimestampType); `truncate` is non-temporal; `day/month/year`
    * go through CAST(ts AS DATE)/year(ts)/month(ts), which evaluate in
    * the writer's session TZ for TimestampType sources — but are
    * TZ-independent for DateType / TimestampNTZType sources. */
  def tzIndependent(pf: PartField): Boolean = pf.transform match {
    case "day" | "month" | "year" => pf.source.dataType != TimestampType
    case _ => true // hour (unix_seconds-based), truncate, identity
  }

  /** canonical generation SQL for a transform field */
  def genSql(pf: PartField): String = {
    val src = pf.source.name
    pf.transform match {
      case "day" => s"CAST($src AS DATE)"
      case "month" => s"((year($src) - 1970) * 12 + month($src) - 1)"
      case "year" => s"(year($src) - 1970)"
      case "hour" => s"CAST(((unix_seconds($src) - pmod(unix_seconds($src), 3600)) div 3600) AS INT)"
      case "truncate" => pf.source.dataType match {
        case StringType => s"substring($src, 1, ${pf.param})"
        case _ => s"($src - pmod($src, ${pf.param}))"
      }
      case other => throw new IllegalArgumentException(
        s"transform '$other' has no Delta generated-column form " +
          "(day/month/year/hour/truncate; bucket is Iceberg-only — its " +
          "spec hash is not expressible as a portable SQL expression)")
    }
  }

  /** parse one `partitionBy` entry for a Delta table: bare names stay
    * identity; transform syntax becomes a generated-column field.
    * Bucket refuses loudly ([[genSql]]). */
  def parseEntry(entry: String, schema: StructType): Either[String, PartField] = {
    val pf = IcebergTransforms.parse(entry, schema)
    if (pf.isIdentity) Left(pf.specName)
    else { genSql(pf); Right(pf) } // genSql validates the transform set
  }

  private val DayRx = """CAST\(\s*([A-Za-z_][A-Za-z0-9_]*)\s+AS\s+DATE\s*\)""".r
  private val MonthRx =
    """\(\(\s*year\(([A-Za-z_][A-Za-z0-9_]*)\)\s*-\s*1970\s*\)\s*\*\s*12\s*\+\s*month\(\1\)\s*-\s*1\s*\)""".r
  private val YearRx = """\(\s*year\(([A-Za-z_][A-Za-z0-9_]*)\)\s*-\s*1970\s*\)""".r
  private val HourRx =
    """CAST\(\(\(\s*unix_seconds\(([A-Za-z_][A-Za-z0-9_]*)\)\s*-\s*pmod\(unix_seconds\(\1\),\s*3600\)\s*\)\s*div\s*3600\s*\)\s*AS\s+INT\s*\)""".r
  private val TruncStrRx =
    """substring\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*,\s*1\s*,\s*(\d+)\s*\)""".r
  private val TruncNumRx =
    """\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*-\s*pmod\(\1,\s*(\d+)\s*\)\s*\)""".r

  /** a recognized generation expression → the [[PartField]] driving
    * source-column pruning; None for foreign shapes (still derived on
    * write via `expr`, just not prunable on the source). */
  def parseGenExpr(specName: String, sql: String,
      schema: StructType): Option[PartField] = {
    def src(name: String): Option[StructField] = schema.fields.find(_.name == name)
    // a foreign-written width can exceed Int (substring(s,1,9999999999));
    // an unparseable width is just an unrecognized shape — fall back to
    // the documented no-pruning path, never fail the scan
    def width(w: String): Option[Int] = scala.util.Try(w.toInt).toOption
    sql.trim match {
      case DayRx(s) => src(s).map(PartField(specName, "day", 0, _))
      case MonthRx(s) => src(s).map(PartField(specName, "month", 0, _))
      case YearRx(s) => src(s).map(PartField(specName, "year", 0, _))
      case HourRx(s) => src(s).map(PartField(specName, "hour", 0, _))
      case TruncStrRx(s, w) =>
        for (f <- src(s); p <- width(w)) yield PartField(specName, "truncate", p, f)
      case TruncNumRx(s, w) =>
        for (f <- src(s); p <- width(w)) yield PartField(specName, "truncate", p, f)
      case _ => scala.None
    }
  }

  /** the generated fields of a Delta schema: (field, generation SQL) */
  def generatedFields(schema: StructType): Seq[(StructField, String)] =
    schema.fields.toSeq.collect {
      case f if f.metadata.contains(GenExprKey) =>
        f -> f.metadata.getString(GenExprKey)
    }

  /** one `add.partitionValues` STRING → the typed value
    * [[IcebergTransforms.sourceBounds]] consumes (epoch-day Integer for
    * day, ordinal Integer for month/year/hour, source-typed for
    * truncate); None = unparseable or a null partition. */
  def decodePartValue(pf: PartField, s: String): Option[AnyRef] =
    if (s == null || s == "__HIVE_DEFAULT_PARTITION__") scala.None
    else scala.util.Try[AnyRef](pf.transform match {
      case "day" =>
        java.lang.Integer.valueOf(java.time.LocalDate.parse(s).toEpochDay.toInt)
      case "month" | "year" | "hour" => java.lang.Integer.valueOf(s.toInt)
      case "truncate" => pf.source.dataType match {
        case StringType => s
        case IntegerType => java.lang.Integer.valueOf(s.toInt)
        case LongType => java.lang.Long.valueOf(s.toLong)
        case _ => throw new IllegalArgumentException(s"untyped $s")
      }
      case _ => throw new IllegalArgumentException(pf.transform)
    }).toOption

  /** a SOURCE-internal bound value → the pruner's comparison domain
    * (matches the serialized-stats domains in [[ParquetStats]]) */
  def comparable(dt: DataType, v: Any): Option[Any] = (dt, v) match {
    case (_, null) => scala.None
    case (IntegerType | LongType, n: Number) =>
      Some(new JBigDecimal(n.toString))
    case (DateType, d: Int) =>
      Some(java.time.LocalDate.ofEpochDay(d.toLong).toString)
    case (DateType, d: Number) =>
      Some(java.time.LocalDate.ofEpochDay(d.longValue()).toString)
    case (TimestampType | TimestampNTZType, us: Long) =>
      Some(ParquetStats.microsString(us))
    case (TimestampType | TimestampNTZType, us: Number) =>
      Some(ParquetStats.microsString(us.longValue()))
    case (StringType, s) => Some(s.toString)
    case _ => scala.None
  }
}
