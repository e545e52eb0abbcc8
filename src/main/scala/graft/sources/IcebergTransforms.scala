package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import org.apache.spark.sql.graftshim.GraftShim

/** Iceberg PARTITION TRANSFORMS (the spec's hidden partitioning):
  * `day`/`month`/`year`/`hour` temporal projections, `bucket[N]`
  * (spec murmur3_x86_32 hash mod N), `truncate[W]`, and `identity`.
  *
  * Hidden partitioning is THE layout for large temporal/event data: a
  * reader filters on the SOURCE column (`ts > X`) and the engine prunes
  * partitions derived from it (`ts_day`), with the source column kept
  * IN the data files — no user-maintained derived columns, no
  * accidental full scans after a predicate is written against the raw
  * column. This module is the shared write/read vocabulary:
  *
  *  - parse (`"day(ts)"`, `"bucket(16, id)"`, `"truncate(4, s)"`,
  *    bare name = identity) → [[PartField]]
  *  - [[PartField.recordField]]: the (name, type) a spec field's
  *    manifest partition record and hive path segment carry
  *    (day → date, month/year/hour/bucket → int, truncate → source)
  *  - [[columnExpr]]: the Spark Column deriving the transformed value
  *    at write time (codegen'd builtins; bucket is a tight eval over
  *    the spec's murmur3 — cited test vectors below)
  *  - [[sourceBounds]]: transformed partition value → EXACT bounds on
  *    the SOURCE column, which is what lets the manifest pruner skip
  *    files for predicates written against the source column
  *
  * Bucket hash conformance: the Iceberg spec (Appendix B) pins
  * murmur3_x86_32 seed 0 with per-type byte layouts — int/long/date/
  * timestamp hash as 8-byte LITTLE-endian longs (so `hash(34) ==
  * hash(34L)`), strings as UTF-8 bytes. Spec test vectors, asserted in
  * IcebergScanSpec: hashLong(34) = 2017239379, hashString("iceberg") =
  * 1210000089, hashLong(micros of 2017-11-16T22:31:08) = -2047944441,
  * hashLong(epoch-day of 2017-11-16) = -653330422. */
object IcebergTransforms {

  /** one partition-spec field: spec name, transform, parameter
    * (bucket N / truncate W; 0 otherwise), SOURCE schema field */
  final case class PartField(specName: String, transform: String,
      param: Int, source: StructField) {
    def isIdentity: Boolean = transform == "identity"

    /** the spec's transform string for the metadata JSON */
    def transformJson: String = transform match {
      case "bucket" => s"bucket[$param]"
      case "truncate" => s"truncate[$param]"
      case t => t
    }

    /** the (name, type) of this field's manifest partition record and
      * hive path value */
    def recordField: StructField = StructField(specName, transform match {
      case "identity" | "truncate" => source.dataType
      case "day" => DateType
      case "month" | "year" | "hour" | "bucket" => IntegerType
      case other => throw new IllegalArgumentException(
        s"unknown partition transform '$other'")
    }, nullable = true)
  }

  private val FnSyntax = """([a-z]+)\s*\(\s*(?:(\d+)\s*,\s*)?([A-Za-z_][A-Za-z0-9_]*)\s*\)""".r

  /** parse one `partitionBy` entry. Bare column names stay identity
    * (backward-compatible); `day(ts)`/`days(ts)`, `month(ts)`,
    * `year(ts)`, `hour(ts)`, `bucket(16, id)`, `truncate(4, s)` build
    * transform fields with the Iceberg default spec names
    * (`ts_day`, `id_bucket`, `s_trunc`). */
  def parse(entry: String, schema: StructType): PartField = {
    def sourceField(name: String): StructField =
      schema.fields.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"partition source column '$name' is not a column of the DataFrame"))
    entry.trim match {
      case FnSyntax(fn0, paramStr, src) =>
        val fn = fn0 match {
          case "days" => "day"; case "months" => "month"
          case "years" => "year"; case "hours" => "hour"
          case other => other
        }
        val sf = sourceField(src)
        val param = Option(paramStr).map(_.toInt).getOrElse(0)
        fn match {
          case "day" | "month" | "year" =>
            require(paramStr == null, s"$fn() takes no numeric parameter")
            require(sf.dataType == DateType || sf.dataType == TimestampType,
              s"$fn() needs a date/timestamp source, '${src}' is ${sf.dataType.sql}")
            PartField(s"${src}_$fn", fn, 0, sf)
          case "hour" =>
            require(paramStr == null, "hour() takes no numeric parameter")
            require(sf.dataType == TimestampType,
              s"hour() needs a timestamp source, '$src' is ${sf.dataType.sql}")
            PartField(s"${src}_hour", "hour", 0, sf)
          case "bucket" =>
            require(param >= 1, s"bucket(N, col) needs N >= 1, got $paramStr")
            require(Seq(IntegerType, LongType, StringType, DateType,
                TimestampType).contains(sf.dataType),
              s"bucket() supports int/long/string/date/timestamp sources, " +
                s"'$src' is ${sf.dataType.sql}")
            PartField(s"${src}_bucket", "bucket", param, sf)
          case "truncate" =>
            require(param >= 1, s"truncate(W, col) needs W >= 1, got $paramStr")
            require(Seq(IntegerType, LongType, StringType).contains(sf.dataType),
              s"truncate() supports int/long/string sources, '$src' is ${sf.dataType.sql}")
            PartField(s"${src}_trunc", "truncate", param, sf)
          case other => throw new IllegalArgumentException(
            s"unknown partition transform '$other' in '$entry' " +
              "(day/month/year/hour/bucket/truncate or a bare column name)")
        }
      case bare =>
        require(bare.matches("[A-Za-z_][A-Za-z0-9_]*"),
          s"partition entry '$entry' is neither a column name nor a " +
            "transform like day(ts) / bucket(16, id) / truncate(4, s)")
        PartField(bare, "identity", 0, sourceField(bare))
    }
  }

  /** parse the metadata JSON's spec fields back into [[PartField]]s
    * (`nameById` resolves source-id → schema field) */
  def fromSpecJson(specFieldsJson: String,
      nameById: Map[Int, String], schema: StructType): Seq[PartField] =
    fromSpecJsonIndexed(specFieldsJson, nameById, schema).map(_._2)

  /** [[fromSpecJson]] keeping each field's ORIGINAL spec slot position
    * — `void` fields (dropped v1 partitions) occupy a slot in the
    * spec, the manifest partition record AND the manifest-list field
    * summaries, so any positional pairing against those structures
    * must index by the slot, not by the position in the void-filtered
    * list (a foreign spec with a void slot before real fields would
    * otherwise read the previous slot's summary as this field's). */
  def fromSpecJsonIndexed(specFieldsJson: String,
      nameById: Map[Int, String], schema: StructType): Seq[(Int, PartField)] = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(specFieldsJson)
    val Param = """(bucket|truncate)\[(\d+)\]""".r
    node.elements().asScala.toSeq.zipWithIndex.flatMap { case (f, slot) =>
      val t = f.get("transform").asText()
      if (t == "void") scala.None
      else {
        val srcId = f.get("source-id").asInt()
        val srcName = nameById.getOrElse(srcId, throw new IllegalArgumentException(
          s"partition spec references field id $srcId which is not a top-level column"))
        val sf = schema(srcName)
        val (fn, param): (String, Int) = t match {
          case Param(p, n) => (p, n.toInt)
          case "identity" | "day" | "month" | "year" | "hour" => (t, 0)
          case other => throw new IllegalArgumentException(
            s"partition transform '$other' not supported by the built-in " +
              "Iceberg reader (identity/day/month/year/hour/bucket/truncate)")
        }
        Some(slot -> PartField(f.get("name").asText(), fn, param, sf))
      }
    }
  }
  /** the Column deriving a spec field's value from its source column —
    * the write-side projection. Temporal math runs on epoch
    * micros/days (timezone-free), never on session-local calendars. */
  def columnExpr(pf: PartField): Column = {
    val c = col(pf.source.name)
    // floorDiv of the timestamp to a whole-second-multiple unit, EXACT
    // over the full timestamp domain: Column `/` is double division,
    // which rounds past ±2^53, so divide SECONDS (|epoch seconds| <
    // 2^43, and unix_seconds itself floorDivs micros) — the subtraction
    // makes the numerator an exact multiple of the unit, so the double
    // quotient is exact. floorDiv composition: floorDiv(floorDiv(µs,
    // 1e6), unit) == floorDiv(µs, unit*1e6) for positive divisors.
    def floorDivSecs(unitSecs: Long): Column =
      ((unix_seconds(c) - pmod(unix_seconds(c), lit(unitSecs)))
        / lit(unitSecs)).cast(IntegerType)
    def asDate: Column = pf.source.dataType match {
      case DateType => c
      case TimestampType => date_from_unix_date(floorDivSecs(86400L))
      case other => throw new IllegalArgumentException(
        s"${pf.transform}(${pf.source.name}): unsupported source ${other.sql}")
    }
    pf.transform match {
      case "identity" => c
      case "day" => asDate
      case "month" => (year(asDate) - lit(1970)) * lit(12) + month(asDate) - lit(1)
      case "year" => year(asDate) - lit(1970)
      case "hour" => floorDivSecs(3600L)
      case "bucket" =>
        GraftShim.column(IcebergBucket(GraftShim.expression(c), pf.param, pf.source.dataType))
      case "truncate" => pf.source.dataType match {
        case StringType => substring(c, 1, pf.param)
        case IntegerType => (c - pmod(c, lit(pf.param))).cast(IntegerType)
        case LongType => c - pmod(c, lit(pf.param.toLong))
        case other => throw new IllegalArgumentException(
          s"truncate(${pf.source.name}): unsupported source ${other.sql}")
      }
      case other => throw new IllegalArgumentException(
        s"unknown partition transform '$other'")
    }
  }

  // ---- spec bucket hash (murmur3_x86_32, seed 0) -----------------------

  def murmur3(data: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51; val c2 = 0x1b873593
    var h1 = 0 // seed
    val len = data.length
    val nblocks = len / 4
    var i = 0
    while (i < nblocks) {
      val i4 = i * 4
      var k1 = (data(i4) & 0xff) | ((data(i4 + 1) & 0xff) << 8) |
        ((data(i4 + 2) & 0xff) << 16) | ((data(i4 + 3) & 0xff) << 24)
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1; h1 = Integer.rotateLeft(h1, 13); h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    var k1 = 0
    val tail = nblocks * 4
    val rem = len & 3
    if (rem >= 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if (rem >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if (rem >= 1) {
      k1 ^= data(tail) & 0xff
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2; h1 ^= k1
    }
    h1 ^= len
    h1 ^= h1 >>> 16; h1 *= 0x85ebca6b; h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35; h1 ^= h1 >>> 16
    h1
  }

  /** int/long/date/timestamp hash as 8-byte LITTLE-endian longs per
    * spec (ints and longs hash identically) */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    murmur3(b)
  }

  def hashString(s: String): Int =
    murmur3(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** bucket id of an ALREADY-TYPED runtime value (Spark internal types:
    * UTF8String for strings, Int for date days, Long for micros) */
  def bucketOf(dt: DataType, value: Any, n: Int): Int = {
    val h = dt match {
      case IntegerType => hashLong(value.asInstanceOf[Int].toLong)
      case LongType => hashLong(value.asInstanceOf[Long])
      case DateType => hashLong(value.asInstanceOf[Int].toLong)
      case TimestampType | TimestampNTZType => hashLong(value.asInstanceOf[Long])
      case StringType => hashString(value.toString)
      case other => throw new IllegalArgumentException(
        s"bucket(): unsupported source type ${other.sql}")
    }
    (h & Integer.MAX_VALUE) % n
  }

  /** transformed partition value (the manifest record / typed path
    * value) → EXACT (lower, upper) bounds on the SOURCE column, in the
    * source's Spark INTERNAL value space — what the manifest pruner
    * consumes. None for bucket (not range-expressible). */
  def sourceBounds(pf: PartField, v: AnyRef): Option[(Any, Any)] = {
    def dayRangeMicros(firstDay: Long, lastDayExclusive: Long): (Any, Any) =
      (firstDay * 86400000000L, lastDayExclusive * 86400000000L - 1L)
    (pf.transform, v) match {
      case (_, null) => scala.None
      case ("identity", x) => Some((x, x))
      case ("day", d: java.lang.Integer) => pf.source.dataType match {
        case DateType => Some((d.intValue(), d.intValue()))
        case TimestampType | TimestampNTZType =>
          Some(dayRangeMicros(d.longValue(), d.longValue() + 1))
        case _ => scala.None
      }
      case ("month", m: java.lang.Integer) =>
        val first = java.time.LocalDate.of(1970 + Math.floorDiv(m.intValue(), 12),
          Math.floorMod(m.intValue(), 12) + 1, 1)
        val next = first.plusMonths(1)
        pf.source.dataType match {
          case DateType => Some((first.toEpochDay.toInt, next.toEpochDay.toInt - 1))
          case TimestampType | TimestampNTZType =>
            Some(dayRangeMicros(first.toEpochDay, next.toEpochDay))
          case _ => scala.None
        }
      case ("year", y: java.lang.Integer) =>
        val first = java.time.LocalDate.of(1970 + y.intValue(), 1, 1)
        val next = first.plusYears(1)
        pf.source.dataType match {
          case DateType => Some((first.toEpochDay.toInt, next.toEpochDay.toInt - 1))
          case TimestampType | TimestampNTZType =>
            Some(dayRangeMicros(first.toEpochDay, next.toEpochDay))
          case _ => scala.None
        }
      case ("hour", h: java.lang.Integer) =>
        Some((h.longValue() * 3600000000L, (h.longValue() + 1) * 3600000000L - 1L))
      case ("truncate", x) => pf.source.dataType match {
        case IntegerType => val lo = x.asInstanceOf[java.lang.Integer].intValue()
          Some((lo, lo + pf.param - 1))
        case LongType => val lo = x.asInstanceOf[java.lang.Long].longValue()
          Some((lo, lo + pf.param - 1))
        case StringType =>
          // any string with this prefix is >= prefix and < bump(prefix);
          // an un-bumpable prefix (all max codepoints) keeps only the lower
          val p = x.toString
          Some((p, bumpPrefix(p).getOrElse(return Some((p, null)))))
        case _ => scala.None
      }
      case _ => scala.None
    }
  }

  /** smallest string STRICTLY greater than every string with prefix
    * `p`: bump the last bumpable codepoint, drop the tail */
  private[graft] def bumpPrefix(p: String): Option[String] = {
    val cps = p.codePoints().toArray
    var i = cps.length - 1
    while (i >= 0) {
      if (cps(i) < 0x10FFFF) {
        val next = cps(i) + 1
        // skip the surrogate gap
        val bumped = if (next >= 0xD800 && next <= 0xDFFF) 0xE000 else next
        return Some(new String(cps.take(i) :+ bumped, 0, i + 1))
      }
      i -= 1
    }
    scala.None
  }
}

/** Native expression: the spec's bucket transform (murmur3 mod N) over
  * one column — write-path derivation of `<col>_bucket` without a UDF.
  * Tight eval over internal values; same CodegenFallback stance as the
  * other per-row kernels ([[graft.plans.SimHash64]]). */
case class IcebergBucket(child: org.apache.spark.sql.catalyst.expressions.Expression,
    n: Int, sourceType: DataType)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(n >= 1, s"bucket N must be >= 1, got $n")
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    IcebergTransforms.bucketOf(sourceType, input, n)
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): IcebergBucket =
    copy(child = newChild)
  override def prettyName: String = "iceberg_bucket"
}
