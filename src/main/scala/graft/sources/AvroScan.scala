package graft.sources

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Built-in Avro object-container reader — Spark ships avro-core (the
  * official Apache implementation, already used by the Iceberg
  * manifest reader) but NOT the spark-avro connector, so `.avro`
  * files are otherwise unreadable here. Container framing, sync
  * markers, and deflate codec are handled by avro-core's
  * DataFileReader; this class only maps Avro types/values to Spark.
  *
  * Type mapping (loud failure outside it): boolean/int/long/float/
  * double/string/bytes/enum(→string)/fixed(→binary); logical types
  * date → DateType, timestamp-millis/micros → TimestampType,
  * decimal(bytes|fixed) → DecimalType; `[null, T]` unions → nullable
  * T; record → StructType; array<T> → ArrayType; map<string,T> →
  * MapType. Recursive through nesting.
  *
  * Scale note: like the Arrow/stat-file family, one `.avro` file is a
  * single-machine artifact — parsed driver-side (2 GiB bound) with
  * rows parallelized afterward. The container's block framing would
  * support a distributed per-block path if multi-GB exports matter.
  */
object AvroScan {

  def read(spark: SparkSession, path: String): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(p).getLen
    require(len < 2L * 1024 * 1024 * 1024,
      s"Avro file too large for the driver-side reader ($len bytes)")
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    val (schema, rows) = parseRows(bytes)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows,
        math.max(1, math.min(32, rows.size / 10000 + 1))), schema)
  }

  /** one container's bytes → (schema, rows) — pure, runs on the driver
    * ([[read]]) or inside an executor task ([[readSharded]]) */
  private[sources] def parseRows(bytes: Array[Byte]): (StructType, Seq[Row]) = {
    val reader = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(bytes), new GenericDatumReader[GenericRecord]())
    try {
      val avroSchema = reader.getSchema
      require(avroSchema.getType == Schema.Type.RECORD,
        s"top-level Avro schema must be a record, got ${avroSchema.getType}")
      val fields = avroSchema.getFields.asScala.toSeq
      val schema = StructType(fields.map(f =>
        StructField(f.name, sparkType(f.schema), nullable = isNullable(f.schema))))
      val rows = mutable.ArrayBuffer.empty[Row]
      while (reader.hasNext) {
        val rec = reader.next()
        rows += Row.fromSeq(fields.indices.map(i => cell(rec.get(i), f = fields(i).schema)))
      }
      (schema, rows.toSeq)
    } finally reader.close()
  }

  /** Distributed scan of a sharded Avro dir ([[AvroWrite.writeSharded]]
    * output): file set from `_manifest.json` (glob fallback), schema
    * from one container's header driver-side, each container parsed in
    * its own executor task. Loud on schema drift between shards. */
  def readSharded(spark: SparkSession, dir: String): DataFrame = {
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = ShardedSink.listShards(fs, dirPath, "avro")
    require(names.nonEmpty, s"no .avro shards under $dir")
    val schema = {
      val p = new Path(dirPath, names.head)
      val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      val in = fs.open(p)
      try in.readFully(0, bytes) finally in.close()
      parseRows(bytes)._1
    }
    val paths = names.map(n => fs.makeQualified(new Path(dirPath, n)).toString)
    val bin = spark.read.format("binaryFile").load(paths: _*)
      .select(org.apache.spark.sql.functions.col("path"),
        org.apache.spark.sql.functions.col("content"))
    val rows = bin.rdd.flatMap { r =>
      val (s, rs) = parseRows(r.getAs[Array[Byte]](1))
      require(s == schema,
        s"shard ${r.getString(0)} schema $s drifts from ${names.head}'s $schema")
      rs
    }
    spark.createDataFrame(rows, schema)
  }

  /** `[null, T]` (either order) → T; anything else passes through */
  private def unwrap(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION) {
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1,
        s"only [null, T] unions are supported, got ${s.getTypes.asScala.map(_.getType)}")
      nonNull.head
    } else s

  private def isNullable(s: Schema): Boolean =
    s.getType == Schema.Type.UNION &&
      s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  private def sparkType(sIn: Schema): DataType = {
    val s = unwrap(sIn)
    (s.getType, s.getLogicalType) match {
      case (Schema.Type.BOOLEAN, _) => BooleanType
      case (Schema.Type.INT, _: LogicalTypes.Date) => DateType
      case (Schema.Type.INT, _) => IntegerType
      case (Schema.Type.LONG, _: LogicalTypes.TimestampMillis) => TimestampType
      case (Schema.Type.LONG, _: LogicalTypes.TimestampMicros) => TimestampType
      case (Schema.Type.LONG, _) => LongType
      case (Schema.Type.FLOAT, _) => FloatType
      case (Schema.Type.DOUBLE, _) => DoubleType
      case (Schema.Type.STRING, _) => StringType
      case (Schema.Type.ENUM, _) => StringType
      case (Schema.Type.BYTES, d: LogicalTypes.Decimal) =>
        DecimalType(d.getPrecision, d.getScale)
      case (Schema.Type.FIXED, d: LogicalTypes.Decimal) =>
        DecimalType(d.getPrecision, d.getScale)
      case (Schema.Type.BYTES, _) => BinaryType
      case (Schema.Type.FIXED, _) => BinaryType
      case (Schema.Type.RECORD, _) =>
        StructType(s.getFields.asScala.toSeq.map(f =>
          StructField(f.name, sparkType(f.schema), nullable = isNullable(f.schema))))
      case (Schema.Type.ARRAY, _) =>
        ArrayType(sparkType(s.getElementType), containsNull = isNullable(s.getElementType))
      case (Schema.Type.MAP, _) =>
        MapType(StringType, sparkType(s.getValueType),
          valueContainsNull = isNullable(s.getValueType))
      case (t, _) =>
        throw new IllegalArgumentException(s"unsupported Avro type $t")
    }
  }

  private def cell(v: Any, f: Schema): Any = {
    val s = unwrap(f)
    if (v == null) return null
    (s.getType, s.getLogicalType) match {
      case (Schema.Type.INT, _: LogicalTypes.Date) =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case (Schema.Type.LONG, _: LogicalTypes.TimestampMillis) =>
        new java.sql.Timestamp(v.asInstanceOf[Long])
      case (Schema.Type.LONG, _: LogicalTypes.TimestampMicros) =>
        val us = v.asInstanceOf[Long]
        val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
        ts
      case (Schema.Type.BYTES, d: LogicalTypes.Decimal) =>
        BigDecimal(new java.math.BigInteger(bufBytes(v)), d.getScale)
      case (Schema.Type.FIXED, d: LogicalTypes.Decimal) =>
        BigDecimal(new java.math.BigInteger(
          v.asInstanceOf[GenericData.Fixed].bytes()), d.getScale)
      case (Schema.Type.STRING, _) => v.toString
      case (Schema.Type.ENUM, _) => v.toString
      case (Schema.Type.BYTES, _) => bufBytes(v)
      case (Schema.Type.FIXED, _) => v.asInstanceOf[GenericData.Fixed].bytes().clone()
      case (Schema.Type.RECORD, _) =>
        val rec = v.asInstanceOf[GenericRecord]
        Row.fromSeq(s.getFields.asScala.toSeq.map(f2 => cell(rec.get(f2.pos), f2.schema)))
      case (Schema.Type.ARRAY, _) =>
        v.asInstanceOf[java.util.Collection[Any]].asScala.toSeq
          .map(e => cell(e, s.getElementType))
      case (Schema.Type.MAP, _) =>
        v.asInstanceOf[java.util.Map[Any, Any]].asScala.map {
          case (k, mv) => k.toString -> cell(mv, s.getValueType)
        }.toMap
      case _ => v
    }
  }

  private def bufBytes(v: Any): Array[Byte] = v match {
    case bb: java.nio.ByteBuffer =>
      val d = bb.duplicate(); val out = new Array[Byte](d.remaining()); d.get(out); out
    case a: Array[Byte] => a
  }
}
