package graft.sources

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.{ListVector, StructVector}
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowStreamReader}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Built-in Arrow IPC reader — the `copy_to` Arrow-register surface of
  * the reference (src/TidierDB.jl:316-371 registers `Arrow.Table`s with
  * DuckDB): `.arrow`/`.feather` (IPC FILE format, magic `ARROW1` — what
  * `pyarrow.feather.write_feather` v2 emits) and `.arrows` (IPC STREAM
  * format). Uses Spark's own bundled arrow-vector jars — no new
  * dependencies.
  *
  * Type mapping (loud failure outside it): signed ints 8/16/32/64 →
  * byte/short/int/long, float32/64, bool, utf8 → string, binary,
  * date32 → date, timestamp (s/ms/µs/ns, tz-naive or UTC) → timestamp,
  * decimal128 → DecimalType, list<supported> → ArrayType,
  * struct<supported…> → StructType. Dictionary-encoded columns and
  * unsigned ints fail loudly (documented).
  *
  * Scale note: like the stat-file family, an Arrow IPC file is a
  * single-machine artifact — parsed driver-side (2 GiB bound enforced)
  * with rows parallelized. The record-batch framing would support a
  * distributed per-batch path if multi-GB exports ever matter.
  */
object ArrowScan {

  def read(spark: SparkSession, path: String): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(p).getLen
    require(len < 2L * 1024 * 1024 * 1024,
      s"Arrow file too large for the driver-side reader ($len bytes)")
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    val stream = path.toLowerCase.endsWith(".arrows") ||
      !(bytes.length >= 6 && new String(bytes, 0, 6, "US-ASCII") == "ARROW1")
    parse(spark, bytes, stream, path)
  }

  private def parse(
      spark: SparkSession, bytes: Array[Byte], stream: Boolean, path: String): DataFrame = {
    val (schema, rows) = parseRows(bytes, stream)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows,
        math.max(1, math.min(32, rows.size / 10000 + 1))), schema)
  }

  /** one IPC file's bytes → (schema, rows) — pure, so it runs on the
    * driver (single-file [[read]]) or inside an executor task
    * ([[readSharded]]) identically */
  private[sources] def parseRows(
      bytes: Array[Byte], stream: Boolean): (StructType, Seq[Row]) = {
    val alloc = new RootAllocator()
    try {
      // CommonsCompressionFactory understands the lz4/zstd buffer
      // compression pyarrow's write_feather applies by default
      val codecs = org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE
      val reader =
        if (stream) new ArrowStreamReader(
          new java.io.ByteArrayInputStream(bytes), alloc, codecs)
        else new ArrowFileReader(
          new org.apache.arrow.vector.ipc.SeekableReadChannel(
            new org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel(bytes)),
          alloc, codecs)
      try {
        val root = reader.getVectorSchemaRoot
        val schema = StructType(root.getSchema.getFields.asScala.toSeq.map(sparkField))
        val rows = mutable.ArrayBuffer.empty[Row]
        while (reader.loadNextBatch()) {
          val vectors = root.getFieldVectors.asScala.toSeq
          var r = 0
          while (r < root.getRowCount) {
            rows += Row.fromSeq(vectors.map(v => cell(v, r)))
            r += 1
          }
        }
        (schema, rows.toSeq)
      } finally reader.close()
    } finally alloc.close()
  }

  /** Distributed scan of a sharded Arrow dir ([[ArrowWrite.writeSharded]]
    * output, or any directory of uniform-schema `part-*.arrow` files):
    * the file set comes from the `_manifest.json` commit record (glob
    * fallback), the schema from ONE file's footer driver-side, and each
    * file parses inside its own executor task — parallelism = shard
    * count, no data-sized driver state. Loud on schema drift between
    * shards. */
  def readSharded(spark: SparkSession, dir: String): DataFrame = {
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = ShardedSink.listShards(fs, dirPath, "arrow")
    require(names.nonEmpty, s"no .arrow shards under $dir")
    val schema = {
      val p = new Path(dirPath, names.head)
      val len = fs.getFileStatus(p).getLen
      val bytes = new Array[Byte](len.toInt)
      val in = fs.open(p)
      try in.readFully(0, bytes) finally in.close()
      parseRows(bytes, stream = false)._1
    }
    val paths = names.map(n => fs.makeQualified(new Path(dirPath, n)).toString)
    val bin = spark.read.format("binaryFile").load(paths: _*)
      .select(col("path"), col("content"))
    val rows = bin.rdd.flatMap { r =>
      val (s, rs) = parseRows(r.getAs[Array[Byte]](1), stream = false)
      require(s == schema,
        s"shard ${r.getString(0)} schema $s drifts from ${names.head}'s $schema")
      rs
    }
    spark.createDataFrame(rows, schema)
  }

  private def sparkField(f: org.apache.arrow.vector.types.pojo.Field): StructField = {
    require(f.getDictionary == null,
      s"dictionary-encoded Arrow column '${f.getName}' not supported")
    StructField(f.getName, sparkType(f), nullable = f.isNullable)
  }

  private def sparkType(f: org.apache.arrow.vector.types.pojo.Field): DataType = {
    import org.apache.arrow.vector.types.pojo.ArrowType
    f.getType match {
      case t: ArrowType.Int =>
        require(t.getIsSigned, s"unsigned Arrow int column '${f.getName}' not supported")
        t.getBitWidth match {
          case 8 => ByteType
          case 16 => ShortType
          case 32 => IntegerType
          case 64 => LongType
          case w => throw new IllegalArgumentException(s"int$w not supported")
        }
      case t: ArrowType.FloatingPoint =>
        t.getPrecision match {
          case org.apache.arrow.vector.types.FloatingPointPrecision.SINGLE => FloatType
          case org.apache.arrow.vector.types.FloatingPointPrecision.DOUBLE => DoubleType
          case p => throw new IllegalArgumentException(s"float precision $p not supported")
        }
      case _: ArrowType.Bool => BooleanType
      case _: ArrowType.Utf8 => StringType
      case _: ArrowType.Binary => BinaryType
      case _: ArrowType.Date => DateType
      case _: ArrowType.Timestamp => TimestampType
      case t: ArrowType.Decimal => DecimalType(t.getPrecision, t.getScale)
      case _: ArrowType.List =>
        ArrayType(sparkType(f.getChildren.get(0)),
          containsNull = f.getChildren.get(0).isNullable)
      case _: ArrowType.Struct =>
        StructType(f.getChildren.asScala.toSeq.map(sparkField))
      case other => throw new IllegalArgumentException(
        s"Arrow type ${other} of column '${f.getName}' not supported " +
          "(supported: signed ints, float32/64, bool, utf8, binary, date32, " +
          "timestamp, decimal128, list, struct)")
    }
  }

  /** one vector cell → Spark external-row value */
  private def cell(v: ValueVector, r: Int): Any = {
    if (v.isNull(r)) return null
    v match {
      case x: TinyIntVector => x.get(r)
      case x: SmallIntVector => x.get(r)
      case x: IntVector => x.get(r)
      case x: BigIntVector => x.get(r)
      case x: Float4Vector => x.get(r)
      case x: Float8Vector => x.get(r)
      case x: BitVector => x.get(r) == 1
      case x: VarCharVector => new String(x.get(r), "UTF-8")
      case x: VarBinaryVector => x.get(r)
      case x: DateDayVector => java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(x.get(r).toLong))
      case x: DateMilliVector => java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(Math.floorDiv(x.get(r), 86400000L)))
      case x: TimeStampVector =>
        val t = x.get(r)
        val micros = x match {
          case _: TimeStampSecVector | _: TimeStampSecTZVector => Math.multiplyExact(t, 1000000L)
          case _: TimeStampMilliVector | _: TimeStampMilliTZVector => Math.multiplyExact(t, 1000L)
          case _: TimeStampMicroVector | _: TimeStampMicroTZVector => t
          case _: TimeStampNanoVector | _: TimeStampNanoTZVector => Math.floorDiv(t, 1000L)
        }
        java.sql.Timestamp.from(java.time.Instant.EPOCH.plus(micros, java.time.temporal.ChronoUnit.MICROS))
      case x: DecimalVector => x.getObject(r)
      case x: ListVector =>
        val d = x.getDataVector
        (x.getElementStartIndex(r) until x.getElementEndIndex(r)).map(i => cell(d, i))
      case x: StructVector =>
        Row.fromSeq(x.getChildrenFromFields.asScala.toSeq.map(c => cell(c, r)))
      case other => throw new IllegalArgumentException(
        s"unsupported Arrow vector ${other.getClass.getSimpleName}")
    }
  }
}
