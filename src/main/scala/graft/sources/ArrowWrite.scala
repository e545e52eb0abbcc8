package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowFileWriter
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ASchema}
import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit => ATimeUnit}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Arrow IPC FILE writer — the outbound half of the `copy_to` Arrow
  * surface ([[ArrowScan]] is the inbound half); `writeFile` dispatches
  * `.arrow`/`.feather` here. Writes uncompressed record batches of
  * `batchRows` rows.
  *
  * Scalar types only (the tabular-interchange scope): byte/short/int/
  * long, float/double, bool, string, binary, date, timestamp,
  * decimal — list/struct/map fail loudly.
  *
  * Two forms: [[write]] emits ONE file through the driver with
  * BOUNDED memory (one `batchRows` batch at a time off a local
  * iterator — the single-file interchange artifact); [[writeSharded]]
  * is the scale path — every executor partition writes its own IPC
  * file in parallel, so a 100 TB frame exports without any
  * data-sized driver state.
  */
object ArrowWrite {

  def write(df: DataFrame, path: String, batchRows: Int = 65536,
      maxRows: Long = SingleFileMaxRows): Unit = {
    require(batchRows >= 1, s"batchRows must be >= 1, got $batchRows")
    val schema = df.schema
    schema.fields.foreach(arrowField) // validate before any job runs
    val ch = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(path),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE,
      java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
    // toLocalIterator: one partition in memory at a time — the
    // single-file form is single-threaded by construction, but its
    // driver memory is batch-bounded, not data-sized  [lint:bounded]
    var failed = false
    try writeBatches(schema,
      guardedRows(df.toLocalIterator().asScala, maxRows, path, "arrow"),
      ch, batchRows)
    catch { case e: Throwable => failed = true; throw e }
    finally {
      // close in its own guard so a close() failure (stream already
      // dead) can't skip the failure-path cleanup of the partial file
      try ch.close()
      catch { case e: Throwable => if (!failed) throw e }
      finally if (failed)
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path))
    }
  }

  /** single-file exports serialize through the DRIVER — refuse past
    * this many rows (override per call) instead of silently spending
    * hours; the partial file is deleted on refusal */
  val SingleFileMaxRows: Long = 50L * 1000 * 1000

  /** wraps a row iterator with the size guard: crossing `maxRows`
    * aborts the export with a pointer to the sharded sink — the damage
    * is capped at the threshold, not at full serialization */
  private[sources] def guardedRows[T](it: Iterator[T], maxRows: Long,
      path: String, fmt: String): Iterator[T] = {
    require(maxRows >= 1, s"maxRows must be >= 1, got $maxRows")
    var n = 0L
    it.map { r =>
      n += 1
      if (n > maxRows) throw new IllegalArgumentException(
        s"single-file $fmt export of $path exceeds maxRows=$maxRows — " +
          s"the single-file form streams through the driver; use " +
          s"writeSharded (write_file '${fmt}_sharded') for frames this " +
          "size, or raise maxRows explicitly if you accept the cost")
      r
    }
  }

  /** Executor-side sharded export: each nonempty partition writes one
    * `part-NNNNN-xxxxxxxx.arrow` IPC file directly into `dir` (tasks
    * run in parallel; the driver only sees one (name, rows) pair per
    * partition), then the driver commits a `_manifest.json` naming the
    * winning attempts' files — [[ShardedSink]]'s protocol, same shape
    * as `Packing.writeTokenShards`. Read back distributed with
    * [[ArrowScan.readSharded]] or file-by-file with any Arrow reader.
    * Returns (fileName, rowCount) per shard. */
  def writeSharded(df: DataFrame, dir: String, batchRows: Int = 65536): Seq[(String, Long)] = {
    require(batchRows >= 1, s"batchRows must be >= 1, got $batchRows")
    val schema = df.schema
    schema.fields.foreach(arrowField) // loud on unsupported types before any job
    val spark = df.sparkSession
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dirPath)
    val qualified = fs.makeQualified(dirPath).toString
    val confB = spark.sparkContext.broadcast(new org.apache.spark.SerializableWritable(
      spark.sparkContext.hadoopConfiguration))
    // one (name, rows) pair per partition — bounded driver state  [lint:bounded]
    val written = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val name = ShardedSink.shardName(pid, "arrow")
        val out = new org.apache.hadoop.fs.Path(qualified, name)
        val os = out.getFileSystem(confB.value.value).create(out, true)
        val ch = java.nio.channels.Channels.newChannel(os)
        val rows = try writeBatches(schema, it, ch, batchRows)
          finally { ch.close(); os.close() }
        Iterator.single((name, rows))
      }
    }.collect().toSeq // [lint:bounded] one (name, rows) pair per partition
    ShardedSink.commit(fs, dirPath, "arrow", written)
    written
  }

  /** shared batch loop (driver single-file and executor shard paths):
    * streams `rows` into `ch` as IPC record batches of `batchRows`,
    * holding at most one batch in vectors at a time; returns the row
    * count written */
  private def writeBatches(schema: StructType, rows: Iterator[
      org.apache.spark.sql.Row], ch: java.nio.channels.WritableByteChannel,
      batchRows: Int): Long = {
    val aFields = schema.fields.map(arrowField).toSeq
    var n = 0L
    val alloc = new RootAllocator()
    try {
      val root = VectorSchemaRoot.create(new ASchema(aFields.asJava), alloc)
      try {
        val w = new ArrowFileWriter(root, null, ch)
        try {
          w.start()
          rows.grouped(batchRows).foreach { batch =>
            root.allocateNew()
            batch.zipWithIndex.foreach { case (r, i) =>
              schema.fields.indices.foreach { c =>
                setCell(root.getVector(c), i, if (r.isNullAt(c)) null else r.get(c))
              }
            }
            root.setRowCount(batch.length)
            w.writeBatch()
            n += batch.length
          }
          w.end()
        } finally w.close()
      } finally root.close()
    } finally alloc.close()
    n
  }

  private def arrowField(f: StructField): Field = {
    val t: ArrowType = f.dataType match {
      case ByteType => new ArrowType.Int(8, true)
      case ShortType => new ArrowType.Int(16, true)
      case IntegerType => new ArrowType.Int(32, true)
      case LongType => new ArrowType.Int(64, true)
      case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case BooleanType => ArrowType.Bool.INSTANCE
      case StringType => ArrowType.Utf8.INSTANCE
      case BinaryType => ArrowType.Binary.INSTANCE
      case DateType => new ArrowType.Date(org.apache.arrow.vector.types.DateUnit.DAY)
      case TimestampType => new ArrowType.Timestamp(ATimeUnit.MICROSECOND, "UTC")
      case d: DecimalType => new ArrowType.Decimal(d.precision, d.scale, 128)
      case other => throw new IllegalArgumentException(
        s"ArrowWrite supports scalar columns only; '${f.name}' is ${other.sql}")
    }
    new Field(f.name, FieldType.nullable(t), null)
  }

  private def setCell(v: FieldVector, i: Int, value: Any): Unit = (v, value) match {
    case (x: BaseFixedWidthVector, null) => x.setNull(i)
    case (x: BaseVariableWidthVector, null) => x.setNull(i)
    case (x: TinyIntVector, b: Byte) => x.setSafe(i, b)
    case (x: SmallIntVector, s: Short) => x.setSafe(i, s)
    case (x: IntVector, n: Int) => x.setSafe(i, n)
    case (x: BigIntVector, l: Long) => x.setSafe(i, l)
    case (x: Float4Vector, f: Float) => x.setSafe(i, f)
    case (x: Float8Vector, d: Double) => x.setSafe(i, d)
    case (x: BitVector, b: Boolean) => x.setSafe(i, if (b) 1 else 0)
    case (x: VarCharVector, s: String) =>
      x.setSafe(i, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    case (x: VarBinaryVector, b: Array[Byte]) => x.setSafe(i, b)
    case (x: DateDayVector, d: java.sql.Date) =>
      x.setSafe(i, d.toLocalDate.toEpochDay.toInt)
    case (x: TimeStampMicroTZVector, t: java.sql.Timestamp) =>
      x.setSafe(i, Math.addExact(
        Math.multiplyExact(t.toInstant.getEpochSecond, 1000000L),
        (t.toInstant.getNano / 1000).toLong))
    case (x: DecimalVector, d: java.math.BigDecimal) => x.setSafe(i, d)
    case (vec, other) => throw new IllegalArgumentException(
      s"ArrowWrite: cannot store ${other.getClass.getName} in ${vec.getClass.getSimpleName}")
  }
}
