package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Built-in Avro object-container writer (scalar-typed, symmetric with
  * [[AvroScan]] — same scope statement as ArrowWrite: long/int/string/
  * boolean/float/double/binary/date/timestamp/decimal columns; nested
  * types fail loudly). Container framing and codec come from
  * avro-core's DataFileWriter.
  *
  * [[write]] emits ONE container through the driver with bounded
  * memory (local iterator — single-threaded by construction);
  * [[writeSharded]] is the scale path: one container per executor
  * partition, written in parallel, committed via [[ShardedSink]]'s
  * manifest protocol and read back distributed with
  * [[AvroScan.readSharded]]. */
object AvroWrite {

  /** the Avro record schema for a Spark schema — shared by both write
    * forms (and serializable-safe: rebuilt from the JSON string inside
    * tasks, since avro Schema predates serialization support) */
  private def avroSchemaOf(fields: Array[StructField]): Schema = {
    val b = SchemaBuilder.record("graft_export").fields()
    fields.foreach { f =>
      b.name(f.name).`type`(avroType(f.dataType, f.name)).withDefault(null)
    }
    b.endRecord()
  }

  def write(df: DataFrame, path: String,
      maxRows: Long = ArrowWrite.SingleFileMaxRows): Unit = {
    val fields = df.schema.fields
    val schema = avroSchemaOf(fields)
    val fieldSchemas = schema.getFields.asScala.map(f => unwrap(f.schema)).toArray

    val p = new Path(path)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    var failed = false
    try {
      w.create(schema, out)
      // one partition in driver memory at a time; the size guard
      // refuses past maxRows with a pointer at writeSharded  [lint:bounded]
      ArrowWrite.guardedRows(df.toLocalIterator().asScala, maxRows, path, "avro")
        .foreach { row =>
          val rec = new GenericData.Record(schema)
          fields.indices.foreach { i =>
            rec.put(i, if (row.isNullAt(i)) null
                       else avroValue(row.get(i), fields(i).dataType, fieldSchemas(i)))
          }
          w.append(rec)
        }
    } catch { case e: Throwable => failed = true; throw e }
    finally {
      // close in its own guard: if the underlying stream already died,
      // close() throws too — the failure-path delete must still run so
      // no truncated file is left at the destination
      try w.close() // closes the stream
      catch { case e: Throwable => if (!failed) throw e }
      finally if (failed) fs.delete(p, false)
    }
  }

  /** Executor-side sharded export: one `part-NNNNN-xxxxxxxx.avro`
    * object container per nonempty partition, written in parallel
    * directly into `dir`; the driver commits `_manifest.json` over the
    * winning attempts ([[ShardedSink]]). Returns (fileName, rowCount)
    * per shard. */
  def writeSharded(df: DataFrame, dir: String): Seq[(String, Long)] = {
    val sparkSchema = df.schema
    val schemaJson = avroSchemaOf(sparkSchema.fields).toString // validates types, loud pre-job
    val spark = df.sparkSession
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dirPath)
    val qualified = fs.makeQualified(dirPath).toString
    val confB = spark.sparkContext.broadcast(new org.apache.spark.SerializableWritable(
      spark.sparkContext.hadoopConfiguration))
    // one (name, rows) pair per partition — bounded driver state  [lint:bounded]
    val written = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val schema = new Schema.Parser().parse(schemaJson)
        val fields = sparkSchema.fields
        val fieldSchemas = schema.getFields.asScala.map(f => unwrap(f.schema)).toArray
        val name = ShardedSink.shardName(pid, "avro")
        val out = new Path(qualified, name)
        val os = out.getFileSystem(confB.value.value).create(out, true)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        var rows = 0L
        try {
          w.create(schema, os)
          it.foreach { row =>
            val rec = new GenericData.Record(schema)
            fields.indices.foreach { i =>
              rec.put(i, if (row.isNullAt(i)) null
                         else avroValue(row.get(i), fields(i).dataType, fieldSchemas(i)))
            }
            w.append(rec)
            rows += 1
          }
        } finally w.close()
        Iterator.single((name, rows))
      }
    }.collect().toSeq // [lint:bounded] one (name, rows) pair per partition
    ShardedSink.commit(fs, dirPath, "avro", written)
    written
  }

  private def unwrap(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  /** nullable union [null, T] for every column (Spark columns are
    * nullable by default; a tighter schema adds nothing on re-read) */
  private def avroType(dt: DataType, name: String): Schema = {
    val base = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case DateType =>
        LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case d: DecimalType =>
        LogicalTypes.decimal(d.precision, d.scale)
          .addToSchema(Schema.create(Schema.Type.BYTES))
      case other =>
        throw new IllegalArgumentException(
          s"AvroWrite: unsupported type $other for column '$name' " +
            "(scalar-typed writer; flatten nested columns first)")
    }
    Schema.createUnion(Schema.create(Schema.Type.NULL), base)
  }

  private def avroValue(v: Any, dt: DataType, target: Schema): Any = dt match {
    case DateType =>
      v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt
    case TimestampType =>
      // whole seconds from getTime (floorDiv for pre-epoch), sub-second
      // entirely from getNanos — adding both millis and nanos would
      // double-count the fraction
      val ts = v.asInstanceOf[java.sql.Timestamp]
      Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
    case d: DecimalType =>
      val bd = v.asInstanceOf[java.math.BigDecimal].setScale(d.scale)
      java.nio.ByteBuffer.wrap(bd.unscaledValue().toByteArray)
    case ShortType => v.asInstanceOf[Short].toInt
    case ByteType => v.asInstanceOf[Byte].toInt
    case BinaryType => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
    case _ => v
  }
}
