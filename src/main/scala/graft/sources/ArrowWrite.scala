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
  * decimal — list/struct/map fail loudly. Driver-side like the scan
  * (single-machine artifact); rows are collected, so the caller bounds
  * the size.
  */
object ArrowWrite {

  def write(df: DataFrame, path: String, batchRows: Int = 65536): Unit = {
    require(batchRows >= 1, s"batchRows must be >= 1, got $batchRows")
    val schema = df.schema
    val aFields = schema.fields.map(arrowField).toSeq
    val rows = df.collect()
    val alloc = new RootAllocator()
    try {
      val root = VectorSchemaRoot.create(new ASchema(aFields.asJava), alloc)
      try {
        val ch = java.nio.channels.FileChannel.open(
          java.nio.file.Paths.get(path),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE,
          java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
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
          }
          w.end()
        } finally { w.close(); ch.close() }
      } finally root.close()
    } finally alloc.close()
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
