package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.WarcScan

/** `parse_warc(binary)` → array of WARC record structs — the
  * column-level face of [[graft.sources.WarcScan]] (same parser core,
  * byte-identical fields). Lets record extraction run INSIDE a
  * distributed plan: a binary column holding one-or-more concatenated
  * WARC records (plain or gzip) explodes into typed rows without a
  * file boundary in sight — e.g. crawl payload blobs landed in a
  * parquet/Delta `binary` column, or synthetic record streams in the
  * correctness gates.
  *
  * NULL for NULL input; malformed records throw (same loud contract
  * as the file reader). Element struct matches
  * [[WarcScan.recordSchema]].
  */
case class WarcParse(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(WarcScan.recordSchema, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"parse_warc expects binary, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val recs = WarcScan.parseBytes(input.asInstanceOf[Array[Byte]], "parse_warc")
      .map { r =>
        InternalRow(
          UTF8String.fromString(r.recordId),
          UTF8String.fromString(r.warcType),
          UTF8String.fromString(r.targetUri),
          UTF8String.fromString(r.date),
          UTF8String.fromString(r.contentType),
          r.contentLength,
          r.httpStatus.map(Int.box).orNull,
          r.httpContentType.map(UTF8String.fromString).orNull,
          r.payload)
      }.toArray[Any]
    new GenericArrayData(recs)
  }

  override protected def withNewChildInternal(newChild: Expression): WarcParse =
    copy(child = newChild)

  override def prettyName: String = "parse_warc"
}
