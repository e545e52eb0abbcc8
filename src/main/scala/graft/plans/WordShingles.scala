package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: text → its word k-shingles as STRINGS, every
  * occurrence in document order (non-distinct), in ONE pass per row.
  *
  * Semantically identical to the composable formulation
  * `transform(sequence(1, n-k+1), i -> concat_ws(' ', slice(toks,i,k)))`
  * over `toks = filter(split(lower(text), '\\s+'), t -> t <> '')` —
  * the [[graft.functions.TextFns.wordShinglesFromTokens]] HOF chain,
  * and what the DuckDB oracles rebuild with `list_transform(range…)`.
  * Sibling of [[HashedWordShingles]] (which distincts and hashes);
  * occurrence counts matter here (repetition statistics), so this one
  * keeps duplicates and the strings.
  *
  * WHY: the HOF chain is CodegenFallback with per-element interpreted
  * closures (~1-2 ms/row on 300-char docs); this pays the fallback once
  * per ROW (~10 µs). See [[HashedWordShingles]] for the full argument.
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects string, got ${other.sql}")
  }

  @transient private lazy val ws = Pattern.compile("\\s+")

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toLowerCase.toString
    val raw = ws.split(text)
    var nTok = 0
    val toks = new Array[String](raw.length)
    var i = 0
    while (i < raw.length) {
      if (!raw(i).isEmpty) { toks(nTok) = raw(i); nTok += 1 }
      i += 1
    }
    if (nTok < k) return ArrayData.toArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](nTok - k + 1)
    val sb = new java.lang.StringBuilder(64)
    i = 0
    while (i <= nTok - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}
