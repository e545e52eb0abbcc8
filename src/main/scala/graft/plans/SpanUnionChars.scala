package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native expression: overlap-aware SPAN-UNION character mass — the
  * chars covered by width-`w` token windows at the given sorted
  * 1-based `starts`, counting each character once
  * ([[graft.operators.Repetition.gopherRepetitionSignals]]'s n≥5
  * duplicate-gram signal).
  *
  * Semantically identical to the fold formulation (kept as
  * `Repetition.coveredCharsHof`, spec-asserted): a left-to-right
  * interval merge where a disjoint start adds its full window's joined
  * length (`concat_ws(" ", slice(toks, s, w))` — null tokens skipped,
  * single separators between retained ones, code-point counts), an
  * overlapping start adds one separator plus the EXTENSION slice's
  * joined length, and a contained start adds nothing.
  *
  * WHY (the [[GramUnitRows]] reasoning): the fold runs on
  * CodegenFallback `aggregate` with a concat_ws+slice per START —
  * interpreted per-element closures over token arrays; boilerplate-
  * heavy documents (the signal's whole point) have starts ∝ tokens,
  * per n in 5..10. One static call per row replaces all of it.
  */
case class SpanUnionChars(left: Expression, right: Expression, w: Int)
    extends BinaryExpression {

  require(w >= 1, s"window width must be >= 1, got $w")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"span_union_chars expects (array<int>, array<string>), got ${l.sql}, ${r.sql}")
  }

  override def nullSafeEval(starts: Any, toks: Any): Any =
    SpanUnionChars.compute(
      starts.asInstanceOf[ArrayData], toks.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, t) =>
      s"${ev.value} = graft.plans.SpanUnionChars.compute($s, $t, $w);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanUnionChars =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "span_union_chars"
}

object SpanUnionChars {

  /** joined code-point length of slice(toks, start1, len) under
    * concat_ws(" ") semantics: nulls skipped, one separator between
    * retained tokens, slice clamped to the array bounds */
  private def joinedLen(toks: ArrayData, start1: Int, len: Int): Long = {
    if (len <= 0) return 0L
    val n = toks.numElements()
    var i = math.max(start1 - 1, 0)
    val end = math.min(start1 - 1 + len, n)
    var chars = 0L
    var kept = 0
    while (i < end) {
      if (!toks.isNullAt(i)) {
        val s = toks.getUTF8String(i)
        chars += s.numChars().toLong
        kept += 1
      }
      i += 1
    }
    if (kept == 0) 0L else chars + (kept - 1)
  }

  /** the whole kernel — called directly from generated code */
  def compute(starts: ArrayData, toks: ArrayData, w: Int): Long = {
    var e = 0
    var c = 0L
    var i = 0
    val n = starts.numElements()
    while (i < n) {
      val s = starts.getInt(i)
      val contained = s + w <= e
      if (!contained) {
        if (s >= e) c += joinedLen(toks, s, w) // disjoint window
        else c += 1L + joinedLen(toks, e, s + w - e) // extension only
        e = s + w
      }
      i += 1
    }
    c
  }
}
