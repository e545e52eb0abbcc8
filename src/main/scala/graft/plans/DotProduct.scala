package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: dot product of two numeric arrays as a
  * sequential double fold — the building block [[CosineSimilarity]]
  * specializes, generalized so LSH bucket assignment (sign of
  * emb · hyperplane, numPlanes times per row) runs codegen'd instead of
  * through interpreted `aggregate`/`zip_with` CodegenFallback lambdas
  * (~10× on 64-dim floats; see CosineSimilarity's scaladoc for the
  * mechanism).
  *
  * Semantics — chosen to agree with the composable reference
  * formulation `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, +)` on
  * equal-length, non-null inputs, with identical left-to-right double
  * accumulation (bit-identical, DuckDB `list_dot_product`-mirrorable):
  *  - elements are read as double (floats widened per element);
  *  - lengths fold over min(|a|,|b|);
  *  - a NULL array element makes the result NULL (the HOF fold
  *    propagates NULL the same way).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def elemsNullable: Boolean = Seq(left, right).exists {
    e => e.dataType.asInstanceOf[ArrayType].containsNull
  }

  // a NULL input OR a NULL element yields NULL
  override def nullable: Boolean = super.nullable || elemsNullable

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<float|double>, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    val n = math.min(xs.numElements(), ys.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val x = if (lf) xs.getFloat(i).toDouble else xs.getDouble(i)
      val y = if (rf) ys.getFloat(i).toDouble else ys.getDouble(i)
      dot += x * y
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lAcc = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rAcc = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      // ev.isNull is the constant `false` when nothing is nullable —
      // only emit the element-null check (and the assignment) when the
      // schema says elements can be null
      val nullCheck =
        if (elemsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $dot += (double) $a.$lAcc($i) * (double) $b.$rAcc($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}
