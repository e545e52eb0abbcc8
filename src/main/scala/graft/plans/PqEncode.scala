package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: product-quantization ENCODE — the m
  * argmin-of-squared-grid-distance centroid codes of an embedding
  * (graft.operators.Pq).
  *
  * WHY a custom Expression (SURVEY §7.2 revisit-for-perf clause, the
  * HashedWordShingles/CosineSimilarity pattern): the composable
  * formulation is a transform over subspaces of an `aggregate` fold
  * over k codes of a zip_with+aggregate squared distance — m·k·subDim
  * (~1 024 at the 8×16×8 default) CodegenFallback evaluations PER ROW,
  * each boxing lambda variables through the interpreter. The round-10
  * full-evaluation bench column priced that at ~30 s for one sf0.1
  * encode pass that this kernel runs in well under a second: one tight
  * primitive loop inside WholeStageCodegen, codebooks shipped once as
  * a flat `long[]` reference object.
  *
  * BIT-IDENTICAL to the fold (PqSpec asserts parity):
  *  - components quantize with the same one IEEE multiply + Spark's
  *    `round` semantics (BigDecimal.valueOf(x).setScale(0, HALF_UP) —
  *    half away from zero on the SHORTEST decimal representation;
  *    `Math.round`/floor(x+0.5) would diverge on .5-adjacent doubles);
  *  - distances are exact BIGINT sums; ties resolve to the LOWEST code
  *    (strict `<` scan in code order), matching argminCode's fold.
  *
  * Scope: embeddings must carry at least m·subDim non-NULL elements —
  * short arrays throw (the HOF path's ANSI element_at does too) and a
  * NULL element yields a NULL result (stricter than the fold's
  * undefined null-propagation through `when`; corpus embeddings are
  * non-null arrays).
  */
case class PqEncode(
    child: Expression,
    subDim: Int,
    codebooks: Array[Array[Array[Long]]])
    extends UnaryExpression {

  private def m: Int = codebooks.length
  private def k: Int = codebooks(0).length
  private def d: Int = m * subDim

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private def elemFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def elemsNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull
  override def nullable: Boolean = super.nullable || elemsNullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float|double>, got ${other.sql}")
  }

  /** codebooks flattened for the codegen reference object:
    * flat((s·k + c)·subDim + j) = codebooks(s)(c)(j) */
  @transient private lazy val flat: Array[Long] = {
    val out = new Array[Long](m * k * subDim)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < k) {
        System.arraycopy(codebooks(s)(c), 0, out, (s * k + c) * subDim, subDim)
        c += 1
      }
      s += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val fl = elemFloat
    if (v.numElements() < d)
      throw new IllegalArgumentException(
        s"pq_encode: embedding has ${v.numElements()} elements, model needs $d")
    val g = new Array[Long](d)
    var i = 0
    while (i < d) {
      if (v.isNullAt(i)) return null
      val x = if (fl) v.getFloat(i).toDouble else v.getDouble(i)
      g(i) = PqEncode.grid(x)
      i += 1
    }
    val codes = new Array[Int](m)
    val fb = flat
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < k) {
        var dist = 0L
        var j = 0
        val base = (s * k + c) * subDim
        while (j < subDim) {
          val dj = g(s * subDim + j) - fb(base + j)
          dist += dj * dj
          j += 1
        }
        if (dist < bestD) { best = c; bestD = dist }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acc = if (elemFloat) "getFloat" else "getDouble"
    val books = ctx.addReferenceObj("pqBooks", flat, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val g = ctx.freshName("g"); val i = ctx.freshName("i")
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s"); val c = ctx.freshName("c"); val j = ctx.freshName("j")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val dist = ctx.freshName("dist"); val dj = ctx.freshName("dj")
      val base = ctx.freshName("base")
      val nullCheck =
        if (elemsNullable)
          s"if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      val earlyOut = if (elemsNullable) s"if (!${ev.isNull}) {" else "{"
      s"""
         |if ($v.numElements() < $d) {
         |  throw new IllegalArgumentException(
         |    "pq_encode: embedding has " + $v.numElements() + " elements, model needs $d");
         |}
         |long[] $g = new long[$d];
         |for (int $i = 0; $i < $d; $i++) {
         |  $nullCheck
         |  $g[$i] = graft.plans.PqEncode.grid((double) $v.$acc($i));
         |}
         |$earlyOut
         |  int[] $codes = new int[$m];
         |  for (int $s = 0; $s < $m; $s++) {
         |    int $best = 0; long $bestD = Long.MAX_VALUE;
         |    for (int $c = 0; $c < $k; $c++) {
         |      long $dist = 0L;
         |      int $base = ($s * $k + $c) * $subDim;
         |      for (int $j = 0; $j < $subDim; $j++) {
         |        long $dj = $g[$s * $subDim + $j] - $books[$base + $j];
         |        $dist += $dj * $dj;
         |      }
         |      if ($dist < $bestD) { $best = $c; $bestD = $dist; }
         |    }
         |    $codes[$s] = $best;
         |  }
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
         |}
       """.stripMargin
    })
  }

  // codebooks is an Array — case-class equality would be by reference;
  // compare content so Catalyst's expression canonicalization behaves
  override def equals(other: Any): Boolean = other match {
    case p: PqEncode =>
      p.child == child && p.subDim == subDim &&
        java.util.Arrays.deepEquals(
          p.codebooks.asInstanceOf[Array[AnyRef]],
          codebooks.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + subDim) +
      java.util.Arrays.deepHashCode(codebooks.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  /** Spark `round(double)` semantics on the 1e-7 grid: HALF_UP on the
    * shortest decimal representation, then the integral double back to
    * long — the exact chain the HOF path's round(...).cast("long")
    * performs (see Pq.gq). Shared by interpreted eval and codegen. */
  def grid(x: Double): Long = {
    val p = x * 1e7
    if (java.lang.Double.isNaN(p) || java.lang.Double.isInfinite(p))
      throw new IllegalArgumentException(s"pq_encode: non-finite component $x")
    java.math.BigDecimal.valueOf(p)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
  }
}
