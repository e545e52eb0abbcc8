package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature over pre-hashed shingle bases — the native kernel
  * behind [[graft.operators.Dedup.minHashFromBases]].
  *
  * Bit-identical to the HOF formulation it replaces (the DuckDB gate
  * mirrors mirror this arithmetic, so it MUST NOT drift):
  * `sig[k] = min over bases x of ((x pmod P) * a_k + b_k) pmod P`,
  * P = 2^31 - 1, (a_k, b_k) = [[graft.operators.Dedup.hashParams]].
  * Null elements are ignored (array_min semantics); a signature slot
  * with no contributing element is NULL.
  *
  * Why native: the HOF version evaluates an interpreted lambda
  * numHashes times PER ELEMENT (CodegenFallback, one closure dispatch
  * per (element, hash) pair). MinHash is the inner loop of every
  * near-dup pass — dedup, ingest, the streaming incremental variant —
  * so those dispatches are the dominant cost of the signature stage at
  * any corpus size. Here: ONE pass over the array, all k running mins
  * in a primitive local loop, codegen'd via doGenCode into the
  * surrounding WholeStageCodegen span.
  */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long = 42L)
    extends UnaryExpression {

  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  private val P = graft.operators.Dedup.MinHashP
  // evaluated once at plan construction; arrays are codegen-referenced
  private val as: Array[Long] =
    graft.operators.Dedup.hashParams(numHashes, seed).map(_._1).toArray
  private val bs: Array[Long] =
    graft.operators.Dedup.hashParams(numHashes, seed).map(_._2).toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  // NULL input yields an array of k NULL slots (what the HOF form
  // produced: array_min(transform(NULL)) = NULL per hash), never a
  // NULL array — downstream gates pin that shape
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"min_hash_signature expects array<bigint>, got ${other.sql}")
  }

  private def allNulls: GenericArrayData =
    new GenericArrayData(Array.fill[Any](numHashes)(null))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) allNulls
    else {
      val arr = v.asInstanceOf[ArrayData]
      val mins = MinHashSignature.eval(arr, arr.numElements(), numHashes, as, bs, P)
      new GenericArrayData(mins.map(m => if (m == Long.MaxValue) null else (m: java.lang.Long))
        .asInstanceOf[Array[Any]])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val aRef = ctx.addReferenceObj("mhAs", as, "long[]")
    val bRef = ctx.addReferenceObj("mhBs", bs, "long[]")
    val k = numHashes
    val childGen = child.genCode(ctx)
    val c = childGen.value
    val mins = ctx.freshName("mins")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val h = ctx.freshName("h")
    val v = ctx.freshName("v")
    val out = ctx.freshName("out")
    val gad = "org.apache.spark.sql.catalyst.util.GenericArrayData"
    val code = code"""
      ${childGen.code}
      Object[] $out = new Object[$k];
      if (!${childGen.isNull}) {
        long[] $mins = new long[$k];
        java.util.Arrays.fill($mins, Long.MAX_VALUE);
        int $n = $c.numElements();
        for (int $i = 0; $i < $n; $i++) {
          if ($c.isNullAt($i)) continue;
          long $h = $c.getLong($i) % ${P}L;
          if ($h < 0) $h += ${P}L;
          for (int $j = 0; $j < $k; $j++) {
            long $v = ($h * $aRef[$j] + $bRef[$j]) % ${P}L;
            if ($v < 0) $v += ${P}L;
            if ($v < $mins[$j]) $mins[$j] = $v;
          }
        }
        for (int $j = 0; $j < $k; $j++) {
          if ($mins[$j] != Long.MAX_VALUE) $out[$j] = (Long) $mins[$j];
        }
      }
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = new $gad($out);
    """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def prettyName: String = "min_hash_signature"
}

object MinHashSignature {
  /** shared interpreted inner loop (also the codegen template's shape) */
  private[plans] def eval(
      arr: ArrayData, n: Int, k: Int,
      as: Array[Long], bs: Array[Long], p: Long): Array[Long] = {
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        var h = arr.getLong(i) % p
        if (h < 0) h += p
        var j = 0
        while (j < k) {
          var v = (h * as(j) + bs(j)) % p
          if (v < 0) v += p
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    mins
  }
}
