package graft.plans

import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: text → distinct 60-bit hashes of its word
  * k-shingles, in ONE pass per row.
  *
  * Semantically identical to the composable formulation
  * `array_distinct(transform(array_distinct(shingles(tokens(text), k)),
  * s -> conv(substr(md5(s),1,15),16,10)))` — whitespace tokenization of
  * the lowercased text, empties dropped, k-grams joined with a single
  * space, md5's first 15 hex digits parsed as a long — which is also
  * what the DuckDB oracle mirrors (SparkEntry.minhashOracle). Output
  * order is first-occurrence, but every consumer (min-hash minima, set
  * intersect/union sizes) is order-insensitive.
  *
  * WHY (same reasoning as [[CosineSimilarity]]): Spark's higher-order
  * functions are `CodegenFallback` — the chained transform/filter
  * lambdas cost ~2 ms/row on 300-char docs (interpreted per-element
  * closures + UTF8String churn), which made the shingling pass dominate
  * the whole MinHash pipeline. This expression does the same work in a
  * tight Scala loop (~20 µs/row), and `doGenCode` splices a direct
  * static call into WholeStageCodegen (the [[CosineSimilarity]]
  * static-invoke shape) — no interpreted dispatch, no per-row
  * InternalRow packing. `tools/KernelBench` A/Bs this against the
  * interpreted fallback.
  */
case class HashedWordShingles(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_word_shingles expects string, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    HashedWordShingles.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HashedWordShingles.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): HashedWordShingles =
    copy(child = newChild)

  override def prettyName: String = "hashed_word_shingles"
}

object HashedWordShingles {
  private val ws = Pattern.compile("\\s+")
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** decimal value of the first 15 hex chars of md5(s) — 60 bits, the
    * portable cross-engine hash (TextFns.portableHash). */
  private def hash60(s: String): Long = {
    val d = md5.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars = 7.5 bytes: 7 full bytes + high nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    (v << 4) | ((bytes(7) & 0xf0L) >> 4)
  }

  /** the whole kernel — called directly from generated code */
  def compute(input: UTF8String, k: Int): ArrayData = {
    val text = input.toLowerCase.toString
    val raw = ws.split(text)
    // drop empties (leading-whitespace artifact of regex split)
    var nTok = 0
    val toks = new Array[String](raw.length)
    var i = 0
    while (i < raw.length) {
      if (!raw(i).isEmpty) { toks(nTok) = raw(i); nTok += 1 }
      i += 1
    }
    if (nTok < k) return ArrayData.toArrayData(Array.empty[Long])
    val seen = new java.util.HashSet[Long](nTok * 2)
    val out = new Array[Long](nTok - k + 1)
    var n = 0
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
      val h = hash60(sb.toString)
      if (seen.add(h)) { out(n) = h; n += 1 }
      i += 1
    }
    ArrayData.toArrayData(if (n == out.length) out else java.util.Arrays.copyOf(out, n))
  }
}
