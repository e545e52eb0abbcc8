package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: text → hashed CHARACTER-n-gram bucket stream
  * (duplicates kept — counts carry the signal), the training-side
  * feature pass of [[graft.operators.LangId]]. Same md5 bucket formula
  * as [[HashedNgramBuckets]] but over sliding codepoint windows instead
  * of whitespace tokens — the oracle mirror is
  * `('0x'||substr(md5(seed||chr(1)||substr(lower(text),i,n)),1,15))::BIGINT % nBuckets`.
  * Codegen'd via the static-invoke shape ([[HashedWordShingles]]); the
  * seed rides as a codegen reference object.
  */
case class CharNgramBuckets(
    child: Expression,
    n: Int,
    nBuckets: Int,
    seed: String)
    extends UnaryExpression {

  require(n >= 1, s"n must be >= 1, got $n")
  require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngram_buckets expects string, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    CharNgramBuckets.compute(input.asInstanceOf[UTF8String], n, nBuckets, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedRef = ctx.addReferenceObj("seed", seed, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.CharNgramBuckets.compute($c, $n, $nBuckets, $seedRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharNgramBuckets =
    copy(child = newChild)

  override def prettyName: String = "char_ngram_buckets"
}

object CharNgramBuckets {
  /** the whole kernel — called directly from generated code */
  def compute(input: UTF8String, n: Int, nBuckets: Int, seed: String): ArrayData =
    ArrayData.toArrayData(
      bucketsOf(input.toLowerCase.toString, n, nBuckets, seed, alreadyLower = true))

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Per-thread gram→bucket memo: the 1..3-gram space is Zipf (a task's
    * documents share most of their grams), and the md5 digest dominates
    * kernel cost — memoizing cuts it to the DISTINCT grams a task sees.
    * Keyed by (seed, nBuckets, gram) so interleaved models can't
    * cross-pollute; size-capped with clear-on-full so a pathological
    * gram stream cannot grow the map unboundedly (the BpeEncode
    * memoization discipline). */
  private val MemoCap = 1 << 17
  private val memo = new ThreadLocal[java.util.HashMap[String, Integer]] {
    override def initialValue() = new java.util.HashMap[String, Integer](1 << 12)
  }

  private[plans] def bucket(seed: String, feature: String, nBuckets: Int): Int = {
    val m = memo.get()
    val key = seed + "\u0001" + nBuckets + "\u0001" + feature
    val hit = m.get(key)
    if (hit != null) return hit.intValue()
    val d = md5.get()
    d.reset()
    d.update(seed.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.update(1.toByte)
    val bytes = d.digest(feature.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    v = (v << 4) | ((bytes(7) & 0xf0L) >> 4) // 60 bits, non-negative
    val b = (v % nBuckets).toInt
    if (m.size() >= MemoCap) m.clear()
    m.put(key, b)
    b
  }

  /** the shared feature extractor: lowercased codepoint-window grams of
    * EVERY length 1..n (the Cavnar-Trenkle mixed-order profile —
    * unigrams carry the writing-system signal held-out higher-order
    * grams can't, because an unseen trigram of a seen script still
    * shares its unigrams with training) → md5 buckets; also the
    * plain-Scala trainer's path so distributed and reference training
    * see BYTE-identical features */
  def bucketsOf(rawText: String, n: Int, nBuckets: Int, seed: String,
                alreadyLower: Boolean = false): Array[Int] = {
    val text = if (alreadyLower) rawText
               else UTF8String.fromString(rawText).toLowerCase.toString
    val cpCount = text.codePointCount(0, text.length)
    if (cpCount == 0) return Array.emptyIntArray
    val offs = new Array[Int](cpCount + 1)
    var ci = 0
    var o = 0
    while (ci < cpCount) {
      offs(ci) = o
      o = text.offsetByCodePoints(o, 1)
      ci += 1
    }
    offs(cpCount) = text.length
    var total = 0
    var len = 1
    while (len <= n) { total += math.max(cpCount - len + 1, 0); len += 1 }
    val out = new Array[Int](total)
    var w = 0
    len = 1
    while (len <= n) {
      var g = 0
      while (g + len <= cpCount) {
        out(w) = bucket(seed, text.substring(offs(g), offs(g + len)), nBuckets)
        w += 1
        g += 1
      }
      len += 1
    }
    out
  }
}
