package graft.plans

import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: text → hashed feature-bucket stream — every
  * token's bucket (and, when `biSeed` is set, every adjacent-pair
  * bucket) in ONE pass per row, duplicates KEPT (counts carry signal).
  *
  * Bucket contract is exactly [[graft.functions.TextFns.tokenBucket]]:
  * `('0x'||substr(md5(seed||chr(1)||feature),1,15))::BIGINT % nBuckets`
  * over the whitespace-tokenized lowercased text, bigram features
  * joined with one space — the formula every classifier/DSIR oracle
  * inlines, so swapping this kernel in changes NOTHING observable.
  *
  * WHY (the [[HashedWordShingles]] argument): higher-order functions
  * are CodegenFallback — a per-token interpreted md5+conv chain costs
  * ~5 µs/feature and made hashed-bag scoring the slowest headline
  * query; this loop pays the interpret overhead once per ROW.
  */
case class HashedNgramBuckets(
    child: Expression,
    nBuckets: Int,
    uniSeed: String,
    biSeed: Option[String])
    extends UnaryExpression with CodegenFallback {

  require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_ngram_buckets expects string, got ${other.sql}")
  }

  @transient private lazy val ws = Pattern.compile("\\s+")
  @transient private lazy val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def bucket(seed: String, feature: String): Int = {
    val d = md5.get()
    d.reset()
    d.update(seed.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.update(1.toByte)
    val bytes = d.digest(feature.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    v = (v << 4) | ((bytes(7) & 0xf0L) >> 4) // 60 bits, non-negative
    (v % nBuckets).toInt
  }

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
    val nBi = if (biSeed.isDefined && nTok >= 2) nTok - 1 else 0
    val out = new Array[Int](nTok + nBi)
    i = 0
    while (i < nTok) { out(i) = bucket(uniSeed, toks(i)); i += 1 }
    if (nBi > 0) {
      val bs = biSeed.get
      var j = 0
      while (j < nBi) {
        out(nTok + j) = bucket(bs, toks(j) + " " + toks(j + 1))
        j += 1
      }
    }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): HashedNgramBuckets =
    copy(child = newChild)

  override def prettyName: String = "hashed_ngram_buckets"
}
