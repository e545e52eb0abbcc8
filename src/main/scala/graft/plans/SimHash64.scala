package graft.plans

import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: text → SimHash signature in ONE pass.
  *
  * Semantically identical to
  * `Dedup.simHashFromHashes(transform(tokens(text), hashFn), numBits)`:
  * whitespace tokenization of the lowercased text (empties dropped),
  * per-token 64-bit hash, bit i of the signature = sign of the sum of
  * ±1 contributions of each token's hash bit i (empty docs: all
  * `numBits` bits set — the zero-sum convention of the fold).
  *
  * `portable=true` hashes tokens with the md5-derived 60-bit portable
  * hash (TextFns.portableHash — SQL-reproducible); otherwise
  * xxhash64-compatible hashing via Spark's own XxHash64Function with
  * the same seed (42) the `xxhash64()` SQL function uses, so this
  * expression and the HOF formulation are bit-identical.
  *
  * WHY (same reasoning as [[HashedWordShingles]]): the composable
  * formulation pays `numBits` interpreted aggregate passes over the
  * token-hash array per row; this loop touches each token once and
  * keeps `numBits` counters.
  */
case class SimHash64(child: Expression, numBits: Int, portable: Boolean)
    extends UnaryExpression with CodegenFallback {

  require(numBits >= 1 && numBits <= 64, s"numBits must be in [1,64], got $numBits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash expects string, got ${other.sql}")
  }

  @transient private lazy val ws = Pattern.compile("\\s+")
  @transient private lazy val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def hashToken(t: String): Long =
    if (portable) {
      val d = md5.get(); d.reset()
      val bytes = d.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L; var i = 0
      while (i < 7) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
      (v << 4) | ((bytes(7) & 0xf0L) >> 4)
    } else {
      val u = UTF8String.fromString(t)
      XxHash64Function.hash(u, StringType, 42L)
    }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toLowerCase.toString
    val counts = new Array[Int](numBits)
    val raw = ws.split(text)
    var i = 0
    while (i < raw.length) {
      val t = raw(i)
      if (!t.isEmpty) {
        val h = hashToken(t)
        var b = 0
        while (b < numBits) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < numBits) {
      if (counts(b) >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash"
}
