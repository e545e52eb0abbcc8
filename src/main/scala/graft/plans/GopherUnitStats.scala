package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native expression: per-document Gopher repetition UNIT STATS — for
  * lines (n=0), paragraphs (n=1) and token n-grams (n in [minN,maxN]),
  * the per-n aggregate `(n, total, dcnt, dupch, totch, topch, starts)`
  * over the document's own units, computed IN-ROW
  * ([[graft.operators.Repetition.gopherRepetitionSignals]]).
  *
  * WHY this exists (beyond the [[HashedWordShingles]] interpreted-HOF
  * argument): the aggregation key of the composable formulation is
  * `(doc, n, gram-hash)` — every group lives inside ONE row's
  * document, yet the explode-then-groupBy shape ships ~9 struct rows
  * PER TOKEN through two full shuffles that Catalyst cannot know are
  * doc-local. This kernel does that grouping in one hash map per
  * document, so the operator's only remaining shuffle carries ≤11
  * tiny stat rows per document (~160× less) — the difference between
  * "the corpus's token count" and "the corpus's document count" as
  * the shuffle volume at 100 TB.
  *
  * Per-n semantics (spec-asserted identical to the shuffled reference
  * formulation, `Repetition.gopherRepetitionSignalsShuffled`):
  * units are grouped by their portable 60-bit hash
  * (TextFns.portableHash of the unit text; grams are the n tokens
  * joined with single spaces under concat_ws null-skipping semantics);
  * `total` counts unit occurrences, `dcnt` distinct hashes, with
  * `ul` = first-seen character (code point) count per hash:
  * `dupch` = Σ(cnt−1)·ul, `totch` = Σ cnt·ul, `topch` = max cnt·ul;
  * `starts` lists the sorted 1-based positions of every occurrence of
  * a duplicated (cnt ≥ 2) gram, only for n ≥ posFromN (the span-union
  * feed). An n with no units yields no entry.
  */
case class GopherUnitStats(
    first: Expression,  // tokens: array<string>
    second: Expression, // lines: array<string>
    third: Expression,  // paragraphs: array<string>
    minN: Int,
    maxN: Int,
    posFromN: Int)
    extends TernaryExpression {

  require(minN >= 2 && maxN >= minN,
    s"bad gram range [$minN, $maxN] (0/1 are the line/paragraph kinds)")

  override def dataType: DataType = GopherUnitStats.schema

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(first, second, third).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gopher_unit_stats expects three array<string> inputs, got " +
        s"${Seq(first, second, third).map(_.dataType.sql).mkString(", ")}")
  }

  override def nullSafeEval(toks: Any, lines: Any, paras: Any): Any =
    GopherUnitStats.compute(
      toks.asInstanceOf[ArrayData], lines.asInstanceOf[ArrayData],
      paras.asInstanceOf[ArrayData], minN, maxN, posFromN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, l, p) =>
      s"${ev.value} = graft.plans.GopherUnitStats.compute($t, $l, $p, $minN, $maxN, $posFromN);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): GopherUnitStats =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "gopher_unit_stats"
}

object GopherUnitStats {

  val schema: DataType = ArrayType(StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("total", LongType, nullable = false),
    StructField("dcnt", LongType, nullable = false),
    StructField("dupch", LongType, nullable = false),
    StructField("totch", LongType, nullable = false),
    StructField("topch", LongType, nullable = false),
    StructField("starts", ArrayType(IntegerType, containsNull = false),
      nullable = false))), containsNull = false)

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** decimal value of the first 15 hex chars of md5(s) — 60 bits, the
    * portable cross-engine hash (TextFns.portableHash) */
  private def hash60(s: String): Long = {
    val d = md5.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    (v << 4) | ((bytes(7) & 0xf0L) >> 4)
  }

  /** per-hash state: first-seen char length, count, occurrence starts */
  private final class UnitAgg(val ul: Long) {
    var cnt: Long = 0L
    var starts: java.util.ArrayList[Int] = null
  }

  private def statsRow(
      n: Int,
      byHash: java.util.LinkedHashMap[java.lang.Long, UnitAgg],
      withStarts: Boolean): GenericInternalRow = {
    var total = 0L; var dcnt = 0L; var dupch = 0L; var totch = 0L; var topch = 0L
    var nStarts = 0
    val it0 = byHash.values().iterator()
    while (it0.hasNext) {
      val a = it0.next()
      total += a.cnt
      dcnt += 1
      dupch += (a.cnt - 1) * a.ul
      totch += a.cnt * a.ul
      val top = a.cnt * a.ul
      if (top > topch) topch = top
      if (withStarts && a.cnt >= 2 && a.starts != null) nStarts += a.starts.size()
    }
    val starts = new Array[Int](nStarts)
    if (nStarts > 0) {
      var k = 0
      val it1 = byHash.values().iterator()
      while (it1.hasNext) {
        val a = it1.next()
        if (a.cnt >= 2 && a.starts != null) {
          var j = 0
          while (j < a.starts.size()) { starts(k) = a.starts.get(j); k += 1; j += 1 }
        }
      }
      java.util.Arrays.sort(starts)
    }
    new GenericInternalRow(Array[Any](n, total, dcnt, dupch, totch, topch,
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(starts)))
  }

  /** the whole kernel — called directly from generated code */
  def compute(toksArr: ArrayData, linesArr: ArrayData, parasArr: ArrayData,
      minN: Int, maxN: Int, posFromN: Int): ArrayData = {
    val out = new java.util.ArrayList[Any](2 + maxN - minN + 1)

    def flatUnits(n: Int, units: ArrayData): Unit = {
      val m = new java.util.LinkedHashMap[java.lang.Long, UnitAgg]()
      var i = 0
      val sz = units.numElements()
      while (i < sz) {
        if (!units.isNullAt(i)) {
          val s = units.getUTF8String(i)
          val h = java.lang.Long.valueOf(hash60(s.toString))
          var a = m.get(h)
          if (a == null) { a = new UnitAgg(s.numChars().toLong); m.put(h, a) }
          a.cnt += 1
        }
        i += 1
      }
      if (!m.isEmpty) out.add(statsRow(n, m, withStarts = false))
    }
    flatUnits(0, linesArr)
    flatUnits(1, parasArr)

    val t = toksArr.numElements()
    val toks = new Array[String](t)
    var i = 0
    while (i < t) {
      toks(i) = if (toksArr.isNullAt(i)) null else toksArr.getUTF8String(i).toString
      i += 1
    }
    val sb = new java.lang.StringBuilder(256)
    var n = minN
    while (n <= maxN) {
      if (t >= n) {
        val withPos = n >= posFromN
        val m = new java.util.LinkedHashMap[java.lang.Long, UnitAgg]()
        var i0 = 0
        val last = t - n
        while (i0 <= last) {
          sb.setLength(0)
          var j = 0
          var kept = 0
          var chars = 0L
          while (j < n) {
            val tok = toks(i0 + j)
            // concat_ws semantics: null elements skipped entirely
            if (tok != null) {
              if (kept > 0) sb.append(' ')
              sb.append(tok)
              chars += tok.codePointCount(0, tok.length).toLong
              kept += 1
            }
            j += 1
          }
          val ul = if (kept == 0) 0L else chars + (kept - 1)
          val h = java.lang.Long.valueOf(hash60(sb.toString))
          var a = m.get(h)
          if (a == null) { a = new UnitAgg(ul); m.put(h, a) }
          a.cnt += 1
          if (withPos) {
            if (a.starts == null) a.starts = new java.util.ArrayList[Int](2)
            a.starts.add(i0 + 1)
          }
          i0 += 1
        }
        if (!m.isEmpty) out.add(statsRow(n, m, withStarts = withPos))
      }
      n += 1
    }
    new GenericArrayData(out.toArray)
  }
}
