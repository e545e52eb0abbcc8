package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.{Bpe, Unigram, UnigramModel}

/** Native expression: text → unigram-LM tokens (or ids) under a
  * trained [[UnigramModel]] — per-word Viterbi-best segmentation.
  *
  * Pre-tokenization matches `TextFns.tokens` (lowercase, whitespace
  * split, empties dropped). Per word, dynamic programming over symbol
  * positions picks the segmentation maximizing the sum of piece log
  * probabilities; ties prefer the longer piece at the earlier position
  * (deterministic). Symbols absent from the vocabulary fall back to a
  * single-symbol OOV piece with a large penalty, so every word always
  * encodes (and [[Bpe.decode]] still restores it verbatim).
  *
  * Same 100 TB shape as [[BpeEncode]]: model rides in the task binary
  * once per stage; Zipfian word frequencies make the per-thread memo
  * absorb almost every row. CodegenFallback for the same reason — the
  * cost is the DP loop, not the call boundary.
  */
case class UnigramEncode(child: Expression, model: UnigramModel, emitIds: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    if (emitIds) ArrayType(IntegerType, containsNull = false)
    else ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_encode expects string, got ${other.sql}")
  }

  // keep explain/treeString readable: never dump the piece table
  override protected def stringArgs: Iterator[Any] =
    Iterator(child, model.toString, emitIds)

  @transient private lazy val ws = Pattern.compile("\\s+")
  @transient private lazy val logProb = model.logProb
  @transient private lazy val vocab = model.vocab
  @transient private lazy val maxLen = math.max(1, model.maxPieceSymbols)

  /** score for a single symbol with no vocabulary entry: harsh enough
    * that any in-vocab segmentation wins, finite so the lattice always
    * completes */
  private val OovLogProb = -1e6

  @transient private lazy val memo =
    new ThreadLocal[java.util.HashMap[String, Array[String]]] {
      override def initialValue() = new java.util.HashMap[String, Array[String]](1 << 12)
    }
  private val MemoMax = 1 << 16

  private def encodeWord(word: String): Array[String] = {
    val m0 = memo.get()
    val hit = m0.get(word)
    if (hit != null) return hit
    val syms = Bpe.splitSymbols(word)
    val m = syms.length
    val score = Array.fill(m + 1)(Double.NegativeInfinity)
    val backI = new Array[Int](m + 1)
    score(0) = 0.0
    var j = 1
    while (j <= m) {
      // i ascending from the longest candidate: strict '>' keeps the
      // longest piece on score ties — deterministic
      var i = math.max(0, j - maxLen)
      while (i < j) {
        if (score(i) != Double.NegativeInfinity) {
          val p = joinRange(syms, i, j)
          val lp = logProb.get(p) match {
            case Some(v) => v
            case None => if (j - i == 1) OovLogProb else Double.NegativeInfinity
          }
          if (lp != Double.NegativeInfinity) {
            val cand = score(i) + lp
            if (cand > score(j)) { score(j) = cand; backI(j) = i }
          }
        }
        i += 1
      }
      j += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[String](8)
    var pos = m
    while (pos > 0) {
      val i = backI(pos)
      out += joinRange(syms, i, pos)
      pos = i
    }
    val arr = out.reverseIterator.toArray
    if (m0.size >= MemoMax) m0.clear()
    m0.put(word, arr)
    arr
  }

  private def joinRange(s: Array[String], i: Int, j: Int): String = {
    if (j - i == 1) return s(i)
    val sb = new java.lang.StringBuilder
    var k = i
    while (k < j) { sb.append(s(k)); k += 1 }
    sb.toString
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toLowerCase.toString
    val out = new scala.collection.mutable.ArrayBuffer[String](64)
    val raw = ws.split(text)
    var i = 0
    while (i < raw.length) {
      if (!raw(i).isEmpty) out ++= encodeWord(raw(i))
      i += 1
    }
    if (emitIds) {
      val ids = new Array[Int](out.length)
      var j = 0
      while (j < out.length) { ids(j) = vocab.getOrElse(out(j), -1); j += 1 }
      ArrayData.toArrayData(ids)
    } else {
      val arr = new Array[AnyRef](out.length)
      var j = 0
      while (j < out.length) { arr(j) = UTF8String.fromString(out(j)); j += 1 }
      new GenericArrayData(arr)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
    copy(child = newChild)

  override def prettyName: String = "unigram_encode"
}
