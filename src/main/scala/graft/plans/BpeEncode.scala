package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.{Bpe, BpeModel}

/** Native expression: text → BPE tokens (or vocab ids) under a trained
  * [[BpeModel]], one pass per row.
  *
  * Pre-tokenization matches `TextFns.tokens` (lowercase, whitespace
  * split, empties dropped); each word then gets the classic greedy
  * lowest-rank merge loop. Two properties make this the right 100 TB
  * shape:
  *
  *   - The model rides in the expression → serialized ONCE into the
  *     task binary per stage (~1 MB at 50k merges), never per row, and
  *     every executor thread reads the same deserialized `ranks` map.
  *   - Word→tokens results are memoized per thread: natural-language
  *     word frequencies are Zipfian, so after the first few thousand
  *     rows almost every word is a map hit and the merge loop runs only
  *     for the long tail. The memo is bounded (LRU-less clear at 64k
  *     entries — adversarial all-unique-words input degrades to the
  *     plain merge loop, never to unbounded memory).
  *
  * CodegenFallback deliberately: the per-row interpret overhead is paid
  * once per ROW and the work runs in a tight JVM loop; tools/KernelBench
  * measured the dispatch difference for exactly this kernel shape
  * (heavyweight per-row compute) at noise level — the cost is the merge
  * loop, not the call boundary.
  */
case class BpeEncode(child: Expression, model: BpeModel, emitIds: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    if (emitIds) ArrayType(IntegerType, containsNull = false)
    else ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects string, got ${other.sql}")
  }

  // keep explain/treeString readable: never dump the merge table
  override protected def stringArgs: Iterator[Any] =
    Iterator(child, model.toString, emitIds)

  @transient private lazy val ws = Pattern.compile("\\s+")
  @transient private lazy val ranks = model.ranks
  @transient private lazy val vocab = model.vocab

  /** per-thread word → token-array memo, cleared when it outgrows the
    * bound so adversarial vocabularies can't accumulate memory */
  @transient private lazy val memo =
    new ThreadLocal[java.util.HashMap[String, Array[String]]] {
      override def initialValue() = new java.util.HashMap[String, Array[String]](1 << 12)
    }
  private val MemoMax = 1 << 16

  private def encodeWord(word: String): Array[String] = {
    val m = memo.get()
    val hit = m.get(word)
    if (hit != null) return hit
    var syms = Bpe.splitSymbols(word)
    // greedy: repeatedly merge the adjacent pair with the lowest rank
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val a = model.merges(bestRank)._1
        val b = model.merges(bestRank)._2
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += a + b; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toArray
        if (syms.length < 2) done = true
      }
    }
    if (m.size >= MemoMax) m.clear()
    m.put(word, syms)
    syms
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
      new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode"
}
