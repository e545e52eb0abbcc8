package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.util.regex.Pattern

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Misra–Gries heavy-hitters aggregate over document text — the
  * bounded-state answer to "top vocabulary terms of a 100 TB corpus":
  * where `termDocFreq`/`tfidfTopTerms` shuffle one row per distinct
  * term, this keeps AT MOST `k` (term, counter) pairs per partition,
  * merges them pairwise (Agarwal et al. 2012, "Mergeable Summaries" —
  * the subtract-(k+1)ᵗʰ-largest merge preserves the sketch bound), and
  * ships only k-entry summaries through the final aggregation. One
  * narrow pass, no token explode, no term shuffle.
  *
  * Guarantee (the classic MG bound, preserved under merge): for every
  * term, `true − n/(k+1) ≤ est ≤ true` where `n` is the total token
  * count — so any term with `true > n/(k+1)` is PRESENT in the result,
  * and absence proves `true ≤ n/(k+1)`. The q_vocab_topk gate asserts
  * exactly these two implications against exact counts.
  *
  * Tokenization matches [[graft.functions.TextFns.tokens]] (lowercase,
  * whitespace split, empties dropped) so exact oracles can rebuild the
  * token stream. Update cost is O(1) per hit and O(k) per miss-while-
  * full (the decrement step); result is the surviving entries sorted
  * (est desc, term asc) as `array<struct<term string, est long>>`.
  */
case class FrequentTerms(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"frequent_terms expects string, got ${other.sql}")
  }

  @transient private lazy val ws = Pattern.compile("\\s+")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  private def offer(buf: mutable.HashMap[String, Long], t: String): Unit =
    buf.get(t) match {
      case Some(c) => buf.update(t, c + 1)
      case None if buf.size < k => buf.update(t, 1L)
      case None =>
        // classic MG decrement: every counter pays one, zeros evicted
        val dead = mutable.ArrayBuffer.empty[String]
        buf.foreach { case (key, c) =>
          if (c == 1L) dead += key else buf.update(key, c - 1)
        }
        dead.foreach(buf.remove)
    }

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val toks = ws.split(v.asInstanceOf[UTF8String].toString.toLowerCase)
      var i = 0
      while (i < toks.length) {
        if (toks(i).nonEmpty) offer(buf, toks(i))
        i += 1
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (t, c) =>
      buf.update(t, buf.getOrElse(t, 0L) + c)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest counter from all, evict <= 0 —
      // the mergeable-summaries reduction (keeps the n/(k+1) bound)
      val cut = buf.values.toArray.sortWith(_ > _).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.foreach { case (key, c) =>
        if (c - cut <= 0L) dead += key else buf.update(key, c - cut)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortWith { case ((t1, c1), (t2, c2)) =>
      c1 > c2 || (c1 == c2 && t1 < t2)
    }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentTerms =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): FrequentTerms =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): FrequentTerms =
    copy(child = newChild)

  override def prettyName: String = "frequent_terms"
}
