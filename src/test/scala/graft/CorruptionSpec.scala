package graft

import org.apache.spark.sql.functions._
import graft.operators.Corruption

/** Deterministic objective-side transforms: T5 blocked span corruption
  * and FIM splitting (both also hash-gated: q_span_corrupt, q_fim). */
class CorruptionSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("spanCorrupt: exact density on full blocks, sentinels numbered per block") {
    val text = (1 to 40).map(i => s"t$i").mkString(" ") // exactly 2 full blocks
    val r = Corruption.spanCorruptBlocked(docs(1L -> text), "doc_id", "text", "s")
      .head()
    val input = r.getAs[String]("input_text").split(" ").toSeq
    val target = r.getAs[String]("target_text").split(" ").toSeq
    assert(r.getAs[Long]("n_masked") == 6L) // 3 per block × 2 blocks = 15%
    assert(input.count(_ == "<extra_id_0>") == 1)
    assert(input.count(_ == "<extra_id_1>") == 1)
    assert(input.size == 40 - 6 + 2)
    // target = sentinel + its 3 dropped tokens, per block, in order
    assert(target.size == 8)
    assert(target(0) == "<extra_id_0>" && target(4) == "<extra_id_1>")
    // splicing each target span back at its sentinel restores the text
    val restored = input.flatMap {
      case "<extra_id_0>" => target.slice(1, 4)
      case "<extra_id_1>" => target.slice(5, 8)
      case t => Seq(t)
    }
    assert(restored == text.split(" ").toSeq)
  }

  test("spanCorrupt: tail shorter than span stays unmasked; empty doc passes") {
    val r = Corruption.spanCorruptBlocked(
      docs(1L -> "a b", 2L -> ""), "doc_id", "text", "s")
      .orderBy("doc_id").collect()
    assert(r(0).getAs[String]("input_text") == "a b")
    assert(r(0).getAs[String]("target_text") == "")
    assert(r(0).getAs[Long]("n_masked") == 0L)
    assert(r(1).getAs[String]("input_text") == "")
    assert(r(1).getAs[Long]("n_masked") == 0L)
  }

  test("spanCorrupt: deterministic across partitionings and reruns; seed-sensitive") {
    val d = (0L until 100L).map(i => (i, (0 to (i % 37).toInt).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame, seed: String) =
      Corruption.spanCorruptBlocked(df, "doc_id", "text", seed)
        .select("doc_id", "input_text", "target_text").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
    val a = run(d, "s1")
    assert(run(d.repartition(7), "s1") == a)
    assert(run(d, "s2") != a)
  }

  test("fimSplit: PSM pieces reassemble the normalized text; rate endpoints") {
    val d = (0L until 50L).map(i => (i, (0 to (i % 11).toInt).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val all = Corruption.fimSplit(d, "doc_id", "text", "f", 1, 1).collect()
    assert(all.forall(_.getAs[Boolean]("fim_applied")))
    val Psm = """<fim_prefix>(.*)<fim_suffix>(.*)<fim_middle>(.*)""".r
    all.foreach { r =>
      val orig = (0 to (r.getAs[Long]("doc_id") % 11).toInt).map(j => s"w$j").mkString(" ")
      r.getAs[String]("fim_text") match {
        case Psm(p, sfx, m) =>
          val parts = Seq(p, m, sfx).filter(_.nonEmpty)
          assert(parts.mkString(" ") == orig, s"doc ${r.getAs[Long]("doc_id")}")
        case other => fail(s"not PSM: $other")
      }
    }
    val none = Corruption.fimSplit(d, "doc_id", "text", "f", 0, 1).collect()
    assert(none.forall(!_.getAs[Boolean]("fim_applied")))
    assert(none.forall(r =>
      r.getAs[String]("fim_text") ==
        (0 to (r.getAs[Long]("doc_id") % 11).toInt).map(j => s"w$j").mkString(" ")))
  }

  test("fimSplit: rate=1/2 applies to roughly half, pure function of seed+id") {
    val d = (0L until 400L).map(i => (i, "a b c d e")).toDF("doc_id", "text")
    val r = Corruption.fimSplit(d, "doc_id", "text", "f", 1, 2)
      .filter(col("fim_applied")).count()
    assert(r > 140 && r < 260) // Bernoulli(1/2) over 400
    val a = Corruption.fimSplit(d, "doc_id", "text", "f", 1, 2)
      .select("doc_id", "fim_text").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = Corruption.fimSplit(d.repartition(9), "doc_id", "text", "f", 1, 2)
      .select("doc_id", "fim_text").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
  }
}
