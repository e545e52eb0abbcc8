package graft

import org.apache.spark.sql.Row
import graft.operators.Repetition

/** Full Gopher repetition rule set — every signal pinned against
  * hand-computed values on crafted documents (exact doubles: the
  * fractions are BIGINT round-half-up to 6 dp, so equality is legal). */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def signals(rows: (Long, String)*): Map[Long, Row] =
    Repetition
      .gopherRepetitionSignals(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap

  private def sig(r: Row, c: String): Double =
    r.getDouble(r.fieldIndex(c))

  test("top n-gram char fractions (alternating doc, hand-derived)") {
    // "a b a b a b": 2-grams a b(3) b a(2) -> 3*3=9 of 11 chars;
    // 3-grams both twice, len 5 -> 10/11; 4-grams a b a b(2), len 7
    // -> 14/11 (may exceed 1: overlaps double-count, per paper)
    val m = signals(1L -> "a b a b a b")
    val r = m(1L)
    assert(sig(r, "top_2gram_char_frac") == 0.818182)
    assert(sig(r, "top_3gram_char_frac") == 0.909091)
    assert(sig(r, "top_4gram_char_frac") == 1.272727)
    // 5-grams both singletons; >6 tokens absent -> all zero
    (5 to 10).foreach(n => assert(sig(r, s"dup_${n}gram_char_frac") == 0.0))
    assert(sig(r, "dup_line_frac") == 0.0)
    assert(sig(r, "dup_para_frac") == 0.0)
  }

  test("duplicate 5-gram span union, disjoint occurrences") {
    // "p q r s t p q r s t": the 5-gram "p q r s t" occurs at token
    // 1 and 6 -> two disjoint spans of 9 chars each = 18 of 19
    val r = signals(1L -> "p q r s t p q r s t")(1L)
    assert(sig(r, "dup_5gram_char_frac") == 0.947368)
    assert(sig(r, "dup_6gram_char_frac") == 0.0)
    // 2-grams p q / q r / r s / s t each twice -> 2*3=6 of 19
    assert(sig(r, "top_2gram_char_frac") == 0.315789)
  }

  test("duplicate 5-gram span union, overlapping occurrences merge") {
    // "a a a a a a": "a a a a a" starts at 1 and 2 -> overlap-merged
    // span covers the WHOLE 11-char text exactly once -> 1.0, not 20/11
    val r = signals(1L -> "a a a a a a")(1L)
    assert(sig(r, "dup_5gram_char_frac") == 1.0)
    assert(sig(r, "dup_6gram_char_frac") == 0.0) // single 6-gram
    assert(sig(r, "top_2gram_char_frac") == 1.363636) // 5*3=15 of 11
  }

  test("duplicate line and paragraph fractions, count and char mass") {
    val text = "hello\nworld\nhello\n\nhello\nworld\nhello"
    val r = signals(1L -> text)(1L)
    // lines: hello x4, world x2 of 6 -> dup 4/6; chars 20/30
    assert(sig(r, "dup_line_frac") == 0.666667)
    assert(sig(r, "dup_line_char_frac") == 0.666667)
    // paragraphs: the 17-char block twice -> 1/2 both ways
    assert(sig(r, "dup_para_frac") == 0.5)
    assert(sig(r, "dup_para_char_frac") == 0.5)
    // token stream crosses line breaks: hello world hello hello world
    // hello -> top 2-gram "hello world"(2)*11 = 22 of 35
    assert(sig(r, "top_2gram_char_frac") == 0.628571)
    assert(sig(r, "top_3gram_char_frac") == 0.971429) // "hello world hello"(2)*17
    assert(sig(r, "top_4gram_char_frac") == 0.657143) // all distinct: 1*23
  }

  test("short, empty and signal-free docs score zero on every dup signal") {
    val m = signals(1L -> "", 2L -> "one", 3L -> "all tokens unique here now")
    m.values.foreach { r =>
      Seq("dup_line_frac", "dup_line_char_frac", "dup_para_frac",
        "dup_para_char_frac").foreach(c => assert(sig(r, c) == 0.0, c))
      (5 to 10).foreach(n => assert(sig(r, s"dup_${n}gram_char_frac") == 0.0))
    }
    assert(m.size == 3) // every input doc present, including empty
    // empty / sub-n docs: top-gram signals zero too
    assert(sig(m(1L), "top_2gram_char_frac") == 0.0)
    assert(sig(m(2L), "top_2gram_char_frac") == 0.0)
    // paper semantics: the MOST FREQUENT gram counts even at cnt=1, so
    // an all-unique doc still has a positive top-gram fraction
    // ("tokens unique" = 13 of 26 normalized chars)
    assert(sig(m(3L), "top_2gram_char_frac") == 0.5)
  }

  test("dropRepetitiveGopher applies the published limits") {
    // long diverse doc: every top-gram fraction is tiny; degenerate doc
    // trips top_2gram (1.36 > 0.20) and dup_5gram (1.0 > 0.15)
    val clean = (1 to 60).map(i => s"word$i").mkString(" ")
    val docs = Seq(1L -> "a a a a a a", 2L -> clean).toDF("doc_id", "text")
    val kept = Repetition.dropRepetitiveGopher(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L))
  }

  test("ten-token boilerplate tail duplicated across the doc is caught at n=10") {
    // 10-token run repeated twice with unique filler between
    val run = (1 to 10).map(i => s"w$i").mkString(" ")
    val text = s"$run unique1 unique2 unique3 $run"
    val r = signals(1L -> text)(1L)
    val runLen = run.length.toLong
    val total = text.length.toLong // single line: normalized == raw
    val expect = math.floor(((2 * runLen) * 2000000L + total).toDouble / (2 * total)) / 1e6
    assert(sig(r, "dup_10gram_char_frac") == expect)
    assert(sig(r, "dup_5gram_char_frac") == expect) // same covered span
  }

  test("in-row kernel path agrees with the shuffled reference formulation signal-for-signal") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat\nthe cat sat on the mat\n\nthe cat sat on the mat again and again and again"),
      (2L, "a"),                       // shorter than every n
      (3L, ""),                        // no tokens at all
      (4L, "x y"),                     // exactly one 2-gram, one line
      (5L, "héllo wörld émojis 😀 here twice 😀 here twice\n\nhéllo wörld émojis 😀 here twice 😀 here twice"),
      (6L, (1 to 60).map(i => s"t${i % 5}").mkString(" ")), // wall-to-wall dup grams
      (7L, "one two three four five six seven eight nine ten eleven twelve " +
        "one two three four five six seven eight nine ten eleven twelve tail"))
      .toDF("doc_id", "text")
    def rowsOf(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val kernel = rowsOf(Repetition.gopherRepetitionSignals(docs, "doc_id", "text"))
    val shuffled = rowsOf(
      Repetition.gopherRepetitionSignalsShuffled(docs, "doc_id", "text"))
    assert(kernel == shuffled)
    // and the narrow plan really is narrow: no Exchange anywhere
    val plan = Repetition.gopherRepetitionSignals(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") ||
      // the input-spreading repartition of a tiny test frame is the
      // ONLY allowed exchange (input splits < cores)
      plan.split("Exchange").length <= 2,
      s"gopher signals must stay shuffle-free past the input spread:\n$plan")
  }

  test("native span-union kernel agrees with the fold reference path") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftshim.GraftShim
    // disjoint, overlapping, contained, repeated, beyond-array starts;
    // multi-codepoint tokens
    val rows = Seq(
      (1L, Seq(1, 7, 13), (1 to 20).map(i => s"tk$i")),
      (2L, Seq(1, 3, 5, 7), (1 to 12).map(i => s"w$i")),
      (3L, Seq(2, 2, 3, 4, 4), (1 to 10).map(i => s"😀$i")),
      (4L, Seq(9, 50), (1 to 10).map(i => s"t$i")),
      (5L, Seq.empty[Int], Seq("a", "b")),
      (6L, Seq(1), Seq.empty[String]))
      .toDF("id", "starts", "toks")
    (3 to 7).foreach { w =>
      def run(c: org.apache.spark.sql.Column) =
        rows.select(col("id"), c.as("v")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val kernel = run(coalesce(GraftShim.column(graft.plans.SpanUnionChars(
        GraftShim.expression(col("starts")), GraftShim.expression(col("toks")), w)),
        lit(0L)))
      val hof = run(Repetition.coveredCharsHof(col("starts"), col("toks"), w))
      assert(kernel == hof, s"w=$w")
    }
  }
}
