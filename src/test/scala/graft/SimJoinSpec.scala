package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Prefix-filter set-similarity join: exact recall against a
  * brute-force all-pairs reference, thresholds as exact rationals,
  * partition invariance, and the degenerate cases. */
class SimJoinSpec extends SparkSpec {

  import spark.implicits._

  /** deterministic corpus with planted near-dup structure: base docs
    * plus mutated copies sharing most tokens */
  private def corpus: Seq[(Long, Seq[String])] = {
    val base = (0 until 20).map { b =>
      (0 until 10).map(i => s"w${(b * 7 + i * 3) % 40}")
    }
    base.zipWithIndex.flatMap { case (toks, b) =>
      Seq(
        (b * 3L, toks),
        (b * 3L + 1, toks.updated(0, s"m$b")), // 1 token swapped
        (b * 3L + 2, toks.take(5) ++ Seq(s"x$b", s"y$b", s"z$b")))
    }
  }

  private def brute(num: Long, den: Long): Set[(Long, Long, Double)] = {
    val sets = corpus.map { case (id, ts) => (id, ts.distinct.toSet) }
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      i = (sa & sb).size.toLong
      u = sa.size + sb.size - i
      if i * den >= u * num
    } yield (a, b, ((i * 2000000L + u) / (2 * u)).toDouble / 1000000.0)).toSet
  }

  private def run(num: Long, den: Long, parts: Int): Set[(Long, Long, Double)] = {
    val df = corpus.toDF("id", "toks").repartition(parts)
    Dedup.similarityJoinPrefix(df, "id", col("toks"), num, den)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("pairs and jaccard values equal brute force at several thresholds") {
    for ((num, den) <- Seq((1L, 2L), (3L, 5L), (4L, 5L), (1L, 1L))) {
      assert(run(num, den, 3) === brute(num, den), s"threshold $num/$den")
    }
  }

  test("threshold 1/1 finds exactly the identical sets") {
    val pairs = run(1L, 1L, 2)
    assert(pairs === brute(1L, 1L))
    assert(pairs.forall(_._3 === 1.0))
  }

  test("partition-invariant") {
    assert(run(1L, 2L, 1) === run(1L, 2L, 7))
  }

  test("duplicate tokens in the input are set-semantics (deduped)") {
    val df = Seq(
      (1L, Seq("a", "a", "a", "b")),
      (2L, Seq("a", "b", "b"))).toDF("id", "toks")
    val got = Dedup.similarityJoinPrefix(df, "id", col("toks"), 1L, 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got === Array((1L, 2L, 1.0))) // both reduce to {a, b}
  }

  test("empty sets never pair") {
    val df = Seq(
      (1L, Seq.empty[String]), (2L, Seq.empty[String]), (3L, Seq("a")))
      .toDF("id", "toks")
    assert(Dedup.similarityJoinPrefix(df, "id", col("toks"), 1L, 2L).count() === 0L)
  }
}
