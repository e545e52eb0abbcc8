package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.{Bpe, Chunking, Repetition}

/** Non-BMP (surrogate-pair) robustness through the text operators that
  * back the driver gates: tokenization, shingles, repetition fractions,
  * chunking, BPE — the likeliest residual source of cross-engine
  * divergence after exact arithmetic. Expectations are hand-computed in
  * CODE POINTS (both Spark's length() and DuckDB's len() count code
  * points, so these pin the shared semantics). 𝄞 and 🚀 are 4-byte
  * UTF-8 / surrogate pairs in the JVM. */
class UnicodeTextSpec extends SparkSpec {
  import spark.implicits._

  test("length/tokens count code points, not UTF-16 units") {
    val r = Seq(1).toDF("i").select(
      length(lit("𝄞")).as("l1"),
      length(lit("𝄞a 🚀b")).as("l2"),
      TextFns.tokenCount(lit("𝄞a 🚀b  ☃c")).as("n")).head()
    assert(r.getInt(0) == 1)
    assert(r.getInt(1) == 5)
    assert(r.getLong(2) == 3L)
  }

  test("repetition report: exact fractions over non-BMP bigrams") {
    val docs = Seq(
      (1L, "𝄞a 𝄞a 🚀b"),    // bigrams: "𝄞a 𝄞a", "𝄞a 🚀b" — all distinct
      (2L, "🚀x 🚀x 🚀x")     // bigram "🚀x 🚀x" twice — dup mass 0.5
    ).toDF("doc_id", "text")
    val rep = Repetition.repetitionReport(docs, "doc_id", "text", n = 2)
      .orderBy("doc_id").collect()
    assert(rep(0).getLong(1) == 2 && rep(0).getLong(2) == 2) // n_grams, distinct
    assert(rep(0).getDouble(3) == 0.0)
    // top gram by (count, gram) struct max: UTF-8 binary order puts
    // 🚀 (F0 9F…) above 𝄞 (F0 9D…)
    assert(rep(0).getString(4) == "𝄞a 🚀b")
    // 1 occurrence × 5 code points / 8 doc code points = 0.625 exact
    assert(rep(0).getDouble(5) == 0.625)
    assert(rep(1).getLong(1) == 2 && rep(1).getLong(2) == 1)
    assert(rep(1).getDouble(3) == 0.5)
    // 2 occurrences × 5 cps / 8 cps = 1.25 (score may exceed 1)
    assert(rep(1).getDouble(5) == 1.25)
  }

  test("word shingles keep surrogate pairs joined") {
    val out = Seq("𝄞a 🚀b ☃c").toDF("text")
      .select(explode(TextFns.wordShingles(col("text"), 2)).as("g"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("𝄞a 🚀b", "🚀b ☃c"))
  }

  test("chunking reconstructs non-BMP text and counts whole tokens") {
    val docs = Seq((1L, "𝄞a 🚀b ☃c dd ee")).toDF("doc_id", "text")
    val chunks = Chunking.chunkByTokens(docs, "text", maxTokens = 2, overlap = 1)
      .orderBy("chunk_id").collect()
    // stride 1: windows of 2 tokens starting at every token (last may be short)
    assert(chunks.forall(_.getLong(chunks.head.fieldIndex("chunk_tokens")) <= 2))
    val first = chunks.head.getString(chunks.head.fieldIndex("chunk"))
    assert(first == "𝄞a 🚀b")
    // every token survives chunking byte-identically
    val toks = chunks.flatMap(_.getString(chunks.head.fieldIndex("chunk")).split(" ")).toSet
    assert(toks == Set("𝄞a", "🚀b", "☃c", "dd", "ee"))
  }

  test("BPE roundtrip over non-BMP + the escape characters together") {
    val docs = Seq(
      "𝄞𝄞 🚀🚀 clef 𝄞 </w> <𝄞> mixed🚀text",
      "🚀 🚀 🚀 deja vu deja vu").toDF("text")
    val m = Bpe.train(docs, "text", numMerges = 20, minPairCount = 1L)
    val bad = docs
      .withColumn("rebuilt", Bpe.decode(Bpe.encode(m, col("text"))))
      .withColumn("expected", concat_ws(" ", TextFns.tokens(col("text"))))
      .filter(col("rebuilt") =!= col("expected"))
      .count()
    assert(bad == 0L)
    // splitSymbols keeps a surrogate pair as ONE symbol
    assert(Bpe.splitSymbols("𝄞a").toSeq == Seq("𝄞", "a", "</w>"))
  }
}
