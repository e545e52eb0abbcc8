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

  test("span dedup strips non-BMP repeated grams without splitting pairs") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "🚀x 𝄞y ☃z alpha"),
      (2L, "🚀x 𝄞y ☃z beta"),
      (3L, "plain words only here")
    ).toDF("doc_id", "text")
    // "🚀x 𝄞y ☃z" (k=3) repeats twice -> stripped from both docs intact
    val out = Dedup.dropRepeatedSpans(docs, "doc_id", "text", k = 3, minRepeats = 2)
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == "alpha")
    assert(out(1).getString(1) == "beta")
    assert(out(2).getString(1) == "plain words only here")
    assert(out(0).getLong(3) == 3L && out(2).getLong(3) == 0L)
  }

  test("frequentTerms counts non-BMP terms as whole tokens") {
    val sk = Seq("🚀 🚀 𝄞a", "𝄞a 🚀").toDF("text")
      .agg(TextFns.frequentTerms(col("text"), 8).as("sk"))
      .select(explode(col("sk")).as("e"))
      .collect().map(r => r.getStruct(0).getString(0) -> r.getStruct(0).getLong(1)).toMap
    assert(sk == Map("🚀" -> 3L, "𝄞a" -> 2L))
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

  test("script profile: counts, dominant tie-break, exact mix score") {
    val d = Seq(
      (1L, "hello Привет"),      // 5 latin vs 6 cyrillic
      (2L, "abc абв"),           // 3 vs 3: tie → latin (declared order)
      (3L, "汉字"),               // han only → mix 0
      (4L, "12345 !?"),          // no profiled script → und, mix 0
      (5L, "aα")                 // 1 latin 1 greek: mix = 1/2
    ).toDF("doc_id", "text")
    val r = d.select(col("doc_id"),
        TextFns.scriptCounts(col("text")).as("sc"),
        TextFns.dominantScript(col("text")).as("dom"),
        TextFns.scriptMixMicro(col("text")).as("mix"))
      .orderBy("doc_id").collect()
    assert(r(0).getStruct(1).getAs[Long]("latin") == 5L)
    assert(r(0).getStruct(1).getAs[Long]("cyrillic") == 6L)
    assert(r(0).getString(2) == "cyrillic")
    assert(r(0).getLong(3) == 454545L) // round-half-up(5/11 · 1e6)
    assert(r(1).getString(2) == "latin") // exact tie breaks by order
    assert(r(1).getLong(3) == 500000L)
    assert(r(2).getString(2) == "han" && r(2).getLong(3) == 0L)
    assert(r(2).getStruct(1).getAs[Long]("total") == 2L)
    assert(r(3).getString(2) == "und" && r(3).getLong(3) == 0L)
    assert(r(4).getLong(3) == 500000L)
  }
}
