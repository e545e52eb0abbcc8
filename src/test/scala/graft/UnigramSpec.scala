package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.{Bpe, BpeModel, Unigram, UnigramModel}

/** Unigram-LM (SentencePiece-style) tokenizer: EM training over a word
  * histogram, Viterbi encoding, the shared-decode roundtrip property,
  * OOV fallback, determinism, and save/load. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def mkModel(pieces: (String, Double)*): UnigramModel =
    UnigramModel(pieces.toVector.sortBy { case (p, lp) => (-lp, p) },
      truncated = false, distinctWords = -1L)

  private val W = BpeModel.EndOfWord

  test("training learns frequent multi-symbol pieces") {
    val model = Unigram.trainFromHistogram(
      Iterator(("abab", 50L), ("ab", 30L), ("abba", 10L), ("cd", 5L)),
      vocabSize = 12)
    // all single symbols survive (a b c d + terminal)
    for (s <- Seq("a", "b", "c", "d", W))
      assert(model.logProb.contains(s), s"missing single symbol $s")
    // the dominant substring "ab" must be in the inventory and more
    // probable than any piece containing the rare c/d
    assert(model.logProb.contains("ab"), model.pieces.map(_._1))
    assert(model.logProb("ab") > model.logProb("c"))
    // probabilities normalize
    val mass = model.pieces.map { case (_, lp) => math.exp(lp) }.sum
    assert(math.abs(mass - 1.0) < 1e-9, s"prob mass $mass")
  }

  test("viterbi picks the max-probability segmentation") {
    // "ab" as one piece (log .4) beats "a"+"b" (log .2 + log .2)
    val m1 = mkModel(
      "ab" -> math.log(0.4), "a" -> math.log(0.2), "b" -> math.log(0.2),
      W -> math.log(0.2))
    val got1 = Seq("ab").toDF("t")
      .select(Unigram.encode(m1, col("t")).as("x")).head().getSeq[String](0)
    assert(got1 == Seq("ab", W))
    // flip the odds: now the split wins
    val m2 = mkModel(
      "ab" -> math.log(0.03), "a" -> math.log(0.3), "b" -> math.log(0.3),
      W -> math.log(0.37))
    val got2 = Seq("ab").toDF("t")
      .select(Unigram.encode(m2, col("t")).as("x")).head().getSeq[String](0)
    assert(got2 == Seq("a", "b", W))
  }

  test("score ties prefer the longer piece (deterministic)") {
    val p = math.log(0.25)
    val m = mkModel("ab" -> 2 * p, "a" -> p, "b" -> p, W -> p)
    // "ab"+W and "a"+"b"+W both score 3p — longer piece wins
    val got = Seq("ab").toDF("t")
      .select(Unigram.encode(m, col("t")).as("x")).head().getSeq[String](0)
    assert(got == Seq("ab", W))
  }

  test("roundtrip: decode(encode(t)) == whitespace-normalized text") {
    val docs = Seq(
      "Hello World  hello",
      "abab ab abba",
      "literal </w> marker and  escape char survive",
      "non-BMP 𝄞 ok 🚀",
      "  leading and trailing  ").toDF("text")
    val model = Unigram.train(docs, "text", vocabSize = 40)
    val r = docs.select(
      Unigram.decode(Unigram.encode(model, col("text"))).as("rebuilt"),
      concat_ws(" ", TextFns.tokens(col("text"))).as("expected"))
      .collect()
    r.foreach(row => assert(row.getString(0) == row.getString(1),
      s"roundtrip broke: ${row.getString(0)} vs ${row.getString(1)}"))
  }

  test("OOV symbols encode as singles; ids are -1") {
    val m = mkModel("a" -> math.log(0.5), W -> math.log(0.5))
    val toks = Seq("axa").toDF("t")
      .select(Unigram.encode(m, col("t")).as("x")).head().getSeq[String](0)
    assert(toks == Seq("a", "x", "a", W))
    val ids = Seq("axa").toDF("t")
      .select(Unigram.encodeIds(m, col("t")).as("x")).head().getSeq[Int](0)
    assert(ids.count(_ == -1) == 1)
    assert(ids.length == 4)
  }

  test("encode is partition-invariant and deterministic") {
    val docs = (1 to 200).map(i => (i.toLong, s"word$i abab common tail")).toDF("id", "text")
    val model = Unigram.train(docs, "text", vocabSize = 60)
    val a = docs.repartition(1)
      .select(col("id"), Unigram.encode(model, col("text")).as("x"))
      .orderBy("id").collect().map(_.getSeq[String](1))
    val b = docs.repartition(13)
      .select(col("id"), Unigram.encode(model, col("text")).as("x"))
      .orderBy("id").collect().map(_.getSeq[String](1))
    assert(a.toSeq == b.toSeq)
  }

  test("save/load roundtrip preserves the model") {
    val docs = Seq("abab ab cd cd cd").toDF("text")
    val model = Unigram.train(docs, "text", vocabSize = 20)
    val dir = java.nio.file.Files.createTempDirectory("unigram").toString
    Unigram.save(spark, model, dir)
    val back = Unigram.load(spark, dir)
    assert(back == model)
  }

  test("symbolLength counts escaped symbols and the terminal as one") {
    assert(Unigram.symbolLength("ab") == 2)
    assert(Unigram.symbolLength(W) == 1)
    assert(Unigram.symbolLength("ab" + W) == 3)
    assert(Unigram.symbolLength(BpeModel.EscLt) == 1)
    assert(Unigram.symbolLength(BpeModel.EscEsc + "a" + W) == 3)
    assert(Unigram.symbolLength("𝄞") == 1) // non-BMP = one symbol
  }

  test("exact tokenCount feeds budgets like BPE's") {
    val docs = Seq("abab ab").toDF("text")
    val model = Unigram.train(docs, "text", vocabSize = 20)
    val n = docs.select(Unigram.tokenCount(model, col("text")).as("n"))
      .head().getLong(0)
    val toks = docs.select(Unigram.encode(model, col("text")).as("x"))
      .head().getSeq[String](0)
    assert(n == toks.length)
  }
}
