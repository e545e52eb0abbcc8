package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bpe, BpeModel}

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- trainer ---------------------------------------------------------

  test("trainFromHistogram learns the classic Sennrich merges") {
    // histogram: low×5, lower×2, newest×6, widest×3
    val hist = Iterator(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val m = Bpe.trainFromHistogram(hist, numMerges = 4, minPairCount = 1L)
    // pair counts: (e,s)=9, (s,t)=9, (t,</w>)=9, (w,e)=6 [newest], ...
    // ties (e,s)/(s,t)/(t,</w>) at 9 break lexicographically:
    // "</w>" < "e" < "s" < "t" so (s,t) vs (e,s) vs (t,</w>):
    // lex asc on (a,b): ("e","s") < ("s","t") < ("t","</w>")
    assert(m.merges(0) == ("e", "s"))
    // after merge 1: (es,t)=9, (t,</w>)=9 → ("es","t") < ("t","</w>")
    assert(m.merges(1) == ("es", "t"))
    // after merge 2: (est,</w>)=9 uniquely largest
    assert(m.merges(2) == ("est", "</w>"))
    // remaining: low×5+lower×2 → (l,o)=7, (o,w)=7 → lex: (l,o) first
    assert(m.merges(3) == ("l", "o"))
  }

  test("training is deterministic and stops at minPairCount") {
    val docs = Seq("aa bb aa cc", "aa bb dd", "aa aa bb").toDF("text")
    val m1 = Bpe.train(docs, "text", numMerges = 50, minPairCount = 2L)
    val m2 = Bpe.train(docs, "text", numMerges = 50, minPairCount = 2L)
    assert(m1.merges == m2.merges)
    assert(m1.merges.nonEmpty)
    // max weighted count is 6, tied between (a,a) and (a,</w>) — the
    // lexicographic tie-break picks (a,</w>) ("</w>" < "a")
    assert(m1.merges.head == ("a", BpeModel.EndOfWord))
  }

  test("histogram truncation is flagged, not silent") {
    val docs = Seq("one two three four five six").toDF("text")
    val m = Bpe.train(docs, "text", numMerges = 2, maxDistinctWords = 3)
    assert(m.truncated)
    assert(m.distinctWords == 3L)
    val full = Bpe.train(docs, "text", numMerges = 2, maxDistinctWords = 100)
    assert(!full.truncated && full.distinctWords == 6L)
  }

  // ---- encoder ---------------------------------------------------------

  test("encode applies merges by rank; unseen chars stay char-level") {
    val hist = Iterator(("abab", 10L))
    val m = Bpe.trainFromHistogram(hist, numMerges = 3, minPairCount = 1L)
    // (a,b)=20 → ab; then (ab,ab)=10 ties (ab,</w>)=10 and the lex
    // break picks (ab,</w>); finally (ab,ab</w>)=10
    assert(m.merges == Vector(("a", "b"), ("ab", "</w>"), ("ab", "ab</w>")))
    val out = Seq("abab ab ق").toDF("text")
      .select(Bpe.encode(m, col("text")).as("t")).head().getSeq[String](0)
    // "abab" → full merge chain; "ab" → (a,b) then (ab,</w>);
    // "ق" outside alphabet → char-level + terminal
    assert(out == Seq("abab</w>", "ab</w>", "ق", "</w>"))
  }

  test("encodeIds maps via vocab, OOV = -1") {
    val m = Bpe.trainFromHistogram(Iterator(("hi", 5L)), 2, 1L)
    val row = Seq("hi hz").toDF("text")
      .select(Bpe.encodeIds(m, col("text")).as("ids"),
        Bpe.encode(m, col("text")).as("toks")).head()
    val ids = row.getSeq[Int](0); val toks = row.getSeq[String](1)
    assert(ids.length == toks.length)
    toks.zip(ids).foreach { case (t, i) =>
      if (m.vocab.contains(t)) assert(i == m.vocab(t)) else assert(i == -1)
    }
    // "hz": h in alphabet, z not
    assert(ids.count(_ == -1) == 1)
  }

  test("decode(encode(x)) == whitespace-normalized x (property)") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcdefg hij\tkl\n  mnop !?.é中"
    val docs = (0 until 200).map { _ =>
      (0 until rnd.nextInt(80)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }.toDF("text")
    val m = Bpe.train(docs, "text", numMerges = 30, minPairCount = 1L)
    val bad = docs
      .withColumn("rebuilt", Bpe.decode(Bpe.encode(m, col("text"))))
      .withColumn("expected",
        concat_ws(" ", graft.functions.TextFns.tokens(col("text"))))
      .filter(col("rebuilt") =!= col("expected"))
      .count()
    assert(bad == 0L)
  }

  test("encode is partitioning-invariant and exact counts feed packing") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet").limit(100).cache()
    val m = Bpe.train(docs, "text", numMerges = 60)
    val a = docs.repartition(1)
      .select(col("doc_id"), Bpe.tokenCount(m, col("text")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = docs.repartition(7)
      .select(col("doc_id"), Bpe.tokenCount(m, col("text")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
    // BPE merges can only shorten the char+terminal sequence
    val over = docs.select(
        Bpe.tokenCount(m, col("text")).as("n"),
        graft.functions.TextFns.tokenCount(col("text")).as("words"))
      .filter(col("n") < col("words")).count()
    assert(over == 0L)
    docs.unpersist()
  }

  test("save/load roundtrip preserves the model") {
    val docs = Seq("pack my box with five dozen liquor jugs").toDF("text")
    val m = Bpe.train(docs, "text", numMerges = 10, minPairCount = 1L)
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    Bpe.save(spark, m, dir)
    val back = Bpe.load(spark, dir)
    assert(back.merges == m.merges)
    assert(back.alphabet.sorted == m.alphabet.sorted)
    assert(back.vocab == m.vocab)
  }

  test("decode never confuses literal </w> content with the terminal") {
    // scraped-HTML-style input containing the marker itself + the
    // escape char: decode(encode(t)) must still equal normalized t
    val texts = Seq(
      "a</w>b plain </w> <w> <</w>>  x</w>y",
      "</w></w> <places> all<one tag</w>")
    val docs = texts.toDF("text")
    val m = Bpe.train(docs, "text", numMerges = 20, minPairCount = 1L)
    val bad = docs
      .withColumn("rebuilt", Bpe.decode(Bpe.encode(m, col("text"))))
      .withColumn("expected",
        concat_ws(" ", graft.functions.TextFns.tokens(col("text"))))
      .filter(col("rebuilt") =!= col("expected"))
      .count()
    assert(bad == 0L)
  }

  test("merge accounting survives overlapping pairs (aaa…)") {
    val m = Bpe.trainFromHistogram(Iterator(("aaaa", 3L), ("aaa", 2L)), 4, 1L)
    // (a,a): aaaa has 3, aaa has 2 → 3*3+2*2 = 13 → merge 1 = (a,a)
    assert(m.merges.head == ("a", "a"))
    val toks = Seq("aaaa aaa").toDF("text")
      .select(Bpe.encode(m, col("text")).as("t")).head().getSeq[String](0)
    // greedy left-to-right with rank order reconstructs both words
    assert(Bpe
      .splitSymbols("x").last == BpeModel.EndOfWord)
    assert(toks.mkString("") == "aaaa</w>aaa</w>")
  }
}
