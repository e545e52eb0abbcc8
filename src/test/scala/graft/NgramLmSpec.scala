package graft

import org.apache.spark.sql.functions._

import graft.operators.NgramLm

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  test("bigram scores match a hand computation") {
    // reference: "a b a b" + "a c" → bigrams (a,b)x2 (b,a)x1 (a,c)x1
    // vocab {a,b,c} V=3; ctx totals: a=3, b=1
    val ref = Seq("a b a b", "a c").toDF("text")
    val model = NgramLm.train(ref, "text", n = 2)
    assert(model.vocabSize == 3L)
    val grams = model.grams.collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(grams == Map(("a", "b") -> 2L, ("b", "a") -> 1L, ("a", "c") -> 1L))

    // score "a b z": (a,b): (2+1)*1e9 // (3+3) = 500000000
    //                (b,z): OOV, ctx b total 1 → 1e9 // (1+3) = 250000000
    val out = NgramLm.scoreDocs(
      Seq((1L, "a b z")).toDF("id", "text"), "id", "text", model)
      .head()
    assert(out.getLong(1) == 2L)       // n_grams
    assert(out.getLong(2) == 1L)       // oov_grams
    assert(math.abs(out.getDouble(3) - ((500000000L + 250000000L) / 2.0 / 1e9)) == 0.0)
  }

  test("short and empty docs keep a row with NULL fluency") {
    val ref = Seq("a b").toDF("text")
    val model = NgramLm.train(ref, "text")
    val out = NgramLm.scoreDocs(
      Seq((1L, "a"), (2L, ""), (3L, "a b")).toDF("id", "text"),
      "id", "text", model)
      .orderBy("id").collect()
    assert(out.length == 3)
    assert(out(0).getLong(1) == 0L && out(0).isNullAt(3))
    assert(out(1).getLong(1) == 0L && out(1).isNullAt(3))
    assert(out(2).getLong(1) == 1L && !out(2).isNullAt(3))
  }

  test("unseen-context grams smooth to 1/V") {
    val ref = Seq("x y").toDF("text")
    val model = NgramLm.train(ref, "text") // V=2
    val out = NgramLm.scoreDocs(
      Seq((1L, "q r")).toDF("id", "text"), "id", "text", model).head()
    // (q,r): cnt 0, ctx q unseen → total 0 → 1e9 // (0+2) = 5e8
    assert(out.getLong(2) == 1L)
    assert(out.getDouble(3) == 0.5)
  }

  test("trigram contexts join n-1 tokens") {
    val ref = Seq("a b c a b c").toDF("text")
    val model = NgramLm.train(ref, "text", n = 3)
    val ctxs = model.grams.select("ctx").as[String].collect().toSet
    assert(ctxs == Set("a b", "b c", "c a"))
    val out = NgramLm.scoreDocs(
      Seq((1L, "a b c")).toDF("id", "text"), "id", "text", model).head()
    assert(out.getLong(1) == 1L && out.getLong(2) == 0L)
  }

  test("broadcastModel hint keeps the plan broadcast-joined") {
    val ref = Seq("a b a b").toDF("text")
    val model = NgramLm.train(ref, "text")
    val plan = NgramLm.scoreDocs(
      Seq((1L, "a b")).toDF("id", "text"), "id", "text", model,
      broadcastModel = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
  }
  test("stupid backoff: hand-computed cascade on a tiny trigram model") {
    val ref = Seq("a b c", "a b d").toDF("text")
    // counts: uni a:2 b:2 c:1 d:1 (N=6); bi "a b":2 "b c":1 "b d":1;
    // tri "a b c":1 "a b d":1
    val model = NgramLm.trainBackoff(ref, "text", n = 3)
    assert(model.totalTokens == 6L)
    val docs = Seq(
      (1L, "a b c"),   // full order: 1e9*1 DIV 2            -> 0.5
      (2L, "c a b"),   // backoff to bigram: 1e9*2*2 DIV (5*2) -> 0.4
      (3L, "b b c"),   // backoff to bigram: 1e9*2*1 DIV (5*2) -> 0.2
      (4L, "x y c"),   // backoff to unigram: 1e9*4*1 DIV (25*6) = 26666666
      (5L, "a b x"),   // OOV at every level -> 0
      (6L, "a b")      // too short -> n_grams 0, fluency NULL
    ).toDF("doc_id", "text")
    val out = NgramLm.scoreDocsBackoff(docs, "doc_id", "text", model)
      .orderBy("doc_id").collect()
    def row(i: Int) = (out(i).getLong(1), out(i).getLong(2), out(i).getLong(3),
      if (out(i).isNullAt(4)) Double.NaN else out(i).getDouble(4))
    assert(row(0) == ((1L, 0L, 0L, 0.5)))
    assert(row(1) == ((1L, 1L, 0L, 0.4)))
    assert(row(2) == ((1L, 1L, 0L, 0.2)))
    assert(row(3) == ((1L, 1L, 0L, 26666666 / 1e9)))
    assert(row(4) == ((1L, 1L, 1L, 0.0)))
    assert(out(5).getLong(1) == 0L && out(5).isNullAt(4))
  }

  test("Kneser-Ney bigram: hand-computed interpolated cascade") {
    // ref "a b a b" + "a c": raw_2 = {a b:2, b a:1, a c:1}, B = 3
    // topDen a→3 b→1; topLam a→2 b→1; cont1 a→1 b→1 c→1
    val ref = Seq("a b a b", "a c").toDF("text")
    val model = NgramLm.trainKneserNey(ref, "text", n = 2)
    assert(model.bigramTypes == 3L)
    // "a b z", D = 3/4:
    //  (a,b): s1 = 1e9 DIV 3 = 333333333
    //         s2 = (1e9·(2·4−3) + 3·2·333333333) DIV (4·3)
    //            = 6999999998 DIV 12 = 583333333
    //         (true rational: 1.25/3 + (.75·2/3)(1/3) = 0.58333…)
    //  (b,z): OOV → s1 = 0; s2 = (0 + 0) DIV 4 = 0
    val out = NgramLm.scoreDocsKneserNey(
      Seq((1L, "a b z")).toDF("id", "text"), "id", "text", model).head()
    assert(out.getLong(1) == 2L) // n_grams
    assert(out.getLong(2) == 1L) // backoff (b,z unseen at top)
    assert(out.getLong(3) == 1L) // oov (z)
    assert(out.getDouble(4) == (583333333L + 0L) / 2.0 / 1e9)
  }

  test("Kneser-Ney trigram: mid-level continuation counts and fall-through") {
    // ref "a b c a b d": raw_3 {a b c, b c a, c a b, a b d} ×1
    // raw_2 {a b:2, b c:1, c a:1, b d:1} → B = 4
    val ref = Seq("a b c a b d").toDF("text")
    val model = NgramLm.trainKneserNey(ref, "text", n = 3)
    assert(model.bigramTypes == 4L)
    val out = NgramLm.scoreDocsKneserNey(
      Seq((1L, "a b c"), (2L, "x y c")).toDF("id", "text"), "id", "text", model)
      .orderBy("id").collect()
    // doc 1, window (a b, c):
    //  s1(c) = 1e9 DIV 4 = 250000000
    //  s2: nc(b c)=1 dc(b)=2 lm(b)=2 →
    //     (1e9·(4−3) + 3·2·250000000) DIV (4·2) = 2.5e9 DIV 8 = 312500000
    //  s3: c(a b c)=1 den(a b)=2 lam(a b)=2 →
    //     (1e9 + 3·2·312500000) DIV 8 = 2875000000 DIV 8 = 359375000
    assert(out(0).getLong(1) == 1L && out(0).getLong(2) == 0L && out(0).getLong(3) == 0L)
    assert(out(0).getDouble(4) == 359375000L / 1e9)
    // doc 2: both contexts unseen → falls through to s1(c) = 0.25
    assert(out(1).getLong(2) == 1L && out(1).getLong(3) == 0L)
    assert(out(1).getDouble(4) == 250000000L / 1e9)
  }

  test("Kneser-Ney: partition-invariant and favors fluent docs") {
    val ref = (1 to 50).map(i => s"the cat sat on the mat $i").toDF("text")
    val docs = Seq((1L, "the cat sat on the mat"), (2L, "mat the on cat sat the"))
      .toDF("id", "text")
    val model = NgramLm.trainKneserNey(ref, "text", n = 2)
    val a = NgramLm.scoreDocsKneserNey(docs, "id", "text", model)
      .orderBy("id").select("fluency").as[Double].collect()
    val b = NgramLm.scoreDocsKneserNey(docs.repartition(7), "id", "text", model)
      .orderBy("id").select("fluency").as[Double].collect()
    assert(a.toSeq == b.toSeq)
    assert(a(0) > a(1), s"fluent ${a(0)} should beat scrambled ${a(1)}")
  }

  test("dropDisfluent keeps fluent + unscoreable docs, drops the rest") {
    import graft.operators.Pipelines
    val ref = Seq("the cat sat", "the cat ran", "the dog sat").toDF("text")
    val model = NgramLm.train(ref, "text", n = 2)
    val docs = Seq(
      (1L, "the cat sat"),     // in-domain -> fluent
      (2L, "zz qq ww xx yy"),  // all-OOV -> low fluency
      (3L, "one")              // too short to score -> kept
    ).toDF("doc_id", "text")
    val scored = NgramLm.scoreDocs(docs, "doc_id", "text", model)
      .orderBy("doc_id").collect()
    val f1 = scored(0).getDouble(scored(0).fieldIndex("fluency"))
    val f2 = scored(1).getDouble(scored(1).fieldIndex("fluency"))
    assert(f1 > f2)
    val thr = (f1 + f2) / 2
    val kept = Pipelines.dropDisfluent(docs, "doc_id", "text", model, thr)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L, 3L))
  }

  test("perplexityBuckets: head/middle/tail/unscored by fluency cutoffs") {
    import spark.implicits._
    import graft.operators.Pipelines
    val ref = Seq((10L, "the cat sat on the mat the cat sat")).toDF("doc_id", "text")
    val model = NgramLm.train(ref, "text", n = 2)
    val docs = Seq(
      (1L, "the cat sat"),     // in-domain -> highest fluency
      (2L, "the cat on the mat"), // partial overlap (above the 1/V OOV floor)
      (3L, "zz qq ww xx yy"),  // all OOV -> lowest
      (4L, "one")              // too short -> unscored
    ).toDF("doc_id", "text")
    val f = NgramLm.scoreDocs(docs, "doc_id", "text", model)
      .orderBy("doc_id").collect()
      .map(r => if (r.isNullAt(r.fieldIndex("fluency"))) Double.NaN
        else r.getDouble(r.fieldIndex("fluency")))
    assert(f(0) > f(1) && f(1) > f(2))
    val cutHigh = (f(0) + f(1)) / 2; val cutLow = (f(1) + f(2)) / 2
    val got = Pipelines.perplexityBuckets(docs, "doc_id", "text", model, cutLow, cutHigh)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(r.fieldIndex("ppl_bucket"))).toMap
    assert(got == Map(1L -> "head", 2L -> "middle", 3L -> "tail", 4L -> "unscored"))
    // calibration helper brackets the middle doc
    val (lo, hi) = Pipelines.fluencyCutoffs(docs, "doc_id", "text", model,
      qLow = 0.34, qHigh = 0.67)
    assert(lo <= f(1) && f(1) <= hi)
  }

  test("save/load round-trips all three model families; scores bit-identical") {
    val ref = Seq("a b a b c d", "a c d b", "b c a a").toDF("text")
    val docs = Seq((1L, "a b c z"), (2L, "d b a")).toDF("id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft_lm_persist").toString
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").collect().map(_.toSeq).toSeq

    val m = NgramLm.train(ref, "text", n = 2)
    NgramLm.save(m, s"$root/plain")
    val m2 = NgramLm.load(spark, s"$root/plain")
    assert(m2.n == m.n && m2.vocabSize == m.vocabSize)
    assert(rows(NgramLm.scoreDocs(docs, "id", "text", m2)) ==
      rows(NgramLm.scoreDocs(docs, "id", "text", m)))

    val b = NgramLm.trainBackoff(ref, "text", n = 3)
    NgramLm.saveBackoff(b, s"$root/backoff")
    val b2 = NgramLm.loadBackoff(spark, s"$root/backoff")
    assert(b2.n == b.n && b2.totalTokens == b.totalTokens)
    assert(rows(NgramLm.scoreDocsBackoff(docs, "id", "text", b2)) ==
      rows(NgramLm.scoreDocsBackoff(docs, "id", "text", b)))

    val k = NgramLm.trainKneserNey(ref, "text", n = 3)
    NgramLm.saveKneserNey(k, s"$root/kn")
    val k2 = NgramLm.loadKneserNey(spark, s"$root/kn")
    assert(k2.n == k.n && k2.bigramTypes == k.bigramTypes &&
      k2.mids.keySet == k.mids.keySet)
    assert(rows(NgramLm.scoreDocsKneserNey(docs, "id", "text", k2)) ==
      rows(NgramLm.scoreDocsKneserNey(docs, "id", "text", k)))

    // loud on a mismatched format tag
    val e = intercept[IllegalArgumentException] {
      NgramLm.loadBackoff(spark, s"$root/plain")
    }
    assert(e.getMessage.contains("graft-backoff-lm-v1"))
  }
}
