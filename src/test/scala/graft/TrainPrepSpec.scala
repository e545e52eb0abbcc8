package graft

import org.apache.spark.sql.functions._
import graft.operators.{Chunking, Decontaminate, Packing, Repetition, Sampling}

/** Training-corpus preparation operators: benchmark decontamination,
  * deterministic sampling / corpus mixing, sequence packing. */
class TrainPrepSpec extends SparkSpec {
  import spark.implicits._

  // -- decontamination ---------------------------------------------------

  private val corpus = Seq(
    (0L, "alpha beta gamma delta epsilon zeta"),            // shares 4-grams w/ bench
    (1L, "totally unrelated text about spark engines here"),
    (2L, "alpha beta gamma delta unrelated tail words"),    // one shared 4-gram
    (3L, "tiny doc")                                        // < n tokens → absent
  ).toDF("doc_id", "text")
  private val bench = Seq(
    (100L, "alpha beta gamma delta epsilon zeta eta theta")
  ).toDF("doc_id", "text")

  test("contaminationReport: shared-gram counts and ratio") {
    val rep = Decontaminate.contaminationReport(corpus, bench, "doc_id", "text", "text", n = 4)
      .orderBy("doc_id").collect()
    // doc 0: 3 distinct 4-grams, all inside the bench doc
    assert(rep(0).getLong(0) == 0L && rep(0).getLong(1) == 3L && rep(0).getLong(2) == 3L)
    assert(rep(0).getDouble(3) == 1.0)
    // doc 2: 4 grams, only "alpha beta gamma delta" shared
    assert(rep(1).getLong(0) == 2L && rep(1).getLong(1) == 4L && rep(1).getLong(2) == 1L)
    assert(rep(1).getDouble(3) == 0.25)
    // docs 1 (no overlap) and 3 (too short) absent
    assert(rep.length == 2)
  }

  test("dropContaminated honors the threshold; broadcast toggle is semantics-neutral") {
    val strict = Decontaminate.dropContaminated(corpus, bench, "doc_id", "text", "text", n = 4)
      .select("doc_id").as[Long].collect().sorted
    assert(strict.toSeq == Seq(1L, 3L)) // any overlap drops
    val lax = Decontaminate.dropContaminated(
        corpus, bench, "doc_id", "text", "text", n = 4, maxContamination = 0.5)
      .select("doc_id").as[Long].collect().sorted
    assert(lax.toSeq == Seq(1L, 2L, 3L)) // doc 2 at 0.25 survives
    val noBcast = Decontaminate.dropContaminated(
        corpus, bench, "doc_id", "text", "text", n = 4, broadcastBenchmark = false)
      .select("doc_id").as[Long].collect().sorted
    assert(noBcast.toSeq == strict.toSeq)
  }

  test("decontamination probe plan broadcasts the benchmark side (no corpus shuffle join)") {
    val plan = Decontaminate.contaminationReport(corpus, bench, "doc_id", "text", "text", n = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("corpusProfileApprox: exact columns identical, sketch n_unique within rsd of exact") {
    import graft.operators.Pipelines
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val exact = Pipelines.corpusProfile(docs, "text", "lang")
      .orderBy("lang").collect()
    val approx = Pipelines.corpusProfileApprox(docs, "text", "lang", rsd = 0.02)
      .orderBy("lang").collect()
    exact.zip(approx).foreach { case (e, a) =>
      Seq("lang", "n_docs", "n_tokens", "n_chars", "avg_tokens", "avg_quality").foreach { c =>
        assert(e.get(e.fieldIndex(c)) == a.get(a.fieldIndex(c)), c)
      }
      val eu = e.getLong(e.fieldIndex("n_unique")).toDouble
      val au = a.getLong(a.fieldIndex("n_unique")).toDouble
      assert(math.abs(au - eu) / eu < 0.1, s"sketch off: $au vs $eu")
    }
  }

  test("dropContaminatedNarrow: equals strict dropContaminated on batch, streams in append mode") {
    // batch equivalence with the join-based strict path
    val narrow = Decontaminate.dropContaminatedNarrow(corpus, bench, "text", "text", n = 4)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(narrow == Seq(1L, 3L))
    // streaming: same op, unchanged, on a MemoryStream corpus
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = Decontaminate.dropContaminatedNarrow(
      input.toDF.toDF("doc_id", "text"), bench, "text", "text", n = 4)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("decon_stream_out").start()
    try {
      corpus.as[(Long, String)].collect().foreach(r => input.addData(r))
      q.processAllAvailable()
      val streamed = spark.table("decon_stream_out")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(streamed == Seq(1L, 3L))
    } finally q.stop()
  }

  // -- deterministic sampling --------------------------------------------

  test("hashSample is a pure function of (seed, key): partitioning-invariant, seed-sensitive") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val a = Sampling.hashSample(docs, 0.3, "s1", Seq("doc_id"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.hashSample(docs.repartition(7), 0.3, "s1", Seq("doc_id"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
    val other = Sampling.hashSample(docs, 0.3, "s2", Seq("doc_id"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(other != a)
    // rough rate check: 0.3 ± generous slack
    val n = docs.count().toDouble
    assert(a.size > n * 0.15 && a.size < n * 0.45)
  }

  test("unitHash: separator-ambiguous and NULL-vs-empty key tuples hash differently") {
    val d = Seq(
      (1L, Some("a|b"), Some("c")), (2L, Some("a"), Some("b|c")),
      (3L, Some("x"), None), (4L, Some("x"), Some(""))
    ).toDF("id", "k1", "k2")
    val hashes = d.select(Sampling.unitHash("s", Seq(col("k1"), col("k2"))).as("h"))
      .collect().map(_.getDouble(0))
    assert(hashes.distinct.length == 4)
  }

  test("hashSample edge fractions: 0 keeps nothing, 1 keeps everything") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    assert(Sampling.hashSample(docs, 0.0, "s", Seq("doc_id")).count() == 0L)
    assert(Sampling.hashSample(docs, 1.0, "s", Seq("doc_id")).count() == docs.count())
  }

  test("stratifiedSampleN keeps exactly min(n, group size) per group, deterministically") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val sizes = Sampling.stratifiedSampleN(docs, Seq("lang"), 5, "s7", "doc_id")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    full.foreach { case (lang, cnt) => assert(sizes(lang) == math.min(5L, cnt)) }
    val again = Sampling.stratifiedSampleN(docs.repartition(5), Seq("lang"), 5, "s7", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val first = Sampling.stratifiedSampleN(docs, Seq("lang"), 5, "s7", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again == first)
  }

  test("mixCorpora: full-weight sources pass through; salted seeds draw independently") {
    val a = Seq((1L, "a"), (2L, "a"), (3L, "a")).toDF("id", "src")
    val b = Seq((1L, "b"), (2L, "b"), (3L, "b")).toDF("id", "src")
    val full = Sampling.mixCorpora(Seq(a -> 1.0, b -> 1.0), "m", Seq("id")).count()
    assert(full == 6L)
    // same ids, different source index → selections must not be the
    // same function of id (salted seed): check on a bigger key space
    val big = spark.range(1000).withColumn("src", lit("x")).toDF("id", "src")
    val mixed = Sampling.mixCorpora(Seq(big -> 0.5, big -> 0.5), "m", Seq("id"))
    val perId = mixed.groupBy("id").count().collect().map(_.getLong(1))
    assert(perId.exists(_ == 1L)) // if seeds weren't salted every id would appear 0 or 2 times
  }

  // -- WAV audio decode --------------------------------------------------

  private def wav(rate: Int, channels: Int, bits: Int, data: Array[Byte]): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val bb = ByteBuffer.allocate(44 + data.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(ascii)); bb.putInt(36 + data.length); bb.put("WAVE".getBytes(ascii))
    bb.put("fmt ".getBytes(ascii)); bb.putInt(16)
    bb.putShort(1); bb.putShort(channels.toShort); bb.putInt(rate)
    bb.putInt(rate * channels * bits / 8)
    bb.putShort((channels * bits / 8).toShort); bb.putShort(bits.toShort)
    bb.put("data".getBytes(ascii)); bb.putInt(data.length)
    bb.put(data)
    bb.array()
  }

  test("WAV decode: 16-bit mono exact peak/rms, 8-bit centered, stereo frames, garbage → NULL") {
    import java.nio.{ByteBuffer, ByteOrder}
    import graft.operators.Multimodal
    // 16-bit mono: samples [1000, -2000, 3000, -4000]
    val s16 = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    Seq(1000, -2000, 3000, -4000).foreach(v => s16.putShort(v.toShort))
    // 8-bit mono: bytes [128, 138, 118] → centered samples [0, 10, -10]
    val s8 = Array[Byte](128.toByte, 138.toByte, 118.toByte)
    // 16-bit stereo: 2 frames of (100, -100)
    val st = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    Seq(100, -100, 100, -100).foreach(v => st.putShort(v.toShort))
    val rows = Seq(
      (1L, wav(8000, 1, 16, s16.array())),
      (2L, wav(16000, 1, 8, s8)),
      (3L, wav(44100, 2, 16, st.array())),
      (4L, Array[Byte](1, 2, 3)),
      (5L, "RIFFxxxxWAVE".getBytes ++ Array.fill[Byte](40)(0)) // no fmt/data chunks
    ).toDF("id", "media")
    val out = rows.select(col("id"), Multimodal.decodeAudioFeatures(col("media")).as("f"))
      .orderBy("id").collect()
    val f1 = out(0).getStruct(1)
    assert(f1.getString(0) == "wav" && f1.getLong(1) == 8000L && f1.getLong(2) == 1L)
    assert(f1.getLong(4) == 4L && f1.getDouble(5) == 0.5) // 4 frames @ 8 kHz
    assert(f1.getLong(6) == 4000L)
    assert(math.abs(f1.getDouble(7) - math.sqrt((1000.0*1000 + 2000.0*2000 + 3000.0*3000 + 4000.0*4000) / 4)) < 1e-9)
    val f2 = out(1).getStruct(1)
    assert(f2.getLong(3) == 8L && f2.getLong(4) == 3L && f2.getLong(6) == 10L)
    val f3 = out(2).getStruct(1)
    assert(f3.getLong(2) == 2L && f3.getLong(4) == 2L && f3.getLong(6) == 100L && f3.getDouble(7) == 100.0)
    assert(out(3).isNullAt(1) && out(4).isNullAt(1))
  }

  // -- sequence packing --------------------------------------------------

  test("packGreedy: first-fit fold, oversized rows isolated, groups independent") {
    val rows = Seq(
      ("g1", 1L, 100L), ("g1", 2L, 100L), ("g1", 3L, 60L), // 100+100 fits, +60 overflows
      ("g1", 4L, 300L),                                    // > budget → own bin
      ("g1", 5L, 10L),
      ("g2", 1L, 50L)                                      // fresh group → bin 0
    ).toDF("g", "ord", "toks")
    val out = Packing.packGreedy(rows, Seq("g"), "ord", "toks", budget = 256)
      .orderBy("g", "ord")
      .select("g", "ord", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      ("g1", 1L, 0L), ("g1", 2L, 0L), ("g1", 3L, 1L),
      ("g1", 4L, 2L), ("g1", 5L, 3L), ("g2", 1L, 0L)))
  }

  test("packGreedy: null tokens count as zero; summary fills add up") {
    val rows = Seq(
      ("g", 1L, Some(200L)), ("g", 2L, None), ("g", 3L, Some(50L))
    ).toDF("g", "ord", "toks")
    val packed = Packing.packGreedy(rows, Seq("g"), "ord", "toks", budget = 256)
    assert(packed.filter(col("bin") === 0L).count() == 3L) // 200+0+50 all fit
    val sum = Packing.packSummary(packed, Seq("g"), "toks").collect().head
    assert(sum.getLong(sum.fieldIndex("n_docs")) == 3L)
    assert(sum.getLong(sum.fieldIndex("fill_tokens")) == 250L)
  }

  // -- repetition quality filter -----------------------------------------

  test("repetitionReport: bigram counts, dup fraction, deterministic top gram") {
    val d = Seq((1L, "a b a b a b"), (2L, "all distinct words here now"), (3L, "solo"))
      .toDF("doc_id", "text")
    val rep = Repetition.repetitionReport(d, "doc_id", "text", n = 2)
      .orderBy("doc_id").collect()
    // doc 1: grams [a b, b a, a b, b a, a b] → total 5, distinct 2
    assert(rep(0).getLong(rep(0).fieldIndex("n_grams")) == 5L)
    assert(rep(0).getLong(rep(0).fieldIndex("distinct_ngrams")) == 2L)
    assert(rep(0).getDouble(rep(0).fieldIndex("dup_ngram_frac")) == 0.6)
    assert(rep(0).getString(rep(0).fieldIndex("top_gram")) == "a b") // count 3 beats 2
    // 3 occurrences × 3 chars / 11 chars
    assert(math.abs(rep(0).getDouble(rep(0).fieldIndex("top_gram_frac")) - 9.0 / 11) < 1e-6)
    // doc 2: all distinct → dup 0; doc 3: single token → absent
    assert(rep(1).getDouble(rep(1).fieldIndex("dup_ngram_frac")) == 0.0)
    assert(rep.length == 2)
  }

  test("dropRepetitive drops over-threshold docs, keeps clean and too-short docs") {
    val d = Seq((1L, "spam spam spam spam spam spam"), (2L, "clean fresh words only"), (3L, "x"))
      .toDF("doc_id", "text")
    val kept = Repetition.dropRepetitive(d, "doc_id", "text", n = 2,
        maxDupFrac = 0.5, maxTopFrac = 2.0)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 3L))
  }

  test("native WordShingles equals the HOF formulation elementwise (order + duplicates)") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet").limit(100)
    val both = docs.select(
      graft.functions.TextFns.wordShingles(col("text"), 2).as("native"),
      graft.functions.TextFns.wordShinglesFromTokens(
        graft.functions.TextFns.tokens(col("text")), 2).as("hof"))
    assert(both.filter(not(col("native") <=> col("hof"))).count() == 0L)
  }

  // -- chunking ----------------------------------------------------------

  test("chunkByTokens: stride windows, short last chunk, single chunk for short docs") {
    val d = Seq(
      (1L, (1 to 11).map(i => s"t$i").mkString(" ")), // 11 toks, max 4 ov 1 → stride 3
      (2L, "one two"),                                // < max → 1 chunk
      (3L, "   ")                                     // no tokens → absent
    ).toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(d, "text", maxTokens = 4, overlap = 1)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "chunk", "chunk_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    assert(out == Seq(
      (1L, 0L, "t1 t2 t3 t4", 4L), (1L, 1L, "t4 t5 t6 t7", 4L),
      (1L, 2L, "t7 t8 t9 t10", 4L), (1L, 3L, "t10 t11", 2L),
      (2L, 0L, "one two", 2L)))
  }

  test("chunkByTokens stays narrow: no exchange in the plan") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val plan = Chunking.chunkByTokens(docs, "text", 32, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  // -- randomized cross-checks vs independent references -----------------

  test("packGreedy matches a sequential Scala fold on random inputs") {
    val rnd = new scala.util.Random(7)
    (0 until 5).foreach { _ =>
      val budget = 50L + rnd.nextInt(200)
      val rows = (0 until 200).map { i =>
        (s"g${rnd.nextInt(4)}", i.toLong, rnd.nextInt(if (rnd.nextInt(10) == 0) 400 else 80).toLong)
      }
      // independent reference: plain fold over the sorted group
      val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
        var bin = 0L; var fill = 0L; var first = true
        rs.sortBy(_._2).map { case (_, ord, t) =>
          if (first) { first = false; fill = t }
          else if (fill + t <= budget) fill += t
          else { bin += 1; fill = t }
          (g, ord) -> bin
        }
      }
      val got = Packing.packGreedy(
          rows.toDF("g", "ord", "toks"), Seq("g"), "ord", "toks", budget)
        .select("g", "ord", "bin").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == expected)
    }
  }

  test("chunkByTokens reconstruction: de-overlapped chunks rebuild the token stream") {
    val rnd = new scala.util.Random(11)
    val docs = (0 until 50).map { i =>
      (i.toLong, (0 until rnd.nextInt(90)).map(j => s"w${rnd.nextInt(20)}").mkString(" "))
    }.toDF("doc_id", "text")
    val maxT = 16; val ov = 5; val stride = maxT - ov
    val chunks = Chunking.chunkByTokens(docs, "text", maxT, ov)
      .select("doc_id", "chunk_id", "chunk").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1)).map(_.getString(2)).toSeq).toMap
    docs.collect().foreach { r =>
      val toks = r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val cs = chunks.getOrElse(r.getLong(0), Seq.empty)
      if (toks.isEmpty) assert(cs.isEmpty)
      else {
        // first chunk whole, later chunks minus their leading overlap
        val rebuilt = cs.head.split(" ").toSeq ++
          cs.tail.flatMap(_.split(" ").drop(ov))
        assert(rebuilt == toks, s"doc ${r.getLong(0)}")
        // every chunk except the last is exactly maxTokens
        cs.dropRight(1).foreach(c => assert(c.split(" ").length == maxT))
        // consecutive chunks agree on the overlap region
        cs.sliding(2).foreach {
          case Seq(a, b) => assert(a.split(" ").takeRight(ov).toSeq == b.split(" ").take(ov).toSeq)
          case _ =>
        }
      }
    }
  }

  test("contaminationReport matches a brute-force set computation on random corpora") {
    val rnd = new scala.util.Random(13)
    def doc() = (0 until (4 + rnd.nextInt(20))).map(_ => s"t${rnd.nextInt(12)}").mkString(" ")
    val corpus = (0L until 40L).map(i => (i, doc()))
    val benchD = (100L until 110L).map(i => (i, doc()))
    val n = 3
    def grams(t: String): Set[Seq[String]] = {
      val tk = t.split("\\s+").filter(_.nonEmpty).toSeq
      if (tk.length < n) Set.empty else tk.sliding(n).map(_.toSeq).toSet
    }
    val benchGrams = benchD.flatMap(d => grams(d._2)).toSet
    val expected = corpus.flatMap { case (id, t) =>
      val g = grams(t)
      val shared = g.count(benchGrams)
      if (shared > 0) Some(id -> ((g.size.toLong, shared.toLong))) else None
    }.toMap
    val got = Decontaminate.contaminationReport(
        corpus.toDF("doc_id", "text"), benchD.toDF("doc_id", "text"),
        "doc_id", "text", "text", n = n)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
  }

  test("packGreedy never splits bins across a group and respects the budget") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .withColumn("toks", graft.functions.TextFns.tokenCount(col("text")))
    val packed = Packing.packGreedy(docs, Seq("lang"), "doc_id", "toks", budget = 256)
    val bad = Packing.packSummary(packed, Seq("lang"), "toks")
      // a bin may exceed budget only if it is a single oversized doc
      .filter(col("fill_tokens") > 256 && col("n_docs") > 1)
      .count()
    assert(bad == 0L)
  }

  // -- Gopher rules ------------------------------------------------------

  test("gopherStats/gopherFilter: rule shapes behave on crafted documents") {
    import graft.functions.TextFns
    val good = ("the quick brown fox jumps over the lazy dog " * 6).trim
    val docs = Seq(
      (1L, good),                                         // passes
      (2L, "short doc"),                                  // too few words
      (3L, Seq.fill(60)("####").mkString(" ")),           // symbol ratio + no alpha
      (4L, (1 to 60).map(i => s"- bullet $i").mkString("\n")), // all bullet lines
      (5L, (1 to 4).map(i => "plain words line " + ("filler " * 8)).mkString("\n")
        + "\ntrailing words..." )                         // 1 of 5 ellipsis lines → passes
    ).toDF("doc_id", "text")
    val kept = TextFns.gopherFilter(docs, "text", minWords = 20L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 5L))
    val s3 = docs.filter(col("doc_id") === 3L)
      .select(TextFns.gopherStats(col("text")).as("g")).select("g.*").head()
    assert(s3.getAs[Double]("symbol_ratio") == 1.0)
    assert(s3.getAs[Double]("alpha_word_ratio") == 0.0)
    val s4 = docs.filter(col("doc_id") === 4L)
      .select(TextFns.gopherStats(col("text")).as("g")).select("g.*").head()
    assert(s4.getAs[Double]("bullet_line_ratio") == 1.0)
  }

  // -- composed prep pipeline --------------------------------------------

  test("prepareTrainingData: branch-free chain plans exactly one shuffle") {
    import graft.operators.Pipelines
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val out = Pipelines.prepareTrainingData(
      docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
      docs.filter(col("doc_id") % 10 === 0), "text",
      minQuality = 0.2, langs = Seq("en", "de", "fr", "es", "zh"),
      contaminationN = 4, maxTokens = 16, overlap = 4)
    // the only wide stage is exact dedup's content-hash window — the
    // quality/lang filters, decontamination, and chunk explode are all
    // narrow and fuse around it
    val plan = out.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length == 1)
    val rows = out.select("doc_id", "chunk_id", "chunk_tokens").collect()
    assert(rows.nonEmpty)
    // chunk invariants: ids dense from 0 per doc, sizes within bounds
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (0L until rs.length).toSeq)
      assert(rs.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= 16))
    }
  }

  // -- video decode ------------------------------------------------------

  test("AVI decode: exact fields, frame sampling, malformed → NULL") {
    import graft.operators.Multimodal
    val avi = graft.plans.ImageCodec.grayAvi(3, 2, 24, 1, 4,
      (f, x, y) => 10 + f * 50 + (y * 3 + x))
    val rows = Seq((1L, avi)).toDF("id", "v")
    def feats(stride: Int) = rows
      .select(Multimodal.decodeVideoFeatures(col("v"), stride).as("f"))
      .select("f.*").head()
    val all = feats(1)
    assert(all.getString(0) == "avi")
    assert(all.getLong(1) == 3 && all.getLong(2) == 2) // w, h
    assert(all.getLong(3) == 4)                        // n_frames
    assert(all.getDouble(4) == 24.0)                   // fps
    assert(all.getLong(5) == 4)                        // sampled
    // analytic mean over f=0..3, idx=0..5 of 10 + 50f + idx
    val exp = (for (f <- 0 until 4; i <- 0 until 6) yield 10 + 50 * f + i)
      .sum / 24.0
    assert(all.getDouble(6) == exp)
    val s3 = feats(3) // frames 0 and 3
    assert(s3.getLong(3) == 4 && s3.getLong(5) == 2)
    val exp3 = (for (f <- Seq(0, 3); i <- 0 until 6) yield 10 + 50 * f + i)
      .sum / 12.0
    assert(s3.getDouble(6) == exp3)
    // malformed inputs degrade to NULL, never throw
    val bad = Seq(
      Array[Byte](1, 2, 3),                       // junk
      avi.take(60),                               // truncated header walk
      wavLike()                                   // RIFF but not AVI
    ).zipWithIndex.map { case (b, i) => (i.toLong, b) }.toDF("id", "v")
    assert(bad.select(Multimodal.decodeVideoFeatures(col("v")).as("f"))
      .filter(col("f").isNotNull).count() == 0L)
  }

  test("AVI decode: video+audio multi-stream layout still decodes") {
    import graft.operators.Multimodal
    // standard layout: vids strl, then auds strl — the trailing audio
    // stream must not clear the latched vids detection
    val avi = graft.plans.ImageCodec.grayAvi(3, 2, 24, 1, 2,
      (f, x, y) => 10 + f * 50 + (y * 3 + x), withAudioStream = true)
    val r = Seq((1L, avi)).toDF("id", "v")
      .select(Multimodal.decodeVideoFeatures(col("v")).as("f"))
      .select("f.*").head()
    assert(r.getString(0) == "avi")
    assert(r.getLong(1) == 3 && r.getLong(2) == 2 && r.getLong(3) == 2)
    assert(r.getDouble(4) == 24.0)
    val exp = (for (f <- 0 until 2; i <- 0 until 6) yield 10 + 50 * f + i)
      .sum / 12.0
    assert(r.getDouble(6) == exp)
  }

  private def wavLike(): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(16)
    b.put("RIFF".getBytes("US-ASCII")); b.putInt(8); b.put("WAVE".getBytes("US-ASCII"))
    b.array()
  }

  // -- token-share mixing ------------------------------------------------

  test("mixCorporaByTokens: binding source whole, others = exact-fraction hashSample") {
    // A: 10 docs x 10 tokens = 100 (w=1, binding); B: 40 docs x 10 = 400
    val tenWords = (1 to 10).map(i => s"w$i").mkString(" ")
    val a = (0L until 10L).map(i => (i, tenWords)).toDF("doc_id", "text")
    val b = (100L until 140L).map(i => (i, tenWords)).toDF("doc_id", "text")
    val mixed = Sampling.mixCorporaByTokens(
      Seq(a -> 1L, b -> 1L), "mseed", Seq("doc_id"), "text")
    val got = mixed.select("doc_id").collect().map(_.getLong(0)).toSet
    // binding source A (t/w = 100 < 400) survives whole
    assert((0L until 10L).forall(got.contains))
    // B's fraction = 100/400 = 0.25 exactly → identical to hashSample
    // at 0.25 with the salted seed (index 1)
    val expectB = Sampling.hashSample(b, 0.25, "mseed#1", Seq("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.filter(_ >= 100L) == expectB)
    assert(expectB.size < 40) // it actually thins
    // deterministic across partitionings
    val again = Sampling.mixCorporaByTokens(
        Seq(a.repartition(7) -> 1L, b.repartition(3) -> 1L),
        "mseed", Seq("doc_id"), "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == got)
  }

  test("temperatureWeights: exact integer roots, normalization, alpha endpoints") {
    // perfect squares at α=1/2: roots exact, ratios exact
    // t = (100, 400, 2500) → sqrt = (10, 20, 50) → normalized (200000, 400000, 1000000)
    assert(Sampling.temperatureWeights(Seq(100L, 400L, 2500L), 1, 2)
      == Seq(200000L, 400000L, 1000000L))
    // α = 1 → natural proportions
    assert(Sampling.temperatureWeights(Seq(100L, 400L), 1, 1) == Seq(250000L, 1000000L))
    // non-square: floor sqrt(2·10^12) = 1414213, then ·1e6 / itself
    assert(Sampling.temperatureWeights(Seq(2L, 2L), 1, 2) == Seq(1000000L, 1000000L))
    // flattening: α=1/2 lifts the small source's relative share
    val Seq(s1, l1) = Sampling.temperatureWeights(Seq(100L, 10000L), 1, 1)
    val Seq(s2, l2) = Sampling.temperatureWeights(Seq(100L, 10000L), 1, 2)
    assert(s1 * 10 == l1 / 10 * 1) // natural: 1:100
    assert(s2 * 10 == l2)          // α=1/2: 1:10
    // invalid alphas and vanishing shares fail loudly
    intercept[IllegalArgumentException] { Sampling.temperatureWeights(Seq(1L), 2, 1) }
    intercept[IllegalArgumentException] { Sampling.temperatureWeights(Seq(1L), 0, 1) }
    intercept[IllegalArgumentException] {
      Sampling.temperatureWeights(Seq(1L, 100000000000000L), 1, 1)
    }
  }

  test("nthRootFloor is the exact floor root at boundary values") {
    for (q <- 2 to 5; base <- Seq(BigInt(1), BigInt(7), BigInt(123456789))) {
      val x = base.pow(q)
      assert(Sampling.nthRootFloor(x, q) == base)
      assert(Sampling.nthRootFloor(x - 1, q) == base - 1 || x == 1)
      assert(Sampling.nthRootFloor(x + 1, q) == base)
    }
    assert(Sampling.nthRootFloor(BigInt(42), 1) == BigInt(42))
    assert(Sampling.nthRootFloor(BigInt(0), 3) == BigInt(0))
  }

  test("mixCorporaByTemperature: alpha=1 equals mixCorporaByTokens with natural weights") {
    val tenWords = (1 to 10).map(i => s"w$i").mkString(" ")
    val a = (0L until 10L).map(i => (i, tenWords)).toDF("doc_id", "text")
    val b = (100L until 140L).map(i => (i, tenWords)).toDF("doc_id", "text")
    // α=1 weights are (250000, 1000000) ∝ (100, 400) token totals:
    // every source's kept fraction w_i·t_k/(w_k·t_i) = 1 → nothing thins
    val got = Sampling.mixCorporaByTemperature(
        Seq(a, b), 1, 1, "tseed", Seq("doc_id"), "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.size == 50) // natural proportions: both sources whole
    // α=1/2 actually flattens: B (the big source) thins toward A's share
    val flat = Sampling.mixCorporaByTemperature(
        Seq(a, b), 1, 2, "tseed", Seq("doc_id"), "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((0L until 10L).forall(flat.contains)) // small source binding, whole
    assert(flat.count(_ >= 100L) < 40)           // big source thinned
    // deterministic across partitionings
    val again = Sampling.mixCorporaByTemperature(
        Seq(a.repartition(7), b.repartition(3)), 1, 2, "tseed", Seq("doc_id"), "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == flat)
  }

  test("writeTokenShards: manifest matches input, assignment deterministic, order laid down") {
    import graft.operators.Packing
    val docs = (0L until 300L)
      .map(i => (i, (0 to (i % 7).toInt).map(j => s"t$j")))
      .toDF("doc_id", "toks")
    val root = java.nio.file.Files.createTempDirectory("graft_shard_spec").toString

    val manifest = Packing.writeTokenShards(
      docs, s"$root/a", numShards = 4, "s1", Seq("doc_id"), "toks")
    val rows = manifest.orderBy("shard").collect()
    // every shard populated, ids exactly 0..3
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    // totals conserve the input exactly
    assert(rows.map(_.getLong(1)).sum == 300L)
    assert(rows.map(_.getLong(2)).sum ==
      docs.agg(sum(size(col("toks")))).head().getLong(0))

    // same manifest from a differently-partitioned input → same shards,
    // same checksums (assignment is a pure function of seed+key)
    val manifest2 = Packing.writeTokenShards(
      docs.repartition(13), s"$root/b", numShards = 4, "s1", Seq("doc_id"), "toks")
    assert(manifest2.orderBy("shard").collect().toSeq == rows.toSeq)

    // the written rows carry the deterministic training order: reading
    // one shard back in file order yields doc_ids sorted by the salted
    // position hash (ties impossible — unique keys)
    val spark2 = docs.sparkSession
    val shard0 = spark2.read.parquet(s"$root/a/shard=0")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val posOf = graft.operators.Sampling
      .unitHashInt("s1#order", Seq(col("doc_id")))
    val expected = docs.filter(col("doc_id").isin(shard0: _*))
      .orderBy(posOf).select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(shard0 == expected)

    // numShards=1 degenerates cleanly
    val one = Packing.writeTokenShards(
      docs.limit(5), s"$root/c", numShards = 1, "s1", Seq("doc_id"), "toks")
    assert(one.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq == Seq((0, 5L)))
  }

  test("sentence chunking: whole sentences pack greedily, oversized sentence isolated") {
    import graft.operators.Chunking
    val d = Seq(
      (1L, "one two three. four five! six seven eight? nine"),
      (2L, "a b c d e f g h i j k l. tail"), // 12-token sentence > budget 8
      (3L, "   "),                            // whitespace only → no rows
      (4L, "no terminator here at all")
    ).toDF("doc_id", "text")
    val out = Chunking.chunkBySentences(d, "text", maxTokens = 8)
      .select("doc_id", "chunk_id", "chunk", "chunk_tokens")
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    assert(out == Seq(
      // 3+2=5 fits; +3 would be 8 → fits too; +1 = 9 overflows
      (1L, 0L, "one two three. four five! six seven eight?", 8L),
      (1L, 1L, "nine", 1L),
      (2L, 0L, "a b c d e f g h i j k l.", 12L), // never split
      (2L, 1L, "tail", 1L),
      (4L, 0L, "no terminator here at all", 5L)))
    // narrow: no Exchange anywhere
    val plan = Chunking.chunkBySentences(d, "text", 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("PipelineVerbs chain equals operator composition and clears grouping") {
    import graft.Tidier
    import graft.operators.{Chunking, Corruption, Dedup}
    import graft.functions.TextFns
    val d = (0L until 60L)
      .map(i => (i, s"alpha beta $i. gamma delta! epsilon " + ("zeta " * (i % 5).toInt)))
      .toDF("doc_id", "text")
    val chained = Tidier.from(d)
      .groupBy("doc_id") // must be consumed/cleared by the pipeline verb
      .dropBlockedTerms("text", Seq("zeta"))
      .dedupExact("doc_id", Seq("text"))
      .hashSample(0.7, "pv", Seq("doc_id"))
      .chunkBySentences("text", 6)
      .fimSplit("doc_id", "chunk", "pv", 1, 1)
    assert(chained.groups.isEmpty)
    val composed = Corruption.fimSplit(
      Chunking.chunkBySentences(
        graft.operators.Sampling.hashSample(
          Dedup.exactDedup(
            TextFns.dropBlockedTerms(d, "text", Seq("zeta")),
            "doc_id", Seq("text")),
          0.7, "pv", Seq("doc_id")),
        "text", 6),
      "doc_id", "chunk", "pv", 1, 1)
    val a = chained.df.select("doc_id", "chunk_id", "fim_text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val b = composed.select("doc_id", "chunk_id", "fim_text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("composed objective pipeline is ONE narrow plan: no Exchange anywhere") {
    import graft.operators.{Chunking, Corruption}
    import graft.functions.TextFns
    val d = (0L until 40L)
      .map(i => (i, s"alpha beta. gamma delta epsilon! zeta $i"))
      .toDF("doc_id", "text")
    val out = Corruption.fimSplit(
      Chunking.chunkBySentences(
        TextFns.dropBlockedTerms(d, "text", Seq("zzz")), "text", 6)
        .withColumn("chunk_uid", col("doc_id") * 10000L + col("chunk_id")),
      "chunk_uid", "chunk", "p", 1, 2)
    assert(out.count() > 0)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("semantic decontamination: cosine anti join, broadcast plan, corpus unshuffled") {
    import graft.operators.Decontaminate
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f, 0.0f)),   // cos with (1,0,0) ≈ 0.994 → dropped
      (3L, Seq(0.0f, 1.0f, 0.0f)),   // orthogonal → kept
      (4L, Seq(0.0f, 0.0f, -2.0f))   // opposite of nothing → kept
    ).toDF("id", "emb")
    val bench = Seq(Tuple1(Seq(2.0f, 0.0f, 0.0f))).toDF("bemb") // scaled: cos 1 with id 1
    val out = Decontaminate.dropContaminatedSemantic(corpus, "emb", bench, "bemb", 0.95)
    assert(out.select("id").collect().map(_.getLong(0)).toSet == Set(3L, 4L))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan) // corpus never shuffles
    intercept[IllegalArgumentException] {
      Decontaminate.dropContaminatedSemantic(corpus, "emb", bench, "bemb", 0.0)
    }
  }

  test("bad-words filter: boundaries, case, phrases, metachar escaping") {
    import graft.functions.TextFns
    val terms = Seq("Spam", "bad phrase", "a.b")
    val d = Seq(
      (1L, "clean text here"),
      (2L, "some SPAM inside"),          // case-insensitive hit
      (3L, "antispammer tools"),         // no word boundary → keep
      (4L, "spam."),                     // punctuation is a boundary → hit
      (5L, "a bad  phrase here"),        // double space ≠ single-space phrase
      (6L, "a bad phrase here"),         // phrase hit
      (7L, "coords a.b matched"),        // escaped metachar hit
      (8L, "coords azb unmatched")       // '.' must not act as wildcard
    ).toDF("doc_id", "text")
    val kept = TextFns.dropBlockedTerms(d, "text", terms)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 5L, 8L))
    val first = d.filter(col("doc_id") === 2L)
      .select(TextFns.firstBlockedTerm(col("text"), terms)).head().getString(0)
    assert(first == "spam")
    intercept[IllegalArgumentException] {
      TextFns.dropBlockedTerms(d, "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      TextFns.dropBlockedTerms(d, "text", Seq("  "))
    }
    // table variant (single-word scale path): punctuation-stripped
    // token semantics, case-insensitive both sides
    val bl = Seq("SPAM", "a.b").toDF("term")
    val keptT = TextFns.dropBlockedTermsTable(d, "text", "doc_id", bl)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 2 (SPAM), 4 ("spam." strips to spam), 7 ("a.b" inner dot kept —
    // only edge punctuation strips) drop; phrase rows survive (no
    // single-token term matches them)
    assert(keptT == Set(1L, 3L, 5L, 6L, 8L))
  }

  test("mixCorporaByTokens rejects non-positive weights and empty sources") {
    val d = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Sampling.mixCorporaByTokens(Seq(d -> 0L), "s", Seq("doc_id"), "text")
    }
    intercept[IllegalArgumentException] {
      Sampling.mixCorporaByTokens(
        Seq(d -> 1L, Seq((2L, "")).toDF("doc_id", "text") -> 1L),
        "s", Seq("doc_id"), "text")
    }
  }

  // -- Bloom-prefiltered decontamination ---------------------------------

  test("bloom-prefiltered report is identical to the exact report") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val bench = docs.filter(col("doc_id") % 10 === 0)
    val exact = Decontaminate.contaminationReport(
      corpus, bench, "doc_id", "text", "text", n = 4)
    // tiny filter (high fpp) AND a roomy one must both match exactly —
    // false positives die in the verify join, no false negatives exist
    for (fpp <- Seq(0.5, 0.01)) {
      val bloomed = Decontaminate.contaminationReportBloom(
        corpus, bench, "doc_id", "text", "text", n = 4,
        expectedItems = 50000L, fpp = fpp)
      assert(bloomed.exceptAll(exact).count() == 0L)
      assert(exact.exceptAll(bloomed).count() == 0L)
    }
  }

  test("bloom pre-filter is narrow: no join/exchange before the candidate filter") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val bloom = Decontaminate.benchmarkBloom(
      docs.limit(50), "text", n = 4, expectedItems = 10000L)
    assert(bloom.nonEmpty)
    val candidates = docs.filter(
      exists(graft.functions.TextFns.hashedWordShingles(col("text"), 4),
        g => Decontaminate.mightContain(bloom, g)))
    val plan = candidates.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"))
    // and it actually prunes: candidates from a disjoint benchmark are rare
    assert(candidates.count() <= docs.count())
  }

  // -- deterministic shuffle ---------------------------------------------

  test("shuffleDeterministic: same order across partitionings and runs") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    def order(parts: Int): Seq[Long] =
      Sampling.shuffleDeterministic(docs.repartition(parts), "sX", Seq("doc_id"))
        .select("doc_id").collect().map(_.getLong(0)).toSeq
    val a = order(1); val b = order(5)
    assert(a == b)
    assert(a != a.sorted) // it actually shuffles
    // a different seed gives a different order over the same rows
    val c = Sampling.shuffleDeterministic(docs, "sY", Seq("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(c != a && c.sorted == a.sorted)
  }

  test("shuffleDeterministic plans a range-partitioned sort, no single-task window") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val plan = Sampling.shuffleDeterministic(docs, "s", Seq("doc_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning") || plan.contains("RangePartitioning"))
    assert(!plan.contains("Window"))
  }

  // -- URL / domain filtering --------------------------------------------

  test("extractDomain handles scheme, userinfo, port, path, bare hosts") {
    val cases = Seq(
      "https://www.Example.COM/path?q=1" -> "www.example.com",
      "http://user:pw@host.org:8080/x" -> "host.org",
      "ftp://files.net" -> "files.net",
      "bare.io/path" -> "bare.io",
      "sub.a.b.co.uk" -> "sub.a.b.co.uk")
    val out = cases.map(_._1).toDF("url")
      .select(graft.functions.TextFns.extractDomain(col("url")).as("d"))
      .collect().map(_.getString(0)).toSeq
    assert(out == cases.map(_._2))
  }

  test("blocklist drops exact domains AND subdomains, inline + table variants") {
    val rows = Seq(
      (1L, "https://ok.com/x"),
      (2L, "https://bad.com/x"),          // exact
      (3L, "https://deep.sub.bad.com/x"), // subdomain
      (4L, "https://notbad.com/x"),       // suffix of the STRING but not a dot-suffix
      (5L, "https://bad.com.evil.io/x")   // blocklisted label mid-host, not a suffix
    ).toDF("id", "url")
    val keptInline = graft.functions.TextFns
      .dropBlockedDomains(rows, "url", Seq("bad.com"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(keptInline == Set(1L, 4L, 5L))
    val keptTable = graft.functions.TextFns
      .dropBlockedDomainsTable(rows, "url", "id", Seq("BAD.com").toDF("domain"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(keptTable == Set(1L, 4L, 5L))
  }
  test("chunkByContent: boundaries are content-local — a front insertion leaves later chunks intact") {
    import graft.operators.Chunking
    val base = (1 to 200).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, base), (2L, "inserted " + base)).toDF("doc_id", "text")
    val out = Chunking.chunkByContent(docs, "text", windowTokens = 3, maskBits = 3)
      .select("doc_id", "chunk_id", "chunk")
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.sortBy(_.getLong(1)).map(_.getString(2)).toSeq }
    val c1 = out(1L); val c2 = out(2L)
    assert(c1.size > 3, s"mask 3 should cut ~25 chunks from 200 tokens, got ${c1.size}")
    // all chunks after the first boundary are IDENTICAL despite the
    // one-token shift (fixed-stride windows would all differ)
    assert(c1.tail == c2.tail.takeRight(c1.tail.size) || c1.tail == c2.tail,
      "CDC chunks after the first boundary must survive a front insertion")
    assert(c2.head.startsWith("inserted"))
    // chunks partition the token stream exactly
    assert(c1.mkString(" ") == base.toLowerCase)
    // short doc: one chunk, id 0
    val short = Chunking.chunkByContent(Seq((9L, "a b")).toDF("doc_id", "text"),
      "text", windowTokens = 3, maskBits = 3).collect()
    assert(short.length == 1 && short(0).getAs[Long]("chunk_id") == 0L
      && short(0).getAs[String]("chunk") == "a b")
  }

  test("publicSuffix/registeredDomain follow PSL semantics (normal/wildcard/exception/default)") {
    import graft.functions.TextFns
    val cases = Seq(
      // (url, expected public suffix, expected registered domain)
      ("https://shop.example.co.uk/p", "co.uk", "example.co.uk"),
      ("http://a.b.site.com/x", "com", "site.com"),
      ("ftp://x.y.ck/f", "y.ck", "x.y.ck"),            // wildcard *.ck
      ("https://www.ck/", "ck", "www.ck"),             // exception !www.ck
      ("user.github.io", "github.io", "user.github.io"),
      ("data.example.org", "org", "example.org"),
      ("co.uk", "co.uk", null),                        // host IS a public suffix
      ("com", "com", null),
      ("localhost", "localhost", null)                 // single label, default rule
    )
    val out = cases.map(_._1).toDF("url")
      .select(
        TextFns.publicSuffix(TextFns.extractDomain(col("url"))).as("ps"),
        TextFns.registeredDomain(col("url")).as("rd"))
      .collect()
    cases.zipWithIndex.foreach { case ((u, ps, rd), i) =>
      assert(out(i).getString(0) == ps, s"public suffix of $u")
      assert((if (out(i).isNullAt(1)) null else out(i).getString(1)) == rd,
        s"registered domain of $u")
    }
  }

  test("PslRules.parse reads standard list syntax; custom rules flow through") {
    import graft.functions.TextFns
    val rules = TextFns.PslRules.parse(Seq(
      "// ===BEGIN ICANN DOMAINS===",
      "",
      "uk",
      "co.uk",
      "*.sch.uk",
      "!known.sch.uk   // trailing junk after whitespace",
      "  JP  "))
    assert(rules.normal == Seq("uk", "co.uk", "jp"))
    assert(rules.wildcardBases == Seq("sch.uk"))
    assert(rules.exceptions == Seq("known.sch.uk"))
    val out = Seq("x.myschool.sch.uk", "a.known.sch.uk").toDF("url")
      .select(TextFns.registeredDomain(col("url"), rules).as("rd"))
      .collect().map(_.getString(0)).toSeq
    // wildcard: ps = myschool.sch.uk -> rd = x.myschool.sch.uk
    // exception: ps = sch.uk -> rd = known.sch.uk
    assert(out == Seq("x.myschool.sch.uk", "known.sch.uk"))
  }

  test("splitCorpus: exhaustive, exclusive, deterministic, fraction-true") {
    val docs = (0L until 8000L).map(i => Tuple1(i)).toDF("doc_id")
    val out = Sampling.splitCorpus(docs, "s1", Seq("doc_id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 8000L)                  // exhaustive + exclusive
    assert(math.abs(counts("train") - 6400L) < 200)     // ~binomial noise
    assert(math.abs(counts("val") - 800L) < 120)
    assert(math.abs(counts("test") - 800L) < 120)
    // deterministic + stable under partitioning
    val a = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.splitCorpus(docs.repartition(13), "s1", Seq("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    // growing the corpus never reassigns existing docs
    val grown = Sampling.splitCorpus(
        (0L until 16000L).map(i => Tuple1(i)).toDF("doc_id"),
        "s1", Seq("doc_id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .filter(col("doc_id") < 8000L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(grown == a)
    // a different seed is a different assignment
    val c = Sampling.splitCorpus(docs, "s2", Seq("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(c != a)
    assert(intercept[IllegalArgumentException] {
      Sampling.splitCorpus(docs, "s", Seq("doc_id"), Seq("a" -> 0.5, "b" -> 0.6))
    }.getMessage.contains("sum to 1"))
  }
  test("upsampleByWeight: exact expected multiplicity, weight<1 drops rows") {
    val docs = (0L until 4000L).map(i => Tuple1(i)).toDF("doc_id")
    val up = Sampling.upsampleByWeight(docs, 2.5, "e", Seq("doc_id"))
    val n = up.count()
    assert(n > 4000L * 2.3 && n < 4000L * 2.7) // ~2.5x
    // every doc appears 2 or 3 times, copies dense from 0
    val per = up.groupBy("doc_id").count().collect().map(_.getLong(1))
    assert(per.forall(c => c == 2L || c == 3L))
    val copies = up.filter(col("doc_id") === 0L).select("copy")
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(copies == (0 until copies.length))
    // deterministic + partition-invariant
    val a = up.collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val b = Sampling.upsampleByWeight(docs.repartition(11), 2.5, "e", Seq("doc_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(a == b)
    // weight < 1 = thinning: rows with 0 copies VANISH (no sequence
    // descent artifact), and the kept set matches hashSample exactly
    val thin = Sampling.upsampleByWeight(docs, 0.3, "e", Seq("doc_id"))
    assert(thin.select("copy").distinct().collect().map(_.getInt(0)).toSeq == Seq(0))
    val thinIds = thin.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val sampleIds = Sampling.hashSample(docs, 0.3, "e", Seq("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(thinIds == sampleIds)
    // integer weight: exactly w copies for every row
    assert(Sampling.upsampleByWeight(docs, 3.0, "e", Seq("doc_id")).count() == 12000L)
  }

  test("canonicalizeUrl: RFC 3986 normalization + tracking-param conventions") {
    import spark.implicits._
    import graft.functions.TextFns
    def canon(u: String): String =
      Seq(u).toDF("u").select(TextFns.canonicalizeUrl(col("u"))).as[String].head()
    // case, default port, dup slashes, tracking params, sort, fragment
    assert(canon("HTTPS://WWW.Example.COM:443/a//b/?utm_source=x&z=2&a=1#frag") ==
      "https://www.example.com/a/b/?a=1&z=2")
    // empty path over authority -> "/" ; default http port drops
    assert(canon("http://Host.org:80") == "http://host.org/")
    // emptied query loses its '?'
    assert(canon("https://h.net/p?gclid=abc") == "https://h.net/p")
    // non-default port and path case survive
    assert(canon("https://X.io:8080/PaTh") == "https://x.io:8080/PaTh")
    // userinfo is case-sensitive; host still lowercases
    assert(canon("ftp://User@HOST.com/F") == "ftp://User@host.com/F")
    // not a URL: unchanged
    assert(canon("plain.io/Path#x") == "plain.io/Path#x")
    // canonical forms collapse for dedup
    val urls = Seq(
      "https://a.com/x?b=1&a=2", "HTTPS://A.com:443/x?a=2&b=1&utm_b=9",
      "https://a.com//x?b=1&a=2#top").toDF("url")
    assert(urls.select(TextFns.canonicalizeUrl(col("url"))).distinct().count() == 1)
  }
}
