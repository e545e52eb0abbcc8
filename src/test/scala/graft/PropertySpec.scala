package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.functions.Selector

/** ScalaCheck-generator-driven properties for the pure-Scala pieces
  * (selector resolution) and round-trip laws (SURVEY §5 plan item c).
  * Deterministic: generators are drawn from fixed seeds. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** deterministic sample stream from a generator */
  private def forAll[A](g: Gen[A], n: Int = 30)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g(Gen.Parameters.default, Seed(42L + i)).foreach(f)
    }
  private def whenever(c: Boolean)(f: => Unit): Unit = if (c) f

  private val colName = Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
  private val schemaGen = Gen.listOfN(6, colName).map(_.distinct).suchThat(_.size >= 3)

  test("selector: resolve(everything) is identity") {
    forAll(schemaGen) { schema =>
      assert(Selector.resolve(schema, Seq(Selector.Everything)) == schema)
    }
  }

  test("selector: all-negative implies everything-minus") {
    forAll(schemaGen) { schema =>
      val drop = schema.head
      val got = Selector.resolve(schema, Seq(Selector.Not(Selector.Name(drop))))
      assert(got == schema.filterNot(_ == drop))
    }
  }

  test("selector: range a:a is singleton; range is contiguous slice") {
    forAll(schemaGen) { schema =>
      val a = schema.head; val b = schema.last
      assert(Selector.resolve(schema, Seq(Selector.Range(a, a))) == Seq(a))
      assert(Selector.resolve(schema, Seq(Selector.Range(a, b))) == schema)
    }
  }

  test("selector: positives accumulate without duplicates") {
    forAll(schemaGen) { schema =>
      val s = schema.head
      val got = Selector.resolve(schema, Seq(Selector.Name(s), Selector.Name(s)))
      assert(got == Seq(s))
    }
  }

  test("unite/separate round-trip for separator-free parts") {
    val part = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(6))
    forAll(Gen.listOfN(2, part)) { parts =>
      whenever(parts.size == 2 && parts.forall(_.nonEmpty)) {
        val df = Seq((parts(0), parts(1))).toDF("a", "b")
        val round = Tidier.from(df)
          .unite("u", Seq("a", "b"), "-")
          .separate("u", Seq("a", "b"), "-")
          .collect().head
        assert(round.getString(0) == parts(0) && round.getString(1) == parts(1))
      }
    }
  }

  test("rangeJoin equals brute-force interval semantics on random data") {
    import graft.operators.JoinKey
    val keyGen = Gen.oneOf("A", "B", "C")
    val rowGen = for { k <- keyGen; t <- Gen.choose(-50L, 50L) } yield (k, t)
    val ivGen = for {
      k <- keyGen; lo <- Gen.choose(-50L, 50L); len <- Gen.choose(-5L, 20L)
    } yield (k, lo, lo + len) // len can be negative → inverted intervals included
    forAll(Gen.zip(Gen.listOfN(8, rowGen), Gen.listOfN(6, ivGen)), n = 10) {
      case (points, ivs) =>
        val pdf = points.zipWithIndex.map { case ((k, t), i) => (k, t, i) }.toDF("k", "t", "pid")
        val idf = ivs.zipWithIndex.map { case ((k, lo, hi), i) => (k, lo, hi, i) }
          .toDF("k2", "lo", "hi", "iid")
        val got = Tidier.from(pdf)
          .rangeJoin(Tidier.from(idf), "t", "lo", "hi", bandWidth = 7L,
            equi = Seq("k" -> "k2"))
          .collect().map(r => (r.getInt(2), r.getInt(5))).toSet
        val want = (for {
          ((k, t), pi) <- points.zipWithIndex
          ((k2, lo, hi), ii) <- ivs.zipWithIndex
          if k == k2 && t >= lo && t <= hi
        } yield (pi, ii)).toSet
        assert(got == want)
    }
  }

  test("as-of right/full joins equal brute-force DuckDB ASOF semantics on random data") {
    import graft.operators.JoinKey.{Closest, Equi}
    val keyGen = Gen.oneOf("A", "B")
    // distinct right timestamps per key (fixtures are tie-free; ties have
    // their own deterministic-pick spec)
    val leftGen = Gen.listOfN(6, for { k <- keyGen; t <- Gen.choose(0L, 40L) } yield (k, t))
    val rightGen = Gen.listOfN(6, for { k <- keyGen; t <- Gen.choose(0L, 40L) } yield (k, t))
      .map(_.distinct)
    forAll(Gen.zip(leftGen, rightGen), n = 10) { case (ls, rsRaw) =>
      val rs = rsRaw.zipWithIndex.map { case ((k, t), i) => (k, t, i) }
      val ldf = ls.zipWithIndex.map { case ((k, t), i) => (k, t, i) }.toDF("k", "t", "lid")
      val rdf = rs.toDF("k2", "rt", "rid")
      // brute force: per left row, the max rt <= t within the key
      val matches = ls.zipWithIndex.flatMap { case ((k, t), li) =>
        val cands = rs.filter { case (k2, rt, _) => k2 == k && rt <= t }
        if (cands.isEmpty) None
        else Some(li -> cands.maxBy(c => (c._2, c._3))._3)
      }.toMap
      val selected = matches.values.toSet
      val unmatchedRights = rs.map(_._3).filterNot(selected).toSet

      val rj = Tidier.from(ldf)
        .rightJoin(Tidier.from(rdf), Equi("k", "k2"), Closest("t", ">=", "rt"))
        .collect()
      val rjMatched = rj.filter(!_.isNullAt(2))
        .map(r => r.getInt(2) -> r.getInt(4)).toMap
      val rjUnmatched = rj.filter(_.isNullAt(2)).map(_.getInt(4)).toSet
      assert(rjMatched == matches, "right-join matched part")
      assert(rjUnmatched == unmatchedRights, "right-join unmatched rights")

      val fj = Tidier.from(ldf)
        .fullJoin(Tidier.from(rdf), Equi("k", "k2"), Closest("t", ">=", "rt"))
        .collect()
      // full = all left rows (matched or null-extended) + unmatched rights
      assert(fj.count(r => !r.isNullAt(2)) == ls.size)
      assert(fj.filter(_.isNullAt(2)).map(_.getInt(4)).toSet == unmatchedRights)
    }
  }

  test("mutate substitution chain matches an eager per-column fold (randomized)") {
    // Random sequences of overwrite / append / self-reference mutates in
    // ONE mutate(...) call, checked against the obvious model: fold the
    // definitions left-to-right over a per-row environment (dplyr
    // sees-earlier-columns semantics). Catches the edge cases the
    // single-projection substitution must get right: an overwrite that
    // reads its own OLD value and an earlier NEW column in the same
    // expression, double overwrites, references to appended names.
    import org.apache.spark.sql.Column
    val base = Seq((1L, 2L, 3L), (4L, 5L, 6L), (-2L, 7L, 0L)).toDF("a", "b", "c")
    val baseRows = Seq(
      Map("a" -> 1L, "b" -> 2L, "c" -> 3L),
      Map("a" -> 4L, "b" -> 5L, "c" -> 6L),
      Map("a" -> -2L, "b" -> 7L, "c" -> 0L))
    val pool = Vector("a", "b", "c", "d", "e")
    final case class Op(target: String, kind: Int, r1: String, r2: String, k: Long)
    def genOps(seed: Long): Seq[Op] = {
      val rnd = new scala.util.Random(seed)
      val avail = scala.collection.mutable.ArrayBuffer("a", "b", "c")
      (0 until (2 + rnd.nextInt(6))).map { _ =>
        val target = pool(rnd.nextInt(pool.length))
        val op = Op(target, rnd.nextInt(4),
          avail(rnd.nextInt(avail.length)), avail(rnd.nextInt(avail.length)),
          rnd.nextInt(10).toLong)
        if (!avail.contains(target)) avail += target
        op
      }
    }
    def colOf(o: Op): Column = o.kind match {
      case 0 => col(o.r1) + col(o.r2)
      case 1 => col(o.r1) * lit(2L) + lit(1L)
      case 2 => col(o.r1) - col(o.r2)
      case _ => lit(o.k)
    }
    def eval(o: Op, env: Map[String, Long]): Long = o.kind match {
      case 0 => env(o.r1) + env(o.r2)
      case 1 => env(o.r1) * 2 + 1
      case 2 => env(o.r1) - env(o.r2)
      case _ => o.k
    }
    (0 until 40).foreach { i =>
      val ops = genOps(1000L + i)
      val outOrder = Seq("a", "b", "c") ++
        ops.map(_.target).distinct.filterNot(Seq("a", "b", "c").contains)
      val out = Tidier.from(base).mutate(ops.map(o => o.target -> colOf(o)): _*).df
      assert(out.columns.toSeq == outOrder, s"seed $i: column order, ops=$ops")
      val expected = baseRows.map { r0 =>
        val env = ops.foldLeft(r0)((e, o) => e + (o.target -> eval(o, e)))
        outOrder.map(env)
      }
      val got = out.collect().map(r => outOrder.indices.map(r.getLong(_)).toSeq).toSeq
      assert(got == expected, s"seed $i: values, ops=$ops")
    }
  }

  test("pivot round-trip law on generated key-value grids") {
    forAll(Gen.listOfN(4, Gen.choose(0, 100))) { vs =>
      whenever(vs.size == 4) {
        val long = Seq(
          (1, "x", vs(0)), (1, "y", vs(1)), (2, "x", vs(2)), (2, "y", vs(3)))
          .toDF("id", "variable", "value")
        val round = Tidier.from(long)
          .pivotWider("variable", "value", values = Seq("x", "y"))
          .pivotLonger(Seq[Selector]("x", "y"))
          .arrange("id", "variable")
          .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
        assert(round == Seq((1, "x", vs(0)), (1, "y", vs(1)), (2, "x", vs(2)), (2, "y", vs(3))))
      }
    }
  }

  test("BPE greedy encoder equals apply-merges-in-rank-order reference (randomized)") {
    import graft.operators.Bpe
    // independent slow reference: apply each merge over the whole
    // symbol sequence in RANK ORDER (the original Sennrich formulation;
    // the production encoder instead repeatedly merges the lowest-rank
    // adjacent pair — provably the same result, asserted here)
    def referenceEncode(model: graft.operators.BpeModel, word: String): Seq[String] = {
      var syms = Bpe.splitSymbols(word).toSeq
      model.merges.foreach { case (a, b) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += a + b; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toSeq
      }
      syms
    }
    val rnd = new scala.util.Random(7)
    val alphabet = "aabbbccd e"
    val corpusWords = (0 until 120).map { _ =>
      (1 to (1 + rnd.nextInt(8))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString.trim
    }.filter(_.nonEmpty)
    import spark.implicits._
    val docs = corpusWords.grouped(10).map(_.mkString(" ")).toSeq.toDF("text")
    val model = Bpe.train(docs, "text", numMerges = 40, minPairCount = 1L)
    assert(model.merges.nonEmpty)
    val testWords = (0 until 200).map { _ =>
      (1 to (1 + rnd.nextInt(10))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString.replace(" ", "")
    }.filter(_.nonEmpty).distinct
    val got = testWords.toDF("text")
      .select(col("text"), Bpe.encode(model, col("text")).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    testWords.foreach { w =>
      assert(got(w) == referenceEncode(model, w),
        s"word '$w': greedy ${got(w)} != rank-order ${referenceEncode(model, w)}")
    }
  }

  test("quantizeInt8: reconstruction error <= scale/2 per component; range holds") {
    import graft.operators.Similarity
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-100f, 100f))
    forAll(vecGen, n = 25) { vs =>
      val df = Seq(Tuple3(1L, vs, 0)).toDF("vec_id", "embedding", "label")
      val r = Similarity.quantizeInt8(df, "embedding").head()
      val q = r.getSeq[Byte](3)
      val scale = r.getDouble(4)
      if (vs.forall(_ == 0f)) {
        assert(q.forall(_ == 0) && scale == 0.0)
      } else {
        vs.zip(q).foreach { case (v, qi) =>
          assert(math.abs(qi.toInt) <= 127)
          // |v - q·scale| <= scale/2 + fp slack (round-to-nearest law)
          assert(math.abs(v.toDouble - qi * scale) <= scale / 2 + 1e-9,
            s"component $v -> $qi at scale $scale")
        }
      }
    }
  }

  test("zorderValue is injective on the masked domain and order-embeds boxes") {
    import graft.operators.ScaleOps
    val ptGen = Gen.zip(Gen.chooseNum(0L, 255L), Gen.chooseNum(0L, 255L))
    forAll(Gen.listOfN(40, ptGen), n = 10) { pts0 =>
      val pts = pts0.distinct
      val zs = pts.toDF("x", "y")
        .select(col("x"), col("y"),
          ScaleOps.zorderValue(Seq(col("x"), col("y")), 8).as("z"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      // injective: distinct points -> distinct keys
      assert(zs.values.toSeq.distinct.size == pts.size)
      // dominance order embeds: p <= q componentwise -> z(p) <= z(q)
      for ((p @ (px, py)) <- pts; (q @ (qx, qy)) <- pts
           if px <= qx && py <= qy)
        assert(zs(p) <= zs(q), s"dominance violated: $p -> ${zs(p)}, $q -> ${zs(q)}")
    }
  }

  // ---- r4 operator laws -------------------------------------------------

  private val wordGen: Gen[String] = Gen.oneOf(
    Gen.alphaLowerStr.map(_.take(6)).suchThat(_.nonEmpty),
    Gen.oneOf("汉字", "🚀ship", "naïve", "a.b", "x!", "end?"))
  private val textGen: Gen[String] =
    Gen.choose(0, 60).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))

  test("law: span corruption splice-back restores the normalized text") {
    import graft.operators.Corruption
    forAll(Gen.listOfN(8, textGen), n = 10) { texts =>
      val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val rows = Corruption.spanCorruptBlocked(d, "doc_id", "text", "prop")
        .select("doc_id", "input_text", "target_text").collect()
      rows.foreach { r =>
        val doc = texts(r.getLong(0).toInt)
        val expected = doc.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        // walk input, splicing each sentinel's span from the target
        val tgt = r.getString(2).split(" ").filter(_.nonEmpty)
        val spans = scala.collection.mutable.Map.empty[String, Seq[String]]
        var k = 0
        while (k < tgt.length) {
          val sent = tgt(k)
          val span = tgt.slice(k + 1, k + 4).takeWhile(!_.startsWith("<extra_id_"))
          spans(sent) = span.toSeq
          k += 1 + span.length
        }
        val restored = r.getString(1).split(" ").filter(_.nonEmpty).toSeq
          .flatMap(t => if (t.startsWith("<extra_id_")) spans(t) else Seq(t))
        assert(restored == expected, s"doc ${r.getLong(0)}")
      }
    }
  }

  test("law: FIM pieces always reassemble; shard totals always conserve") {
    import graft.operators.{Corruption, Packing}
    forAll(Gen.listOfN(12, textGen), n = 6) { texts =>
      val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val Psm = """<fim_prefix>(.*)<fim_suffix>(.*)<fim_middle>(.*)""".r
      Corruption.fimSplit(d, "doc_id", "text", "prop", 1, 1)
        .select("doc_id", "fim_text", "fim_applied").collect().foreach { r =>
          val expected = texts(r.getLong(0).toInt)
            .toLowerCase.split("\\s+").filter(_.nonEmpty).mkString(" ")
          if (r.getBoolean(2)) r.getString(1) match {
            case Psm(p, sfx, m) =>
              assert(Seq(p, m, sfx).filter(_.nonEmpty).mkString(" ") == expected)
            case other => fail(s"not PSM: $other")
          } else assert(r.getString(1) == expected)
        }
      // shard conservation on the same corpus
      val toks = d.withColumn("toks", graft.functions.TextFns.tokens(col("text")))
      val root = java.nio.file.Files.createTempDirectory("graft_prop_shard").toString
      val man = Packing.writeTokenShards(toks, root + "/s", 3, "prop", Seq("doc_id"), "toks")
        .collect()
      assert(man.map(_.getLong(1)).sum == texts.size.toLong)
      assert(man.map(_.getInt(0)).forall(s => s >= 0 && s < 3))
      assert(man.map(_.getLong(2)).sum ==
        toks.agg(coalesce(sum(size(col("toks"))), lit(0))).head().getLong(0))
    }
  }

  test("law: temperature weights are monotone, bounded, and exact at alpha=1") {
    import graft.operators.Sampling
    val totalsGen = Gen.listOfN(5, Gen.choose(1L, 1000000000L))
    forAll(totalsGen, n = 20) { ts =>
      whenever(ts.max / ts.min < 1000000L) {
        for ((p, q) <- Seq((1, 1), (1, 2), (3, 10), (7, 10))) {
          val ws = Sampling.temperatureWeights(ts, p, q)
          assert(ws.max == 1000000L)
          // monotone: larger corpus never gets a smaller weight
          ts.zip(ws).combinations(2).foreach { case Seq((t1, w1), (t2, w2)) =>
            if (t1 <= t2) assert(w1 <= w2 + 1) // ±1 floor slack
            else assert(w2 <= w1 + 1)
          }
        }
        // α=1 reproduces exact natural ratios (up to the 1e6 floor)
        val nat = Sampling.temperatureWeights(ts, 1, 1)
        val mx = ts.max
        ts.zip(nat).foreach { case (t, w) =>
          assert(w == (BigInt(t) * 1000000L / mx).toLong)
        }
      }
    }
  }

  test("langid feature extractor: gram-count law and hash-range invariants on random text") {
    import graft.plans.CharNgramBuckets
    val textGen = Gen.listOfN(40,
      Gen.frequency(
        6 -> Gen.alphaChar,
        2 -> Gen.const(' '),
        1 -> Gen.oneOf('好', '世', 'я', 'к', 'é', 'ß'),
        1 -> Gen.oneOf('0', '9', ',', '.'))).map(_.mkString)
    forAll(textGen) { t =>
      val cp = t.codePointCount(0, t.length)
      val b = CharNgramBuckets.bucketsOf(t, 3, 2048, "lid")
      // mixed-order 1..3 gram count law over codepoints
      val expect = cp + math.max(cp - 1, 0) + math.max(cp - 2, 0)
      assert(b.length == expect, s"text='$t'")
      assert(b.forall(x => x >= 0 && x < 2048))
      // determinism + case-fold stability
      assert(b.sameElements(CharNgramBuckets.bucketsOf(t, 3, 2048, "lid")))
      assert(b.sameElements(CharNgramBuckets.bucketsOf(
        t.toUpperCase(java.util.Locale.ROOT)
          .toLowerCase(java.util.Locale.ROOT), 3, 2048, "lid")) ||
        t != t.toUpperCase(java.util.Locale.ROOT)
          .toLowerCase(java.util.Locale.ROOT)) // only when round-trip is identity
    }
  }

  test("langid prediction is total and closed over the model's label set") {
    val model = graft.operators.LangId.trainRef(graft.operators.LangSeedCorpus.train)
    val valid = model.langs.toSet + "und"
    val textGen = Gen.listOfN(25,
      Gen.frequency(5 -> Gen.alphaChar, 2 -> Gen.const(' '),
        1 -> Gen.oneOf('好', 'я', 'ü'))).map(_.mkString)
    forAll(textGen, n = 15) { t =>
      val preds = Seq(t).toDF("text")
        .select(graft.operators.LangId.predict(model, $"text")).as[String].collect()
      assert(valid.contains(preds.head), s"text='$t' pred=${preds.head}")
    }
  }
}
