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
}
