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
