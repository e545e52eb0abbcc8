package graft

import org.apache.spark.sql.functions._
import graft.functions.{Fns, Selector}
import graft.operators.JoinKey.Equi

/** Ports of the reference's differential-test scenarios on its own
  * fixture tables (FIXTURES.md §A; reference: test/runtests.jl:19-36,
  * test/comp_tests.jl). Values asserted here were derived from the
  * generation formulas, mirroring the TidierData-vs-TidierDB
  * differential idea with precomputed expectations. */
class RefScenariosSpec extends SparkSpec {
  import spark.implicits._

  /** test_df (reference: test/runtests.jl:19-23): id = AA..DV base-26
    * pairs, groups alternates bb/aa, value = repeat(1..20, 5),
    * percent = i/200 */
  private def testDf = {
    val rows = (1 to 100).map { i =>
      val id = s"${('A' + (i - 1) / 26).toChar}${('A' + (i - 1) % 26).toChar}"
      val groups = if (i % 2 == 1) "bb" else "aa"
      val value = ((i - 1) % 20) + 1L
      val percent = i / 200.0
      (id, groups, value, percent)
    }
    rows.toDF("id", "groups", "value", "percent")
  }

  /** df4-shaped: same key name as test_df (reference: test/runtests.jl:34-37) */
  private def df4 = (1 to 80).map { i =>
    val id = s"${('A' + (i - 1) / 26).toChar}${('A' + (i - 1) % 26).toChar}"
    (id, Seq("X", "Y", "Z")((i - 1) / 27 % 3), 50L + (i % 50))
  }.toDF("id", "category", "score")

  test("tidy selection + relocate (comp_tests 1-23)") {
    val sel = Tidier.from(testDf).select(Selector.contains("e"), "id")
    assert(sel.df.columns.toSeq == Seq("value", "percent", "id"))
    val rel = Tidier.from(testDf).relocate(Seq[Selector]("value"), before = Some("groups"))
    assert(rel.df.columns.toSeq == Seq("id", "value", "groups", "percent"))
  }

  test("group_by + summarize with across (comp_tests 24-35)") {
    val tf = Tidier.from(testDf).groupBy("groups")
    val out = tf.summarize(
      (tf.across(Seq[Selector]("value", "percent"), "mean" -> (c => avg(c)))
        :+ ("n" -> Fns.n())): _*)
      .arrange("groups").collect()
    // odd i (groups=bb): i=1,3..99 → values cycle; direct check vs formula
    val bb = (1 to 100).filter(_ % 2 == 1)
    val aa = (1 to 100).filter(_ % 2 == 0)
    def valOf(i: Int) = ((i - 1) % 20) + 1
    val aaRow = out(0); val bbRow = out(1)
    assert(aaRow.getString(0) == "aa" && bbRow.getString(0) == "bb")
    assert(math.abs(bbRow.getDouble(1) - bb.map(valOf).sum.toDouble / 50) < 1e-12)
    assert(math.abs(aaRow.getDouble(2) - aa.map(_ / 200.0).sum / 50) < 1e-12)
    assert(aaRow.getLong(3) == 50L && bbRow.getLong(3) == 50L)
  }

  test("filter with regex, in-list, logical ops (comp_tests 36-82)") {
    val f1 = Tidier.from(testDf)
      .filter(Fns.strDetectRegex(col("id"), "^A[AB]$")).df.count()
    assert(f1 == 2)
    val f2 = Tidier.from(testDf)
      .filter(col("value").isin(1L, 2L), col("groups") === "bb").df.count()
    // value 1 or 2 occurs for i where ((i-1)%20)+1 in {1,2}; odd i only
    val expect = (1 to 100).count(i => i % 2 == 1 && Seq(1, 2).contains(((i - 1) % 20) + 1))
    assert(f2 == expect)
    val f3 = Tidier.from(testDf)
      .filter(col("value") > 10L || col("percent") < 0.1).df.count()
    val expect3 = (1 to 100).count(i => ((i - 1) % 20) + 1 > 10 || i / 200.0 < 0.1)
    assert(f3 == expect3)
  }

  test("same-name key join + repeated joins (comp_tests 88-159, 409-455)") {
    val joined = Tidier.from(testDf)
      .innerJoin(Tidier.from(df4), Equi("id", "id"))
    assert(joined.df.columns.toSeq ==
      Seq("id", "groups", "value", "percent", "category", "score"))
    assert(joined.df.count() == 80)
    // join the same frame twice through different renamed keys
    val renamed = Tidier.from(df4).rename("id2" -> "id", "score2" -> "score")
    val twice = joined
      .innerJoin(renamed, Equi("id", "id2"))
    assert(twice.df.count() == 80)
    assert(twice.df.columns.count(_ == "category") == 2) // both category cols survive
  }

  test("mutate with casts, cumsum and window kwargs (comp_tests 160-220, 312-323)") {
    val out = Tidier.from(testDf)
      .mutateBy(by = Seq[Selector]("groups"), order = Seq(col("id")))(
        "cum_v" -> Fns.cumsum(col("value")),
        "v_str" -> Fns.asString(col("value")),
        "v_dbl" -> Fns.asFloat(col("value")))
      .filter(col("id").isin("AA", "AC"))
      .arrange("id").collect()
    // bb group ordered by id: AA(v=1) cum=1; AC(v=3) cum=4
    assert(out.map(_.getAs[Long]("cum_v")).toSeq == Seq(1L, 4L))
    assert(out.head.getAs[String]("v_str") == "1")
  }

  test("conditionals if_else/case_when on value bands (comp_tests 221-254)") {
    val out = Tidier.from(testDf)
      .mutate(
        "band" -> Fns.caseWhen(
          Seq((col("value") <= 5L) -> lit("low"), (col("value") <= 15L) -> lit("mid")),
          Some(lit("high"))),
        "flag" -> Fns.ifElse(col("percent") > 0.25, lit(1), lit(0)))
      .countSorted("band")
      .arrange("band").collect()
    val bands = (1 to 100).map(i => ((i - 1) % 20) + 1).groupBy {
      case v if v <= 5  => "low"
      case v if v <= 15 => "mid"
      case _            => "high"
    }.view.mapValues(_.size).toMap
    assert(out.map(r => r.getString(0) -> r.getLong(1)).toMap == bands)
  }

  test("distinct + count ordering (comp_tests 255-265, 291-297)") {
    val d = Tidier.from(testDf).distinct("groups").arrange("groups")
      .collect().map(_.getString(0)).toSeq
    assert(d == Seq("aa", "bb"))
    val c = Tidier.from(testDf).countSorted("value").head(1).collect()
    assert(c.head.getLong(1) == 5L) // every value appears 5 times
  }

  test("date parsing and intervals (comp_tests 266-289)") {
    val d = Seq("2024-01-15", "2023-06-02").toDF("s")
    val out = Tidier.from(d)
      .mutate(
        "d" -> Fns.ymd(col("s")),
        "y" -> year(col("d")),
        "plus1y" -> (col("d").cast("timestamp") + Fns.years(1)),
        "diff_days" -> datediff(lit("2024-02-01").cast("date"), col("d")))
      .arrange(desc("d")).collect()
    assert(out.head.getAs[Int]("y") == 2024)
    assert(out.head.getAs[java.sql.Timestamp]("plus1y").toString.startsWith("2025-01-15"))
    assert(out.head.getAs[Int]("diff_days") == 17)
  }

  test("as-of join smoke on prices/holdings shape (comp_tests 202-219)") {
    val prices = Seq(
      ("APL", 1L, 100.0), ("APL", 3L, 105.0), ("MSF", 1L, 50.0), ("MSF", 4L, 55.0)
    ).toDF("ticker", "pwhen", "price")
    val holdings = Seq(
      ("APL", 2L, 10.0), ("APL", 4L, 20.0), ("MSF", 5L, 30.0)
    ).toDF("ticker2", "hwhen", "shares")
    val out = Tidier.from(holdings)
      .innerJoin(Tidier.from(prices),
        Equi("ticker2", "ticker"),
        graft.operators.JoinKey.Closest("hwhen", ">=", "pwhen"))
      .arrange("ticker2", "hwhen").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(4)))
    assert(out.toSeq == Seq(("APL", 2L, 100.0), ("APL", 4L, 105.0), ("MSF", 5L, 55.0)))
  }
}
