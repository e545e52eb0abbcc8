package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns

class LineCleanSpec extends SparkSpec {
  import spark.implicits._

  private def clean(s: String): String =
    Seq(s).toDF("t").select(TextFns.cleanLines(col("t"))).first().getString(0)

  test("drops separator runs, digit-only and punctuation-only lines") {
    val doc = Seq(
      "====", "A real sentence here.", "42 17 99", "| | |",
      "***", "Another paragraph of text.").mkString("\n")
    assert(clean(doc) == "A real sentence here.\nAnother paragraph of text.")
  }

  test("drops too-short lines and blank lines; keeps minChars boundary") {
    assert(clean("ab\ncat\n\nword") == "cat\nword")
  }

  test("alpha-ratio boundary is cross-multiplied exact: 2 alpha of 5 = 40% kept") {
    assert(clean("ab-12\nab1234") == "ab-12") // 2*100 >= 5*40 keeps; 2 of 6 fails
  }

  test("spaces don't count against the ratio") {
    assert(clean("a b c d e 1 2 3") == "a b c d e 1 2 3") // 5 alpha of 8 nonspace
  }

  test("report counts kept and dropped lines per doc") {
    val df = Seq((1L, "good line here\n####\nmore text")).toDF("id", "text")
    val r = TextFns.lineCleanReport(df, "text").select("n_lines_kept", "n_lines_dropped").first()
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L)
  }

  test("clean doc passes through unchanged") {
    val doc = "First real line.\nSecond real line."
    assert(clean(doc) == doc)
  }
}
