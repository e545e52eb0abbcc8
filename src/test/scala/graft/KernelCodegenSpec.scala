package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim

/** The three hottest text kernels carry real `doGenCode`
  * (static-invoke into WholeStageCodegen). This spec pins (a) the
  * generated code actually COMPILES — `codegen.fallback=false` +
  * `CODEGEN_ONLY` turn Janino errors into test failures instead of
  * Spark's silent interpreted fallback — and (b) codegen and
  * interpreted paths return identical values on adversarial inputs
  * (nulls, empties, multi-codepoint unicode). */
class KernelCodegenSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    Some("the quick brown fox jumps over the lazy dog"),
    Some("  leading   and   trailing   whitespace  "),
    Some(""),
    None,
    Some("naïve café über straße"),
    Some("日本語のテキストと emoji 🙂 mixed"),
    Some("a"),
    Some("one two"))
  private lazy val df = texts.map(Tuple1(_)).toDF("text")

  private def shingles: Column =
    GraftShim.column(graft.plans.HashedWordShingles(
      GraftShim.expression(col("text")), 3))
  private def buckets: Column =
    GraftShim.column(graft.plans.CharNgramBuckets(
      GraftShim.expression(col("text")), 3, 512, "graft"))
  private def nbScore: Column = {
    val rng = new scala.util.Random(11)
    GraftShim.column(graft.plans.CharNgramNbScore(
      GraftShim.expression(col("text")), 3, 512, "graft",
      Seq("en", "de", "xx"), Array(0L, 10L, 5L),
      Array.fill(3)(Array.fill(512)(rng.nextInt(100).toLong))))
  }

  private def collectBoth(c: Column): (Seq[Any], Seq[Any]) = {
    // loud codegen: compile errors fail the test, nothing falls back
    val gen = withSqlConf(
      "spark.sql.codegen.fallback" -> "false",
      "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY") {
      df.select(c.as("x")).collect().map(_.get(0)).toSeq
    }
    val interp = withSqlConf(
      "spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      df.select(c.as("x")).collect().map(_.get(0)).toSeq
    }
    (gen, interp)
  }

  test("hashed_word_shingles: codegen compiles and agrees with interpreted") {
    val (gen, interp) = collectBoth(shingles)
    assert(gen == interp)
    assert(gen.count(_ != null) == texts.count(_.isDefined))
  }

  test("char_ngram_buckets: codegen compiles and agrees with interpreted") {
    val (gen, interp) = collectBoth(buckets)
    assert(gen == interp)
  }

  test("char_ngram_nb_score: codegen compiles and agrees with interpreted (model rides a reference obj)") {
    val (gen, interp) = collectBoth(nbScore)
    assert(gen == interp)
    // empty text scores 'und', null stays null
    val byInput = texts.zip(gen)
    assert(byInput.collect { case (Some(""), v) => v }.head.toString == "und")
    assert(byInput.collect { case (None, v) => v }.head == null)
  }

  private def withSqlConf[A](pairs: (String, String)*)(f: => A): A = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f
    finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
