package graft

import org.apache.spark.sql.functions._
import graft.operators.{LangId, LangSeedCorpus}
import graft.functions.TextFns

/** Character-n-gram Naive Bayes language ID (the real-model
  * replacement for the 5-language marker heuristic). */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  private lazy val refModel = LangId.trainRef(LangSeedCorpus.train)

  test("distributed training equals the plain-Scala reference model exactly") {
    val df = LangSeedCorpus.train.toDF("lang", "text").repartition(7)
    val distributed = LangId.train(df, "text", "lang")
    assert(distributed == refModel)
    // and repartitioning must not matter
    val d2 = LangId.train(LangSeedCorpus.train.toDF("lang", "text").repartition(3), "text", "lang")
    assert(d2 == refModel)
  }

  test("held-out multi-script sentences classify correctly (8 languages, 3 scripts)") {
    val test = LangSeedCorpus.test.toDF("lang", "text")
    val got = test.select($"lang", LangId.predict(refModel, $"text").as("pred")).collect()
    val wrong = got.filter(r => r.getString(0) != r.getString(1))
    assert(wrong.isEmpty,
      s"misclassified: ${wrong.map(r => s"${r.getString(0)}->${r.getString(1)}").mkString(", ")}")
  }

  test("the old marker heuristic demonstrably mislabels the non-Latin test set") {
    val nonLatin = LangSeedCorpus.test.filter(t => Set("zh", "ru", "ja")(t._1))
    val got = nonLatin.toDF("lang", "text")
      .select($"lang", TextFns.langId($"text").as("pred")).collect()
    // its 'zh' markers are pinyin that never match Han text; it has no
    // ru/ja at all — every row must come back wrong or 'und'
    assert(got.forall(r => r.getString(1) != r.getString(0)),
      "marker heuristic unexpectedly correct on non-Latin text")
    // while the NB model gets them all right
    val nb = nonLatin.toDF("lang", "text")
      .select($"lang", LangId.predict(refModel, $"text").as("pred")).collect()
    assert(nb.forall(r => r.getString(1) == r.getString(0)))
  }

  test("script-profile agreement: predicted language matches the dominant script") {
    val expectScript: Map[String, Set[String]] = Map(
      "en" -> Set("latin"), "es" -> Set("latin"), "fr" -> Set("latin"),
      "de" -> Set("latin"), "pt" -> Set("latin"),
      "zh" -> Set("han"), "ru" -> Set("cyrillic"),
      "ja" -> Set("hiragana", "katakana", "han"))
    val rows = LangSeedCorpus.test.toDF("lang", "text")
      .select(LangId.predict(refModel, $"text").as("pred"),
        TextFns.dominantScript($"text").as("script")).collect()
    rows.foreach { r =>
      val (pred, script) = (r.getString(0), r.getString(1))
      assert(expectScript(pred).contains(script),
        s"pred=$pred but dominant script=$script")
    }
  }

  test("empty text returns 'und' (no evidence); short text still classifies") {
    val got = Seq("", "the quick brown fox").toDF("text")
      .select(LangId.predict(refModel, $"text")).as[String].collect()
    assert(got(0) == "und" && got(1) == "en")
  }

  test("save/load round-trips the model exactly; predictions identical; loud on junk") {
    val path = java.nio.file.Files.createTempDirectory("graft_lid").toString + "/model.json"
    LangId.save(spark, refModel, path)
    val back = LangId.load(spark, path)
    assert(back == refModel)
    val texts = LangSeedCorpus.test.map(_._2).toDF("text")
    val a = texts.select(LangId.predict(refModel, $"text")).as[String].collect().toSeq
    val b = texts.select(LangId.predict(back, $"text")).as[String].collect().toSeq
    assert(a == b)
    val junk = path + ".junk"
    java.nio.file.Files.write(java.nio.file.Paths.get(junk),
      """{"format":"something-else"}""".getBytes)
    assert(intercept[IllegalArgumentException] { LangId.load(spark, junk) }
      .getMessage.contains("not a graft langid model"))
  }

  test("SQL surface: langid(text) and char_ngram_buckets run through the registry") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT langid('the quick brown fox jumps over the lazy dog') AS l, " +
        "langid('学生们经常问关于世界的难题') AS z, " +
        "size(char_ngram_buckets('abc', 3, 2048)) AS nb")
      .head()
    assert(got.getString(0) == "en" && got.getString(1) == "zh")
    assert(got.getInt(2) == 3 + 2 + 1) // mixed-order 1..3 grams of 'abc'
  }

  test("edge cases: single-language model, NULL text null-out, empty corpus loud") {
    val solo = LangId.trainRef(LangSeedCorpus.train.filter(_._1 == "en"))
    assert(solo.langs == Seq("en") && solo.priorsMicro.head == 0L) // ln(1)
    val got = Seq("anything at all", "学生").toDF("text")
      .select(LangId.predict(solo, $"text")).as[String].collect()
    assert(got.forall(_ == "en")) // one label — everything maps to it
    // NULL text follows Spark null-in-null-out (not 'und' — no row evidence)
    val withNull = spark.sql("SELECT CAST(NULL AS STRING) AS text")
      .select(LangId.predict(refModel, $"text")).collect()
    assert(withNull.head.isNullAt(0))
    assert(intercept[IllegalArgumentException] {
      LangId.trainRef(Seq.empty)
    }.getMessage.contains("no labeled documents"))
  }

  test("model is deterministic and weights are dense over all buckets") {
    assert(refModel.langs == Seq("de", "en", "es", "fr", "ja", "pt", "ru", "zh"))
    assert(refModel.weightsMicro.forall(_.length == refModel.nBuckets))
    assert(LangId.trainRef(LangSeedCorpus.train) == refModel)
    // every weight is a negative log-prob micro; priors sum to ~ln-consistent mass
    assert(refModel.weightsMicro.forall(_.forall(_ < 0L)))
    assert(refModel.priorsMicro.forall(_ <= 0L))
  }
}
