package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.Classifier

/** Deterministic distributed training of the hashed-bag linear
  * classifier — the training half of the quality-filter loop whose
  * inference half (linearTextScore) is hash-gated. */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val B = 128

  private val seedSet = {
    val pos = (1 to 30).map(i =>
      (s"excellent careful thorough analysis with detailed reasoning v$i", 1))
    val neg = (1 to 30).map(i =>
      (s"click here buy now limited offer cheap deal v$i", 0))
    pos ++ neg
  }

  test("separable seed set trains to perfect accuracy") {
    val docs = seedSet.toDF("text", "label")
    val m = Classifier.train(docs, "text", "label", B, iters = 30)
    val scored = TextFns.linearTextScore(
      docs, "text", m.weightsDF(spark), B, biasMicro = m.biasMicro)
    val acc = scored
      .withColumn("pred", when(col("logit") >= 0, 1).otherwise(0))
      .filter(col("pred") === col("label")).count()
    assert(acc == 60L, s"expected all 60 classified correctly, got $acc")
  }

  test("training is bit-identical across partitionings and reruns") {
    val docs = seedSet.toDF("text", "label")
    val a = Classifier.train(docs, "text", "label", B, iters = 10)
    val b = Classifier.train(docs.repartition(17), "text", "label", B, iters = 10)
    val c = Classifier.train(docs, "text", "label", B, iters = 10)
    assert(a == b)
    assert(a == c)
  }

  test("save/load round-trips the integer-micro model exactly; loud on junk") {
    val docs = seedSet.toDF("text", "label")
    val m = Classifier.train(docs, "text", "label", B, iters = 10)
    val path = java.nio.file.Files.createTempDirectory("graft_cls").toString + "/m.json"
    Classifier.save(spark, m, path)
    val back = Classifier.load(spark, path)
    assert(back == m)
    val junk = path + ".junk"
    java.nio.file.Files.write(java.nio.file.Paths.get(junk),
      """{"format":"nope"}""".getBytes)
    assert(intercept[IllegalArgumentException] { Classifier.load(spark, junk) }
      .getMessage.contains("not a graft linear classifier"))
  }

  test("trained model drives the corpus filter") {
    val docs = seedSet.toDF("text", "label")
    val m = Classifier.train(docs, "text", "label", B, iters = 30)
    val corpus = Seq(
      (1L, "thorough detailed analysis and careful reasoning throughout"),
      (2L, "buy now cheap limited offer click here")).toDF("doc_id", "text")
    val kept = TextFns.filterByLinearScore(
      corpus, "text", m.weightsDF(spark), B,
      minLogitMicro = 0L, biasMicro = m.biasMicro)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("empty and degenerate inputs fail loudly or are excluded") {
    intercept[IllegalArgumentException] {
      Classifier.train(Seq.empty[(String, Int)].toDF("text", "label"),
        "text", "label", B)
    }
    // docs with no tokens are excluded from training, not NaN-poison
    val m = Classifier.train(
      (seedSet :+ ("", 1)).toDF("text", "label"), "text", "label", B, iters = 5)
    assert(m.weights.nonEmpty)
  }
}
