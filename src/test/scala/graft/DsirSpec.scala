package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir

/** DSIR importance resampling: feature hashing, distribution fitting,
  * exact integer scoring, deterministic selection. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64

  /** independent md5 bucket reimplementation (same contract as
    * TextFns.tokenBucket: portable 60-bit hex prefix mod n) */
  private def bucket(t: String, seed: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest((seed + "" + t).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.take(15), 16) % B).toInt
  }

  private def feats(text: String): Seq[Int] = {
    val tk = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    tk.map(bucket(_, "dsiru")) ++
      tk.sliding(2).filter(_.size == 2).map(p => bucket(p.mkString(" "), "dsirb"))
  }

  test("bucketCounts matches an independent hash implementation") {
    val docs = Seq("spark shuffles data", "data data spark").toDF("text")
    val got = Dsir.bucketCounts(docs, "text", B)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val want = Seq("spark shuffles data", "data data spark")
      .flatMap(feats)
      .groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    assert(got == want)
  }

  test("logRatioWeights: add-alpha smoothed ln ratio in micro units") {
    val target = Seq((1, 6L), (2, 2L)).toDF("bucket", "cnt")
    val raw = Seq((1, 1L), (3, 7L)).toDF("bucket", "cnt")
    val w = Dsir.logRatioWeights(target, raw, nBuckets = 4, alpha = 1.0)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    def lw(ct: Long, cr: Long): Long =
      math.round(1e6 * (math.log((ct + 1.0) / (8 + 4.0)) -
        math.log((cr + 1.0) / (8 + 4.0))))
    assert(w == Map(1 -> lw(6, 1), 2 -> lw(2, 0), 3 -> lw(0, 7)))
  }

  test("importanceScore: exact integer sum over unigram+bigram stream") {
    val weights = (0 until B).map(b => (b, (b * 37L) % 201 - 100)).toDF("bucket", "w")
    val wmap = (0 until B).map(b => b -> ((b * 37L) % 201 - 100)).toMap
    val docs = Seq((1L, "spark shuffles data"), (2L, "one"), (3L, ""))
      .toDF("doc_id", "text")
    val got = Dsir.importanceScore(docs, "text", weights, B)
      .select("doc_id", "n_feats", "score_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toMap2
    def expect(t: String) = feats(t).map(wmap).sum
    assert(got(1L) == ((5L, expect("spark shuffles data"))))
    assert(got(2L) == ((1L, expect("one"))))
    assert(got(3L) == ((0L, 0L)))
  }

  test("resampleTopK: deterministic, partition-invariant selection") {
    val weights = (0 until B).map(b => (b, (b * 37L) % 201 - 100)).toDF("bucket", "w")
    val docs = (1L to 50L).map(i => (i, s"token$i joins token${i % 7}")).toDF("doc_id", "text")
    val a = Dsir.resampleTopK(docs, "doc_id", "text", weights, B, k = 10)
      .select("doc_id").as[Long].collect().toSeq
    val b = Dsir.resampleTopK(docs.repartition(13), "doc_id", "text", weights, B, k = 10)
      .select("doc_id").as[Long].collect().toSeq
    assert(a == b)
    assert(a.size == 10)
    // matches a brute-force ranking
    val wmap = (0 until B).map(x => x -> ((x * 37L) % 201 - 100)).toMap
    val brute = (1L to 50L).map(i => (i, feats(s"token$i joins token${i % 7}").map(wmap).sum))
      .sortBy { case (i, s) => (-s, i) }.take(10).map(_._1)
    assert(a == brute)
  }

  test("resampleGumbel: reproducible per seed, k respected") {
    val weights = (0 until B).map(b => (b, (b * 37L) % 201 - 100)).toDF("bucket", "w")
    val docs = (1L to 60L).map(i => (i, s"alpha beta$i gamma${i % 5}")).toDF("doc_id", "text")
    def run(seed: String) =
      Dsir.resampleGumbel(docs, "doc_id", "text", weights, B, k = 15, seed = seed)
        .select("doc_id").as[Long].collect().toSet
    val s1 = run("dsir"); val s2 = run("dsir"); val s3 = run("other")
    assert(s1 == s2)
    assert(s1.size == 15)
    assert(s1 != s3) // overwhelmingly likely under different noise
  }

  test("end to end: target-like docs are preferred") {
    val target = Seq.fill(20)("spark shuffle partition join broadcast").toDF("text")
    val rawTexts = (1 to 30).map(i =>
      if (i <= 15) s"spark shuffle partition join broadcast run$i"
      else s"cooking recipe garden flower weather note$i")
    val raw = rawTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val p = Dsir.bucketCounts(target, "text", B)
    val q = Dsir.bucketCounts(raw, "text", B)
    val w = Dsir.logRatioWeights(p, q, B)
    val kept = Dsir.resampleTopK(raw, "doc_id", "text", w, B, k = 15)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == (0L until 15L).toSet) // exactly the spark-like half
  }

  private implicit class Map2[A, B1, C](xs: Array[(A, B1, C)]) {
    def toMap2: Map[A, (B1, C)] = xs.map(t => t._1 -> ((t._2, t._3))).toMap
  }
}
