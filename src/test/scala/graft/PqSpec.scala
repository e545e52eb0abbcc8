package graft

import org.apache.spark.sql.functions._
import graft.operators.Pq
import graft.operators.Pq.PqModel

/** Product quantization: training determinism, encode/ADC exactness
  * against plain-Scala reimplementations, compression correctness, and
  * the serving-path invariants (ADC of a centroid row = table entry,
  * ADC ranking approximates exact ranking). */
class PqSpec extends SparkSpec {

  import spark.implicits._

  /** deterministic synthetic embeddings: 4 well-separated quadrant
    * clusters in 8 dims so k=4 training has an obvious optimum */
  private def corpus(n: Int): Seq[(Long, Seq[Float])] =
    (0L until n.toLong).map { i =>
      val cluster = (i % 4).toInt
      val base = Array.fill(8)(0.0f)
      base(cluster) = 0.4f
      base((cluster + 4) % 8) = -0.3f
      // small deterministic jitter, exactly representable floats
      val jit = (i / 4 % 7).toFloat / 1000f
      (i, base.toSeq.map(_ + jit))
    }

  private def df(n: Int) = corpus(n).toDF("vec_id", "emb")

  /** independent plain-Scala encode on the same 1e-7 grid */
  private def refEncode(v: Seq[Float], model: PqModel): Seq[Int] =
    (0 until model.m).map { s =>
      val q = (0 until model.subDim)
        .map(j => math.round(v(s * model.subDim + j).toDouble * 1e7))
      val dists = (0 until model.k).map { c =>
        q.zip(model.codebooks(s)(c)).map { case (x, y) =>
          val d = x - y; d * d
        }.sum
      }
      dists.indexOf(dists.min) // first min = lowest code
    }

  test("training is partition-invariant and rerun-stable") {
    val d1 = df(200).repartition(1)
    val d5 = df(200).repartition(5, col("vec_id"))
    val m1 = Pq.train(d1, "emb", m = 2, k = 4, iters = 3)
    val m2 = Pq.train(d5, "emb", m = 2, k = 4, iters = 3)
    val m3 = Pq.train(d1, "emb", m = 2, k = 4, iters = 3)
    def flat(m: PqModel) = m.codebooks.flatten.flatten.toSeq
    assert(flat(m1) === flat(m2))
    assert(flat(m1) === flat(m3))
  }

  test("training converges onto the 4 planted clusters (quantization error drops)") {
    val data = df(400)
    def err(model: PqModel): Long = {
      // quantization error via the decode round trip: grid distance
      // between each vector and its reconstructed centroid concat
      val enc = Pq.encode(data, "emb", model)
      val dec = Pq.decode(enc, "codes", model)
      dec.select(sum(aggregate(
        zip_with(col("emb"), col("decoded"),
          (x, y) => { val d = round(x.cast("double") * 1e7).cast("long") -
            round(y.cast("double") * 1e7).cast("long"); d * d }),
        lit(0L), (a, v) => a + v))).first().getLong(0)
    }
    val e1 = err(Pq.train(data, "emb", m = 2, k = 4, iters = 1))
    val e5 = err(Pq.train(data, "emb", m = 2, k = 4, iters = 5))
    assert(e5 <= e1)
    // total signal energy on the grid: 400 vectors × (0.4² + 0.3²)·10¹⁴
    // ≈ 10¹⁶. Lloyd from deterministic seeds may settle in a local
    // optimum (standard k-means), but must capture most of the planted
    // structure — an order of magnitude under the all-zero model.
    val energy = data.select(sum(aggregate(
      transform(col("emb"), x => {
        val g = round(x.cast("double") * 1e7).cast("long"); g * g
      }), lit(0L), (a, v) => a + v))).first().getLong(0)
    assert(e5 < energy / 5)
  }

  test("encode matches the independent reimplementation") {
    val data = df(100)
    val model = Pq.train(data, "emb", m = 2, k = 4, iters = 2)
    val got = Pq.encode(data, "emb", model)
      .select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    corpus(100).foreach { case (id, v) =>
      assert(got(id) === refEncode(v, model), s"vec $id")
    }
  }

  test("native encode kernel agrees with the HOF reference path code-for-code") {
    val data = df(512)
    val model = Pq.train(df(64), "emb", m = 4, k = 4, iters = 2)
    def codesOf(d: org.apache.spark.sql.DataFrame) =
      d.select("vec_id", "codes").collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    val kernel = codesOf(Pq.encode(data, "emb", model))
    val hof = codesOf(Pq.encodeHof(data, "emb", model))
    assert(kernel == hof)
    // grid-rounding edge values (tiny magnitudes quantize to 0/±1 — the
    // half-up boundary region) must agree too
    val tricky = Seq(
      (0L, Seq(5.0e-8f, -5.0e-8f, 1.5e-7f, -1.5e-7f, 0.25f, -0.25f, 0.1f, -0.1f)),
      (1L, Seq(0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (2L, Seq(-0.4f, 0.3f, -0.2f, 0.1f, 0.4f, -0.3f, 0.2f, -0.1f)))
      .toDF("vec_id", "emb")
    assert(codesOf(Pq.encode(tricky, "emb", model)) ==
      codesOf(Pq.encodeHof(tricky, "emb", model)))
    // short embeddings are loud on the kernel path (ANSI element_at is
    // loud on the HOF path)
    val short = Seq((9L, Seq(1.0f, 2.0f))).toDF("vec_id", "emb")
    val e = intercept[Exception] {
      Pq.encode(short, "emb", model).collect()
    }
    assert(e.getMessage != null)
  }

  test("ADC of a row sitting exactly on centroids equals the table sum; zero for the query's own cell") {
    // formula codebook — no training needed for this invariant
    val model = PqModel(2, 3, 4,
      Array.tabulate(2, 3, 4)((s, c, j) => (s * 1000000L + c * 200000L + j * 50000L)))
    val query = (0 until 8).map(j => ((j / 4) * 1000000L + 200000L + (j % 4) * 50000L) / 1e7.toFloat)
    // query IS centroid 1 of each subspace → table[s][1] == 0
    val t = Pq.adcTable(query.map(_.toFloat), model)
    assert(t(0)(1) === 0L && t(1)(1) === 0L)
    val rows = Seq((7L, Seq(1, 1)), (8L, Seq(0, 2))).toDF("vec_id", "codes")
    val scored = Pq.adcScore(rows, "codes", query.map(_.toFloat), model)
      .select("vec_id", "adc_dist").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scored(7L) === 0L)
    assert(scored(8L) === t(0)(0) + t(1)(2))
  }

  test("adcTopK ranks the query's planted cluster first") {
    val data = df(400)
    val model = Pq.train(data, "emb", m = 2, k = 4, iters = 4)
    val enc = Pq.encode(data, "emb", model)
    val q = corpus(400).find(_._1 == 0L).get._2 // cluster-0 member
    val top = Pq.adcTopK(enc, "vec_id", "codes", q, model, 20)
      .collect().map(_.getLong(0))
    // all of the top-20 should be cluster-0 members (ids ≡ 0 mod 4)
    assert(top.length === 20)
    assert(top.forall(_ % 4 === 0L))
  }

  test("save/load round-trips the model and 32x-style compression holds") {
    val model = Pq.train(df(100), "emb", m = 4, k = 4, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("pq_model").toString
    Pq.save(model, dir, spark)
    val back = Pq.load(spark, dir)
    assert(back.m === model.m && back.k === model.k && back.subDim === model.subDim)
    assert(back.codebooks.flatten.flatten.toSeq === model.codebooks.flatten.flatten.toSeq)
    // 8 floats (32 bytes) → 4 codes ≤ 1 byte each of information (k=4)
    assert(Pq.encode(df(10), "emb", back).select("codes").first()
      .getSeq[Int](0).length === 4)
  }

  test("IVF-PQ: probed-cell ADC finds the planted cluster; saved layout prunes partitions") {
    val data = df(400)
    val model = Pq.train(data, "emb", m = 2, k = 4, iters = 3)
    val (ivf, coded) = Pq.ivfPqIndex(data, "vec_id", "emb", kCells = 4, model)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    Pq.saveIvfPq(ivf, coded, model, dir)
    val back = spark.read.parquet(s"$dir/data")
    val backModel = Pq.load(spark, s"$dir/pq")
    val q = corpus(400).find(_._1 == 0L).get._2
    val top = Pq.ivfPqTopK(ivf.centers, back, backModel, q, kTop = 10, nprobe = 1)
      .collect().map(_.getLong(0))
    assert(top.length === 10)
    assert(top.forall(_ % 4 === 0L)) // all cluster-0 members
    // cell filter must reach the scan as a partition filter on the
    // hive-partitioned layout (one cell probed → one partition read)
    val probed = Pq.ivfPqTopK(ivf.centers, back, backModel, q, 10, 1)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"))
  }

  test("train fails loudly when a subspace lacks k distinct subvectors") {
    val degenerate = (0L until 50L).map(i => (i, Seq.fill(8)(0.25f))).toDF("vec_id", "emb")
    val e = intercept[IllegalArgumentException] {
      Pq.train(degenerate, "emb", m = 2, k = 4, iters = 1)
    }
    assert(e.getMessage.contains("distinct subvectors"))
  }
}
