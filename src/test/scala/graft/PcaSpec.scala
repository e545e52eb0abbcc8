package graft

import org.apache.spark.sql.functions._
import graft.operators.Pca

/** Driver-eigensolve + projection properties for [[Pca]] (the
  * distributed moment pass is hash-gated vs DuckDB by q_embed_pca). */
class PcaSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
  private lazy val model = Pca.fit(emb, "embedding", 8)

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("covariance matches a local brute-force computation") {
    val rows = emb.select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = rows.length.toDouble
    val d = rows.head.length
    val mean = Array.tabulate(d)(i => rows.map(_(i)).sum / n)
    val got = Pca.covarianceUpper(emb, "embedding").collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getDouble(2)).toMap
    for (i <- 0 until d; j <- i until d) {
      val cov = rows.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / n
      assert(math.abs(got((i, j)) - cov) < 1e-9,
        s"cov($i,$j): got ${got((i, j))}, brute $cov")
    }
  }

  test("basis is orthonormal") {
    for (a <- 0 until model.k; b <- 0 until model.k) {
      val expect = if (a == b) 1.0 else 0.0
      assert(math.abs(dot(model.basis(a), model.basis(b)) - expect) < 1e-9)
    }
  }

  test("eigenpairs satisfy A v = lambda v and descend") {
    val covRows = Pca.covarianceUpper(emb, "embedding").collect()
    val d = model.d
    val a = Array.ofDim[Double](d, d)
    covRows.foreach { r =>
      val i = r.getLong(0).toInt; val j = r.getLong(1).toInt
      a(i)(j) = r.getDouble(2); a(j)(i) = r.getDouble(2)
    }
    for (c <- 0 until model.k) {
      val v = model.basis(c); val lam = model.eigenvalues(c)
      val av = a.map(row => dot(row, v))
      val resid = math.sqrt(av.zip(v).map { case (x, y) => (x - lam * y) * (x - lam * y) }.sum)
      assert(resid < 1e-9, s"eigen residual $resid for component $c")
      assert(lam >= -1e-12, "covariance is PSD")
      if (c > 0) assert(model.eigenvalues(c - 1) >= lam - 1e-15, "descending")
    }
  }

  test("projection variance per component equals its eigenvalue") {
    val proj = Pca.transform(emb, "embedding", model)
    val comps = proj.select("pca").collect().map(_.getSeq[Double](0).toArray)
    val n = comps.length.toDouble
    for (c <- 0 until model.k) {
      val xs = comps.map(_(c))
      val m = xs.sum / n
      val varc = xs.map(x => (x - m) * (x - m)).sum / n
      // moment pass quantizes at 1e-7; eigenvalue vs sample variance of
      // the float-precision projection agree to ~1e-6 relative
      assert(math.abs(varc - model.eigenvalues(c)) <
        1e-6 * math.max(1.0, model.eigenvalues(c)),
        s"component $c: var $varc vs lambda ${model.eigenvalues(c)}")
      // components are centered by construction
      assert(math.abs(m) < 1e-6)
    }
  }

  test("reconstruction error decreases with k and explained variance sums") {
    val totalVar = Pca.covarianceUpper(emb, "embedding")
      .filter(col("i") === col("j"))
      .agg(sum("cov")).first().getDouble(0)
    val full = Pca.fit(emb, "embedding", model.d)
    assert(math.abs(full.eigenvalues.sum - totalVar) < 1e-9 * math.max(1.0, totalVar),
      "trace preserved")
    val errs = Seq(1, 4, 16, 64).map { k =>
      // residual variance = total - retained (Parseval on the
      // orthonormal basis); strictly decreasing in k on real data
      totalVar - full.eigenvalues.take(k).sum
    }
    assert(errs == errs.sorted.reverse)
    assert(errs.last < 1e-9)
  }

  test("fit is partition-invariant (integer-exact moments)") {
    val m2 = Pca.fit(emb.repartition(7), "embedding", 8)
    assert(m2.mean.sameElements(model.mean))
    assert(m2.eigenvalues.sameElements(model.eigenvalues))
    for (c <- 0 until 8)
      assert(m2.basis(c).sameElements(model.basis(c)))
  }

  test("whitened components have unit variance") {
    val proj = Pca.transform(emb, "embedding", model, whiten = true)
    val comps = proj.select("pca").collect().map(_.getSeq[Double](0).toArray)
    val n = comps.length.toDouble
    for (c <- 0 until model.k) {
      val xs = comps.map(_(c))
      val m = xs.sum / n
      val varc = xs.map(x => (x - m) * (x - m)).sum / n
      assert(math.abs(varc - 1.0) < 1e-6, s"component $c variance $varc")
    }
  }

  test("PCA-space retrieval recovers full-space cosine top-k on low-rank data") {
    import spark.implicits._
    // synthetic rank-4 structure + small noise in 32 dims: the setting
    // PCA-before-ANN exists for. (The driver's fixture embeddings are
    // near-isotropic — flat spectrum — where NO linear projection can
    // preserve neighborhoods, so the property is tested on data that
    // has the structure the operator exploits.)
    val rnd = new scala.util.Random(7)
    val d = 32; val rank = 4; val nRows = 200
    val basis = Array.fill(rank, d)(rnd.nextGaussian())
    val data = (0L until nRows.toLong).map { id =>
      val w = Array.fill(rank)(rnd.nextGaussian() * 3.0)
      val v = Array.tabulate(d) { i =>
        (0 until rank).map(r => w(r) * basis(r)(i)).sum + rnd.nextGaussian() * 0.05
      }
      (id, v.map(_.toFloat).toSeq)
    }
    val df = data.toDF("vec_id", "embedding")
    val m = Pca.fit(df, "embedding", rank)
    val proj = Pca.transform(df, "embedding", m)
    val rows = proj.select("vec_id", "embedding", "pca").collect()
    val full = rows.map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val red = rows.map(r => r.getLong(0) -> r.getSeq[Double](2).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val p = dot(a, b); val na = math.sqrt(dot(a, a)); val nb = math.sqrt(dot(b, b))
      if (na == 0 || nb == 0) 0 else p / (na * nb)
    }
    val ids = full.keys.toSeq.sorted.take(20)
    val recalls = ids.map { q =>
      def topk(space: Map[Long, Array[Double]]) =
        space.keys.filter(_ != q).toSeq
          .sortBy(x => (-cos(space(q), space(x)), x)).take(10).toSet
      topk(full).intersect(topk(red)).size / 10.0
    }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.9, s"avg recall $avg")
    // and the spectrum confirms the rank: top-4 carry ~all variance
    val fullModel = Pca.fit(df, "embedding", d)
    val ev = fullModel.eigenvalues
    assert(ev.take(rank).sum / ev.sum > 0.99)
  }

  test("jacobi solves a known 3x3 exactly") {
    // eigenvalues of [[2,1,0],[1,2,1],[0,1,2]] are 2, 2±sqrt(2)
    val a = Array(
      Array(2.0, 1.0, 0.0),
      Array(1.0, 2.0, 1.0),
      Array(0.0, 1.0, 2.0))
    val (vals, _) = Pca.jacobiEigen(a)
    val expect = Seq(2.0 - math.sqrt(2.0), 2.0, 2.0 + math.sqrt(2.0))
    assert(vals.sorted.zip(expect).forall { case (g, e) => math.abs(g - e) < 1e-12 })
  }
}
