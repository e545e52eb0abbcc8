package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column (`Array[Float]`) — the
  * dimensionality-reduction step a 100 TB pipeline runs BEFORE ANN
  * indexing / semantic dedup (64→16 dims cuts index memory 4× and
  * tightens LSH bucket quality on anisotropic embeddings).
  *
  * Scale shape (the part that must survive 1000 executors):
  *  - the ONLY distributed work is one pass computing the d×d second-
  *    moment matrix: a narrow double-explode to (i, j≥i) pairs whose
  *    hash aggregation partially combines map-side, so the shuffle
  *    carries O(tasks × d²) partial sums — NOT O(rows × d²); for
  *    d=64 that is 2 080 cells per task regardless of corpus size.
  *  - moments are summed in DECIMAL(38,16): exact, order-independent
  *    (partition-invariant results, and an external engine reproduces
  *    them bit-for-bit — the covariance gate hash-matches DuckDB).
  *  - the d×d eigensolve runs on the DRIVER on the 2 080 collected
  *    cells (bounded, like the IVF centroid step) via cyclic Jacobi —
  *    deterministic: fixed sweep order, fixed tolerance, sign-
  *    canonicalized eigenvectors.
  *  - projection is a narrow per-row expression (k dot products via
  *    higher-order functions, codegen'd, no shuffle, no UDF).
  */
object Pca {

  /** dimensionality of the embedding column (one-row driver lookup,
    * same bounded pattern as BPE's vocab fetch) */
  private def dimOf(df: DataFrame, embCol: String): Int =
    df.select(size(col(embCol))).first().getInt(0)

  /** fixed-point quantization grid: 1e-7 ≈ a unit-scale float's own
    * relative precision, so no PCA-visible information is lost */
  private val Scale = 1e7
  private val Scale2 = 1e14

  /** Upper-triangle exact second moments over 1e-7 fixed-point
    * quantized components: one row per (i, j≥i) with n, Σxᵢ, Σxⱼ,
    * Σxᵢxⱼ as DECIMAL(38,0) integer sums.
    *
    * Why quantize instead of summing DECIMAL-cast doubles: a float
    * product is an arbitrary binary double, and DuckDB's
    * double→DECIMAL(38,16) cast double-rounds (×10¹⁶ in binary, then
    * round) where the JVM quantizes exactly — last-ulp divergence.
    * `round(x·10⁷)` is ONE IEEE multiply + one half-away-from-zero
    * round of the same binary double on both engines (the recipe
    * q_embed_quant already proved), and from there every moment is
    * integer-exact and its DECIMAL(38,0)→DOUBLE cast is a single
    * correctly-rounded int→double on both engines.
    *
    * Long-range: per-element products stay in Long for |x| < 3e5 —
    * far beyond any normalized embedding. */
  def secondMoments(df: DataFrame, embCol: String, dim: Int = -1): DataFrame = {
    val d = if (dim > 0) dim else dimOf(df, embCol)
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    def at(v: Column, i: Column): Column =
      round(element_at(v, i + 1).cast("double") * lit(Scale)).cast("long")
    df.select(col(embCol).as("__v"))
      .select(explode(sequence(lit(0), lit(d - 1))).as("i"), col("__v"))
      .select(col("i"), explode(sequence(col("i"), lit(d - 1))).as("j"), col("__v"))
      .groupBy(col("i").cast("long").as("i"), col("j").cast("long").as("j"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec(at(col("__v"), col("i")))).as("sx"),
        sum(dec(at(col("__v"), col("j")))).as("sy"),
        sum(dec(at(col("__v"), col("i")) * at(col("__v"), col("j")))).as("sxy"))
  }

  /** Upper-triangle population covariance (of the quantized grid,
    * rescaled to original units): cov(i,j) = ((Σxy − ΣxΣy/n)/n)/10¹⁴
    * with the three sums integer-exact and the final formula a fixed
    * IEEE sequence — deterministic and externally reproducible. */
  def covarianceUpper(df: DataFrame, embCol: String, dim: Int = -1): DataFrame =
    secondMoments(df, embCol, dim)
      .select(col("i"), col("j"),
        ((col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double") / col("n")) / col("n") /
          lit(Scale2))
          .as("cov"))

  /** PCA model: per-dimension mean, eigenvalues (descending), and the
    * top-k row-major principal axes (each of length d). */
  final case class PcaModel(
      mean: Array[Double],
      eigenvalues: Array[Double],
      basis: Array[Array[Double]]) {
    def k: Int = basis.length
    def d: Int = mean.length
  }

  /** Fit: one distributed moment pass (see scaladoc above), then a
    * driver-side cyclic-Jacobi eigensolve of the d×d covariance.
    * Deterministic end-to-end: exact moments + fixed sweep order +
    * sign canonicalization (largest-|component| made positive). */
  def fit(df: DataFrame, embCol: String, k: Int): PcaModel = {
    val rows = secondMoments(df, embCol).collect() // bounded: d(d+1)/2 cells
    require(rows.nonEmpty, "fit: empty input")
    val d = rows.iterator.map(_.getLong(1)).max.toInt + 1
    require(k >= 1 && k <= d, s"fit: k=$k out of range 1..$d")
    val n = rows.head.getLong(2).toDouble
    val sx = new Array[Double](d)
    val a = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      val i = r.getLong(0).toInt; val j = r.getLong(1).toInt
      val sxi = r.getDecimal(3).doubleValue
      val syj = r.getDecimal(4).doubleValue
      val sxy = r.getDecimal(5).doubleValue
      if (i == j) sx(i) = sxi
      val cov = (sxy - sxi * syj / n) / n / Scale2
      a(i)(j) = cov; a(j)(i) = cov
    }
    val mean = sx.map(_ / n / Scale)
    val (values, vectors) = jacobiEigen(a)
    val order = values.indices.sortBy(i => -values(i)).take(k)
    val basis = order.map { c =>
      val v = vectors.map(_(c))
      // sign canonicalization: flip so the largest-|x| component is >0
      val m = v.indices.maxBy(i => math.abs(v(i)))
      if (v(m) < 0) v.map(x => -x) else v
    }.toArray
    PcaModel(mean, order.map(values).toArray, basis)
  }

  /** Project rows onto the model's axes: `outCol` = array of k doubles,
    * component c = (x − mean)·basis(c). Pure narrow column expression.
    * `whiten = true` divides each component by √λ (unit variance per
    * axis — the right space for cosine/euclidean dedup after PCA);
    * near-zero eigenvalues are floored at 1e-12·λ₀ so a degenerate
    * trailing axis can't blow up to ±∞. */
  def transform(
      df: DataFrame, embCol: String, model: PcaModel,
      outCol: String = "pca", whiten: Boolean = false): DataFrame = {
    def lits(xs: Array[Double]): Column = array(xs.map(lit): _*)
    val centered = zip_with(col(embCol), lits(model.mean),
      (x, m) => x.cast("double") - m)
    val floor = 1e-12 * math.max(model.eigenvalues.headOption.getOrElse(1.0), 1e-300)
    val comps = model.basis.zipWithIndex.map { case (axis, c) =>
      val proj = aggregate(
        zip_with(centered, lits(axis), (x, v) => x * v),
        lit(0.0), (acc, t) => acc + t)
      if (whiten) proj / lit(math.sqrt(math.max(model.eigenvalues(c), floor)))
      else proj
    }
    df.withColumn(outCol, array(comps: _*))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector matrix with vectors in COLUMNS).
    * Deterministic fixed (p,q) sweep order; converges quadratically —
    * 30 sweeps is far beyond what d≤512 needs (off-diagonal norm is
    * checked each sweep and the loop exits early). Driver-side by
    * design: the input is d×d (covariance), never data-sized. */
  private[graft] def jacobiEigen(
      aIn: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = aIn.length
    val a = aIn.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offNorm(a)
    val tol = 1e-14 * math.max(1.0, frobNorm(a))
    while (sweep < 30 && off > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > tol / (d.toDouble * d)) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s   => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < d) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offNorm(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }
  private def frobNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }
}
