package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou 2011) — the IVF-PQ memory path for
  * 100 TB ANN serving: a d-dim float vector (256 bytes at d=64) becomes
  * `m` one-byte centroid codes (8 bytes at m=8), a 32× compression
  * that lets a shard hold its whole index in RAM; queries score codes
  * with an asymmetric-distance (ADC) lookup table and only re-rank a
  * short candidate list with exact math. Composes with
  * [[Similarity.ivfIndex]] (coarse cells) exactly as FAISS does.
  *
  * All geometry runs on the 1e-7 fixed-point grid [[Pca]] established:
  * components quantize with one IEEE multiply + one half-away-from-zero
  * round (cross-engine exact), and from there every distance is BIGINT
  * arithmetic — encode, ADC tables and scores are bit-identical across
  * engines/partitionings, which makes the encode+ADC path hash-gateable.
  *
  * Scale shape:
  *  - TRAINING (`train`): per Lloyd iteration one narrow assignment
  *    pass + one (subspace, code, dim)-keyed aggregation whose group
  *    count is m·k·subDim (bounded, e.g. 1 024) — the shuffle carries
  *    O(tasks × groups) partial DECIMAL sums, never the vectors; the
  *    m·k centroid table is a driver-side object like IVF centroids.
  *    Sums are DECIMAL(38,0)-exact → the model is partition-invariant.
  *  - ENCODE: fully narrow per-row column expression (nested
  *    higher-order folds over literal codebooks — CodegenFallback, but
  *    zero shuffle and no UDF; m·k·subDim ops/row).
  *  - ADC: the m×k distance table is computed driver-side from the
  *    query and shipped as a LITERAL — scoring is one narrow
  *    aggregate-HOF over the code array, top-k is TakeOrdered.
  */
object Pq {

  /** fixed-point grid shared with [[Pca]]: 1e-7 of a unit-scale float */
  private val Scale = 1e7

  /** Codebooks in grid units: `codebooks(s)(c)(j)` = component j of
    * centroid c of subspace s. */
  final case class PqModel(
      m: Int,
      k: Int,
      subDim: Int,
      codebooks: Array[Array[Array[Long]]]) {
    def d: Int = m * subDim
    override def toString: String = s"PqModel(m=$m, k=$k, subDim=$subDim)"
  }

  private def dimOf(df: DataFrame, embCol: String): Int =
    df.select(size(col(embCol))).first().getInt(0)

  /** grid-quantized component i (0-based) of the embedding */
  private def gq(v: Column, i: Column): Column =
    round(element_at(v, i + 1).cast("double") * lit(Scale)).cast("long")

  /** Train `m` codebooks of `k` centroids each with `iters` Lloyd
    * rounds. Deterministic end to end: init picks each subspace's k
    * seed centroids by md5 order over the DISTINCT quantized
    * subvectors (a value property — partition-invariant), assignment
    * ties go to the lowest code, and means are floor divisions of
    * exact DECIMAL sums. Empty clusters keep their previous centroid. */
  def train(
      df: DataFrame,
      embCol: String,
      m: Int,
      k: Int,
      iters: Int = 5,
      dim: Int = -1): PqModel = {
    require(m >= 1 && k >= 2 && iters >= 1, s"bad PQ params m=$m k=$k iters=$iters")
    val d = if (dim > 0) dim else dimOf(df, embCol)
    require(d % m == 0, s"dim $d not divisible by m=$m subspaces")
    val subDim = d / m

    // (s, subvec) rows, quantized — the only distributed shape training
    // ever touches; persist: read once per iteration + once for init
    val sub = df.select(col(embCol).as("__v"))
      .select(explode(sequence(lit(0), lit(m - 1))).as("s"), col("__v"))
      .select(col("s"),
        transform(sequence(lit(0), lit(subDim - 1)),
          j => gq(col("__v"), col("s") * subDim + j)).as("q"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // deterministic seeds: k distinct subvectors per subspace in md5
    // order of their rendered form (bounded collect: m·k rows)
    val seedRows = sub.distinct()
      .withColumn("__h", md5(concat_ws(",", col("s"), concat_ws(",", col("q")))))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("s").orderBy("__h")))
      .filter(col("__rn") <= k)
      .select("s", "__rn", "q")
      .collect()
    val books = Array.ofDim[Array[Long]](m, k)
    seedRows.foreach { r =>
      books(r.getInt(0))(r.getInt(1) - 1) = r.getSeq[Long](2).toArray
    }
    for (s <- 0 until m; c <- 0 until k)
      require(books(s)(c) != null,
        s"PQ train: subspace $s has fewer than $k distinct subvectors — lower k")

    var it = 0
    while (it < iters) {
      val cbLit = codebookLit(PqModel(m, k, subDim, books))
      // assignment (narrow) → per-(s, code, j) exact component sums
      val assigned = sub.withColumn("__c",
        argminCode(element_at(cbLit, col("s") + 1), col("q"), k))
      val stats = assigned
        .select(col("s"), col("__c"),
          explode(sequence(lit(0), lit(subDim - 1))).as("j"), col("q"))
        .groupBy("s", "__c", "j")
        .agg(
          sum(element_at(col("q"), col("j") + 1).cast("decimal(38,0)")).as("sx"),
          count(lit(1)).as("n"))
        .collect()
      val next = Array.tabulate(m, k)((s, c) => books(s)(c).clone())
      stats.foreach { r =>
        val (s, c, j) = (r.getInt(0), r.getInt(1), r.getInt(2))
        val sx = r.getDecimal(3)
        val n = r.getLong(4)
        // floor division of exact integers (BigDecimal scale 0)
        next(s)(c)(j) = sx.toBigInteger
          .divide(java.math.BigInteger.valueOf(n)).longValueExact()
      }
      for (s <- 0 until m; c <- 0 until k) books(s)(c) = next(s)(c)
      it += 1
    }
    sub.unpersist()
    PqModel(m, k, subDim, books)
  }

  /** nested literal: array(subspace -> array(code -> array(dim -> grid))) */
  private def codebookLit(model: PqModel): Column =
    array(model.codebooks.map(book =>
      array(book.map(cent => array(cent.map(lit): _*)): _*)): _*)

  /** exact BIGINT squared distance between a quantized subvector and a
    * centroid (both array<long> of subDim) */
  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  /** fold over codes 1..k-1 keeping the strictly-smaller distance —
    * ties resolve to the LOWEST code on both engines */
  private def argminCode(book: Column, q: Column, k: Int): Column = {
    val init = struct(lit(0).as("c"), sqDist(element_at(book, 1), q).as("dist"))
    val folded = aggregate(
      sequence(lit(1), lit(k - 1)),
      init,
      (acc, c) => {
        val dc = sqDist(element_at(book, c + 1), q)
        when(dc < acc.getField("dist"), struct(c.cast("int").as("c"), dc.as("dist")))
          .otherwise(acc)
      })
    folded.getField("c")
  }

  /** Append `codes` (array<int>, length m) — the PQ compression of the
    * embedding. Fully narrow, via the native codegen'd
    * [[graft.plans.PqEncode]] kernel (the HOF formulation below is
    * m·k·subDim CodegenFallback evaluations per row — the round-10
    * full-evaluation bench priced that ~50× slower; PqSpec asserts the
    * two paths agree code-for-code). */
  def encode(df: DataFrame, embCol: String, model: PqModel): DataFrame = {
    import org.apache.spark.sql.graftshim.GraftShim
    df.withColumn("codes", GraftShim.column(graft.plans.PqEncode(
      GraftShim.expression(col(embCol)), model.subDim, model.codebooks)))
  }

  /** the composable higher-order-function formulation — kept as the
    * reference implementation the kernel must agree with (the
    * dotHof/cosineHof pattern) */
  private[graft] def encodeHof(df: DataFrame, embCol: String, model: PqModel): DataFrame = {
    val cb = codebookLit(model)
    val codes = transform(sequence(lit(0), lit(model.m - 1)), s => {
      val q = transform(sequence(lit(0), lit(model.subDim - 1)),
        j => gq(col(embCol), s * model.subDim + j))
      argminCode(element_at(cb, s + 1), q, model.k)
    })
    df.withColumn("codes", codes)
  }

  /** Reconstruction (centroid concat) in original float units — the
    * decode side of the 32× compression, for re-ranking or drift
    * checks. */
  def decode(df: DataFrame, codesCol: String, model: PqModel): DataFrame = {
    val cb = codebookLit(model)
    df.withColumn("decoded",
      flatten(transform(sequence(lit(0), lit(model.m - 1)), s =>
        transform(
          element_at(element_at(cb, s + 1), element_at(col(codesCol), s + 1) + 1),
          g => g.cast("double") / lit(Scale)))))
  }

  /** exact ADC table for a query: table(s)(c) = BIGINT squared grid
    * distance from the query's subvector s to centroid c */
  private[graft] def adcTable(query: Seq[Float], model: PqModel): Array[Array[Long]] = {
    require(query.length == model.d,
      s"query dim ${query.length} != model dim ${model.d}")
    val q = query.map(x => math.round(x.toDouble * Scale)).toArray
    Array.tabulate(model.m, model.k) { (s, c) =>
      var acc = 0L
      var j = 0
      while (j < model.subDim) {
        val dj = q(s * model.subDim + j) - model.codebooks(s)(c)(j)
        acc += dj * dj
        j += 1
      }
      acc
    }
  }

  /** Asymmetric-distance top-k: score every code row against `query`
    * through the m×k lookup table (shipped as a literal — no join, no
    * shuffle), ascending exact BIGINT distance, ties by id. This is the
    * serving path: the float column is never touched. */
  def adcTopK(
      df: DataFrame,
      idCol: String,
      codesCol: String,
      query: Seq[Float],
      model: PqModel,
      kTop: Int): DataFrame =
    adcScore(df, codesCol, query, model)
      .select(col(idCol), col("adc_dist"))
      .orderBy(col("adc_dist"), col(idCol))
      .limit(kTop)

  /** ADC distance column for every row (no truncation) — the building
    * block `adcTopK` ranks on. */
  def adcScore(
      df: DataFrame,
      codesCol: String,
      query: Seq[Float],
      model: PqModel): DataFrame = {
    val table = adcTable(query, model)
    val tableLit = array(table.map(row => array(row.map(lit): _*)): _*)
    df.withColumn("adc_dist",
      aggregate(
        zip_with(sequence(lit(0), lit(model.m - 1)), col(codesCol),
          (s, c) => element_at(element_at(tableLit, s + 1), c + 1)),
        lit(0L), (acc, v) => acc + v))
  }

  /** IVF-PQ index: coarse KMeans cells ([[Similarity.ivfIndex]]) over
    * PQ codes — the full FAISS-style serving layout. A probe touches
    * `nprobe/kCells` of the corpus (cell partition pruning when saved
    * with [[saveIvfPq]]) and scores CODES, never floats: memory and
    * I/O both collapse. Codes are of the RAW vectors (not cell
    * residuals — the FastScan-style simplification; exactness of the
    * gate arithmetic and cross-engine parity matter more here than the
    * last few % of recall residual coding buys). */
  def ivfPqIndex(
      df: DataFrame,
      idCol: String,
      embCol: String,
      kCells: Int,
      model: PqModel,
      seed: Long = 42L): (Similarity.IvfIndex, DataFrame) = {
    val ivf = Similarity.ivfIndex(df, embCol, kCells, seed)
    val coded = encode(ivf.indexed, embCol, model)
      .select(col(idCol), col("cell"), col("codes"))
    (ivf, coded)
  }

  /** Write the coded index partitioned BY CELL plus the PQ model —
    * a probing read prunes to the probed cells' partitions. */
  def saveIvfPq(
      ivf: Similarity.IvfIndex,
      coded: DataFrame,
      model: PqModel,
      path: String): Unit = {
    coded.write.mode("overwrite").partitionBy("cell").parquet(s"$path/data")
    val spark = coded.sparkSession
    import spark.implicits._
    ivf.centers.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell_id", "center")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centers")
    save(model, s"$path/pq", spark)
  }

  /** ADC top-k over the probed cells only: nearest `nprobe` cells are
    * picked driver-side from the bounded center table (same as
    * [[Similarity.ivfTopK]]); the scan prunes to those cells, then the
    * narrow lookup-table scoring ranks codes. */
  def ivfPqTopK(
      centers: Array[Array[Double]],
      coded: DataFrame,
      model: PqModel,
      query: Seq[Float],
      kTop: Int,
      nprobe: Int,
      idCol: String = "vec_id"): DataFrame = {
    val qd = query.map(_.toDouble).toArray
    val cells = centers.zipWithIndex
      .map { case (c, i) =>
        (i, c.zip(qd).map { case (a, b) => (a - b) * (a - b) }.sum)
      }
      .sortBy(_._2).take(nprobe).map(_._1)
    adcTopK(coded.filter(col("cell").isin(cells: _*)),
      idCol, "codes", query, model, kTop)
  }

  /** Persist a model as two small parquet tables (meta + one row per
    * (s, c) centroid) — the same bounded-artifact layout as
    * [[Similarity.saveIvfIndex]] and Bpe's merges table. */
  def save(model: PqModel, path: String, spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    Seq((model.m, model.k, model.subDim)).toDF("m", "k", "sub_dim")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    (for (s <- 0 until model.m; c <- 0 until model.k)
      yield (s, c, model.codebooks(s)(c).toSeq))
      .toDF("s", "c", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): PqModel = {
    val meta = spark.read.parquet(s"$path/meta").first()
    val (m, k, subDim) = (meta.getInt(0), meta.getInt(1), meta.getInt(2))
    val books = Array.ofDim[Array[Long]](m, k)
    spark.read.parquet(s"$path/codebooks").collect().foreach { r =>
      books(r.getInt(0))(r.getInt(1)) = r.getSeq[Long](2).toArray
    }
    PqModel(m, k, subDim, books)
  }
}
