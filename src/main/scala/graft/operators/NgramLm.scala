package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** N-gram language-model fluency scoring — the CCNet-style corpus
  * quality signal: score each document by the average smoothed
  * conditional probability of its word n-grams under a model counted
  * from a reference corpus (usually a trusted subset; KenLM perplexity
  * is the production analog, this is its exact-arithmetic cousin).
  *
  * Probabilities are ADD-ONE smoothed and kept in INTEGER-SCALED form:
  * `score = (scale * (count + 1)) DIV (ctxTotal + V)` — the scaled
  * numerator/denominator are exact DECIMAL(38,0) (no wrap at any real
  * corpus count), the quotient and per-doc aggregation are exact
  * integers, and the final average divides two exactly-representable
  * integers. That makes scores bit-identical
  * across engines (gate-checkable VALUES, like tfidfTopTerms' rational
  * idf), where a log-prob formulation would inherit libm's last-ulp
  * variation.
  *
  * Scale shape (100 TB): training is the gram explode (narrow — the
  * sequence/transform stays inside the row) plus TWO count shuffles
  * keyed by (ctx, tok) and ctx; scoring is two equi-joins on those same
  * keys. Stop-word contexts are Zipf-hot — AQE skew-join handles the
  * imbalance, and a model counted from a bounded reference corpus is
  * broadcast-sized (`broadcastModel = true` forces the hint, the
  * dimension-table pattern).
  */
object NgramLm {

  /** Counted model: `grams` = (ctx, tok, cnt), `ctxTotals` =
    * (ctx, total), plus the smoothing vocabulary size. Plain DataFrames
    * — persist or write them like any other table. */
  case class Model(grams: DataFrame, ctxTotals: DataFrame, vocabSize: Long, n: Int)

  /** explode `(ctx, tok)` word n-grams; ctx = n-1 tokens joined by one
    * space. Narrow — no shuffle. */
  private def gramPairs(df: DataFrame, idCols: Seq[Column], textCol: String, n: Int): DataFrame = {
    val tk = TextFns.tokens(col(textCol))
    val pairs = when(size(col("__tk")) >= n,
      transform(
        sequence(lit(1), size(col("__tk")) - (n - 1)),
        i => struct(
          concat_ws(" ", slice(col("__tk"), i, lit(n - 1))).as("ctx"),
          element_at(col("__tk"), i + (n - 1)).as("tok"))))
      .otherwise(array().cast("array<struct<ctx:string,tok:string>>"))
    df.withColumn("__tk", tk)
      .select(idCols :+ explode(pairs).as("__g"): _*)
      .select(idCols :+ col("__g.ctx") :+ col("__g.tok"): _*)
  }

  /** Count an n-gram model from a reference corpus. Two aggregations
    * (one shuffle each); vocabulary size is one distinct-count action.
    */
  def train(ref: DataFrame, textCol: String, n: Int = 2): Model = {
    require(n >= 2, s"n must be >= 2 (conditional model), got $n")
    val grams = gramPairs(ref, Seq.empty, textCol, n)
      .groupBy("ctx", "tok").agg(count(lit(1)).as("cnt"))
    val ctxTotals = grams.groupBy("ctx").agg(sum("cnt").as("total"))
    val v = ref.select(explode(TextFns.tokens(col(textCol))).as("t"))
      .agg(countDistinct(col("t"))).head().getLong(0)
    Model(grams, ctxTotals, v, n)
  }

  /** Score every document: `(idCol, n_grams, oov_grams, fluency)`.
    * Documents shorter than n tokens keep a row (n_grams = 0, fluency
    * NULL). `fluency` = mean smoothed conditional probability in
    * [0, 1]; `oov_grams` counts grams never seen in the reference.
    *
    * @param broadcastModel hint both model tables as broadcast — use
    *        when the reference corpus is bounded (the common case);
    *        leave false to let AQE decide from runtime sizes
    */
  def scoreDocs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: Model,
      scale: Long = 1000000000L,
      broadcastModel: Boolean = false): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    val g = if (broadcastModel) broadcast(model.grams) else model.grams
    val ct = if (broadcastModel) broadcast(model.ctxTotals) else model.ctxTotals
    val scored = gramPairs(docs, Seq(col(idCol)), textCol, model.n)
      .join(g, Seq("ctx", "tok"), "left")
      .join(ct, Seq("ctx"), "left")
      // DECIMAL(38,0): scale·(cnt+1) reaches ~1e28 before overflow —
      // LongType arithmetic would silently wrap past cnt ≈ 9.2e9,
      // plausible for stop-word bigrams at full corpus scale
      .withColumn("__num",
        lit(scale).cast("decimal(38,0)") * (coalesce(col("cnt"), lit(0L)) + 1L))
      .withColumn("__den",
        (coalesce(col("total"), lit(0L)) + model.vocabSize).cast("decimal(38,0)"))
      .withColumn("__s", expr("CAST(__num DIV __den AS BIGINT)"))
      .withColumn("__oov", when(col("cnt").isNull, 1L).otherwise(0L))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        sum("__oov").as("oov_grams"),
        (sum("__s").cast("double") / count(lit(1)) / scale.toDouble).as("fluency"))
    docs.select(col(idCol)).distinct()
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("oov_grams"), lit(0L)).as("oov_grams"),
        col("fluency"))
  }

  /** Backoff model: `orders(k-1)` holds the k-gram occurrence counts
    * (`gram` = k tokens space-joined, `cnt`); `totalTokens` is the
    * unigram denominator N. */
  case class BackoffModel(orders: Seq[DataFrame], totalTokens: Long, n: Int)

  /** k-gram strings of a text column, narrow explode (rows shorter
    * than k tokens produce none). */
  private def kgrams(df: DataFrame, idCols: Seq[Column], textCol: String, k: Int): DataFrame =
    df.withColumn("__tk", TextFns.tokens(col(textCol)))
      .filter(size(col("__tk")) >= k)
      .select(idCols :+ explode(
        transform(sequence(lit(1), size(col("__tk")) - (k - 1)),
          i => concat_ws(" ", slice(col("__tk"), i, lit(k))))).as("gram"): _*)

  /** Count a stupid-backoff model (Brants et al. 2007, "Large Language
    * Models in Machine Translation"): raw k-gram counts for every order
    * k = 1..n. One count shuffle per order; each is the same
    * (fingerprintable) gram-count shape as [[train]]. */
  def trainBackoff(ref: DataFrame, textCol: String, n: Int = 3): BackoffModel = {
    require(n >= 2, s"n must be >= 2 (conditional model), got $n")
    val orders = (1 to n).map { k =>
      kgrams(ref, Seq.empty, textCol, k).groupBy("gram").agg(count(lit(1)).as("cnt"))
    }
    val r = orders.head.agg(sum("cnt")).head()
    val total = if (r.isNullAt(0)) 0L else r.getLong(0)
    BackoffModel(orders, total, n)
  }

  /** Interpolated Kneser–Ney model (Kneser & Ney 1995; Chen & Goodman
    * 1998's interpolated formulation — the smoothing KenLM ships and
    * CCNet's perplexity filters run on). All tables derive from the raw
    * k-gram counts of [[trainBackoff]]'s shape; every aggregation is
    * over the bounded MODEL tables, not the corpus.
    *
    *  - `top`/`topDen`/`topLam`: raw n-gram counts, their context
    *    totals Σ_w c(ctx·w), and context continuation fan-outs
    *    N1+(ctx·•).
    *  - `mids(k)` for k = n−1..2: continuation counts N1+(•·g_k)
    *    (distinct left extensions in the raw (k+1)-grams), the
    *    mid-level denominators N1+(•·ctx·•), and fan-outs N1+(ctx·•).
    *  - `cont1`/`bigramTypes`: unigram continuation counts N1+(•·w)
    *    and their total B = distinct bigram count.
    */
  case class KnModel(
      top: DataFrame, topDen: DataFrame, topLam: DataFrame,
      mids: Map[Int, (DataFrame, DataFrame, DataFrame)],
      cont1: DataFrame, bigramTypes: Long, n: Int)

  /** Count an interpolated-KN model. Raw k-gram counting is one count
    * shuffle per order (identical shape to [[trainBackoff]]); the
    * continuation/fan-out tables are small aggregations OVER those
    * model tables (split/slice on ≤n-token strings — bounded rows). */
  def trainKneserNey(ref: DataFrame, textCol: String, n: Int = 2): KnModel = {
    require(n >= 2, s"n must be >= 2 (conditional model), got $n")
    val raw: Map[Int, DataFrame] = (2 to n).map { k =>
      k -> kgrams(ref, Seq.empty, textCol, k).groupBy("gram").agg(count(lit(1)).as("cnt"))
    }.toMap
    def part(from: Int, len: Int): Column =
      concat_ws(" ", slice(split(col("gram"), " "), from, len))
    val topDen = raw(n).groupBy(part(1, n - 1).as("ctx"))
      .agg(sum("cnt").as("total"))
    val topLam = raw(n).groupBy(part(1, n - 1).as("ctx"))
      .agg(count(lit(1)).as("types"))
    val mids = (2 until n).map { k =>
      val up = raw(k + 1) // (k+1)-token grams: u · ctx · w
      val numCont = up.groupBy(part(2, k).as("gram"))
        .agg(count(lit(1)).as("types"))
      val denCont = up.groupBy(part(2, k - 1).as("ctx"))
        .agg(count(lit(1)).as("types"))
      val lam = raw(k).groupBy(part(1, k - 1).as("ctx"))
        .agg(count(lit(1)).as("types"))
      k -> ((numCont, denCont, lam))
    }.toMap
    val cont1 = raw(2).groupBy(part(2, 1).as("tok"))
      .agg(count(lit(1)).as("types"))
    val b = raw(2).count()
    KnModel(raw(n), topDen, topLam, mids, cont1, b, n)
  }

  /** Score documents under interpolated Kneser–Ney with absolute
    * discount D = `dNum/dDen` (default 3/4, the textbook value):
    *
    * P_n(w|ctx) = (max(c(ctx·w) − D, 0) + D·N1+(ctx·•)·P_{n−1}) / c(ctx)
    *
    * with continuation counts below the top order and base
    * P_1(w) = N1+(•·w)/B. Every level is ONE exact integer step,
    * `s_k = (scale·max(num·dDen − dNum, 0) + dNum·λ·s_{k−1}) DIV
    * (dDen·den)` in DECIMAL(38,0) — deterministic floor at each level,
    * so fluency values are bit-identical across engines and the whole
    * cascade mirrors into oracle SQL. An unseen context interpolates
    * straight through to the next level (s_k = s_{k−1}), the KN
    * recursion's own base behavior.
    *
    * Output: `(idCol, n_grams, backoff_grams, oov_grams, fluency)` —
    * `backoff_grams` counts windows unseen at full order, `oov_grams`
    * windows whose final token has no continuation count. Scale shape:
    * ~3 broadcastable model joins per order (bounded tables), the
    * per-window arithmetic is narrow and codegen'd.
    */
  def scoreDocsKneserNey(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: KnModel,
      dNum: Long = 3L,
      dDen: Long = 4L,
      scale: Long = 1000000000L,
      broadcastModel: Boolean = true): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    require(dNum > 0 && dDen > dNum,
      s"discount must be a rational in (0,1): $dNum/$dDen")
    val n = model.n
    def tbl(t: DataFrame) = if (broadcastModel) broadcast(t) else t
    val fields =
      (1 to n).map(j =>
        concat_ws(" ", slice(col("__tk"), col("__i") + (n - j), lit(j))).as(s"g$j")) ++
      (2 to n).map(j =>
        concat_ws(" ", slice(col("__tk"), col("__i") + (n - j), lit(j - 1))).as(s"d$j"))
    var cur = docs
      .withColumn("__tk", TextFns.tokens(col(textCol)))
      .filter(size(col("__tk")) >= n)
      .select(col(idCol), col("__tk"),
        explode(sequence(lit(1), size(col("__tk")) - (n - 1))).as("__i"))
      .select(col(idCol) +: fields: _*)
    cur = cur
      .join(tbl(model.top.select(col("gram").as(s"g$n"), col("cnt").as("cN"))),
        Seq(s"g$n"), "left")
      .join(tbl(model.topDen.select(col("ctx").as(s"d$n"), col("total").as("denN"))),
        Seq(s"d$n"), "left")
      .join(tbl(model.topLam.select(col("ctx").as(s"d$n"), col("types").as("lamN"))),
        Seq(s"d$n"), "left")
    for (k <- 2 until n) {
      val (numCont, denCont, lam) = model.mids(k)
      cur = cur
        .join(tbl(numCont.select(col("gram").as(s"g$k"), col("types").as(s"nc$k"))),
          Seq(s"g$k"), "left")
        .join(tbl(denCont.select(col("ctx").as(s"d$k"), col("types").as(s"dc$k"))),
          Seq(s"d$k"), "left")
        .join(tbl(lam.select(col("ctx").as(s"d$k"), col("types").as(s"lm$k"))),
          Seq(s"d$k"), "left")
    }
    cur = cur.join(tbl(model.cont1.select(col("tok").as("g1"), col("types").as("c1t"))),
      Seq("g1"), "left")
    // cascade, bottom-up; every __sk is a DECIMAL(38,0) scaled prob
    cur = cur.withColumn("__s1", expr(
      s"CAST(CAST($scale AS DECIMAL(38,0)) * COALESCE(c1t, 0) DIV ${math.max(model.bigramTypes, 1L)} AS DECIMAL(38,0))"))
    def level(k: Int, num: String, den: String, lam: String): String =
      s"""CASE WHEN $den IS NULL THEN __s${k - 1} ELSE CAST(
         |  (CAST($scale AS DECIMAL(38,0)) * GREATEST(COALESCE($num, 0) * $dDen - $dNum, 0)
         |    + $dNum * COALESCE($lam, 0) * __s${k - 1})
         |  DIV (CAST($dDen AS DECIMAL(38,0)) * $den) AS DECIMAL(38,0)) END""".stripMargin
    for (k <- 2 until n)
      cur = cur.withColumn(s"__s$k", expr(level(k, s"nc$k", s"dc$k", s"lm$k")))
    cur = cur.withColumn(s"__s$n", expr(level(n, "cN", "denN", "lamN")))
    val scored = cur
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("cN").isNull, 1L).otherwise(0L)).as("backoff_grams"),
        sum(when(col("c1t").isNull, 1L).otherwise(0L)).as("oov_grams"),
        (sum(col(s"__s$n")).cast("double") / count(lit(1)) / scale.toDouble).as("fluency"))
    docs.select(col(idCol)).distinct()
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("backoff_grams"), lit(0L)).as("backoff_grams"),
        coalesce(col("oov_grams"), lit(0L)).as("oov_grams"),
        col("fluency"))
  }

  /** Score documents under stupid backoff: for each full-context gram,
    * S = cnt_n/den_n if the n-gram was seen, else α · cnt_{n-1}/den_{n-1},
    * … down to α^{n-1} · cnt_1/N; unseen even as a unigram scores 0.
    * α is the RATIONAL `alphaNum/alphaDen` (default 2/5 = the published
    * 0.4) and every level is computed as one exact integer division
    * `(scale·αnum^k·cnt) DIV (αden^k·den)` in DECIMAL(38,0) — the
    * backoff cascade is a `coalesce` over the per-level exact scores,
    * so results are bit-identical across engines like [[scoreDocs]].
    *
    * Output: `(idCol, n_grams, backoff_grams, oov_grams, fluency)` —
    * `backoff_grams` counts grams that fell below full order,
    * `oov_grams` counts grams whose final token is out-of-vocabulary.
    *
    * Scale shape: 2n−1 equi-joins of the exploded grams against the
    * count tables — all broadcastable when the reference corpus is
    * bounded (default hint on); otherwise AQE shuffles on gram keys
    * with skew handling for stop-word heads.
    */
  def scoreDocsBackoff(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: BackoffModel,
      alphaNum: Long = 2L,
      alphaDen: Long = 5L,
      scale: Long = 1000000000L,
      broadcastModel: Boolean = true): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    require(alphaNum > 0 && alphaDen > alphaNum,
      s"alpha must be a rational in (0,1): $alphaNum/$alphaDen")
    val n = model.n
    def tbl(k: Int) = {
      val t = model.orders(k - 1)
      if (broadcastModel) broadcast(t) else t
    }
    // one struct per gram window: g_j = last j tokens (numerator key),
    // d_j = context of g_j (denominator key), j = n..2; g_1 = the token
    val fields =
      (1 to n).map(j =>
        concat_ws(" ", slice(col("__tk"), col("__i") + (n - j), lit(j))).as(s"g$j")) ++
      (2 to n).map(j =>
        concat_ws(" ", slice(col("__tk"), col("__i") + (n - j), lit(j - 1))).as(s"d$j"))
    var cur = docs
      .withColumn("__tk", TextFns.tokens(col(textCol)))
      .filter(size(col("__tk")) >= n)
      .select(col(idCol), col("__tk"),
        explode(sequence(lit(1), size(col("__tk")) - (n - 1))).as("__i"))
      .select(col(idCol) +: fields: _*)
    for (j <- 1 to n)
      cur = cur.join(tbl(j).select(col("gram").as(s"g$j"), col("cnt").as(s"c$j")),
        Seq(s"g$j"), "left")
    for (j <- 2 to n)
      cur = cur.join(tbl(j - 1).select(col("gram").as(s"d$j"), col("cnt").as(s"dn$j")),
        Seq(s"d$j"), "left")
    def pw(b: Long, k: Int): Long = (0 until k).foldLeft(1L)((a, _) => a * b)
    for (j <- n to 1 by -1) {
      val k = n - j
      val den = if (j == 1) lit(model.totalTokens) else col(s"dn$j")
      cur = cur
        .withColumn(s"__num$j",
          lit(scale).cast("decimal(38,0)") * lit(pw(alphaNum, k)) * col(s"c$j"))
        .withColumn(s"__den$j", lit(pw(alphaDen, k)).cast("decimal(38,0)") * den)
        .withColumn(s"__s$j", expr(s"CAST(__num$j DIV __den$j AS BIGINT)"))
    }
    val scored = cur
      .withColumn("__s",
        coalesce((n to 1 by -1).map(j => col(s"__s$j")) :+ lit(0L): _*))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col(s"__s$n").isNull, 1L).otherwise(0L)).as("backoff_grams"),
        sum(when(col("__s1").isNull, 1L).otherwise(0L)).as("oov_grams"),
        (sum("__s").cast("double") / count(lit(1)) / scale.toDouble).as("fluency"))
    docs.select(col(idCol)).distinct()
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("backoff_grams"), lit(0L)).as("backoff_grams"),
        coalesce(col("oov_grams"), lit(0L)).as("oov_grams"),
        col("fluency"))
  }

  // ---- persistence (train once on the bounded reference corpus, ----
  // ---- reuse across the 100 TB scoring jobs) -----------------------

  private def writeMeta(spark: SparkSession, path: String, json: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, "_graft_lm_meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readMeta(spark: SparkSession, path: String,
      format: String): com.fasterxml.jackson.databind.JsonNode = {
    val p = new org.apache.hadoop.fs.Path(path, "_graft_lm_meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val bytes = try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(bytes)
    require(node.path("format").asText() == format,
      s"$path is not a $format model (format=${node.path("format").asText()})")
    node
  }

  /** model tables as parquet + one meta JSON — any fs:// the cluster
    * sees; scoring after [[load]] is plan-identical (same broadcastable
    * dimension-table joins) */
  def save(model: Model, path: String): Unit = {
    val spark = model.grams.sparkSession
    model.grams.write.mode("overwrite").parquet(s"$path/grams")
    model.ctxTotals.write.mode("overwrite").parquet(s"$path/ctx_totals")
    writeMeta(spark, path,
      s"""{"format":"graft-ngram-lm-v1","n":${model.n},"vocabSize":${model.vocabSize}}""")
  }

  def load(spark: SparkSession, path: String): Model = {
    val meta = readMeta(spark, path, "graft-ngram-lm-v1")
    Model(spark.read.parquet(s"$path/grams"),
      spark.read.parquet(s"$path/ctx_totals"),
      meta.get("vocabSize").asLong(), meta.get("n").asInt())
  }

  def saveBackoff(model: BackoffModel, path: String): Unit = {
    val spark = model.orders.head.sparkSession
    model.orders.zipWithIndex.foreach { case (df, i) =>
      df.write.mode("overwrite").parquet(s"$path/order_${i + 1}")
    }
    writeMeta(spark, path,
      s"""{"format":"graft-backoff-lm-v1","n":${model.n},"totalTokens":${model.totalTokens}}""")
  }

  def loadBackoff(spark: SparkSession, path: String): BackoffModel = {
    val meta = readMeta(spark, path, "graft-backoff-lm-v1")
    val n = meta.get("n").asInt()
    BackoffModel((1 to n).map(k => spark.read.parquet(s"$path/order_$k")),
      meta.get("totalTokens").asLong(), n)
  }

  def saveKneserNey(model: KnModel, path: String): Unit = {
    val spark = model.top.sparkSession
    model.top.write.mode("overwrite").parquet(s"$path/top")
    model.topDen.write.mode("overwrite").parquet(s"$path/top_den")
    model.topLam.write.mode("overwrite").parquet(s"$path/top_lam")
    model.mids.foreach { case (k, (num, den, lam)) =>
      num.write.mode("overwrite").parquet(s"$path/mid_${k}_num")
      den.write.mode("overwrite").parquet(s"$path/mid_${k}_den")
      lam.write.mode("overwrite").parquet(s"$path/mid_${k}_lam")
    }
    model.cont1.write.mode("overwrite").parquet(s"$path/cont1")
    writeMeta(spark, path,
      s"""{"format":"graft-kn-lm-v1","n":${model.n},"bigramTypes":${model.bigramTypes},""" +
        s""""midKs":[${model.mids.keys.toSeq.sorted.mkString(",")}]}""")
  }

  def loadKneserNey(spark: SparkSession, path: String): KnModel = {
    val meta = readMeta(spark, path, "graft-kn-lm-v1")
    import scala.jdk.CollectionConverters._
    val mids = meta.get("midKs").elements().asScala.map(_.asInt()).map { k =>
      k -> ((spark.read.parquet(s"$path/mid_${k}_num"),
        spark.read.parquet(s"$path/mid_${k}_den"),
        spark.read.parquet(s"$path/mid_${k}_lam")))
    }.toMap
    KnModel(spark.read.parquet(s"$path/top"),
      spark.read.parquet(s"$path/top_den"),
      spark.read.parquet(s"$path/top_lam"),
      mids,
      spark.read.parquet(s"$path/cont1"),
      meta.get("bigramTypes").asLong(), meta.get("n").asInt())
  }
}
