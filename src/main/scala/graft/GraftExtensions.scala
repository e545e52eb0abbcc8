package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}

/** SQL surface for graft's native Catalyst kernels.
  *
  * Two ways in:
  *  - production config: `spark.sql.extensions=graft.GraftExtensions`
  *    — the standard [[SparkSessionExtensions]] injection point, so the
  *    functions exist in every session of the application (works from
  *    pure SQL, JDBC gateways, etc.);
  *  - an existing session: `GraftExtensions.register(spark)`.
  *
  * The expressions themselves are the library's single source of truth
  * (the graft.plans package — the same objects the Column API builds),
  * so SQL callers get byte-identical semantics to the verb surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
    GraftExtensions.tableFunctions.foreach { case (name, builder) =>
      ext.injectTableFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
    // nested-loop range joins → banded equi-joins (opt-in via
    // spark.graft.rangeJoin.bandWidth; no-op otherwise)
    ext.injectOptimizerRule(_ => plans.RangeJoinRule)
    // aggregations over registered Delta corpora served from their
    // incrementally-maintained rollups (opt-in via
    // RollupRewriteRule.register; no-op otherwise)
    ext.injectOptimizerRule(_ => plans.RollupRewriteRule)
    // bare global count/min/max over registered lakehouse tables
    // answered from Delta stats / Iceberg manifests with zero data
    // files read (opt-in via MetaAggRewriteRule.register; no-op
    // otherwise)
    ext.injectOptimizerRule(_ => plans.MetaAggRewriteRule)
  }
}

object GraftExtensions {

  /** literal-int argument (band counts, shingle sizes must be plan-time
    * constants — they shape the expression tree) */
  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got ${other.sql}")
  }

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_similarity" -> (e => plans.CosineSimilarity(e(0), e(1))),
    "dot_product" -> (e => plans.DotProduct(e(0), e(1))),
    "hashed_word_shingles" ->
      (e => plans.HashedWordShingles(e(0), litInt(e(1), "shingle size k"))),
    "simhash64" -> (e => plans.SimHash64(
      e(0),
      if (e.length > 1) litInt(e(1), "numBits") else 64,
      portable = e.length > 2 && e(2).eval(null) == true)),
    "decode_image_features" -> (e => plans.DecodeImageFeatures(e(0))),
    "decode_audio_features" -> (e => plans.DecodeAudioFeatures(e(0))),
    "decode_video_features" -> (e => plans.DecodeVideoFeatures(
      e(0), if (e.length > 1) litInt(e(1), "frameStride") else 1)),
    "word_shingles" ->
      (e => plans.WordShingles(e(0), litInt(e(1), "shingle size k"))),
    "frequent_terms" ->
      (e => plans.FrequentTerms(e(0), litInt(e(1), "sketch size k"))),
    "unicode_normalize" -> (e => plans.UnicodeNormalize(
      e(0),
      e.lift(1) match {
        case Some(Literal(v: org.apache.spark.unsafe.types.UTF8String, StringType)) =>
          v.toString.toUpperCase
        case None => "NFC"
        case Some(other) => throw new IllegalArgumentException(
          s"normalization form must be a string literal, got ${other.sql}")
      })),
    "fix_mojibake" -> (e => plans.FixMojibake(e(0))),
    "audio_fingerprint" -> (e => plans.AudioFingerprint(e(0))),
    "video_frame_hashes" -> (e => plans.VideoFrameHashes(
      e(0),
      e.lift(1) match {
        case Some(Literal(v: org.apache.spark.unsafe.types.UTF8String, StringType)) =>
          v.toString.toLowerCase(java.util.Locale.ROOT)
        case None => "ahash"
        case Some(other) => throw new IllegalArgumentException(
          s"hash kind must be a string literal ('ahash'|'dhash'), got ${other.sql}")
      },
      if (e.length > 2) litInt(e(2), "frameStride") else 1)),
    "perceptual_image_hash" -> (e => plans.PerceptualImageHash(
      e(0),
      e.lift(1) match {
        case Some(Literal(v: org.apache.spark.unsafe.types.UTF8String, StringType)) =>
          v.toString.toLowerCase(java.util.Locale.ROOT)
        case None => "ahash"
        case Some(other) => throw new IllegalArgumentException(
          s"hash kind must be a string literal ('ahash'|'dhash'), got ${other.sql}")
      })),
    "decode_html_entities" -> (e => plans.DecodeHtmlEntities(e(0))),
    "parse_warc" -> (e => plans.WarcParse(e(0))),
    // real-model language id under the BUILT-IN seed model (for a
    // custom-trained model use LangId.predict with your NbModel)
    "langid" -> (e => {
      val m = builtinLangModel
      plans.CharNgramNbScore(e(0), m.n, m.nBuckets, m.seed,
        m.langs, m.priorsMicro, m.weightsMicro)
    }),
    "char_ngram_buckets" -> (e => plans.CharNgramBuckets(
      e(0), litInt(e(1), "n"), litInt(e(2), "nBuckets"),
      e.lift(3) match {
        case Some(Literal(v: org.apache.spark.unsafe.types.UTF8String, StringType)) =>
          v.toString
        case None => "lid"
        case Some(other) => throw new IllegalArgumentException(
          s"seed must be a string literal, got ${other.sql}")
      })))

  /** trained once per JVM from the in-tree seed corpus (LangIdSpec pins
    * the training as deterministic, so this is a constant) */
  private lazy val builtinLangModel: operators.LangId.NbModel =
    operators.LangId.trainRef(operators.LangSeedCorpus.train)

  // ---- TABLE functions — the reference's SQL scan surface ---------------
  // (TidierDB emits `FROM delta_scan('p')` / `iceberg_scan('p', ...)` /
  // `read_parquet('p')` / `read_csv([...])` for its DuckDB backend,
  // src/TidierDB.jl:164-262; these make the same SQL text run here)

  /** literal string args of a TVF call; CreateArray of literals (the
    * reference's `read_parquet(['a','b'])` list form) flattens. Extra
    * NON-STRING arguments (positional literals, `opt => v` named args)
    * are tolerated and ignored. DuckDB's `opt = true` option spelling
    * cannot reach this builder at all: Spark's analyzer rejects it as
    * an unresolved column reference first — path-only calls (what the
    * reference emits for delta_scan/read_parquet) run verbatim, and
    * iceberg_scan's `allow_moved_paths` needs dropping or respelling. */
  private def pathArgs(args: Seq[Expression], fn: String): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.CreateArray
    val out = args.flatMap {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) =>
        Seq(s.toString)
      case CreateArray(children, _) => children.map {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) => s.toString
        case other => throw new IllegalArgumentException(
          s"$fn: array elements must be string literals, got ${other.sql}")
      }
      case _ => Seq.empty // tolerated option argument (ignored)
    }
    require(out.nonEmpty, s"$fn needs at least one string-literal path")
    out
  }

  /** exactly-one-path surface for the single-table scans — silently
    * reading only the first of several paths would be a wrong answer */
  private def onePath(args: Seq[Expression], fn: String): String = {
    val ps = pathArgs(args, fn)
    require(ps.size == 1,
      s"$fn reads ONE table path, got ${ps.size} (${ps.mkString(", ")})")
    ps.head
  }

  private def planOf(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.logical

  val tableFunctions: Seq[(String,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = Seq(
    "read_parquet" -> (args =>
      planOf(SparkSession.active.read.parquet(pathArgs(args, "read_parquet"): _*))),
    "read_csv" -> (args =>
      planOf(SparkSession.active.read
        .option("header", "true").option("inferSchema", "true")
        .csv(pathArgs(args, "read_csv"): _*))),
    "read_json" -> (args =>
      planOf(SparkSession.active.read.json(pathArgs(args, "read_json"): _*))),
    "delta_scan" -> (args =>
      planOf(sources.DeltaScan.read(
        SparkSession.active, onePath(args, "delta_scan")))),
    "iceberg_scan" -> (args =>
      planOf(sources.IcebergScan.read(
        SparkSession.active, onePath(args, "iceberg_scan")))),
    "warc_scan" -> (args =>
      planOf(sources.WarcScan.readWarc(
        SparkSession.active, onePath(args, "warc_scan")))),
    // external database: jdbc_scan('jdbc:...', 'table-or-sql'[,
    // 'partitionColumn', lower, upper, numPartitions]) — the SQL twin
    // of Tidier.readJdbc (the reference's db_table-against-a-connection
    // surface as verbatim SQL)
    "jdbc_scan" -> (args => {
      val strs = args.collect {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) => s.toString
      }
      require(strs.size >= 2,
        "jdbc_scan needs (url, tableOrQuery[, partitionColumn, lower, upper, numPartitions])")
      val nums = args.collect {
        case Literal(v, t) if t == org.apache.spark.sql.types.IntegerType ||
            t == org.apache.spark.sql.types.LongType ||
            t == org.apache.spark.sql.types.ShortType =>
          v.toString.toLong
      }
      if (strs.size >= 3) {
        require(nums.size == 3,
          "partitioned jdbc_scan needs integer literals (lower, upper, numPartitions)")
        planOf(sources.JdbcScan.readPartitioned(SparkSession.active,
          strs(0), strs(1), strs(2), nums(0), nums(1), nums(2).toInt))
      } else
        planOf(sources.JdbcScan.read(SparkSession.active, strs(0), strs(1)))
    }),
    "read_wet" -> (args =>
      planOf(sources.WarcScan.readWet(
        SparkSession.active, onePath(args, "read_wet")))),
    // the CHANGE DATA FEED as verbatim SQL:
    // SELECT * FROM delta_cdf('path', 2, 4)
    "delta_cdf" -> (args => {
      val path = onePath(args, "delta_cdf")
      val vers = args.collect {
        case Literal(v, t) if t == org.apache.spark.sql.types.IntegerType ||
            t == org.apache.spark.sql.types.LongType => v.toString.toLong
      }
      require(vers.size == 2,
        "delta_cdf needs (path, fromVersion, toVersion) with integer versions")
      planOf(sources.DeltaScan.readCdf(
        SparkSession.active, path, vers(0), vers(1)))
    }),
    // metadata-only aggregates as one-row SQL:
    // SELECT * FROM delta_meta_count('path')  -> (n_rows, metadata_only)
    "delta_meta_count" -> (args => {
      val m = sources.MetaAgg.countDelta(
        SparkSession.active, onePath(args, "delta_meta_count"))
      val s = SparkSession.active
      import s.implicits._
      planOf(Seq((m.value, m.metadataOnly)).toDF("n_rows", "metadata_only"))
    }),
    "iceberg_meta_count" -> (args => {
      val m = sources.MetaAgg.countIceberg(
        SparkSession.active, onePath(args, "iceberg_meta_count"))
      val s = SparkSession.active
      import s.implicits._
      planOf(Seq((m.value, m.metadataOnly)).toDF("n_rows", "metadata_only"))
    }))

  /** register all kernels + optimizer rules on an existing session */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (name, builder) =>
      org.apache.spark.sql.graftshim.GraftShim.registerFunction(spark, name, builder)
    }
    tableFunctions.foreach { case (name, builder) =>
      org.apache.spark.sql.graftshim.GraftShim.registerTableFunction(spark, name, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(plans.RangeJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ plans.RangeJoinRule
  }
}
