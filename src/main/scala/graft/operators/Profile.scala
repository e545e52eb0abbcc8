package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Numeric column profiling — the data-quality report a pipeline emits
  * before/after a transformation (row counts, null rates, ranges,
  * central moments, quartiles), long-format so it composes with the
  * verb surface (`arrange`, joins against a previous profile, …).
  *
  * ONE aggregation pass computes every column's statistics together
  * (a single partial/final global agg — no per-column jobs), then a
  * `stack` unpivots to (column, stat…) rows: profiling k columns costs
  * the same scan as profiling one.
  *
  * Quantiles: [[tableProfile]] uses exact `percentile` (linear
  * interpolation — state is a value-count map, fine up to millions of
  * DISTINCT values per column); [[tableProfileApprox]] swaps in
  * `approx_percentile` (bounded sketch state at any cardinality) and
  * HLL++ distinct counts — the 100 TB path, same schema. Means route
  * through DECIMAL sums (order-independent, reproducible at any
  * partition count — same rule as corpusProfile).
  */
object Profile {

  private val quantiles = Seq(0.25, 0.5, 0.75)

  /** exact profile: (column, n, n_null, min, max, mean, p25, p50, p75,
    * n_distinct) — one aggregation pass for all `cols` */
  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame =
    profile(df, cols,
      c => percentile(c, typedlit(quantiles)),
      c => countDistinct(c))

  /** sketch profile for unbounded cardinality: same schema, quantiles
    * via `approx_percentile(accuracy)`, distinct via HLL++ (`rsd`) */
  def tableProfileApprox(
      df: DataFrame, cols: Seq[String],
      accuracy: Int = 10000, rsd: Double = 0.02): DataFrame =
    profile(df, cols,
      c => approx_percentile(c, typedlit(quantiles), lit(accuracy)),
      c => approx_count_distinct(c, rsd))

  /** Hash-gateable view of [[tableProfileApprox]]: the deterministic
    * fields (n, n_null, min, max, mean) pass through verbatim; each
    * sketch field is replaced by a boolean asserting the sketch landed
    * inside its error bound against the exact statistic. An oracle that
    * knows the exact answers asserts the same as literal TRUEs, so a
    * healthy sketch hash-matches while its engine-specific values stay
    * ungated.
    *
    * The quantile check is by RANK COUNTING, not exact percentiles —
    * `percentile`'s value-count-map state over near-distinct doubles is
    * exactly the unbounded-state shape the sketch path exists to avoid
    * (measured 6× the whole sketch profile's cost). Instead: collect
    * the k·3 sketch quantile VALUES (the profile is k rows — driver
    * size), then ONE grouped aggregation over the unpivoted
    * (column, value) frame computes, per column, the rank counts
    * `x < v` / `x <= v` (thresholds ride in a literal map keyed by
    * column) AND the exact distinct count; `v` is a valid `q`-quantile
    * iff `count(<v) ≤ q·n ≤ count(≤v)` within the sketch's rank slack
    * (10× its guaranteed `1/accuracy`, min 1 row) — plateau-safe under
    * heavy ties where a value-space bound is not. The HLL++ count must
    * land within `5·rsd` of the exact distinct count. Total gate cost:
    * the sketch pass + one verification pass.
    */
  def sketchGate(
      df: DataFrame, cols: Seq[String],
      accuracy: Int = 10000, rsd: Double = 0.02): DataFrame = {
    val spark = df.sparkSession
    val approx = tableProfileApprox(df, cols, accuracy, rsd).collect()
    val byCol = approx.map(r => r.getString(0) -> r).toMap
    val labels = Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75)
    // ONE verification pass over the unpivoted (column, value) frame:
    // the per-column quantile thresholds ride in a literal map keyed by
    // column name, so rank counts AND the exact distinct count come out
    // of a single grouped aggregation (k countDistinct calls in a wide
    // agg would Expand the scan k-fold; a second rank pass would scan
    // again)
    val stackArgs = cols.map(name => s"'$name', CAST(`$name` AS DOUBLE)").mkString(", ")
    val stacked = df.selectExpr(s"stack(${cols.size}, $stackArgs) AS (__col, __v)")
    def thresholdMap(label: String): Column = {
      val entries = cols.flatMap { name =>
        val r = byCol(name)
        val idx = r.fieldIndex(label)
        val v = if (r.isNullAt(idx)) Double.NaN else r.getDouble(idx)
        Seq(lit(name), lit(v))
      }
      map(entries: _*)
    }
    // two-level aggregation instead of one groupBy mixing countDistinct
    // with plain sums: the mixed form plans an Expand that pushes every
    // unpivoted row through the shuffle TWICE. Level 1 collapses to one
    // row per (column, distinct value) with map-side combine — the only
    // shuffle, sized by distinct values; level 2 derives the exact
    // distinct count AND all rank counts from those collapsed rows.
    val perValue = stacked.groupBy("__col", "__v")
      .agg(count(lit(1)).as("__c"))
    val rankAggs = labels.flatMap { case (label, _) =>
      val v = element_at(thresholdMap(label), col("__col"))
      Seq(
        sum(when(col("__v") < v, col("__c")).otherwise(0L)).as(s"__lt_$label"),
        sum(when(col("__v") <= v, col("__c")).otherwise(0L)).as(s"__le_$label"))
    } :+ sum(when(col("__v").isNotNull, 1L).otherwise(0L)).as("__d") // countDistinct ignores NULL; so must the collapsed count
    val statsByCol = perValue.groupBy("__col")
      .agg(rankAggs.head, rankAggs.tail: _*)
      .collect().map(r => r.getString(0) -> r).toMap
    val out = cols.sorted.map { name =>
      val r = byCol(name)
      val n = r.getLong(r.fieldIndex("n"))
      val slack = math.max(1.0, 10.0 / accuracy * n)
      val st = statsByCol.get(name)
      def ok(label: String, q: Double): Boolean =
        if (r.isNullAt(r.fieldIndex(label))) n == 0 // vacuous: no data to rank
        else {
          val s = st.get
          val lt = s.getLong(s.fieldIndex(s"__lt_$label"))
          val le = s.getLong(s.fieldIndex(s"__le_$label"))
          lt - slack <= q * n && q * n <= le + slack
        }
      val dExact = st.map(s => s.getLong(s.fieldIndex("__d"))).getOrElse(0L)
      val dApprox = r.getLong(r.fieldIndex("n_distinct"))
      org.apache.spark.sql.Row(
        name, n, r.get(r.fieldIndex("n_null")), r.get(r.fieldIndex("min")),
        r.get(r.fieldIndex("max")), r.get(r.fieldIndex("mean")),
        ok("p25", 0.25), ok("p50", 0.5), ok("p75", 0.75),
        math.abs(dApprox - dExact) <= math.max(1.0, 5 * rsd * dExact))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("column", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_null", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("min", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("max", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("mean", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("p25_ok", org.apache.spark.sql.types.BooleanType),
      org.apache.spark.sql.types.StructField("p50_ok", org.apache.spark.sql.types.BooleanType),
      org.apache.spark.sql.types.StructField("p75_ok", org.apache.spark.sql.types.BooleanType),
      org.apache.spark.sql.types.StructField("n_distinct_ok", org.apache.spark.sql.types.BooleanType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1), schema)
  }

  private def profile(
      df: DataFrame, cols: Seq[String],
      qs: Column => Column,
      distinct: Column => Column): DataFrame = {
    require(cols.nonEmpty, "tableProfile needs at least one column")
    val aggs = cols.flatMap { name =>
      val c = df.col(name).cast("double")
      Seq(
        count(c).as(s"__n_$name"),
        count(when(c.isNull, 1)).as(s"__nn_$name"),
        min(c).as(s"__min_$name"),
        max(c).as(s"__max_$name"),
        round(sum(c.cast("decimal(38,6)")).cast("double") / count(c), 6)
          .as(s"__mean_$name"),
        qs(c).as(s"__q_$name"),
        distinct(c).as(s"__d_$name"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot: one stack row per column, quantile array unpacked
    val stackArgs = cols.map { name =>
      s"'$name', __n_$name, __nn_$name, __min_$name, __max_$name, __mean_$name, " +
        // round(6): interpolation arithmetic is the one place two
        // engines' formulas can differ in the last ulp
        s"round(element_at(__q_$name, 1), 6), round(element_at(__q_$name, 2), 6), " +
        s"round(element_at(__q_$name, 3), 6), __d_$name"
    }.mkString(", ")
    wide.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column, n, n_null, min, max, mean, p25, p50, p75, n_distinct)")
  }
}
