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
    * inside its error bound against the exact statistic — quantiles
    * must fall in the exact-percentile interval at rank `q ± slack`
    * (slack = 10× the sketch's guaranteed `1/accuracy` rank error),
    * the HLL++ count within `5·rsd` relative error. An oracle that
    * knows the exact answers asserts the same as literal TRUEs, so a
    * healthy sketch hash-matches while its engine-specific values stay
    * ungated. The extra exact pass is gate-only cost; the serving path
    * remains [[tableProfileApprox]].
    */
  def sketchGate(
      df: DataFrame, cols: Seq[String],
      accuracy: Int = 10000, rsd: Double = 0.02): DataFrame = {
    val approx = tableProfileApprox(df, cols, accuracy, rsd)
    val slack = 10.0 / accuracy
    val lo = quantiles.map(q => math.max(0.0, q - slack))
    val hi = quantiles.map(q => math.min(1.0, q + slack))
    val aggs = cols.flatMap { name =>
      val c = df.col(name).cast("double")
      Seq(
        percentile(c, typedlit(lo)).as(s"__lo_$name"),
        percentile(c, typedlit(hi)).as(s"__hi_$name"),
        countDistinct(c).as(s"__d_$name"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { name =>
      s"'$name', element_at(__lo_$name, 1), element_at(__hi_$name, 1), " +
        s"element_at(__lo_$name, 2), element_at(__hi_$name, 2), " +
        s"element_at(__lo_$name, 3), element_at(__hi_$name, 3), __d_$name"
    }.mkString(", ")
    val bounds = wide.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column, __p25_lo, __p25_hi, __p50_lo, __p50_hi, __p75_lo, __p75_hi, __d)")
    val eps = lit(1e-6) // approx quantiles were round(…, 6)ed
    def ok(p: String): Column =
      (col(p) >= col(s"__${p}_lo") - eps && col(p) <= col(s"__${p}_hi") + eps)
        .as(s"${p}_ok")
    approx.join(broadcast(bounds), "column")
      .select(col("column"), col("n"), col("n_null"), col("min"), col("max"),
        col("mean"), ok("p25"), ok("p50"), ok("p75"),
        (abs(col("n_distinct") - col("__d")) <=
          greatest(lit(1.0), lit(5 * rsd) * col("__d"))).as("n_distinct_ok"))
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
