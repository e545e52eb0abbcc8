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
