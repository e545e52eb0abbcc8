package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.TidierFrame
import graft.functions.Selector

/** Reshaping verbs (SURVEY §2.8) — pivots, unnest, separate/unite
  * (reference: src/pivots.jl, src/unnest.jl, src/sep_unite.jl). */
trait ReshapeVerbs { self: TidierFrame =>

  /** `@pivot_wider(names_from, values_from [, values])`
    * (reference: src/pivots.jl:9-169). Id columns = everything else.
    * When `values` is omitted this is an EAGER distinct scan, same as
    * the reference's get_distinct_values2 (src/pivots.jl:1-7) and
    * Spark's own `pivot(col)` — pass `values` at scale. */
  def pivotWider(
      namesFrom: String,
      valuesFrom: String,
      values: Seq[String] = Nil): TidierFrame = {
    val idCols = df.columns.toSeq.filterNot(c => c == namesFrom || c == valuesFrom)
    val g = df.groupBy(idCols.map(df.col): _*)
    val p = if (values.nonEmpty) g.pivot(namesFrom, values) else g.pivot(namesFrom)
    // any_value semantics (reference uses ANY_VALUE ... FILTER): first()
    reset(p.agg(first(df.col(valuesFrom))))
  }

  /** Multiple `values_from` columns (reference: src/pivots.jl:20-52 —
    * `values_from = [a, b]`): output columns alias `<name>_<vc>`,
    * exactly the reference's `spv * "_" * vc` scheme (Spark's
    * multi-agg pivot naming `{pivotValue}_{aggAlias}` reproduces it
    * when each agg is aliased to its source column). A single-element
    * Seq degrades to the un-suffixed single-values form. */
  def pivotWider(
      namesFrom: String,
      valuesFrom: Seq[String],
      values: Seq[String]): TidierFrame = {
    require(valuesFrom.nonEmpty, "pivotWider needs at least one values_from column")
    if (valuesFrom.sizeIs == 1) pivotWider(namesFrom, valuesFrom.head, values)
    else {
      val idCols = df.columns.toSeq.filterNot(c => c == namesFrom || valuesFrom.contains(c))
      val g = df.groupBy(idCols.map(df.col): _*)
      val p = if (values.nonEmpty) g.pivot(namesFrom, values) else g.pivot(namesFrom)
      val aggs = valuesFrom.map(vc => first(df.col(vc)).as(vc))
      reset(p.agg(aggs.head, aggs.tail: _*))
    }
  }

  /** `@pivot_longer(cols, names_to, values_to)`
    * (reference: src/pivots.jl:172-274) — Spark-native `unpivot`
    * (no UNION-ALL-per-column blowup; single pass). */
  def pivotLonger(
      sels: Seq[Selector],
      namesTo: String = "variable",
      valuesTo: String = "value"): TidierFrame = {
    val valueCols = Selector.resolve(df.columns.toSeq, sels)
    val ids = df.columns.toSeq.filterNot(valueCols.contains)
    reset(df.unpivot(ids.map(df.col).toArray, valueCols.map(df.col).toArray, namesTo, valuesTo))
  }

  /** `@unnest_wider(col)` — STRUCT column → one column per field
    * (reference: src/unnest.jl:1-85). Field names come from the real
    * `StructType` instead of parsing DESCRIBE strings. */
  def unnestWider(c: String, namesSep: Option[String] = None): TidierFrame = {
    val fields = df.schema(c).dataType.asInstanceOf[StructType].fieldNames.toSeq
    val before = df.columns.toSeq.takeWhile(_ != c)
    val after = df.columns.toSeq.dropWhile(_ != c).drop(1)
    val expanded = fields.map { f =>
      val outName = namesSep.map(sep => s"$c$sep$f").getOrElse(f)
      df.col(c).getField(f).as(outName)
    }
    reset(df.select(before.map(df.col) ++ expanded ++ after.map(df.col): _*))
  }

  /** `@unnest_longer(cols…)` — explode array column(s); multiple columns
    * unnest in parallel (zip semantics, like DuckDB's multi-arg unnest;
    * reference: src/unnest.jl:90-138). */
  def unnestLonger(cols: String*): TidierFrame = {
    require(cols.nonEmpty, "unnestLonger needs at least one column")
    if (cols.size == 1) {
      val c = cols.head
      reset(df.withColumn(c, explode(df.col(c))))
    } else {
      val zipped = "__graft_zip"
      val z = df.withColumn(zipped, explode(arrays_zip(cols.map(df.col): _*)))
      val out = df.columns.toSeq.map {
        case c if cols.contains(c) => z.col(s"$zipped.$c").as(c)
        case c                     => z.col(c)
      }
      reset(z.select(out: _*))
    }
  }

  /** `@separate(col, into, sep)` (reference: src/sep_unite.jl:1-66):
    * parts 1..n-1 are the split fields; the LAST part swallows any
    * remaining separators; empty strings become NULL. */
  def separate(c: String, into: Seq[String], sep: String): TidierFrame = {
    val arr = split(df.col(c), java.util.regex.Pattern.quote(sep))
    val n = into.size
    val before = df.columns.toSeq.takeWhile(_ != c)
    val after = df.columns.toSeq.dropWhile(_ != c).drop(1)
    val parts = into.zipWithIndex.map { case (name, i) =>
      // try_element_at: out-of-range → NULL (ANSI-safe), matching the
      // reference's ''-padding + NULLIF behavior.
      val piece =
        if (i < n - 1) try_element_at(arr, lit(i + 1))
        else array_join(slice(arr, n, Int.MaxValue - n), sep)
      nullif(piece, lit("")).as(name)
    }
    reset(df.select(before.map(df.col) ++ parts ++ after.map(df.col): _*))
  }

  /** `@unite(new, cols, sep)` (reference: src/sep_unite.jl:68-110):
    * CONCAT_WS (skips NULLs), drops the inputs, new column in the
    * position of the first input. */
  def unite(newCol: String, cols: Seq[String], sep: String = "_"): TidierFrame = {
    val first = cols.head
    val united = concat_ws(sep, cols.map(df.col): _*).as(newCol)
    val out = df.columns.toSeq.flatMap {
      case `first`                  => Some(united)
      case c if cols.contains(c)    => None
      case c                        => Some(df.col(c))
    }
    reset(df.select(out: _*))
  }
}
