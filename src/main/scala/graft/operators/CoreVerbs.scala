package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.TidierFrame
import graft.functions.{Selector, WindowRewrite}

/** Core single-table verbs (SURVEY §2.2, §2.4, §2.6).
  *
  * Each verb is a pure `TidierFrame => TidierFrame`; Catalyst's
  * CollapseProject / CombineFilters / PushDownPredicates replace all of
  * the reference's CTE-fission and clause-placement machinery
  * (reference: src/structs.jl:100-136, src/TidierDB_macros.jl:70-119).
  */
trait CoreVerbs { self: TidierFrame =>

  private def schema: Seq[String] = df.columns.toSeq

  // ---- projection -----------------------------------------------------

  /** `@select` with tidy selectors (reference: src/TidierDB_macros.jl:4-31). */
  def select(sels: Selector*): TidierFrame =
    withDf(df.select(Selector.resolve(schema, sels).map(df.col): _*))

  /** `@rename(new = old)` (reference: src/TidierDB_macros.jl:425-497). */
  def rename(pairs: (String, String)*): TidierFrame = {
    val m = pairs.map { case (nw, old) => old -> nw }.toMap
    withDf(df.withColumnsRenamed(m))
  }

  /** `@relocate` (reference: src/relocate.jl:45-115). Moves the selected
    * columns before/after an anchor (default: to the front). */
  def relocate(
      sels: Seq[Selector],
      before: Option[String] = None,
      after: Option[String] = None): TidierFrame = {
    val moved = Selector.resolve(schema, sels)
    val rest = schema.filterNot(moved.contains)
    val ordered: Seq[String] = (before, after) match {
      case (Some(b), _) =>
        val i = rest.indexOf(b); require(i >= 0, s"anchor '$b' not found")
        rest.take(i) ++ moved ++ rest.drop(i)
      case (_, Some(a)) =>
        val i = rest.indexOf(a); require(i >= 0, s"anchor '$a' not found")
        rest.take(i + 1) ++ moved ++ rest.drop(i + 1)
      case _ => moved ++ rest
    }
    withDf(df.select(ordered.map(df.col): _*))
  }

  // ---- filtering / rows ----------------------------------------------

  /** `@filter` — multiple conditions AND together
    * (reference: src/TidierDB_macros.jl:37-128). On a grouped frame,
    * aggregate calls in the condition are evaluated OVER the group
    * (dplyr's grouped filter / the reference's HAVING routing): e.g.
    * `groupBy("g").filter(sum(col("x")) > 5)` keeps all rows of
    * qualifying groups. Post-summarize filters need no special
    * handling — the frame is already aggregated. */
  def filter(conds: Column*): TidierFrame = {
    val hasWindowState = groups.nonEmpty || winOrder.nonEmpty || winFrame.nonEmpty
    val (windowed, plain) = conds.partition(c =>
      hasWindowState && WindowRewrite.containsWindowable(c))
    if (windowed.isEmpty)
      return withDf(conds.foldLeft(df)((d, c) => d.filter(c)))
    // Window expressions are illegal in WHERE — materialize them as
    // columns first. ALL windowed conditions go into ONE projection over
    // the ORIGINAL frame, then one combined filter: filtering between
    // them would make the second aggregate see already-filtered groups,
    // diverging from dplyr/HAVING semantics where every condition is
    // evaluated over the full group.
    val named = windowed.zipWithIndex.map { case (c, i) =>
      s"__graft_cond_$i" -> WindowRewrite.rewrite(c, groups.map(df.col), winOrder, winFrame)
    }
    val withCols = df.withColumns(named.toMap)
    val combined = (named.map { case (n, _) => col(n) } ++ plain).reduce(_ && _)
    withDf(withCols.filter(combined).drop(named.map(_._1): _*))
  }

  /** `@distinct` — NOTE the reference keeps ONLY the listed columns
    * (SELECT DISTINCT cols), not dplyr's keep-all
    * (reference: src/TidierDB_macros.jl:343-368). */
  def distinct(sels: Selector*): TidierFrame =
    if (sels.isEmpty) reset(df.distinct())
    else reset(df.select(Selector.resolve(schema, sels).map(df.col): _*).distinct())

  /** `@drop_missing` (reference: src/TidierDB_macros.jl:693-765). */
  def dropMissing(sels: Selector*): TidierFrame = {
    val cols = if (sels.isEmpty) schema else Selector.resolve(schema, sels)
    withDf(df.na.drop(cols))
  }

  /** `@head` (reference: src/TidierDB_macros.jl:671-681). */
  def head(n: Int = 6): TidierFrame = withDf(df.limit(n))

  /** `@arrange` — use `desc(col)` / `col.desc` for descending
    * (reference: src/TidierDB_macros.jl:149-175). */
  def arrange(cols: Column*): TidierFrame = withDf(df.orderBy(cols: _*))
  def arrange(first: String, rest: String*): TidierFrame =
    withDf(df.orderBy((first +: rest).map(col): _*))
  /** `@arrange(2)` — 1-based column POSITIONS (reference NEWS v8.10:
    * "`@arrange` can accept numeric values for columns"); negative =
    * descending on that position, mirroring `desc(col)`. */
  def arrange(first: Int, rest: Int*): TidierFrame = {
    val names = schema
    val cols = (first +: rest).map { p =>
      require(p != 0 && math.abs(p) <= names.length,
        s"arrange position $p out of range 1..${names.length}")
      if (p > 0) col(names(p - 1)) else col(names(-p - 1)).desc
    }
    withDf(df.orderBy(cols: _*))
  }

  // ---- grouping / aggregation ----------------------------------------

  /** `@group_by` with selectors (reference: src/TidierDB_macros.jl:225-285). */
  def groupBy(sels: Selector*): TidierFrame =
    copy(groups = Selector.resolve(schema, sels))

  /** `@group_by(all)` / `_by = all` (reference NEWS v8.10): group by
    * every current column. */
  def groupByAll(): TidierFrame = groupBy(graft.functions.Selector.everything())

  /** `@group_by(key = expr)` — computed grouping keys become projected
    * columns then grouping names (reference: src/TidierDB_macros.jl:178-220). */
  def groupBy(named: (String, Column)*)(implicit d: DummyImplicit): TidierFrame = {
    val d2 = df.withColumns(named.toMap)
    copy(df = d2, groups = named.map(_._1))
  }

  /** `@summarize` (reference: src/mutate_and_summ.jl:304-495).
    * Output columns: group keys then aggregates, grouping state cleared
    * (reference: src/mutate_and_summ.jl:250-257). */
  def summarize(aggs: (String, Column)*): TidierFrame = {
    if (aggs.isEmpty) {
      // zero aggregates = one row per group of just the keys
      require(groups.nonEmpty, "summarize() with no aggregates needs a grouped frame")
      return reset(df.select(groups.map(df.col): _*).distinct())
    }
    val exprs = aggs.map { case (n, c) => c.as(n) }
    val out =
      if (groups.isEmpty) df.agg(exprs.head, exprs.tail: _*)
      else df.groupBy(groups.map(df.col): _*).agg(exprs.head, exprs.tail: _*)
    reset(out)
  }

  /** `@summarize(_by = ...)` inline grouping (reference: src/mutate_and_summ.jl:266-282). */
  def summarizeBy(by: Seq[Selector])(aggs: (String, Column)*): TidierFrame =
    groupBy(by: _*).summarize(aggs: _*)

  /** CUBE summarize — one result row per subset of the active grouping
    * keys (superset verb: the reference leaves grouping sets
    * unimplemented; Spark aggregates all levels in ONE shuffle via the
    * native Expand operator, no per-level re-scan). Output columns:
    * keys (NULL at rolled-up levels), `grouping_id` (bitmask
    * disambiguating a NULL key value from a rolled-up key), then the
    * aggregates. Grouping state is consumed. */
  def cube(aggs: (String, Column)*): TidierFrame = {
    require(groups.nonEmpty, "cube needs a grouped frame (groupBy first)")
    multiLevel(df.cube(groups.map(df.col): _*), aggs)
  }

  /** ROLLUP summarize — hierarchical prefixes of the grouping keys
    * (n+1 levels); same output shape and single-shuffle plan as
    * [[cube]]. */
  def rollup(aggs: (String, Column)*): TidierFrame = {
    require(groups.nonEmpty, "rollup needs a grouped frame (groupBy first)")
    multiLevel(df.rollup(groups.map(df.col): _*), aggs)
  }

  /** GROUPING SETS summarize — explicit key subsets (each must draw
    * from the active grouping keys); same output shape as [[cube]]. */
  def groupingSets(sets: Seq[Seq[String]])(aggs: (String, Column)*): TidierFrame = {
    require(groups.nonEmpty, "groupingSets needs a grouped frame (groupBy first)")
    val unknown = sets.flatten.distinct.filterNot(groups.contains)
    require(unknown.isEmpty,
      s"grouping set columns ${unknown.mkString(", ")} are not grouping keys (${groups.mkString(", ")})")
    multiLevel(df.groupingSets(sets.map(_.map(df.col)), groups.map(df.col): _*), aggs)
  }

  private def multiLevel(
      g: org.apache.spark.sql.RelationalGroupedDataset,
      aggs: Seq[(String, Column)]): TidierFrame = {
    require(aggs.nonEmpty, "cube/rollup/groupingSets need at least one aggregate")
    val exprs = grouping_id().cast("long").as("grouping_id") +:
      aggs.map { case (n, c) => c.as(n) }
    reset(g.agg(exprs.head, exprs.tail: _*))
  }

  /** `@count` (reference: src/TidierDB_macros.jl:373-419). */
  def count(sels: Selector*): TidierFrame = countImpl(sels, sort = false)
  def countSorted(sels: Selector*): TidierFrame = countImpl(sels, sort = true)
  private def countImpl(sels: Seq[Selector], sort: Boolean): TidierFrame = {
    val cols = Selector.resolve(schema, sels)
    val nExpr = org.apache.spark.sql.functions.count(lit(1)).as("n")
    val counted =
      if (cols.isEmpty) df.agg(nExpr)
      else df.groupBy(cols.map(df.col): _*).agg(nExpr)
    reset(if (sort) counted.orderBy(desc("n")) else counted)
  }

  /** `@summary` — column stats profile (reference: src/mutate_and_summ.jl:659-674).
    * With explicit stats (e.g. "count", "min", "max") only those rows
    * are produced — the deterministic subset (quartiles are
    * approximate). */
  def summary(stats: String*): DataFrame =
    if (stats.isEmpty) df.summary() else df.summary(stats: _*)

  // ---- mutation -------------------------------------------------------

  /** `@mutate` (reference: src/mutate_and_summ.jl:120-263).
    * Overwrites in place when the name exists; appends otherwise. On a
    * grouped frame (or with windowOrder/windowFrame set), aggregate and
    * window calls are implicitly evaluated OVER the current
    * partition/order/frame, then grouping state is cleared — exactly the
    * reference's grouped-mutate semantics
    * (reference: src/parsing_duckdb.jl:23-91, src/mutate_and_summ.jl:250-257). */
  def mutate(colsIn: (String, Column)*): TidierFrame = {
    val hasWindowState = groups.nonEmpty || winOrder.nonEmpty || winFrame.nonEmpty
    val rewritten = colsIn.map { case (n, c) =>
      if (hasWindowState || WindowRewrite.containsWindowable(c))
        n -> WindowRewrite.rewrite(c, groups.map(df.col), winOrder, winFrame)
      else n -> c
    }
    // ONE projection instead of a withColumn chain: a chained fold
    // re-analyzes the whole plan per column (quadratic on 100-column
    // mutates). dplyr's sees-earlier-columns semantics survive by
    // substituting references to names defined earlier in THIS mutate
    // into later expressions (`col("x")` is an UnresolvedAttribute;
    // `df.col("x")` stays pinned to the input column, same as before).
    // Overwrites land in place; genuinely new names append in listed
    // order. A name's own definition sees the PREVIOUS value (dplyr:
    // mutate(x = x*2) reads the old x).
    import org.apache.spark.sql.graftshim.GraftShim
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.Expression
    val defined = scala.collection.mutable.HashMap.empty[String, Expression]
    val spelling = scala.collection.mutable.HashMap.empty[String, String]
    val appendOrder = scala.collection.mutable.ArrayBuffer.empty[String] // lowercase
    val schemaLower = schema.map(_.toLowerCase)
    val schemaSet = schemaLower.toSet
    rewritten.foreach { case (n, c) =>
      val key = n.toLowerCase
      val e = GraftShim.expression(c).transformUp {
        case a: UnresolvedAttribute
            if a.nameParts.length == 1 && defined.contains(a.nameParts.head.toLowerCase) =>
          defined(a.nameParts.head.toLowerCase)
      }
      if (!defined.contains(key) && !schemaSet.contains(key)) appendOrder += key
      defined(key) = e
      spelling(key) = n
    }
    val outCols: Seq[Column] =
      schema.zip(schemaLower).map { case (c, lc) =>
        defined.get(lc) match {
          case Some(e) => GraftShim.column(e).as(spelling(lc))
          case None    => df.col(c)
        }
      } ++ appendOrder.toSeq.map(k => GraftShim.column(defined(k)).as(spelling(k)))
    reset(df.select(outCols: _*))
  }

  /** `@mutate(..., _by=, _order=, _frame=)` inline window kwargs
    * (reference: src/mutate_and_summ.jl:10-46,189-201). */
  def mutateBy(
      by: Seq[Selector] = Nil,
      order: Seq[Column] = Nil,
      frame: Option[(Long, Long)] = None)(colsIn: (String, Column)*): TidierFrame = {
    val part = Selector.resolve(schema, by)
    copy(groups = part, winOrder = order, winFrame = frame).mutate(colsIn: _*)
  }

  /** `@transmute` — mutate keeping only group cols + new cols
    * (reference: src/mutate_and_summ.jl:509-654). */
  def transmute(colsIn: (String, Column)*): TidierFrame = {
    val keep = groups ++ colsIn.map(_._1)
    val m = mutate(colsIn: _*)
    m.withDf(m.df.select(keep.map(m.df.col): _*))
  }

  /** `across(cols, fns)` expansion helper — returns named aggregate pairs
    * for use in summarize/mutate (reference: src/db_parsing.jl:367-443).
    * Naming convention matches the reference: `<col>_<fnName>`. */
  def across(
      sels: Seq[Selector],
      fns: (String, Column => Column)*): Seq[(String, Column)] =
    for {
      c <- Selector.resolve(schema, sels)
      (fname, f) <- fns
    } yield s"${c}_$fname" -> f(df.col(c))
}
