package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.graftshim.{GraftShim => ExpressionUtils}

/** Grouped-mutate rewriting: inside a `mutate` on a grouped frame, any
  * aggregate / window function call is implicitly evaluated
  * `OVER (PARTITION BY groups [ORDER BY winOrder] [frame])` — the
  * reference does the same by textually splicing an OVER clause
  * (reference: src/parsing_duckdb.jl:23-91,169-179;
  * construct_window_clause reference: src/db_parsing.jl:453-472).
  *
  * Here the rewrite is a Catalyst expression transform: unresolved
  * function calls whose name is in the whitelist get wrapped in a
  * `WindowExpression` with the frame's current partition/order/frame
  * state. Everything stays inside Catalyst (no UDFs), so codegen and
  * whole-stage fusion still apply.
  */
object WindowRewrite {

  /** Aggregates that become windowed in a grouped mutate
    * (reference: src/parsing_duckdb.jl:23-66). */
  private val aggFns = Set(
    "sum", "avg", "mean", "min", "max", "count", "stddev", "stddev_samp",
    "var_samp", "variance", "median", "first", "last", "any_value",
    "approx_count_distinct", "collect_list", "collect_set")

  /** Pure window functions auto-wrapped even ungrouped
    * (whitelist reference: src/TidierDB.jl:43). */
  private val winFns = Set(
    "lead", "lag", "dense_rank", "nth_value", "ntile", "rank",
    "row_number", "first_value", "last_value", "cume_dist", "percent_rank")

  /** Functions that default to a running ROWS UNBOUNDED PRECEDING frame
    * (cumsum semantics, reference: src/parsing_duckdb.jl:52-58). */
  private val runningFns = Set("cumsum")

  /** User-extensible additions — the `push!(window_agg_fxns, :fn)`
    * analog (reference: src/docstrings.jl:1896-1900). */
  private val userFns = scala.collection.mutable.Set.empty[String]
  def addWindowFn(name: String): Unit = synchronized { userFns += name.toLowerCase }

  /** Explicit escape-hatch marker name — `Fns.agg(...)` wraps any call
    * (reference `agg()` / `~fn`: src/parsing_duckdb.jl:68-91). */
  private[graft] val AggMarker = "graft_agg_marker"

  def needsOrder(name: String): Boolean = winFns.contains(name.toLowerCase)

  /** Rewrite `col` so aggregate/window calls run over the given spec.
    * @param partition  PARTITION BY expressions (current groups)
    * @param order      ORDER BY (current windowOrder)
    * @param frame      optional ROWS frame (from, to) in Window.* convention
    */
  def rewrite(
      col: Column,
      partition: Seq[Column],
      order: Seq[Column],
      frame: Option[(Long, Long)]): Column = {
    val partExprs = partition.map(ExpressionUtils.expression)
    val orderExprs = order.map(ExpressionUtils.expression).map {
      case so: SortOrder => so
      case e             => SortOrder(e, Ascending)
    }
    val frameSpec: WindowFrame = frame match {
      case Some((from, to)) =>
        SpecifiedWindowFrame(RowFrame, boundary(from), boundary(to))
      case None => UnspecifiedFrame
    }
    def spec(running: Boolean): WindowSpecDefinition = {
      val f =
        if (running)
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)
        else frameSpec
      WindowSpecDefinition(partExprs, orderExprs, f)
    }
    // Manual recursion instead of transformDown: an explicit user
    // `.over(...)` is already a WindowExpression whose child is an
    // UnresolvedFunction — transformDown would double-wrap it.
    def rw(e: Expression): Expression = e match {
      case w: WindowExpression => w
      // agg() escape hatch: unwrap the marker, window the inner call
      case f: UnresolvedFunction
          if f.nameParts.length == 1 && f.nameParts.head.toLowerCase == AggMarker =>
        WindowExpression(f.arguments.head, spec(running = false))
      case f: UnresolvedFunction
          if f.nameParts.length == 1 && isWindowable(f.nameParts.head) =>
        val name = f.nameParts.head.toLowerCase
        if (runningFns.contains(name))
          WindowExpression(
            f.copy(nameParts = Seq("sum")), spec(running = true))
        else WindowExpression(f, spec(running = false))
      case other => other.mapChildren(rw)
    }
    ExpressionUtils.column(rw(ExpressionUtils.expression(col)))
  }

  private def isWindowable(name: String): Boolean = {
    val n = name.toLowerCase
    aggFns.contains(n) || winFns.contains(n) || runningFns.contains(n) ||
      userFns.contains(n) || n == AggMarker
  }

  private def boundary(v: Long): Expression = v match {
    case Long.MinValue => UnboundedPreceding
    case Long.MaxValue => UnboundedFollowing
    case 0             => CurrentRow
    case n if n >= Int.MinValue && n <= Int.MaxValue => Literal(n.toInt)
    case n => throw new IllegalArgumentException(
      s"ROWS frame bound $n exceeds Int range; use Long.MinValue/MaxValue " +
        "for unbounded ends (silent toInt truncation would corrupt the frame)")
  }

  /** Does this column contain any windowable function call? (used by
    * mutate to decide whether plain projection suffices) */
  def containsWindowable(col: Column): Boolean =
    ExpressionUtils.expression(col).exists {
      case f: UnresolvedFunction =>
        f.nameParts.length == 1 && isWindowable(f.nameParts.head)
      case _ => false
    }
}
