package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.TidierFrame

/** Join keys — the parse_join_expression analog
  * (reference: src/db_parsing.jl:474-527). */
sealed trait JoinKey
object JoinKey {
  /** `l == r` equi key — output coalesces and dedups (reference: src/joins_sq.jl:88-138). */
  final case class Equi(l: String, r: String) extends JoinKey
  /** theta key: op ∈ {">=", "<=", ">", "<", "!="} (reference: src/db_parsing.jl:503-519). */
  final case class Theta(l: String, op: String, r: String) extends JoinKey
  /** `closest(l >= r)` — as-of key (reference: src/db_parsing.jl:482-501). */
  final case class Closest(l: String, op: String, r: String) extends JoinKey

  /** bare-column shorthand `join(q, id)` → id == id (reference: src/db_parsing.jl:521-524). */
  def apply(k: String): JoinKey = Equi(k, k)
  def ===(l: String, r: String): JoinKey = Equi(l, r)
}

/** The six join verbs + as-of, all funnelling into one `doJoin` engine —
  * mirroring the reference's single do_join
  * (reference: src/joins_sq.jl:159-316).
  *
  * Output convention (must match the reference for oracle parity,
  * reference: src/joins_sq.jl:88-138): for each `==` key the output has
  * ONE column named after the left key, valued `COALESCE(l.k, r.k)`
  * (identical to l.k except under right/full joins); left columns first
  * in order, then right columns minus consumed equi keys.
  *
  * Scale notes: the condition is handed to Catalyst as-is — equi keys
  * become hash/sort-merge join keys, theta keys become post-join filters
  * on the same join, and AQE picks broadcast when a side is small. Use
  * `broadcastRight = true` to force a broadcast hint on a known-small
  * dimension.
  */
trait JoinVerbs { self: TidierFrame =>

  def innerJoin(right: TidierFrame, keys: JoinKey*): TidierFrame = doJoin(right, keys, "inner")
  def leftJoin(right: TidierFrame, keys: JoinKey*): TidierFrame = doJoin(right, keys, "left")
  def rightJoin(right: TidierFrame, keys: JoinKey*): TidierFrame = doJoin(right, keys, "right")
  def fullJoin(right: TidierFrame, keys: JoinKey*): TidierFrame = doJoin(right, keys, "full")
  def semiJoin(right: TidierFrame, keys: JoinKey*): TidierFrame = doJoin(right, keys, "left_semi")
  def antiJoin(right: TidierFrame, keys: JoinKey*): TidierFrame = doJoin(right, keys, "left_anti")

  /** Broadcast-hinted variants for known-small right sides. */
  def innerJoinBroadcast(right: TidierFrame, keys: JoinKey*): TidierFrame =
    doJoin(right.withDf(broadcast(right.df)), keys, "inner")
  def leftJoinBroadcast(right: TidierFrame, keys: JoinKey*): TidierFrame =
    doJoin(right.withDf(broadcast(right.df)), keys, "left")

  private def opCol(l: Column, op: String, r: Column): Column = op match {
    case ">=" => l >= r
    case "<=" => l <= r
    case ">"  => l > r
    case "<"  => l < r
    case "!=" => l =!= r
    case "==" => l === r
    case o    => throw new IllegalArgumentException(s"unknown join op '$o'")
  }

  private def doJoin(right: TidierFrame, keys: Seq[JoinKey], how: String): TidierFrame = {
    val asofKeys = keys.collect { case c: JoinKey.Closest => c }
    if (asofKeys.nonEmpty) return asOfJoin(right, keys, how)

    val l = df.alias("__l")
    val r = right.df.alias("__r")
    val cond = keys.map {
      case JoinKey.Equi(lk, rk)      => l.col(lk) === r.col(rk)
      case JoinKey.Theta(lk, op, rk) => opCol(l.col(lk), op, r.col(rk))
      case _: JoinKey.Closest        => lit(true)
    }.reduce(_ && _)
    val joined = l.join(r, cond, how)

    if (how == "left_semi" || how == "left_anti") return reset(joined)

    // Reference projection: left cols (equi keys coalesced in place),
    // then right cols minus consumed equi keys (src/joins_sq.jl:88-138).
    val equi = keys.collect { case JoinKey.Equi(lk, rk) => lk -> rk }
    val equiL = equi.map(_._1).toSet
    val equiR = equi.map(_._2).toSet
    val coalesceMap = equi.toMap
    val leftCols = df.columns.toSeq.map { c =>
      if (equiL.contains(c)) coalesce(l.col(c), r.col(coalesceMap(c))).as(c)
      else l.col(c)
    }
    val rightCols = right.df.columns.toSeq.filterNot(equiR.contains).map(r.col)
    reset(joined.select(leftCols ++ rightCols: _*))
  }

  /** Range (interval) join: left rows whose `tsCol` falls inside the
    * right side's `[loCol, hiCol]` interval, optionally within equi-key
    * groups — WITHOUT the nested-loop join a bare
    * `l.ts BETWEEN r.lo AND r.hi` condition plans to.
    *
    * Implementation (composition, not a custom operator): band both
    * sides by `floorDiv(value, bandWidth)` — each left row lands in ONE
    * band, each right interval explodes to the bands it covers — then
    * equi-join on (keys, band) and apply the exact range filter. A
    * (left, right) pair can only meet in the left row's single band, so
    * no dedup pass is needed. The one wide stage is a hash join on the
    * band key; cost scales with Σ interval_len/bandWidth on the right —
    * pick bandWidth ≈ typical interval length so intervals explode to
    * ~1-2 bands. This is the standard distributed interval-join shape
    * (a native range join would need a custom SparkPlan; banding gets
    * the same asymptotics from existing operators).
    *
    * `bandWidth` is in the column's native units — MICROSECONDS for
    * timestamp columns (they band via `unix_micros`), the raw value for
    * numerics.
    */
  def rangeJoin(
      right: TidierFrame,
      tsCol: String,
      loCol: String,
      hiCol: String,
      bandWidth: Long,
      equi: Seq[(String, String)] = Nil): TidierFrame = {
    require(bandWidth > 0, s"bandWidth must be positive, got $bandWidth")
    val B = "__range_band"
    def toLong(d: DataFrame, c: String): Column = d.schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        graft.plans.ExactMicros.col(d, c) // shared exact dispatch (NTZ-safe)
      case _ => d.col(c).cast("long")
    }
    // Band key = the band's START value (x - pmod(x, w)): floor-aligned
    // for negative longs too (pmod is non-negative), and EXACT long
    // arithmetic — a quotient via `/` would round through double above
    // 2^53. Right intervals enumerate band starts with a stepped
    // sequence, so there is still no division anywhere.
    def bandStart(x: Column): Column = x - pmod(x, lit(bandWidth))

    val l = df.withColumn(B, bandStart(toLong(df, tsCol)))
    val rLo = bandStart(toLong(right.df, loCol))
    val rHi = bandStart(toLong(right.df, hiCol))
    // guard: sequence(a, b) DESCENDS when b < a (it is not empty) —
    // inverted/NULL intervals must produce zero bands, not a band walk
    // in the wrong direction
    val bands = when(
      right.df.col(loCol).isNotNull && right.df.col(hiCol).isNotNull &&
        right.df.col(hiCol) >= right.df.col(loCol),
      sequence(rLo, rHi, lit(bandWidth))).otherwise(array().cast("array<long>"))
    val r = right.df.withColumn(B, explode(bands))

    val lA = l.alias("__l"); val rA = r.alias("__r")
    val cond = (equi.map { case (a, b) => lA.col(a) === rA.col(b) } ++ Seq(
      lA.col(B) === rA.col(B),
      lA.col(tsCol) >= rA.col(loCol),
      lA.col(tsCol) <= rA.col(hiCol))).reduce(_ && _)
    val joined = lA.join(rA, cond, "inner")
    val outCols = df.columns.toSeq.map(lA.col) ++
      right.df.columns.toSeq.filterNot(equi.map(_._2).contains).map(rA.col)
    reset(joined.select(outCols: _*))
  }

  /** As-of join — DuckDB `ASOF JOIN` semantics on every outer type
    * (reference: src/joins_sq.jl:238-241, src/db_parsing.jl:482-501):
    * for each left row, join the single right row that is *nearest* in
    * the inequality column while satisfying it, within the equi-key
    * group. `right` keeps unmatched RIGHT rows (those no left row
    * selected as its closest — DuckDB's ASOF RIGHT semantics), `full`
    * keeps unmatched rows of both sides.
    *
    * Spark has no native as-of join. Implementation chosen for 100 TB
    * scale — the "union + last_value(ignoreNulls) OVER" technique:
    * instead of a range join (O(n·m) nested-loop or an exploding
    * sort-merge band), we UNION the tagged sides, sort once within each
    * equi-key partition by the as-of column, and propagate the most
    * recent right payload with a running `last(ignoreNulls)` window.
    * Cost: ONE shuffle + sort of |L|+|R| rows — the same asymptotics as
    * DuckDB's native sort-based ASOF, and it parallelizes per key group.
    *
    * The right/full outer parts need "which right rows were selected?":
    * a running `sum(tag)` in the SAME window numbers each right row
    * within its key group (its segment), and every left row lands on
    * the segment of the right row it matched — so matched segments are
    * just the distinct (key, segment) pairs of matched left rows, and
    * unmatched right rows fall out of one semi/anti join on those
    * pairs. No row-ids, no extra shuffle (same partition key).
    *
    * Ties (two right rows equal in the as-of column): the selected row
    * is the one whose payload struct sorts LAST (deterministic across
    * runs/partitionings); if the payload type is not orderable the
    * within-tie choice is partition-order dependent, like DuckDB's own
    * arbitrary tie pick.
    */
  /** as-of join with a MATCH TOLERANCE (pandas `merge_asof(tolerance=)`
    * parity — the reference's DuckDB ASOF has no analog): the nearest
    * candidate must lie within `tolerance` of the left value or the
    * row counts as unmatched. Only the nearest candidate is considered
    * — a farther in-tolerance row never substitutes, exactly pandas'
    * semantics. `tolerance` is compared against the as-of difference in
    * its native type: an INTERVAL literal for timestamps
    * (`expr("INTERVAL 15 MINUTES")`), a numeric literal otherwise. */
  def asofJoinTolerance(
      right: TidierFrame,
      how: String,
      tolerance: Column,
      keys: JoinKey*): TidierFrame =
    asOfJoin(right, keys, how, Some(tolerance))

  private def asOfJoin(right: TidierFrame, keys: Seq[JoinKey], how: String,
      tolerance: Option[Column] = None): TidierFrame = {
    require(Seq("inner", "left", "right", "full").contains(how),
      s"asof join supports inner/left/right/full, got $how")
    val closest = keys.collect { case c: JoinKey.Closest => c }
    require(closest.size == 1, "exactly one closest() key per as-of join")
    val JoinKey.Closest(lk, op, rk) = closest.head
    val equi = keys.collect { case JoinKey.Equi(a, b) => (a, b) }

    val descending = op == "<=" || op == "<" // nearest *above*: order desc
    val strict = op == ">" || op == "<"

    val T = "__asof_t"; val TAG = "__asof_isr"
    val PAY = "__asof_r"; val PAYC = "__asof_rc"; val SEG = "__asof_seg"
    val rPayloadCols = right.df.columns.toSeq.filterNot(c => equi.map(_._2).contains(c))

    // Right side: (equi keys renamed to left names, asof col, payload
    // struct). NULL-keyed right rows are dropped up front: SQL/DuckDB
    // ASOF never matches on NULL keys, but Window.partitionBy groups
    // NULLs together and would hand their payloads to NULL-keyed left
    // rows. (For right/full they re-enter below as unmatched rows.)
    // The as-of column keeps its ORIGINAL type — casting to double
    // would corrupt 64-bit keys beyond 2^53 (e.g. nanosecond epochs)
    // and NULL-out non-numeric orderable types.
    val rNonNull = equi.map(e => right.df.col(e._2).isNotNull)
      .foldLeft(right.df.col(rk).isNotNull)(_ && _)
    val rSel = equi.map { case (a, b) => right.df.col(b).as(a) } ++ Seq(
      right.df.col(rk).as(T),
      lit(1).as(TAG),
      struct(rPayloadCols.map(right.df.col): _*).as(PAY))
    val rTagged = right.df.filter(rNonNull).select(rSel: _*)

    // Left side keeps all columns + sort key + null payload.
    val lTagged = df
      .withColumn(T, col(lk))
      .withColumn(TAG, lit(0))
      .withColumn(PAY, lit(null).cast(rTagged.schema(PAY).dataType))
    val lAligned = lTagged.select(
      (df.columns.toSeq ++ Seq(T, TAG, PAY)).map(lTagged.col): _*)
    // unionByName with missing left-only columns nulled on the right side
    val unioned = lAligned.unionByName(
      rTagged.select(
        (equi.map(_._1) ++ Seq(T, TAG, PAY)).map(rTagged.col): _*),
      allowMissingColumns = true)

    // Within each key group, order by the as-of column; at equal sort key
    // a right row is visible to a left row only for inclusive ops, so
    // inclusive → right sorts before left, strict → right sorts after.
    // Tied right rows are ordered by payload when orderable (see above).
    val tOrder = if (descending) col(T).desc else col(T).asc
    val tagOrder = if (strict) col(TAG).asc else col(TAG).desc
    val payOrderable = org.apache.spark.sql.catalyst.expressions.RowOrdering
      .isOrderable(rTagged.schema(PAY).dataType)
    val ordering = if (payOrderable) Seq(tOrder, tagOrder, col(PAY).asc_nulls_first)
                   else Seq(tOrder, tagOrder)
    val w = Window
      .partitionBy(equi.map(e => col(e._1)): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried0 = unioned
      .withColumn(PAYC, last(col(PAY), ignoreNulls = true).over(w))
      .withColumn(SEG, sum(col(TAG)).over(w))
    // tolerance: carry the matched right row's as-of value in the SAME
    // window and null the match out when it lies too far — the left row
    // then counts as unmatched everywhere downstream (incl. the
    // right/full segment logic, which keys off PAYC)
    val carried = tolerance match {
      case None => carried0
      case Some(tol) =>
        val PAYT = "__asof_rt"
        val withT = carried0.withColumn(PAYT,
          last(when(col(TAG) === 1, col(T)), ignoreNulls = true).over(w))
        val diff = if (descending) col(PAYT) - col(T) else col(T) - col(PAYT)
        withT
          .withColumn(PAYC, when(col(PAYC).isNotNull && diff <= tol, col(PAYC)))
          .drop(PAYT)
    }

    val leftRows = carried.filter(col(TAG) === 0)
    val matchedPart = how match {
      case "inner" | "right" => leftRows.filter(col(PAYC).isNotNull)
      case _                 => leftRows // left/full keep unmatched lefts
    }
    val out = matchedPart.select(
      df.columns.toSeq.map(col) ++
        rPayloadCols.map(c => col(s"$PAYC.$c").as(c)): _*)

    if (how == "inner" || how == "left") return reset(out)

    // ---- right/full outer part: right rows nobody selected ------------
    val keyCols = equi.map(_._1)
    val matchedSegs = leftRows.filter(col(PAYC).isNotNull)
      .select((keyCols :+ SEG).map(col): _*).distinct()
    val rightRows = carried.filter(col(TAG) === 1)
    val unmatchedRight = rightRows.join(matchedSegs, keyCols :+ SEG, "left_anti")
    // NULL-keyed right rows never match; SQL outer joins still keep them
    val nullKeyed = right.df.filter(!rNonNull).select(rSel: _*)
    // Output shape: left columns (equi keys carry the right key values —
    // the coalesce convention), right payload columns from the row itself
    def rightAsOut(rr: DataFrame): DataFrame = {
      val cols = df.columns.toSeq.map { c =>
        if (keyCols.contains(c)) col(c)
        else lit(null).cast(df.schema(c).dataType).as(c)
      } ++ rPayloadCols.map(c => col(s"$PAY.$c").as(c))
      rr.select(cols: _*)
    }
    val outer = rightAsOut(unmatchedRight).unionByName(rightAsOut(nullKeyed))
    reset(out.unionByName(outer))
  }
}
