package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.TidierFrame
import graft.functions.Selector

/** Window-state verbs (SURVEY §2.5). The state is consumed by the next
  * `mutate` (see WindowRewrite), exactly like the reference's
  * `window_order`/`windowFrame` clauses
  * (reference: src/windows.jl:4-177, src/db_parsing.jl:453-472). */
trait WindowVerbs { self: TidierFrame =>

  /** `@window_order` (reference: src/windows.jl:4-54). */
  def windowOrder(cols: Column*): TidierFrame = copy(winOrder = cols)

  /** `@window_frame(from, to)` — ROWS BETWEEN in the signed-int
    * convention (negative = preceding, 0 = current row); one-sided
    * variants fill with UNBOUNDED (reference: src/windows.jl:59-177). */
  def windowFrame(from: Long, to: Long): TidierFrame =
    copy(winFrame = Some((from, to)))
  def windowFrameFrom(from: Long): TidierFrame =
    copy(winFrame = Some((from, Long.MaxValue)))
  def windowFrameTo(to: Long): TidierFrame =
    copy(winFrame = Some((Long.MinValue, to)))
}

/** Slice verbs (SURVEY §2.6) — per-group top-k / sampling
  * (reference: src/slices_sq.jl). */
trait SliceVerbs { self: TidierFrame =>

  private val rankCol = "__graft_rank"

  /** `@slice_max(col, n)` — keeps ties (RANK, not ROW_NUMBER;
    * reference: src/slices_sq.jl:4-72). Partitioned by current groups.
    * At scale this is the classic per-group top-k: one shuffle on the
    * group keys, no global sort. */
  def sliceMax(c: String, n: Int = 1): TidierFrame = slice(c, n, asc = false)

  /** `@slice_min(col, n)` (reference: src/slices_sq.jl:77-147). */
  def sliceMin(c: String, n: Int = 1): TidierFrame = slice(c, n, asc = true)

  private def slice(c: String, n: Int, asc: Boolean): TidierFrame = {
    val ord = if (asc) df.col(c).asc else df.col(c).desc
    val w =
      if (groups.isEmpty) Window.orderBy(ord)
      else Window.partitionBy(groups.map(df.col): _*).orderBy(ord)
    val ranked = df.withColumn(rankCol, rank().over(w))
    reset(ranked.filter(col(rankCol) <= n).drop(rankCol))
  }

  /** `@slice_sample(n)` — n random rows per group
    * (reference: src/slices_sq.jl:152-208). Seeded for testability
    * (SURVEY §7.1 deviation: determinism over ORDER BY RANDOM()). */
  def sliceSample(n: Int, seed: Long = 42L): TidierFrame = {
    val w =
      if (groups.isEmpty) Window.orderBy(rand(seed))
      else Window.partitionBy(groups.map(df.col): _*).orderBy(rand(seed))
    val ranked = df.withColumn(rankCol, row_number().over(w))
    reset(ranked.filter(col(rankCol) <= n).drop(rankCol))
  }
}
