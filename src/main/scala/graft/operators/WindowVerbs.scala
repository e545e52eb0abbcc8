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
    require(n >= 1, s"slice needs n >= 1, got $n")
    if (groups.nonEmpty) {
      val ord = if (asc) df.col(c).asc else df.col(c).desc
      val w = Window.partitionBy(groups.map(df.col): _*).orderBy(ord)
      val ranked = df.withColumn(rankCol, rank().over(w))
      reset(ranked.filter(col(rankCol) <= n).drop(rankCol))
    } else {
      // Ungrouped top-n-with-ties WITHOUT a single-task global window
      // (Window.orderBy with no partitionBy pushes EVERY row through
      // one task — a straggler-killer at scale). Instead: TakeOrdered
      // finds the rank-n threshold (distributed partial top-n per
      // partition, n rows reduced), then ONE narrow filter pass keeps
      // ties. Keep-set is IDENTICAL to RANK() <= n incl. null
      // ordering: asc = NULLS FIRST so nulls always tie at rank 1;
      // desc = NULLS LAST so nulls qualify only when every non-null
      // row already does (all non-nulls fit inside the limit).
      val ord = if (asc) col("__graft_v").asc else col("__graft_v").desc
      val firstN = df.select(df.col(c).as("__graft_v")).orderBy(ord).limit(n)
      // fully-qualified: the TidierFrame `count` VERB shadows the agg fn
      val thr = firstN.agg(
        org.apache.spark.sql.functions.count(lit(1)).as("__graft_cnt"),
        org.apache.spark.sql.functions.count(col("__graft_v")).as("__graft_nn"),
        (if (asc) max(col("__graft_v")) else min(col("__graft_v"))).as("__graft_thr"))
      val keep =
        if (asc) df.col(c).isNull || df.col(c) <= col("__graft_thr")
        else (df.col(c).isNotNull && df.col(c) >= col("__graft_thr")) ||
          (df.col(c).isNull && col("__graft_nn") < col("__graft_cnt"))
      // ONE-row broadcast nested-loop join (not an O(n²) cross join):
      // the threshold row replicates to every task, the filter stays
      // narrow and partition-parallel
      reset(df.crossJoin(broadcast(thr)).filter(keep)
        .drop("__graft_cnt", "__graft_nn", "__graft_thr"))
    }
  }

  /** `@slice_sample(n)` — n random rows per group
    * (reference: src/slices_sq.jl:152-208). Seeded for testability
    * (SURVEY §7.1 deviation: determinism over ORDER BY RANDOM()).
    * Ungrouped: TakeOrdered over rand(seed) — no single-task global
    * window (same scale reasoning as [[slice]]). */
  def sliceSample(n: Int, seed: Long = 42L): TidierFrame = {
    if (groups.isEmpty) reset(df.orderBy(rand(seed)).limit(n))
    else {
      val w = Window.partitionBy(groups.map(df.col): _*).orderBy(rand(seed))
      val ranked = df.withColumn(rankCol, row_number().over(w))
      reset(ranked.filter(col(rankCol) <= n).drop(rankCol))
    }
  }
}
