package graft.operators

import graft.TidierFrame

/** Set operations (SURVEY §2.7) — by position, like SQL, matching the
  * reference's `SELECT * FROM l <OP> SELECT * FROM r`
  * (reference: src/union_intersect_setdiff.jl:3-73). */
trait SetVerbs { self: TidierFrame =>

  /** `@union` — SQL UNION (dedup); `all=true` → UNION ALL
    * (reference: src/union_intersect_setdiff.jl:79-100). */
  def union(other: TidierFrame, all: Boolean = false): TidierFrame =
    if (all) reset(df.union(other.df)) else reset(df.union(other.df).distinct())

  /** `@union_all` (reference: src/union_intersect_setdiff.jl:105-117). */
  def unionAll(other: TidierFrame): TidierFrame = reset(df.union(other.df))

  /** `@intersect` (reference: src/union_intersect_setdiff.jl:122-144). */
  def intersect(other: TidierFrame, all: Boolean = false): TidierFrame =
    if (all) reset(df.intersectAll(other.df)) else reset(df.intersect(other.df))

  /** `@setdiff` — SQL EXCEPT (reference: src/union_intersect_setdiff.jl:149-172). */
  def setdiff(other: TidierFrame, all: Boolean = false): TidierFrame =
    if (all) reset(df.exceptAll(other.df)) else reset(df.except(other.df))
}
