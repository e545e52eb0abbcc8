package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst Expression bridge.
  *
  * Spark 4.x hides the classic converter behind `private[sql]`; this
  * object lives under `org.apache.spark.sql` solely to re-export the two
  * conversions graft's window-rewrite needs. No Spark internals are
  * modified. */
object GraftShim {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
