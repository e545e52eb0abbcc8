package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnConversions, ExpressionUtils}

/** Column ↔ Catalyst Expression bridge.
  *
  * Spark 4.x hides the classic converter behind `private[sql]`; this
  * object lives under `org.apache.spark.sql` solely to re-export the two
  * conversions graft's window-rewrite needs. No Spark internals are
  * modified.
  *
  * `ColumnConversions.expression` runs the full ColumnNode → Catalyst
  * conversion eagerly (ExpressionUtils.expression would only produce a
  * lazy `ColumnNodeExpression` leaf that a transform can't see into). */
object GraftShim {
  def expression(c: Column): Expression = ColumnConversions.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Build a DataFrame straight from a logical plan (classic
    * Dataset.ofRows is private[sql]) — used by RangeJoinRule's
    * interval-statistics probe. */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Wrap a (typically cached) DataFrame in a fresh LogicalRDD leaf
    * WITHOUT the InternalRow → Row → InternalRow double conversion that
    * `spark.createDataFrame(df.rdd, df.schema)` pays: `df.rdd` plans a
    * deserializer to external Rows and createDataFrame re-encodes them,
    * costing two full row conversions every time the leaf is read.
    * `internalCreateDataFrame` (private[sql]) builds the leaf over the
    * InternalRow RDD directly — the iterative operators (PageRank,
    * HyperBall, label propagation) re-read their persisted state every
    * round through this leaf, so the conversion tax was per-iteration.
    * Laziness, cache-eviction recompute-from-lineage, and plan
    * truncation semantics are identical to the Row round-trip.
    *
    * Additionally the leaf KEEPS the frame's physical output
    * partitioning/ordering and origin stats (`LogicalRDD.fromDataset` —
    * the same helper `Dataset.checkpoint` uses): a cached iterative
    * state that is already hash-partitioned by its join key no longer
    * re-Exchanges when the next round joins on that key. */
  def internalDf(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    org.apache.spark.sql.classic.Dataset.ofRows(
      cds.sparkSession,
      org.apache.spark.sql.execution.LogicalRDD
        .fromDataset(cds.queryExecution.toRdd, cds, isStreaming = false))
  }

  /** Register a custom Catalyst expression builder as a SQL-callable
    * function on this session (sessionState is private[sql]). */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Register a TABLE function (`SELECT * FROM f('arg')`) on this
    * session — the tableFunctionRegistry is equally private[sql]. */
  def registerTableFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
    spark.sessionState.tableFunctionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
