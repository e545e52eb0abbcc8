package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Fns, Selector}
import graft.functions.Selector._

/** Driver contract — one `queries` entry + one `oracleSql` entry per
  * implemented operator from SURVEY.md §2, all expressed through the
  * TidierFrame fluent API (the library under test).
  *
  * Determinism rules for oracle hash-matching (SURVEY §7.3 item 5):
  *  - every query ends with an ORDER BY on a unique key, mirrored in SQL;
  *  - double-typed SUM/AVG go through DECIMAL(25,2) so Spark's and
  *    DuckDB's float summation order can't produce differing ulps, then
  *    cast back to DOUBLE so schemas line up.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): TidierFrame =
    Tidier.read(s, s"$dir/$name.parquet")

  /** exact decimal sum of a 2-dp double column, surfaced as double */
  private def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast("decimal(25,2)")).cast("double")
  private def davg(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast("decimal(25,2)")).cast("double") / count(c)

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.4 aggregation: TPC-H Q1 shape ----
    "q1_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .summarize(
          "sum_qty" -> dsum(col("l_quantity")),
          "sum_base_price" -> dsum(col("l_extendedprice")),
          "avg_qty" -> davg(col("l_quantity")),
          "n_rows" -> Fns.n())
        .arrange("l_returnflag", "l_linestatus")
        .df),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
  )
}
