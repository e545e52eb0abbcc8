package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Fns, Selector}
import graft.operators.JoinKey.{Closest, Equi, Theta}

/** Driver contract — one `queries` entry + one `oracleSql` entry per
  * implemented operator from SURVEY.md §2, all expressed through the
  * TidierFrame fluent API (the library under test).
  *
  * Determinism rules for oracle hash-matching (SURVEY §7.3 item 5):
  *  - every query ends with an ORDER BY on a unique key, mirrored in SQL
  *    (nulls ordering made explicit on both sides);
  *  - double-typed SUM/AVG go through DECIMAL(25,2) so Spark's and
  *    DuckDB's float summation order can't produce differing ulps, then
  *    cast back to DOUBLE so schemas line up;
  *  - per-row double arithmetic (x*(1-y)) is bit-identical IEEE 754 on
  *    both engines and needs no special handling.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): TidierFrame =
    Tidier.read(s, s"$dir/$name.parquet")

  /** events.parquet stores ts as TIMESTAMP(NANOS); with
    * spark.sql.legacy.parquet.nanosAsLong=true it scans as LongType
    * nanos — convert to a proper microsecond timestamp at the scan. */
  private def tev(s: SparkSession, dir: String): TidierFrame = {
    val raw = t(s, dir, "events")
    if (raw.df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      // integer `div`, NOT `/`: a nanosecond epoch (~1.7e18) overflows
      // double's 53-bit mantissa and would round the microseconds.
      raw.mutate("ts" -> timestamp_micros(expr("ts div 1000")))
    else raw
  }

  /** exact decimal sum of a 2-dp double column, surfaced as double */
  private def dsum(c: Column): Column = sum(c.cast("decimal(25,2)")).cast("double")
  private def davg(c: Column): Column = sum(c.cast("decimal(25,2)")).cast("double") / count(c)

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // =====================================================================
    // §2.4 aggregation
    // =====================================================================
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

    "q_count" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .countSorted("l_returnflag", "l_linestatus")
        .arrange(desc("n"), col("l_returnflag"), col("l_linestatus"))
        .df),

    "q_across" -> ((s, dir) => {
      val g = t(s, dir, "lineitem").groupBy("l_returnflag")
      g.summarize(g.across(
          Seq[Selector]("l_quantity", "l_extendedprice"),
          "sum" -> dsum,
          "max" -> (c => max(c))): _*)
        .arrange("l_returnflag")
        .df
    }),

    "q_group_exp" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("bucket" -> Fns.ifElse(col("o_totalprice") > 200000d, lit("big"), lit("small")))
        .summarize("n_orders" -> Fns.n(), "total" -> dsum(col("o_totalprice")))
        .arrange("bucket")
        .df),

    "q_grouped_mutate" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .mutate("flag_qty" -> sum(col("l_quantity").cast("decimal(25,2)")).cast("double"))
        .select("l_orderkey", "l_linenumber", "l_returnflag", "flag_qty")
        .arrange("l_orderkey", "l_linenumber")
        .head(200)
        .df),

    "q_summarize_stats" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_linestatus")
        .summarize(
          "min_price" -> min(col("l_extendedprice")),
          "max_price" -> max(col("l_extendedprice")),
          "n_parts" -> Fns.nDistinct(col("l_partkey")),
          "n_rows" -> Fns.n())
        .arrange("l_linestatus")
        .df),

    // =====================================================================
    // §2.2 projection / filtering / row ops
    // =====================================================================
    "q_select" -> ((s, dir) =>
      t(s, dir, "part")
        .select("p_partkey", Selector.startsWith("p_b"), Selector.contains("name"))
        .arrange("p_partkey")
        .head(100)
        .df),

    "q_filter" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(
          col("l_discount") > 0.05,
          col("l_returnflag") === "A",
          col("l_linestatus").isin("F", "O"))
        .select("l_orderkey", "l_linenumber", "l_discount", "l_returnflag", "l_linestatus")
        .arrange("l_orderkey", "l_linenumber")
        .head(500)
        .df),

    "q_mutate" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .mutate(
          "revenue" -> col("l_extendedprice") * (lit(1d) - col("l_discount")),
          "disc_band" -> Fns.ifElse(col("l_discount") > 0.05, lit("hi"), lit("lo")),
          "qty_int" -> Fns.asInteger(col("l_quantity")))
        .select("l_orderkey", "l_linenumber", "revenue", "disc_band", "qty_int")
        .arrange("l_orderkey", "l_linenumber")
        .head(500)
        .df),

    "q_transmute" -> ((s, dir) =>
      t(s, dir, "orders")
        .transmute(
          "o_orderkey" -> col("o_orderkey"),
          "tax" -> col("o_totalprice") * 0.1d)
        .arrange("o_orderkey")
        .head(300)
        .df),

    "q_rename" -> ((s, dir) =>
      t(s, dir, "customer")
        .rename("cust_id" -> "c_custkey", "balance" -> "c_acctbal")
        .select("cust_id", "balance", "c_mktsegment")
        .arrange("cust_id")
        .head(300)
        .df),

    "q_relocate" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .relocate(Seq[Selector]("l_returnflag", "l_linestatus"), before = Some("l_orderkey"))
        .select("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber")
        .arrange("l_orderkey", "l_linenumber")
        .head(200)
        .df),

    "q_distinct" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .distinct("l_returnflag", "l_linestatus")
        .arrange("l_returnflag", "l_linestatus")
        .df),

    "q_drop_missing" -> ((s, dir) =>
      t(s, dir, "customer")
        .mutate("seg2" -> Fns.missingIf(col("c_mktsegment"), lit("BUILDING")))
        .dropMissing("seg2")
        .select("c_custkey", "seg2")
        .arrange("c_custkey")
        .df),

    "q_head" -> ((s, dir) =>
      t(s, dir, "orders")
        .arrange("o_orderkey")
        .head(6)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .df),

    "q_arrange" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .arrange(desc("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
        .select("l_extendedprice", "l_orderkey", "l_linenumber")
        .head(100)
        .df),

    // =====================================================================
    // §2.3 joins
    // =====================================================================
    "q_join_inner" -> ((s, dir) =>
      t(s, dir, "orders")
        .innerJoin(t(s, dir, "customer"), Equi("o_custkey", "c_custkey"))
        .arrange("o_orderkey")
        .head(300)
        .df),

    "q_join_left" -> ((s, dir) =>
      t(s, dir, "customer")
        .leftJoin(t(s, dir, "orders"), Equi("c_custkey", "o_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .arrange(col("c_custkey"), col("o_orderkey").asc_nulls_first)
        .head(400)
        .df),

    "q_join_right" -> ((s, dir) =>
      t(s, dir, "orders")
        .rightJoin(t(s, dir, "customer"), Equi("o_custkey", "c_custkey"))
        .select("o_custkey", "o_orderkey", "c_name")
        .arrange(col("o_custkey"), col("o_orderkey").asc_nulls_first)
        .head(400)
        .df),

    "q_join_full" -> ((s, dir) => {
      val bigOrders = t(s, dir, "orders").filter(col("o_totalprice") > 150000d)
      val richCust = t(s, dir, "customer").filter(col("c_acctbal") > 5000d)
      bigOrders
        .fullJoin(richCust, Equi("o_custkey", "c_custkey"))
        .select("o_custkey", "o_orderkey", "c_name", "c_acctbal")
        .arrange(col("o_custkey"), col("o_orderkey").asc_nulls_first)
        .head(500)
        .df
    }),

    "q_join_semi" -> ((s, dir) =>
      t(s, dir, "customer")
        .semiJoin(
          t(s, dir, "orders").filter(col("o_totalprice") > 250000d),
          Equi("c_custkey", "o_custkey"))
        .arrange("c_custkey")
        .df),

    "q_join_anti" -> ((s, dir) =>
      t(s, dir, "customer")
        .antiJoin(t(s, dir, "orders"), Equi("c_custkey", "o_custkey"))
        .arrange("c_custkey")
        .df),

    "q_join_theta" -> ((s, dir) =>
      t(s, dir, "nation")
        .innerJoin(t(s, dir, "region"), Theta("n_regionkey", "!=", "r_regionkey"))
        .arrange("n_nationkey", "r_regionkey")
        .df),

    "q_join_multi" -> ((s, dir) =>
      t(s, dir, "orders")
        .innerJoin(t(s, dir, "customer"), Equi("o_custkey", "c_custkey"))
        .innerJoinBroadcast(t(s, dir, "nation"), Equi("c_nationkey", "n_nationkey"))
        .groupBy("n_name")
        .summarize("revenue" -> dsum(col("o_totalprice")), "n_orders" -> Fns.n())
        .arrange("n_name")
        .df),

    "q_asof_join" -> ((s, dir) => {
      val ev = tev(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "value")
      val errors = ev.filter(col("event_type") === "error")
        .transmute(
          "user_id" -> col("user_id"),
          "err_ts" -> col("ts"),
          "err_value" -> col("value"))
      clicks
        .innerJoin(errors, Equi("user_id", "user_id"), Closest("ts", ">=", "err_ts"))
        .arrange("event_id")
        .df
    }),

    // =====================================================================
    // §2.7 set operations
    // =====================================================================
    "q_union" -> ((s, dir) => {
      val o = t(s, dir, "orders").select("o_orderkey", "o_orderstatus")
      val a = o.filter(col("o_orderstatus").isin("F", "P"))
      val b = o.filter(col("o_orderstatus").isin("P", "O"))
      a.union(b).arrange("o_orderkey").df
    }),

    "q_union_all" -> ((s, dir) => {
      val o = t(s, dir, "orders").select("o_orderkey", "o_orderstatus")
      val a = o.filter(col("o_orderstatus").isin("F", "P"))
      val b = o.filter(col("o_orderstatus").isin("P", "O"))
      a.unionAll(b).arrange("o_orderkey", "o_orderstatus").df
    }),

    "q_intersect" -> ((s, dir) => {
      val o = t(s, dir, "orders").select("o_orderkey", "o_orderstatus")
      val a = o.filter(col("o_orderstatus").isin("F", "P"))
      val b = o.filter(col("o_orderstatus").isin("P", "O"))
      a.intersect(b).arrange("o_orderkey").df
    }),

    "q_setdiff" -> ((s, dir) => {
      val o = t(s, dir, "orders").select("o_orderkey", "o_orderstatus")
      val a = o.filter(col("o_orderstatus").isin("F", "P"))
      val b = o.filter(col("o_orderstatus").isin("P", "O"))
      a.setdiff(b).arrange("o_orderkey").df
    }),
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

    "q_count" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY n DESC, l_returnflag, l_linestatus""".stripMargin,

    "q_across" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS l_quantity_sum,
        |  MAX(l_quantity) AS l_quantity_max,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) AS l_extendedprice_sum,
        |  MAX(l_extendedprice) AS l_extendedprice_max
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_group_exp" ->
      """SELECT CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS bucket,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q_grouped_mutate" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) OVER (PARTITION BY l_returnflag) AS DOUBLE) AS flag_qty
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber LIMIT 200""".stripMargin,

    "q_summarize_stats" ->
      """SELECT l_linestatus, MIN(l_extendedprice) AS min_price,
        |  MAX(l_extendedprice) AS max_price,
        |  COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q_select" ->
      "SELECT p_partkey, p_brand, p_name FROM part ORDER BY p_partkey LIMIT 100",

    "q_filter" ->
      """SELECT l_orderkey, l_linenumber, l_discount, l_returnflag, l_linestatus
        |FROM lineitem
        |WHERE l_discount > 0.05 AND l_returnflag = 'A' AND l_linestatus IN ('F','O')
        |ORDER BY l_orderkey, l_linenumber LIMIT 500""".stripMargin,

    "q_mutate" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1 - l_discount) AS revenue,
        |  CASE WHEN l_discount > 0.05 THEN 'hi' ELSE 'lo' END AS disc_band,
        |  TRY_CAST(l_quantity AS INT) AS qty_int
        |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 500""".stripMargin,

    "q_transmute" ->
      "SELECT o_orderkey, o_totalprice * 0.1 AS tax FROM orders ORDER BY o_orderkey LIMIT 300",

    "q_rename" ->
      """SELECT c_custkey AS cust_id, c_acctbal AS balance, c_mktsegment
        |FROM customer ORDER BY cust_id LIMIT 300""".stripMargin,

    "q_relocate" ->
      """SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber
        |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 200""".stripMargin,

    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_drop_missing" ->
      """SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg2
        |FROM customer WHERE NULLIF(c_mktsegment, 'BUILDING') IS NOT NULL
        |ORDER BY c_custkey""".stripMargin,

    "q_head" ->
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 6",

    "q_arrange" ->
      """SELECT l_extendedprice, l_orderkey, l_linenumber FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,

    "q_join_inner" ->
      """SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice,
        |  o.o_orderdate, o.o_orderpriority,
        |  c.c_name, c.c_nationkey, c.c_acctbal, c.c_mktsegment
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o.o_orderkey LIMIT 300""".stripMargin,

    "q_join_left" ->
      """SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
        |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |ORDER BY c.c_custkey, o.o_orderkey ASC NULLS FIRST LIMIT 400""".stripMargin,

    "q_join_right" ->
      """SELECT COALESCE(o.o_custkey, c.c_custkey) AS o_custkey, o.o_orderkey, c.c_name
        |FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o_custkey, o.o_orderkey ASC NULLS FIRST LIMIT 400""".stripMargin,

    "q_join_full" ->
      """SELECT COALESCE(o.o_custkey, c.c_custkey) AS o_custkey, o.o_orderkey, c.c_name, c.c_acctbal
        |FROM (SELECT * FROM orders WHERE o_totalprice > 150000) o
        |FULL JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
        |  ON o.o_custkey = c.c_custkey
        |ORDER BY o_custkey, o.o_orderkey ASC NULLS FIRST LIMIT 500""".stripMargin,

    "q_join_semi" ->
      """SELECT c.* FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_totalprice > 250000 AND c.c_custkey = o.o_custkey)
        |ORDER BY c.c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c.* FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE c.c_custkey = o.o_custkey)
        |ORDER BY c.c_custkey""".stripMargin,

    "q_join_theta" ->
      """SELECT n.n_nationkey, n.n_name, n.n_regionkey, r.r_regionkey, r.r_name
        |FROM nation n JOIN region r ON n.n_regionkey != r.r_regionkey
        |ORDER BY n.n_nationkey, r.r_regionkey""".stripMargin,

    "q_join_multi" ->
      """SELECT n.n_name,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin,

    "q_asof_join" ->
      """SELECT l.event_id, l.user_id, l.ts, l.value, r.err_ts, r.err_value
        |FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click') l
        |ASOF JOIN (SELECT user_id, ts AS err_ts, value AS err_value
        |           FROM events WHERE event_type = 'error') r
        |  ON l.user_id = r.user_id AND l.ts >= r.err_ts
        |ORDER BY l.event_id""".stripMargin,

    "q_union" ->
      """SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus IN ('F','P')
        |UNION
        |SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus IN ('P','O')
        |ORDER BY o_orderkey""".stripMargin,

    "q_union_all" ->
      """SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus IN ('F','P')
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus IN ('P','O')
        |ORDER BY o_orderkey, o_orderstatus""".stripMargin,

    "q_intersect" ->
      """SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus IN ('F','P')
        |INTERSECT
        |SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus IN ('P','O')
        |ORDER BY o_orderkey""".stripMargin,

    "q_setdiff" ->
      """SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus IN ('F','P')
        |EXCEPT
        |SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus IN ('P','O')
        |ORDER BY o_orderkey""".stripMargin,
  )
}
