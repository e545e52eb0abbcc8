package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Fns
import graft.operators.JoinKey.{Equi, Theta}

/** The full TPC-H query suite expressed through the TidierFrame verb
  * API, completing the q3/q5/q10/q18 set already in [[SparkEntry]] —
  * the strongest available proof that the verb surface composes into
  * every classic warehouse plan shape (decorrelated subqueries,
  * EXISTS/NOT EXISTS as semi/anti joins, scalar-aggregate thresholds
  * as broadcast one-row joins, disjunctive join predicates,
  * two-level aggregation, nation self-joins).
  *
  * The driver fixtures are a REDUCED TPC-H schema (no partsupp, no
  * commit/receipt dates, no phone/container/shipmode columns).
  * Queries whose every column exists run verbatim directly (q1, q6,
  * q7, q8, q13, q14, q15, q17, q19); the rest run verbatim over a
  * deterministic key-arithmetic synthesis of the missing relations/
  * columns that a CTE prologue replays identically in each oracle
  * (q2, q4, q9, q11, q12, q16, q20, q21, q22 — see partsuppF /
  * lineitemX / synthProlog), and ALSO as pattern-faithful
  * fixture-native adaptations carrying an `a` suffix (q_tpch_q2a …,
  * same plan shape, fixture columns standing in). Constants are
  * chosen so every query is non-empty at all three driver scales.
  *
  * Cross-engine determinism follows the proven q3/q5/q10/q18 recipe:
  * money arithmetic entirely in DECIMAL (exact, order-independent),
  * one final cast to DOUBLE; scalar thresholds derived from DECIMAL
  * totals (never from re-summing doubles, whose order differs per
  * engine); every output ends in a total ORDER BY.
  *
  * Scale notes (100 TB): every scalar subquery is decorrelated into
  * an aggregate frame joined back (broadcast when one row / tiny);
  * per-group correlated averages (q17) become a groupBy + equi join
  * on the group key — the standard distributed decorrelation; no
  * driver-side collect anywhere in the suite.
  */
object TpchSuite {

  private def t(s: SparkSession, dir: String, name: String): TidierFrame =
    Tidier.read(s, s"$dir/$name.parquet")

  private def dsum(c: Column): Column = sum(c.cast("decimal(25,2)")).cast("double")
  private def davg(c: Column): Column = sum(c.cast("decimal(25,2)")).cast("double") / count(c)
  /** exact per-row DECIMAL product extprice*(1-discount) */
  private def revCol: Column =
    col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)"))
  private def revSum: Column = sum(revCol).cast("double")
  private def ts(d: String): Column = lit(d).cast("timestamp")

  /** one-row aggregate broadcast-cross-joined onto a frame — the
    * scale-correct scalar-subquery shape (no driver collect). */
  private def withScalar(f: TidierFrame, one: TidierFrame): TidierFrame =
    Tidier.from(f.df.crossJoin(broadcast(one.df)))

  // ---- deterministic synthesis of the TPC-H relations/columns the ----
  // ---- reduced fixture lacks (partsupp, commit/receipt dates,     ----
  // ---- shipmode, phone/address/comment/mfgr)                      ----
  //
  // The same arithmetic runs as a CTE prologue in the DuckDB oracles
  // ([[synthProlog]]), so engine and oracle compute over IDENTICAL
  // synthesized data and the published TPC-H query text can run
  // verbatim against it. All synthesis is integer arithmetic over the
  // keys (cross-engine exact); money lands in DECIMAL(12,2) via an
  // exact cents * 0.01 decimal product. partsupp is 4 suppliers per
  // part (dbgen's shape), a narrow 4x projection of part — scale-free.

  /** partsupp: ps_suppkey_i = (p_partkey*7 + i*13) % |supplier| for
    * i in 0..3 (distinct mod any supplier count ≥ 4 not divisible by
    * 13); availqty/supplycost are key-hash arithmetic */
  private def partsuppF(s: SparkSession, dir: String): TidierFrame = {
    val scnt = t(s, dir, "supplier").df.agg(count(lit(1)).as("n_supp"))
    val base = t(s, dir, "part").df.select(col("p_partkey"))
      .crossJoin(broadcast(scnt))
      .select(col("p_partkey"), col("n_supp"),
        explode(array(lit(0L), lit(1L), lit(2L), lit(3L))).as("i"))
    val sk = (col("p_partkey") * 7 + col("i") * 13) % col("n_supp")
    Tidier.from(base.select(
      col("p_partkey").as("ps_partkey"),
      sk.as("ps_suppkey"),
      ((col("p_partkey") * 17 + sk * 23) % 9999 + 1).as("ps_availqty"),
      (((col("p_partkey") * 31 + sk * 37) % 99901 + 100).cast("decimal(12,2)") *
        expr("CAST(0.01 AS DECIMAL(3,2))")).cast("decimal(12,2)").as("ps_supplycost")))
  }

  /** lineitem + l_commitdate (ship ± 30d), l_receiptdate (ship + 1..30d),
    * l_shipmode (7-way key hash) */
  private def lineitemX(s: SparkSession, dir: String): TidierFrame = Tidier.from(
    t(s, dir, "lineitem").df
      .withColumn("l_commitdate", expr(
        "timestampadd(DAY, CAST((l_orderkey * 7 + l_linenumber * 3) % 61 - 30 AS INT), l_shipdate)"))
      .withColumn("l_receiptdate", expr(
        "timestampadd(DAY, CAST((l_orderkey * 11 + l_linenumber * 5) % 30 + 1 AS INT), l_shipdate)"))
      .withColumn("l_shipmode", expr(
        """CASE CAST((l_orderkey * 3 + l_linenumber) % 7 AS INT)
          |  WHEN 0 THEN 'REG AIR' WHEN 1 THEN 'AIR' WHEN 2 THEN 'RAIL'
          |  WHEN 3 THEN 'SHIP' WHEN 4 THEN 'TRUCK' WHEN 5 THEN 'MAIL'
          |  ELSE 'FOB' END""".stripMargin)))

  /** supplier + s_address / s_phone (nationkey+10 country code) /
    * s_comment (every 10th supplier carries the Customer Complaints
    * marker q16 filters on) */
  private def supplierX(s: SparkSession, dir: String): TidierFrame = Tidier.from(
    t(s, dir, "supplier").df
      .withColumn("s_address", concat(lit("ADDR_"), col("s_suppkey").cast("string")))
      .withColumn("s_phone", concat((col("s_nationkey") + 10).cast("string"),
        lit("-555-"), col("s_suppkey").cast("string")))
      .withColumn("s_comment",
        when(col("s_suppkey") % 10 === 7,
          lit("slow delivery Customer service Complaints logged"))
          .otherwise(lit("fine supplier, prompt deliveries"))))

  /** part + p_mfgr */
  private def partX(s: SparkSession, dir: String): TidierFrame = Tidier.from(
    t(s, dir, "part").df
      .withColumn("p_mfgr", concat(lit("Manufacturer#"),
        (col("p_partkey") % 5 + 1).cast("string"))))

  /** customer + c_phone (nationkey+10 country code — q22's cntrycode) */
  private def customerX(s: SparkSession, dir: String): TidierFrame = Tidier.from(
    t(s, dir, "customer").df
      .withColumn("c_phone", concat((col("c_nationkey") + 10).cast("string"),
        lit("-555-"), col("c_custkey").cast("string"))))

  /** the oracle-side twin of the synth helpers: CTEs shadowing the
    * fixture relation names (inner references escape the shadow via
    * DuckDB's `main.` schema qualifier), so the published TPC-H query
    * text that follows runs verbatim */
  private val synthProlog: String =
    """WITH
      |scnt AS (SELECT COUNT(*) AS n_supp FROM main.supplier),
      |partsupp AS (
      |  SELECT p_partkey AS ps_partkey,
      |         (p_partkey * 7 + gen.i * 13) % n_supp AS ps_suppkey,
      |         (p_partkey * 17 + ((p_partkey * 7 + gen.i * 13) % n_supp) * 23) % 9999 + 1
      |           AS ps_availqty,
      |         CAST(CAST((p_partkey * 31 + ((p_partkey * 7 + gen.i * 13) % n_supp) * 37)
      |           % 99901 + 100 AS DECIMAL(12,2)) * CAST(0.01 AS DECIMAL(3,2))
      |           AS DECIMAL(12,2)) AS ps_supplycost
      |  FROM main.part, scnt, (VALUES (0),(1),(2),(3)) AS gen(i)),
      |lineitem AS (
      |  SELECT l.*,
      |    l_shipdate + INTERVAL ((l_orderkey * 7 + l_linenumber * 3) % 61 - 30) DAY
      |      AS l_commitdate,
      |    l_shipdate + INTERVAL ((l_orderkey * 11 + l_linenumber * 5) % 30 + 1) DAY
      |      AS l_receiptdate,
      |    CASE CAST((l_orderkey * 3 + l_linenumber) % 7 AS INT)
      |      WHEN 0 THEN 'REG AIR' WHEN 1 THEN 'AIR' WHEN 2 THEN 'RAIL' WHEN 3 THEN 'SHIP'
      |      WHEN 4 THEN 'TRUCK' WHEN 5 THEN 'MAIL' ELSE 'FOB' END AS l_shipmode
      |  FROM main.lineitem l),
      |supplier AS (
      |  SELECT s.*, 'ADDR_' || CAST(s_suppkey AS VARCHAR) AS s_address,
      |    CAST(s_nationkey + 10 AS VARCHAR) || '-555-' || CAST(s_suppkey AS VARCHAR)
      |      AS s_phone,
      |    CASE WHEN s_suppkey % 10 = 7 THEN 'slow delivery Customer service Complaints logged'
      |         ELSE 'fine supplier, prompt deliveries' END AS s_comment
      |  FROM main.supplier s),
      |part AS (
      |  SELECT p.*, 'Manufacturer#' || CAST(p_partkey % 5 + 1 AS VARCHAR) AS p_mfgr
      |  FROM main.part p),
      |customer AS (
      |  SELECT c.*,
      |    CAST(c_nationkey + 10 AS VARCHAR) || '-555-' || CAST(c_custkey AS VARCHAR)
      |      AS c_phone
      |  FROM main.customer c)
      |""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q1 pricing summary — the full 8-aggregate version (q1_agg is the
    // reduced flagship); fixture dates run to 2001-11 so the "90 days
    // before end" pivot lands at 2001-08-06
    "q_tpch_q1" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= ts("2001-08-06"))
        .groupBy("l_returnflag", "l_linestatus")
        .summarize(
          "sum_qty" -> dsum(col("l_quantity")),
          "sum_base_price" -> sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double"),
          "sum_disc_price" -> revSum,
          "sum_charge" -> sum(revCol *
            (lit(1).cast("decimal(4,2)") + col("l_tax").cast("decimal(4,2)"))).cast("double"),
          "avg_qty" -> davg(col("l_quantity")),
          "avg_price" -> davg(col("l_extendedprice")),
          "avg_disc" -> davg(col("l_discount")),
          "count_order" -> Fns.n())
        .arrange("l_returnflag", "l_linestatus")
        .df),

    // Q2 adapted (no partsupp): cheapest EUROPE sale per part — the
    // correlated-MIN subquery decorrelated into a per-part aggregate
    // joined back on (partkey, price=min)
    "q_tpch_q2a" -> ((s, dir) => {
      val esales = t(s, dir, "lineitem")
        .innerJoin(t(s, dir, "supplier"), Equi("l_suppkey", "s_suppkey"))
        .innerJoinBroadcast(t(s, dir, "nation"), Equi("s_nationkey", "n_nationkey"))
        .innerJoinBroadcast(
          t(s, dir, "region").filter(col("r_name") === "EUROPE"),
          Equi("n_regionkey", "r_regionkey"))
        .select("l_partkey", "l_extendedprice", "s_acctbal", "s_name", "n_name")
      val minp = esales.groupBy("l_partkey")
        .summarize("min_price" -> min(col("l_extendedprice")))
        .rename("mp_partkey" -> "l_partkey")
      esales
        .innerJoin(minp, Equi("l_partkey", "mp_partkey"),
          Theta("l_extendedprice", "==", "min_price"))
        .innerJoin(t(s, dir, "part").filter(col("p_type") === "LARGE"),
          Equi("l_partkey", "p_partkey"))
        .rename("p_partkey" -> "l_partkey") // the equi key survives under the left name
        .distinct("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "min_price")
        .arrange(desc("s_acctbal"), col("n_name"), col("s_name"), col("p_partkey"))
        .head(100)
        .df
    }),

    // Q4 adapted (no commit/receipt dates: returned lines stand in for
    // late lines) — EXISTS as a semi join against the fact table
    "q_tpch_q4a" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-07-01") &&
                col("o_orderdate") < ts("1996-10-01"))
        .semiJoin(
          t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
            .transmute("lk" -> col("l_orderkey")),
          Equi("o_orderkey", "lk"))
        .groupBy("o_orderpriority")
        .summarize("order_count" -> Fns.n())
        .arrange("o_orderpriority")
        .df),

    // Q6 forecast revenue — single narrow scan + one global agg
    "q_tpch_q6" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
                col("l_shipdate") < ts("1997-01-01") &&
                col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
                col("l_quantity") < 24)
        .summarize("revenue" -> sum(
          col("l_extendedprice").cast("decimal(18,2)") *
            col("l_discount").cast("decimal(4,2)")).cast("double"))
        .df),

    // Q7 volume shipping — the nation SELF-join in both roles (supplier
    // nation and customer nation), year extraction, all cross-nation
    // pairs (the fixture's 10-supplier sf0.001 can't guarantee one
    // specific pair is populated)
    "q_tpch_q7" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
                col("l_shipdate") < ts("1998-01-01"))
        .innerJoin(t(s, dir, "orders"), Equi("l_orderkey", "o_orderkey"))
        .innerJoin(t(s, dir, "customer"), Equi("o_custkey", "c_custkey"))
        .innerJoin(t(s, dir, "supplier"), Equi("l_suppkey", "s_suppkey"))
        .innerJoinBroadcast(
          t(s, dir, "nation").transmute(
            "sn_key" -> col("n_nationkey"), "supp_nation" -> col("n_name")),
          Equi("s_nationkey", "sn_key"))
        .innerJoinBroadcast(
          t(s, dir, "nation").transmute(
            "cn_key" -> col("n_nationkey"), "cust_nation" -> col("n_name")),
          Equi("c_nationkey", "cn_key"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .mutate("l_year" -> year(col("l_shipdate")).cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .summarize("revenue" -> revSum)
        .arrange("supp_nation", "cust_nation", "l_year")
        .df),

    // Q8 national market share — CASE-guarded share of an exact
    // DECIMAL volume sum; one final double division per year
    "q_tpch_q8" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .innerJoin(t(s, dir, "part").filter(col("p_type") === "PROMO"),
          Equi("l_partkey", "p_partkey"))
        .innerJoin(
          t(s, dir, "orders")
            .filter(col("o_orderdate") >= ts("1996-01-01") &&
                    col("o_orderdate") < ts("1998-01-01")),
          Equi("l_orderkey", "o_orderkey"))
        .innerJoin(t(s, dir, "customer"), Equi("o_custkey", "c_custkey"))
        .innerJoinBroadcast(t(s, dir, "nation"), Equi("c_nationkey", "n_nationkey"))
        .innerJoinBroadcast(
          t(s, dir, "region").filter(col("r_name") === "AMERICA"),
          Equi("n_regionkey", "r_regionkey"))
        .innerJoin(t(s, dir, "supplier"), Equi("l_suppkey", "s_suppkey"))
        .innerJoinBroadcast(
          t(s, dir, "nation").transmute(
            "sn_key" -> col("n_nationkey"), "supp_nation" -> col("n_name")),
          Equi("s_nationkey", "sn_key"))
        .mutate(
          "o_year" -> year(col("o_orderdate")).cast("long"),
          "volume" -> revCol)
        .groupBy("o_year")
        .summarize("mkt_share" ->
          (sum(when(col("supp_nation") === "NATION_5", col("volume"))
            .otherwise(lit(0).cast("decimal(4,2)"))).cast("double") /
           sum(col("volume")).cast("double")))
        .arrange("o_year")
        .df),

    // Q9 adapted (no ps_supplycost: profit = discounted revenue) —
    // substring part filter, supplier-nation attribution, order-year
    "q_tpch_q9a" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .innerJoin(
          t(s, dir, "part").filter(col("p_name").contains("red")),
          Equi("l_partkey", "p_partkey"))
        .innerJoin(t(s, dir, "supplier"), Equi("l_suppkey", "s_suppkey"))
        .innerJoinBroadcast(
          t(s, dir, "nation").transmute(
            "sn_key" -> col("n_nationkey"), "nation" -> col("n_name")),
          Equi("s_nationkey", "sn_key"))
        .innerJoin(t(s, dir, "orders"), Equi("l_orderkey", "o_orderkey"))
        .mutate("o_year" -> year(col("o_orderdate")).cast("long"))
        .groupBy("nation", "o_year")
        .summarize("sum_profit" -> revSum)
        .arrange(col("nation"), desc("o_year"))
        .df),

    // Q11 adapted (no partsupp: revenue concentration per part) — the
    // scalar-subquery threshold as a broadcast one-row cross join; the
    // threshold derives from the EXACT DECIMAL grand total (never from
    // re-summing per-part doubles, whose order differs per engine)
    "q_tpch_q11a" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val pv = li.groupBy("l_partkey").summarize("value" -> revSum)
      val tot = li.summarize("total" -> revSum)
      val cnt = pv.summarize("npart" -> Fns.n())
      withScalar(withScalar(pv, tot), cnt)
        .filter(col("value") > col("total") / col("npart") * lit(1.25))
        .select("l_partkey", "value")
        .arrange(desc("value"), col("l_partkey"))
        .df
    }),

    // Q12 adapted (no shipmode: linestatus stands in) — the dual
    // CASE-sum shape over the order-priority urgency split
    "q_tpch_q12a" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
                col("l_shipdate") < ts("1997-01-01"))
        .innerJoin(t(s, dir, "orders"), Equi("l_orderkey", "o_orderkey"))
        .groupBy("l_linestatus")
        .summarize(
          "high_line_count" -> sum(when(
            col("o_orderpriority") === "1-URGENT" ||
            col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L)),
          "low_line_count" -> sum(when(
            col("o_orderpriority") =!= "1-URGENT" &&
            col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L)))
        .arrange("l_linestatus")
        .df),

    // Q13 customer order-count distribution — LEFT join (zero-order
    // customers kept, filter folded into the right side pre-join),
    // then aggregation OVER an aggregation
    "q_tpch_q13" -> ((s, dir) =>
      t(s, dir, "customer")
        .leftJoin(
          t(s, dir, "orders").filter(col("o_orderpriority") =!= "1-URGENT"),
          Equi("c_custkey", "o_custkey"))
        .groupBy("c_custkey")
        .summarize("c_count" -> count(col("o_orderkey")))
        .groupBy("c_count")
        .summarize("custdist" -> Fns.n())
        .arrange(desc("custdist"), desc("c_count"))
        .df),

    // Q14 promo revenue share — CASE numerator and plain denominator
    // both exact DECIMAL sums, one final (100*a)/b double step
    "q_tpch_q14" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-09-01") &&
                col("l_shipdate") < ts("1996-10-01"))
        .innerJoin(t(s, dir, "part"), Equi("l_partkey", "p_partkey"))
        .summarize(
          "promo" -> sum(when(col("p_type") === "PROMO", revCol)
            .otherwise(lit(0).cast("decimal(4,2)"))).cast("double"),
          "total" -> revSum)
        .transmute("promo_revenue" -> lit(100.0) * col("promo") / col("total"))
        .df),

    // Q15 top supplier — the revenue view reused twice (frames are
    // free forks), MAX as a broadcast one-row join, equality on the
    // identically-derived double
    "q_tpch_q15" -> ((s, dir) => {
      val revenue = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
                col("l_shipdate") < ts("1996-04-01"))
        .groupBy("l_suppkey")
        .summarize("total_revenue" -> revSum)
      val top = revenue.summarize("max_rev" -> max(col("total_revenue")))
      t(s, dir, "supplier")
        .innerJoin(
          withScalar(revenue, top).filter(col("total_revenue") === col("max_rev")),
          Equi("s_suppkey", "l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .arrange("s_suppkey")
        .df
    }),

    // Q16 adapted (lineitem stands in for partsupp; negative-balance
    // suppliers for the complaint filter) — NOT IN as an anti join,
    // COUNT(DISTINCT) per group
    "q_tpch_q16a" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .innerJoin(
          t(s, dir, "part").filter(
            col("p_brand") =!= "Brand#5" && col("p_type") =!= "STANDARD" &&
            col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)),
          Equi("l_partkey", "p_partkey"))
        .antiJoin(
          t(s, dir, "supplier").filter(col("s_acctbal") < 0)
            .transmute("bad_supp" -> col("s_suppkey")),
          Equi("l_suppkey", "bad_supp"))
        .groupBy("p_brand", "p_type", "p_size")
        .summarize("supplier_cnt" -> Fns.nDistinct(col("l_suppkey")))
        .arrange(desc("supplier_cnt"), col("p_brand"), col("p_type"), col("p_size"))
        .df),

    // Q17 small-quantity revenue — the correlated per-part AVG
    // decorrelated into a groupBy joined back on the part key (the
    // standard distributed rewrite), exact-DECIMAL average
    "q_tpch_q17" -> ((s, dir) => {
      val li2 = t(s, dir, "lineitem")
        .semiJoin(
          t(s, dir, "part").filter(col("p_brand") === "Brand#3" && col("p_size") < 10)
            .transmute("pk" -> col("p_partkey")),
          Equi("l_partkey", "pk"))
      val aq = li2.groupBy("l_partkey")
        .summarize("avg_qty" -> davg(col("l_quantity")))
        .rename("aq_partkey" -> "l_partkey")
      li2.innerJoin(aq, Equi("l_partkey", "aq_partkey"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .summarize("avg_yearly" -> (dsum(col("l_extendedprice")) / lit(7.0)))
        .df
    }),

    // Q19 disjunctive brand/size/quantity predicate groups — one equi
    // join on the part key, OR-of-ANDs residual filter
    "q_tpch_q19" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .innerJoin(t(s, dir, "part"), Equi("l_partkey", "p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#4" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .summarize("revenue" -> revSum)
        .df),

    // Q20 adapted (shipped quantity stands in for availqty) — the
    // nested-IN chain as semi joins; the above-average threshold from
    // the EXACT DECIMAL total and count
    "q_tpch_q20a" -> ((s, dir) => {
      val red = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
                col("l_shipdate") < ts("1997-01-01"))
        .semiJoin(
          t(s, dir, "part").filter(col("p_name").startsWith("red "))
            .transmute("pk" -> col("p_partkey")),
          Equi("l_partkey", "pk"))
      val rq = red.groupBy("l_suppkey").summarize("qty" -> dsum(col("l_quantity")))
      val tot = red.summarize("tq" -> dsum(col("l_quantity")))
      val cnt = rq.summarize("nsupp" -> Fns.n())
      val heavy = withScalar(withScalar(rq, tot), cnt)
        .filter(col("qty") > col("tq") / col("nsupp") * lit(1.05))
      t(s, dir, "supplier")
        .semiJoin(heavy, Equi("s_suppkey", "l_suppkey"))
        .select("s_name")
        .arrange("s_name")
        .df
    }),

    // Q21 adapted (sole returned-flag supplier in multi-supplier F
    // orders) — EXISTS and NOT EXISTS over the same fact as one semi
    // plus one anti join with a non-equi residual
    "q_tpch_q21a" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val others = li.transmute("o2" -> col("l_orderkey"), "s2" -> col("l_suppkey"))
      val othersR = li.filter(col("l_returnflag") === "R")
        .transmute("o3" -> col("l_orderkey"), "s3" -> col("l_suppkey"))
      li.filter(col("l_returnflag") === "R")
        .innerJoin(
          t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          Equi("l_orderkey", "o_orderkey"))
        .semiJoin(others, Equi("l_orderkey", "o2"), Theta("l_suppkey", "!=", "s2"))
        .antiJoin(othersR, Equi("l_orderkey", "o3"), Theta("l_suppkey", "!=", "s3"))
        .innerJoinBroadcast(t(s, dir, "supplier"), Equi("l_suppkey", "s_suppkey"))
        .groupBy("s_name")
        .summarize("numwait" -> Fns.n())
        .arrange(desc("numwait"), col("s_name"))
        .head(100)
        .df
    }),

    // Q22 adapted (trailing name digit stands in for the phone country
    // code) — scalar positive-balance average as a broadcast one-row
    // join, NOT EXISTS as an anti join, derived-column grouping
    "q_tpch_q22a" -> ((s, dir) => {
      val ap = t(s, dir, "customer")
        .filter(col("c_acctbal") > 0)
        .summarize("apos" -> davg(col("c_acctbal")))
      withScalar(t(s, dir, "customer"), ap)
        .mutate("cntrycode" -> expr("substring(c_name, length(c_name), 1)"))
        .filter(col("c_acctbal") > col("apos") &&
                col("cntrycode").isin("1", "3", "5", "7", "9"))
        .antiJoin(
          t(s, dir, "orders").filter(col("o_orderstatus") === "P")
            .transmute("ok" -> col("o_custkey")),
          Equi("c_custkey", "ok"))
        .groupBy("cntrycode")
        .summarize(
          "numcust" -> Fns.n(),
          "totacctbal" -> dsum(col("c_acctbal")))
        .arrange("cntrycode")
        .df
    }),

    // ---- the VERBATIM versions of the 9 schema-adapted queries ----
    // (q2/q4/q11/q12/q16/q20/q21/q22 over deterministically
    // synthesized partsupp / date / shipmode / phone columns — the
    // oracle runs the published TPC-H text against the same synthesis,
    // see synthProlog). Parameters are chosen non-empty at all three
    // driver scales; structure is the published query, decorrelated
    // the standard distributed way.

    // Q2 minimum-cost supplier: the correlated per-part MIN over
    // EUROPE suppliers decorrelated into a groupBy joined back on
    // (partkey, cost == min); dims broadcast
    "q_tpch_q2" -> ((s, dir) => {
      val eurSupp = supplierX(s, dir)
        .innerJoinBroadcast(t(s, dir, "nation"), Equi("s_nationkey", "n_nationkey"))
        .innerJoinBroadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE"),
          Equi("n_regionkey", "r_regionkey"))
      val eurPs = partsuppF(s, dir)
        .innerJoinBroadcast(eurSupp, Equi("ps_suppkey", "s_suppkey"))
      val minc = eurPs.groupBy("ps_partkey")
        .summarize("min_cost" -> min(col("ps_supplycost")))
        .rename("mc_partkey" -> "ps_partkey")
      eurPs
        .innerJoin(minc, Equi("ps_partkey", "mc_partkey"),
          Theta("ps_supplycost", "==", "min_cost"))
        .innerJoinBroadcast(
          partX(s, dir).filter(col("p_size") === 9 && col("p_type").like("%ARGE")),
          Equi("ps_partkey", "p_partkey"))
        .transmute(
          "s_acctbal" -> col("s_acctbal"), "s_name" -> col("s_name"),
          "n_name" -> col("n_name"), "p_partkey" -> col("ps_partkey"),
          "p_mfgr" -> col("p_mfgr"), "s_address" -> col("s_address"),
          "s_phone" -> col("s_phone"), "s_comment" -> col("s_comment"))
        .arrange(desc("s_acctbal"), col("n_name"), col("s_name"), col("p_partkey"))
        .head(100)
        .df
    }),

    // Q9 product-type profit measure, verbatim over the synthesized
    // partsupp: amount = l_extendedprice*(1-l_discount)
    // - ps_supplycost*l_quantity, entirely DECIMAL (exact,
    // order-independent), one cast to DOUBLE after the SUM. The
    // (l_partkey, l_suppkey) → partsupp join restricts to pairs the
    // synthesis emits — identical on the oracle side, so the gate is
    // exact; q_tpch_q9a keeps the fixture-native profit variant.
    "q_tpch_q9" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .innerJoin(
          t(s, dir, "part").filter(col("p_name").contains("red")),
          Equi("l_partkey", "p_partkey"))
        .innerJoin(partsuppF(s, dir),
          Equi("l_partkey", "ps_partkey"), Equi("l_suppkey", "ps_suppkey"))
        .innerJoin(t(s, dir, "supplier"), Equi("l_suppkey", "s_suppkey"))
        .innerJoinBroadcast(
          t(s, dir, "nation").transmute(
            "sn_key" -> col("n_nationkey"), "nation" -> col("n_name")),
          Equi("s_nationkey", "sn_key"))
        .innerJoin(t(s, dir, "orders"), Equi("l_orderkey", "o_orderkey"))
        .mutate("o_year" -> year(col("o_orderdate")).cast("long"))
        .groupBy("nation", "o_year")
        .summarize("sum_profit" ->
          sum(revCol -
            col("ps_supplycost") * col("l_quantity").cast("decimal(12,2)"))
            .cast("double"))
        .arrange(col("nation"), desc("o_year"))
        .df),

    // Q4 late orders: EXISTS over the synthesized commit/receipt dates
    // as a semi join
    "q_tpch_q4" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-07-01") &&
                col("o_orderdate") < ts("1996-10-01"))
        .semiJoin(
          lineitemX(s, dir).filter(col("l_commitdate") < col("l_receiptdate"))
            .transmute("lk" -> col("l_orderkey")),
          Equi("o_orderkey", "lk"))
        .groupBy("o_orderpriority")
        .summarize("order_count" -> Fns.n())
        .arrange("o_orderpriority")
        .df),

    // Q11 important stock: per-part DECIMAL-exact value vs the 0.0001
    // whole-nation threshold (one-row broadcast)
    "q_tpch_q11" -> ((s, dir) => {
      val natSupp = supplierX(s, dir)
        .innerJoinBroadcast(t(s, dir, "nation").filter(col("n_name") === "NATION_13"),
          Equi("s_nationkey", "n_nationkey"))
        .transmute("sk" -> col("s_suppkey"))
      val natPs = partsuppF(s, dir)
        .innerJoinBroadcast(natSupp, Equi("ps_suppkey", "sk"))
      val grouped = natPs.groupBy("ps_partkey")
        .summarize("v" -> sum(col("ps_supplycost") * col("ps_availqty")))
      val tot = natPs.summarize(
        "tv" -> sum(col("ps_supplycost") * col("ps_availqty")))
      withScalar(grouped, tot)
        .filter(col("v").cast("double") > col("tv").cast("double") * lit(0.0001))
        .transmute("ps_partkey" -> col("ps_partkey"),
          "value" -> col("v").cast("double"))
        .arrange(desc("value"), col("ps_partkey"))
        .df
    }),

    // Q12 shipmode priority split over the synthesized shipmode +
    // commit/receipt dates — the genuine three-date filter
    "q_tpch_q12" -> ((s, dir) =>
      lineitemX(s, dir)
        .filter(col("l_shipmode").isin("MAIL", "SHIP") &&
                col("l_commitdate") < col("l_receiptdate") &&
                col("l_shipdate") < col("l_commitdate") &&
                col("l_receiptdate") >= ts("1997-01-01") &&
                col("l_receiptdate") < ts("1998-01-01"))
        .innerJoin(t(s, dir, "orders"), Equi("l_orderkey", "o_orderkey"))
        .groupBy("l_shipmode")
        .summarize(
          "high_line_count" -> sum(when(
            col("o_orderpriority") === "1-URGENT" ||
            col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L)),
          "low_line_count" -> sum(when(
            col("o_orderpriority") =!= "1-URGENT" &&
            col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L)))
        .arrange("l_shipmode")
        .df),

    // Q16 supplier counts over real partsupp; NOT IN of the
    // Complaints suppliers as an anti join
    "q_tpch_q16" -> ((s, dir) =>
      partsuppF(s, dir)
        .innerJoin(
          t(s, dir, "part").filter(
            col("p_brand") =!= "Brand#5" && !col("p_type").like("MEDIUM%") &&
            col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)),
          Equi("ps_partkey", "p_partkey"))
        .antiJoin(
          supplierX(s, dir)
            .filter(col("s_comment").like("%Customer%Complaints%"))
            .transmute("bad_supp" -> col("s_suppkey")),
          Equi("ps_suppkey", "bad_supp"))
        .groupBy("p_brand", "p_type", "p_size")
        .summarize("supplier_cnt" -> Fns.nDistinct(col("ps_suppkey")))
        .arrange(desc("supplier_cnt"), col("p_brand"), col("p_type"), col("p_size"))
        .df),

    // Q20 excess stock: the correlated half-of-shipped-quantity scalar
    // decorrelated into a (partkey, suppkey) groupBy joined back;
    // nested INs as semi joins
    "q_tpch_q20" -> ((s, dir) => {
      val halfQty = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1997-01-01") &&
                col("l_shipdate") < ts("1998-01-01"))
        .groupBy("l_partkey", "l_suppkey")
        .summarize("half_qty" -> (lit(0.5) * dsum(col("l_quantity"))))
      val heavy = partsuppF(s, dir)
        .semiJoin(
          t(s, dir, "part").filter(col("p_name").like("large%"))
            .transmute("pk" -> col("p_partkey")),
          Equi("ps_partkey", "pk"))
        .innerJoin(halfQty,
          Equi("ps_partkey", "l_partkey"), Equi("ps_suppkey", "l_suppkey"))
        .filter(col("ps_availqty") > col("half_qty"))
        .transmute("hsk" -> col("ps_suppkey"))
      supplierX(s, dir)
        .innerJoinBroadcast(t(s, dir, "nation").filter(col("n_name") === "NATION_18"),
          Equi("s_nationkey", "n_nationkey"))
        .semiJoin(heavy, Equi("s_suppkey", "hsk"))
        .select("s_name", "s_address")
        .arrange("s_name")
        .df
    }),

    // Q21 waiting supplier — the genuine receipt-after-commit
    // semantics: EXISTS (another supplier on the order) as a semi
    // join, NOT EXISTS (another LATE supplier) as an anti join
    "q_tpch_q21" -> ((s, dir) => {
      val li = lineitemX(s, dir)
      val late = li.filter(col("l_receiptdate") > col("l_commitdate"))
      val others = t(s, dir, "lineitem")
        .transmute("o2" -> col("l_orderkey"), "s2" -> col("l_suppkey"))
      val othersLate = late
        .transmute("o3" -> col("l_orderkey"), "s3" -> col("l_suppkey"))
      late
        .innerJoin(t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          Equi("l_orderkey", "o_orderkey"))
        .semiJoin(others, Equi("l_orderkey", "o2"), Theta("l_suppkey", "!=", "s2"))
        .antiJoin(othersLate, Equi("l_orderkey", "o3"), Theta("l_suppkey", "!=", "s3"))
        .innerJoinBroadcast(
          supplierX(s, dir)
            .innerJoinBroadcast(t(s, dir, "nation").filter(col("n_name") === "NATION_3"),
              Equi("s_nationkey", "n_nationkey")),
          Equi("l_suppkey", "s_suppkey"))
        .groupBy("s_name")
        .summarize("numwait" -> Fns.n())
        .arrange(desc("numwait"), col("s_name"))
        .head(100)
        .df
    }),

    // Q22 global sales opportunity over the synthesized phone country
    // codes; the positive-balance average restricted to the code set
    // (published semantics), NOT EXISTS as an anti join
    "q_tpch_q22" -> ((s, dir) => {
      val codes = Seq("13", "18", "22", "23", "28", "30", "31")
      val inCodes = Tidier.from(customerX(s, dir).df
        .withColumn("cntrycode", expr("substr(c_phone, 1, 2)")))
        .filter(col("cntrycode").isin(codes: _*))
      val ap = inCodes.filter(col("c_acctbal") > 0)
        .summarize("apos" -> davg(col("c_acctbal")))
      withScalar(inCodes, ap)
        .filter(col("c_acctbal") > col("apos"))
        .antiJoin(
          t(s, dir, "orders").filter(col("o_orderstatus") === "P")
            .transmute("ok" -> col("o_custkey")),
          Equi("c_custkey", "ok"))
        .groupBy("cntrycode")
        .summarize(
          "numcust" -> Fns.n(),
          "totacctbal" -> dsum(col("c_acctbal")))
        .arrange("cntrycode")
        .df
    }),
  )

  /** DuckDB mirrors — each reproduces the Spark computation
    * shape-for-shape (same DECIMAL casts, same division order, same
    * scalar-threshold derivation) so the driver's exact value hash
    * cannot diverge on arithmetic. */
  def oracles: Map[String, String] = Map(

    "q_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        |    AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
        |    * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)
        |    AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) / COUNT(l_quantity)
        |    AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) / COUNT(l_extendedprice)
        |    AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(25,2))) AS DOUBLE) / COUNT(l_discount)
        |    AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-08-06 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_tpch_q2a" ->
      """WITH esales AS (
        |  SELECT l.l_partkey, l.l_extendedprice, s.s_acctbal, s.s_name, n.n_name
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  WHERE r.r_name = 'EUROPE'),
        |minp AS (SELECT l_partkey, MIN(l_extendedprice) AS min_price
        |         FROM esales GROUP BY l_partkey)
        |SELECT DISTINCT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_name, m.min_price
        |FROM esales e
        |JOIN minp m ON e.l_partkey = m.l_partkey AND e.l_extendedprice = m.min_price
        |JOIN part p ON e.l_partkey = p.p_partkey
        |WHERE p.p_type = 'LARGE'
        |ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey LIMIT 100""".stripMargin,

    "q_tpch_q4a" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_tpch_q6" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |  * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,

    "q_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |WHERE n1.n_name <> n2.n_name
        |  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q_tpch_q8" ->
      """WITH allsales AS (
        |  SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
        |    CAST(l.l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2))) AS volume,
        |    n1.n_name AS supp_nation
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |  JOIN region r ON n2.n_regionkey = r.r_regionkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |  WHERE r.r_name = 'AMERICA' AND p.p_type = 'PROMO'
        |    AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
        |SELECT o_year,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
        |                ELSE CAST(0 AS DECIMAL(4,2)) END) AS DOUBLE)
        |    / CAST(SUM(volume) AS DOUBLE) AS mkt_share
        |FROM allsales GROUP BY o_year ORDER BY o_year""".stripMargin,

    "q_tpch_q9a" ->
      """SELECT n.n_name AS nation,
        |  CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        |    AS sum_profit
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE p.p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    "q_tpch_q11a" ->
      """WITH pv AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        |      AS value
        |  FROM lineitem GROUP BY l_partkey),
        |tot AS (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |  * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        |  AS total FROM lineitem),
        |cnt AS (SELECT COUNT(*) AS npart FROM pv)
        |SELECT pv.l_partkey, pv.value FROM pv, tot, cnt
        |WHERE pv.value > tot.total / cnt.npart * 1.25
        |ORDER BY pv.value DESC, pv.l_partkey""".stripMargin,

    "q_tpch_q12a" ->
      """SELECT l.l_linestatus,
        |  CAST(SUM(CASE WHEN o.o_orderpriority = '1-URGENT'
        |                  OR o.o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS high_line_count,
        |  CAST(SUM(CASE WHEN o.o_orderpriority <> '1-URGENT'
        |                 AND o.o_orderpriority <> '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS low_line_count
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l.l_linestatus ORDER BY l.l_linestatus""".stripMargin,

    "q_tpch_q13" ->
      """WITH pc AS (
        |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        |  FROM customer c
        |  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |    AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY c.c_custkey)
        |SELECT c_count, COUNT(*) AS custdist FROM pc GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q_tpch_q14" ->
      """SELECT CAST(100 AS DOUBLE) *
        |  CAST(SUM(CASE WHEN p.p_type = 'PROMO'
        |    THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
        |    ELSE CAST(0 AS DECIMAL(4,2)) END) AS DOUBLE)
        |  / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        |  AS promo_revenue
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        |  AND l.l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin,

    "q_tpch_q15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        |      AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s.s_suppkey, s.s_name, r.total_revenue
        |FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
        |WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        |ORDER BY s.s_suppkey""".stripMargin,

    "q_tpch_q16a" ->
      """SELECT p.p_brand, p.p_type, p.p_size,
        |  COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'STANDARD'
        |  AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        |  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size""".stripMargin,

    "q_tpch_q17" ->
      """WITH li2 AS (
        |  SELECT l.* FROM lineitem l
        |  WHERE EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey
        |                AND p.p_brand = 'Brand#3' AND p.p_size < 10)),
        |aq AS (SELECT l_partkey,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) / COUNT(l_quantity)
        |           AS avg_qty
        |       FROM li2 GROUP BY l_partkey)
        |SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) / 7.0
        |  AS avg_yearly
        |FROM li2 l JOIN aq ON l.l_partkey = aq.l_partkey
        |WHERE l.l_quantity < 0.2 * aq.avg_qty""".stripMargin,

    "q_tpch_q19" ->
      """SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
        |  * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        |  AS revenue
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
        |       AND l.l_quantity BETWEEN 1 AND 11)
        |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
        |       AND l.l_quantity BETWEEN 10 AND 20)
        |   OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15
        |       AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q_tpch_q20a" ->
      """WITH red AS (
        |  SELECT l.l_suppkey, l.l_quantity FROM lineitem l
        |  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |    AND EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey
        |                AND p.p_name LIKE 'red %')),
        |rq AS (SELECT l_suppkey,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS qty
        |       FROM red GROUP BY l_suppkey),
        |tot AS (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS tq
        |        FROM red),
        |cnt AS (SELECT COUNT(*) AS nsupp FROM rq)
        |SELECT s.s_name FROM supplier s
        |WHERE s.s_suppkey IN (
        |  SELECT l_suppkey FROM rq, tot, cnt WHERE qty > tq / nsupp * 1.05)
        |ORDER BY s.s_name""".stripMargin,

    "q_tpch_q21a" ->
      """SELECT s.s_name, COUNT(*) AS numwait
        |FROM lineitem l1
        |JOIN orders o ON l1.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l1.l_suppkey = s.s_suppkey
        |WHERE l1.l_returnflag = 'R' AND o.o_orderstatus = 'F'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s.s_name ORDER BY numwait DESC, s.s_name LIMIT 100""".stripMargin,

    "q_tpch_q22a" ->
      """WITH ap AS (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,2))) AS DOUBLE) / COUNT(c_acctbal)
        |    AS apos
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT substring(c.c_name, length(c.c_name), 1) AS cntrycode,
        |  COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(25,2))) AS DOUBLE) AS totacctbal
        |FROM customer c, ap
        |WHERE c.c_acctbal > ap.apos
        |  AND substring(c.c_name, length(c.c_name), 1) IN ('1','3','5','7','9')
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        |GROUP BY 1 ORDER BY cntrycode""".stripMargin,

    // ---- verbatim TPC-H over the synthesized relations: each oracle
    // is synthProlog (the CTE twin of partsuppF/lineitemX/supplierX/
    // partX/customerX) + the PUBLISHED query text (parameters chosen
    // non-empty tri-scale; sums that would be engine-order-sensitive
    // or HUGEINT-typed carry the house DECIMAL/BIGINT casts) ----

    "q_tpch_q2" -> (synthProlog +
      """SELECT s_acctbal, s_name, n_name, p_partkey, p_mfgr, s_address, s_phone, s_comment
        |FROM part, supplier, partsupp, nation, region
        |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
        |  AND p_size = 9 AND p_type LIKE '%ARGE'
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'EUROPE'
        |  AND ps_supplycost = (
        |    SELECT MIN(ps_supplycost)
        |    FROM partsupp, supplier, nation, region
        |    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
        |      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |      AND r_name = 'EUROPE')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin),

    "q_tpch_q9" -> (synthProlog +
      """SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
        |FROM (
        |  SELECT n_name AS nation,
        |    CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
        |      - ps_supplycost * CAST(l_quantity AS DECIMAL(12,2)) AS amount
        |  FROM part, supplier, lineitem, partsupp, orders, nation
        |  WHERE s_suppkey = l_suppkey
        |    AND ps_suppkey = l_suppkey AND ps_partkey = l_partkey
        |    AND p_partkey = l_partkey AND o_orderkey = l_orderkey
        |    AND s_nationkey = n_nationkey AND p_name LIKE '%red%'
        |) profit
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""".stripMargin),

    "q_tpch_q4" -> (synthProlog +
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_commitdate < l_receiptdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    "q_tpch_q11" -> (synthProlog +
      """SELECT ps_partkey, CAST(SUM(ps_supplycost * ps_availqty) AS DOUBLE) AS value
        |FROM partsupp, supplier, nation
        |WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |  AND n_name = 'NATION_13'
        |GROUP BY ps_partkey
        |HAVING CAST(SUM(ps_supplycost * ps_availqty) AS DOUBLE) > (
        |  SELECT CAST(SUM(ps_supplycost * ps_availqty) AS DOUBLE) * 0.0001
        |  FROM partsupp, supplier, nation
        |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |    AND n_name = 'NATION_13')
        |ORDER BY value DESC, ps_partkey""".stripMargin),

    "q_tpch_q12" -> (synthProlog +
      """SELECT l_shipmode,
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH'
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH'
        |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders, lineitem
        |WHERE o_orderkey = l_orderkey AND l_shipmode IN ('MAIL', 'SHIP')
        |  AND l_commitdate < l_receiptdate AND l_shipdate < l_commitdate
        |  AND l_receiptdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_receiptdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_shipmode ORDER BY l_shipmode""".stripMargin),

    "q_tpch_q16" -> (synthProlog +
      """SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
        |FROM partsupp, part
        |WHERE p_partkey = ps_partkey AND p_brand <> 'Brand#5'
        |  AND p_type NOT LIKE 'MEDIUM%'
        |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND ps_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier
        |    WHERE s_comment LIKE '%Customer%Complaints%')
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin),

    "q_tpch_q20" -> (synthProlog +
      """SELECT s_name, s_address
        |FROM supplier, nation
        |WHERE s_suppkey IN (
        |    SELECT ps_suppkey FROM partsupp
        |    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'large%')
        |      AND ps_availqty > (
        |        SELECT 0.5 * CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE)
        |        FROM lineitem
        |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'))
        |  AND s_nationkey = n_nationkey AND n_name = 'NATION_18'
        |ORDER BY s_name""".stripMargin),

    "q_tpch_q21" -> (synthProlog +
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier, lineitem l1, orders, nation
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F' AND l1.l_receiptdate > l1.l_commitdate
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_receiptdate > l3.l_commitdate)
        |  AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin),

    "q_tpch_q22" -> (synthProlog +
      """SELECT cntrycode, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(25,2))) AS DOUBLE) AS totacctbal
        |FROM (
        |  SELECT substr(c_phone, 1, 2) AS cntrycode, c_acctbal
        |  FROM customer
        |  WHERE substr(c_phone, 1, 2) IN ('13', '18', '22', '23', '28', '30', '31')
        |    AND c_acctbal > (
        |      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,2))) AS DOUBLE)
        |        / COUNT(c_acctbal)
        |      FROM customer
        |      WHERE c_acctbal > 0.00
        |        AND substr(c_phone, 1, 2) IN ('13', '18', '22', '23', '28', '30', '31'))
        |    AND NOT EXISTS (SELECT 1 FROM orders
        |                    WHERE o_custkey = c_custkey
        |                      AND o_orderstatus = 'P')) custsale
        |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin),
  )
}
