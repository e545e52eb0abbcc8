package graft

import org.apache.spark.sql.functions._

/** JDBC external-database source (SURVEY §2.1 — the reference's ext/
  * backend surface, reference: ext/LibPQExt.jl:15-39, ext/SQLiteExt.jl)
  * exercised end to end against an EMBEDDED Derby database
  * (jdbc:derby:memory: — no egress, driver jar ships in
  * /opt/spark/jars): round trip, predicate pushdown into the remote
  * WHERE clause, partitioned parallel reads, and the subquery form. */
class JdbcScanSpec extends SparkSpec {
  import spark.implicits._

  System.setProperty("derby.stream.error.file", "/tmp/graft_derby_spec.log")
  private val driverOpt = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  private def freshUrl(): String =
    "jdbc:derby:memory:graft_spec_" +
      java.util.UUID.randomUUID().toString.replace("-", "") + ";create=true"

  private def seeded(): String = {
    val url = freshUrl()
    val df = (1L to 100L).map(i => (i, s"name_$i", i * 10L)).toDF("id", "name", "amount")
    graft.sources.JdbcWrite.write(df, url, "t", mode = "overwrite", options = driverOpt)
    url
  }

  test("write then read round-trips rows and schema through Derby") {
    val url = seeded()
    val back = Tidier.readJdbc(spark, url, "t").arrange("id").df
    assert(back.count() == 100)
    assert(back.columns.toSeq == Seq("id", "name", "amount"))
    val r = back.filter($"id" === 7L).first()
    assert(r.getString(1) == "name_7" && r.getLong(2) == 70L)
  }

  test("filter on the frame is pushed into the JDBC scan (remote WHERE)") {
    val url = seeded()
    val q = Tidier.readJdbc(spark, url, "t").filter($"amount" > 500).df
    // the JDBC scan must carry the pushed filter; a post-scan Spark
    // Filter over a full-table JDBC scan would ship the whole remote
    // table at 100 TB
    val pushed = q.queryExecution.executedPlan.toString
    assert(pushed.contains("JDBCRelation"),
      s"no JDBC relation in executed plan:\n$pushed")
    assert(pushed.contains("PushedFilters") && pushed.contains("amount"),
      s"filter not pushed into JDBC scan:\n$pushed")
    assert(q.count() == 50)
  }

  test("partitioned read issues numPartitions range scans and loses no rows") {
    val url = seeded()
    val q = Tidier.readJdbc(spark, url, "t", "id", 1L, 101L, 4).df
    assert(q.rdd.getNumPartitions == 4)
    // rows outside [lower, upper) must still arrive (bounds are stride
    // hints, not filters) — Spark puts them in the first/last partition
    assert(q.count() == 100)
    assert(q.agg(sum("amount")).first().getLong(0) == (1L to 100L).map(_ * 10).sum)
  }

  test("SQL-text form wraps as a derived table and runs remotely") {
    val url = seeded()
    assert(graft.sources.JdbcScan.dbTableClause("t") == "t")
    assert(graft.sources.JdbcScan
      .dbTableClause("SELECT id FROM t") == "(SELECT id FROM t) graft_q")
    // Spark's JDBC writer creates case-sensitive (quoted) lowercase
    // columns, so raw Derby SQL must quote them — unquoted folds to
    // uppercase per the SQL standard
    val q = Tidier.readJdbc(spark, url,
      """SELECT "id", "amount" FROM t WHERE "id" <= 10""").arrange("id").df
    assert(q.count() == 10)
    assert(q.columns.toSeq == Seq("id", "amount"))
  }

  test("string-predicate pushdown: equality and LIKE reach the remote scan") {
    val url = seeded()
    val q = Tidier.readJdbc(spark, url, "t")
      .filter($"name" === "name_7" || $"name".startsWith("name_1")).df
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("name"),
      s"string filter not pushed:\n$plan")
    // name_7 plus name_1, name_10..name_19, name_100
    assert(q.count() == 13)
  }

  test("showTables lists the created table") {
    val url = seeded()
    assert(graft.sources.JdbcScan.showTables(url).exists(_.equalsIgnoreCase("t")))
  }

  test("auto-bounded partitioned read probes min/max and loses no rows") {
    val url = seeded()
    val q = graft.sources.JdbcScan.readPartitionedAuto(spark, url, "t", "id", 4,
      options = driverOpt)
    assert(q.rdd.getNumPartitions == 4)
    assert(q.count() == 100)
    assert(q.agg(sum("amount")).first().getLong(0) == (1L to 100L).map(_ * 10).sum)
    // empty table → loud, not a silent empty scan with bogus bounds
    val empty = freshUrl()
    graft.sources.JdbcWrite.write(
      Seq.empty[(Long, String)].toDF("id", "v"), empty, "e",
      mode = "overwrite", options = driverOpt)
    val e = intercept[IllegalArgumentException] {
      graft.sources.JdbcScan.readPartitionedAuto(spark, empty, "e", "id", 4)
    }
    assert(e.getMessage.contains("no non-NULL values"))
  }

  test("auto-bounded read survives MAX(col) == Long.MaxValue (no hi+1 overflow)") {
    val url = freshUrl()
    val df = Seq((1L, "lo"), (Long.MaxValue, "hi")).toDF("id", "name")
    graft.sources.JdbcWrite.write(df, url, "t", mode = "overwrite", options = driverOpt)
    val q = graft.sources.JdbcScan.readPartitionedAuto(spark, url, "t", "id", 4,
      options = driverOpt)
    // hi+1 would overflow to Long.MinValue and trip the
    // upperBound > lowerBound require; the clamp keeps reading — and
    // the row AT the bound still arrives (last partition is unbounded
    // above)
    assert(q.count() == 2)
    assert(q.agg(max("id")).first().getLong(0) == Long.MaxValue)
  }

  test("auto-bounded read partitions on a TIMESTAMP column (time-strided ranges)") {
    val url = freshUrl()
    val df = (0 until 96).map { i =>
      (java.sql.Timestamp.valueOf(s"2024-01-01 ${i / 4}:${15 * (i % 4)}:00"), i.toLong)
    }.toDF("ts", "n")
    graft.sources.JdbcWrite.write(df, url, "tt", mode = "overwrite", options = driverOpt)
    val q = graft.sources.JdbcScan.readPartitionedAuto(spark, url, "tt", "ts", 4,
      options = driverOpt)
    assert(q.rdd.getNumPartitions == 4)
    assert(q.count() == 96)
    assert(q.agg(sum("n")).first().getLong(0) == (0L until 96L).sum)
    // the stride actually splits the data (no single hot partition)
    val sizes = q.rdd.mapPartitions(it => Iterator.single(it.size)).collect()
    assert(sizes.count(_ > 0) >= 3, s"time stride collapsed: ${sizes.toSeq}")
    // all-same-timestamp column degrades to the unpartitioned read
    val url2 = freshUrl()
    graft.sources.JdbcWrite.write(
      Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L),
          (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 2L)).toDF("ts", "n"),
      url2, "one", mode = "overwrite", options = driverOpt)
    assert(graft.sources.JdbcScan.readPartitionedAuto(spark, url2, "one", "ts", 4,
      options = driverOpt).count() == 2)
  }

  test("auto-bounded read partitions on a DATE column; strings fail loudly") {
    val url = freshUrl()
    val df = (1 to 60).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)), i.toLong)
    }.toDF("d", "n")
    graft.sources.JdbcWrite.write(df, url, "td", mode = "overwrite", options = driverOpt)
    val q = graft.sources.JdbcScan.readPartitionedAuto(spark, url, "td", "d", 3,
      options = driverOpt)
    assert(q.rdd.getNumPartitions == 3)
    assert(q.count() == 60)
    // a string partition column is a loud error, not a bogus scan
    val e = intercept[IllegalArgumentException] {
      graft.sources.JdbcScan.readPartitionedAuto(spark, seeded(), "t", "name", 4,
        options = driverOpt)
    }
    assert(e.getMessage.contains("integral, DATE or TIMESTAMP"))
  }

  test("quoteIdent picks the dialect's quoting and doubles its escapes") {
    import graft.sources.JdbcScan.quoteIdent
    assert(quoteIdent("jdbc:mysql://h/db", "order") == "`order`")
    assert(quoteIdent("jdbc:mariadb://h/db", "a`b") == "`a``b`")
    assert(quoteIdent("jdbc:sqlserver://h;db", "sel]ect") == "[sel]]ect]")
    assert(quoteIdent("jdbc:postgresql://h/db", "order") == "\"order\"")
    assert(quoteIdent("jdbc:derby:memory:x", "a\"b") == "\"a\"\"b\"")
    // scheme matching is exact-prefix: a hypothetical jdbc:mysqlish
    // url is NOT backtick-quoted
    assert(quoteIdent("jdbc:mysqlish://h/db", "c") == "\"c\"")
  }

  test("SQL table function: jdbc_scan runs verbatim, plain and partitioned") {
    GraftExtensions.register(spark)
    val url = seeded()
    val n = spark.sql(s"SELECT count(*) AS n FROM jdbc_scan('$url', 't')")
      .head().getLong(0)
    assert(n == 100)
    val part = spark.sql(
      s"SELECT sum(amount) AS s FROM jdbc_scan('$url', 't', 'id', 1, 101, 4)")
    assert(part.head().getLong(0) == (1L to 100L).map(_ * 10).sum)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM jdbc_scan('$url')").collect()
    }
    assert(e.getMessage.contains("jdbc_scan needs"))
  }

  test("write maxConnections caps task-level connection fan-out without a shuffle") {
    val url = freshUrl()
    val df = spark.range(0, 64, 1, 32).selectExpr("id", "CAST(id AS STRING) AS v")
    assert(df.rdd.getNumPartitions == 32)
    graft.sources.JdbcWrite.write(df, url, "cap", mode = "overwrite",
      options = driverOpt, maxConnections = 4)
    assert(Tidier.readJdbc(spark, url, "cap").df.count() == 64)
  }

  test("append mode accumulates; overwrite replaces") {
    val url = freshUrl()
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    graft.sources.JdbcWrite.write(df, url, "w", mode = "overwrite", options = driverOpt)
    graft.sources.JdbcWrite.write(df, url, "w", mode = "append", options = driverOpt)
    assert(Tidier.readJdbc(spark, url, "w").df.count() == 4)
    graft.sources.JdbcWrite.write(df, url, "w", mode = "overwrite", options = driverOpt)
    assert(Tidier.readJdbc(spark, url, "w").df.count() == 2)
  }
}
