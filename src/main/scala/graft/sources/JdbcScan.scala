package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** External-database scans — the Spark-native counterpart of the
  * reference's entire `ext/` backend surface (reference:
  * ext/LibPQExt.jl:15-39 Postgres, ext/MySQLExt.jl, ext/SQLiteExt.jl,
  * ext/ODBCExt.jl:1-57, ext/CHExt.jl ClickHouse; REST backends in
  * src/parsing_snowflake.jl:188-250). Where the reference keeps a live
  * connection object per backend and transpiles verbs into each SQL
  * dialect, the Spark analog is ONE code path: `spark.read.jdbc` — the
  * driver jar on the classpath picks the dialect, Catalyst's
  * JDBCRelation pushes filters/projections into the remote database, and
  * `partitionColumn`/`numPartitions` turns a single remote table into a
  * parallel scan across executors.
  *
  * Scale notes (100 TB stance):
  *  - An UNPARTITIONED jdbc read is ONE task on one executor, whatever
  *    the cluster size — fine for dimension tables, fatal for facts.
  *    `readPartitioned` issues `numPartitions` range-predicated queries
  *    in parallel; callers size it to the remote database's connection
  *    budget, not the cluster's core count.
  *  - Filters on the frame land in the remote WHERE clause (visible as
  *    `PushedFilters` on the JDBCRelation scan node) — the database
  *    scans its own index instead of shipping the table; JdbcScanSpec
  *    asserts this against an embedded Derby instance.
  *  - `fetchsize` keeps the per-task memory bounded by streaming rows
  *    from the cursor instead of materializing the whole result set.
  */
object JdbcScan {

  /** Read a whole table (or any subquery via the `(SELECT …) t` alias
    * form every JDBC backend accepts) as a single-partition scan.
    * The analog of the reference's `db_table(con, :tbl)` against a
    * LibPQ/MySQL/SQLite/ODBC connection. */
  def read(spark: SparkSession, url: String, tableOrQuery: String,
           options: Map[String, String] = Map.empty): DataFrame = {
    val props = new java.util.Properties()
    options.foreach { case (k, v) => props.setProperty(k, v) }
    if (!props.containsKey("fetchsize")) props.setProperty("fetchsize", "10000")
    spark.read.jdbc(url, dbTableClause(tableOrQuery), props)
  }

  /** Parallel range-partitioned read: `numPartitions` concurrent
    * connections each scanning `[lower + i*stride, …)` of
    * `partitionColumn`. This is the scan shape that survives a 100×
    * scale-up — every executor pulls its own slice. */
  def readPartitioned(spark: SparkSession, url: String, tableOrQuery: String,
                      partitionColumn: String, lowerBound: Long, upperBound: Long,
                      numPartitions: Int,
                      options: Map[String, String] = Map.empty): DataFrame = {
    require(numPartitions > 0, s"numPartitions must be positive, got $numPartitions")
    require(upperBound > lowerBound,
      s"upperBound ($upperBound) must exceed lowerBound ($lowerBound)")
    val props = new java.util.Properties()
    options.foreach { case (k, v) => props.setProperty(k, v) }
    if (!props.containsKey("fetchsize")) props.setProperty("fetchsize", "10000")
    spark.read.jdbc(url, dbTableClause(tableOrQuery), partitionColumn,
      lowerBound, upperBound, numPartitions, props)
  }

  /** DATE/TIMESTAMP-partitioned parallel read: Spark's string-bound
    * jdbc partitioning (`lowerBound`/`upperBound` parsed as
    * `Date.valueOf`/`Timestamp.valueOf` literals, stride in time).
    * The shape every event/fact table partitions on in practice. */
  def readPartitionedTemporal(spark: SparkSession, url: String,
      tableOrQuery: String, partitionColumn: String,
      lowerBound: String, upperBound: String, numPartitions: Int,
      options: Map[String, String] = Map.empty): DataFrame = {
    require(numPartitions > 0, s"numPartitions must be positive, got $numPartitions")
    spark.read.format("jdbc")
      .options(Map("fetchsize" -> "10000") ++ options)
      .option("url", url)
      .option("dbtable", dbTableClause(tableOrQuery))
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions.toString)
      .load()
  }

  /** Auto-bounded parallel read: ONE driver-side `SELECT min, max`
    * against the remote resolves the partition bounds, then
    * [[readPartitioned]] (integral columns) or
    * [[readPartitionedTemporal]] (DATE/TIMESTAMP columns — Spark
    * strides them in time). This is the ergonomic that gets fact
    * tables actually partitioned — the manual-bounds form is skipped
    * in practice precisely when it matters. The bounds probe is a
    * single-row aggregate the database answers from its index.
    * `partitionColumn` is quoted per the url's dialect
    * ([[quoteIdent]]: backticks for MySQL-family urls, brackets for
    * SQL Server, standard double quotes otherwise). */
  def readPartitionedAuto(spark: SparkSession, url: String, tableOrQuery: String,
                          partitionColumn: String, numPartitions: Int,
                          options: Map[String, String] = Map.empty): DataFrame = {
    require(numPartitions > 0, s"numPartitions must be positive, got $numPartitions")
    val conn = openConnection(url, options)
    val (loObj, hiObj) =
      try {
        val st = conn.createStatement()
        val q = quoteIdent(url, partitionColumn)
        val rs = st.executeQuery(
          s"""SELECT MIN($q), MAX($q)
             |FROM ${dbTableClause(tableOrQuery)}""".stripMargin)
        require(rs.next(), s"bounds probe returned no row for $tableOrQuery")
        val lo = rs.getObject(1)
        val hi = rs.getObject(2)
        require(lo != null && hi != null,
          s"cannot auto-partition $tableOrQuery on $partitionColumn: " +
            "no non-NULL values (empty table?) — use the unpartitioned read")
        (lo, hi)
      } finally conn.close()
    (loObj, hiObj) match {
      case (lo: java.sql.Timestamp, hi: java.sql.Timestamp) =>
        if (lo == hi) read(spark, url, tableOrQuery, options)
        else readPartitionedTemporal(spark, url, tableOrQuery, partitionColumn,
          lo.toString, hi.toString, numPartitions, options)
      case (lo: java.sql.Date, hi: java.sql.Date) =>
        if (lo == hi) read(spark, url, tableOrQuery, options)
        else readPartitionedTemporal(spark, url, tableOrQuery, partitionColumn,
          lo.toString, hi.toString, numPartitions, options)
      case (loN: Number, hiN: Number) =>
        val lo = loN.longValue(); val hi = hiN.longValue()
        if (lo == hi)
          read(spark, url, tableOrQuery, options) // single value — one range
        else {
          // hi+1 evens the stride, but overflows when MAX == Long.MaxValue;
          // clamping to hi is still correct — Spark's last JDBC partition
          // predicate is unbounded above (>= last bound), so rows equal to
          // the upper bound are always read
          val upper = if (hi == Long.MaxValue) hi else hi + 1
          readPartitioned(spark, url, tableOrQuery, partitionColumn,
            lo, upper, numPartitions, options)
        }
      case (lo, _) => throw new IllegalArgumentException(
        s"cannot auto-partition $tableOrQuery on $partitionColumn: bounds of " +
          s"type ${lo.getClass.getName} — use an integral, DATE or TIMESTAMP " +
          "column, or the manual-bounds form")
    }
  }

  /** Dialect-aware identifier quoting for driver-side probe SQL:
    * backticks on MySQL-family urls (MySQL/MariaDB default mode rejects
    * double-quoted identifiers), square brackets on SQL Server (safe
    * regardless of QUOTED_IDENTIFIER), standard SQL double quotes
    * everywhere else — each with the dialect's own escape doubling. */
  private[graft] def quoteIdent(url: String, name: String): String = {
    val u = url.toLowerCase(java.util.Locale.ROOT)
    if (u.startsWith("jdbc:mysql:") || u.startsWith("jdbc:mariadb:"))
      "`" + name.replace("`", "``") + "`"
    else if (u.startsWith("jdbc:sqlserver:"))
      "[" + name.replace("]", "]]") + "]"
    else "\"" + name.replace("\"", "\"\"") + "\""
  }

  /** A bare identifier passes through; anything with whitespace is
    * treated as SQL and wrapped in the `(…) alias` derived-table form
    * (the `db_table(con, sql"SELECT …")` analog). */
  private[graft] def dbTableClause(tableOrQuery: String): String = {
    val t = tableOrQuery.trim
    if (t.exists(_.isWhitespace)) s"($t) graft_q" else t
  }

  /** `show_tables` against a JDBC catalog (reference:
    * ext/LibPQExt.jl:41-43) via DatabaseMetaData — dialect-free. */
  def showTables(url: String,
                 options: Map[String, String] = Map.empty): Seq[String] = {
    val conn = openConnection(url, options)
    try {
      val rs = conn.getMetaData.getTables(null, null, "%", Array("TABLE"))
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (rs.next()) out += rs.getString("TABLE_NAME")
      out.toSeq
    } finally conn.close()
  }

  /** driver-side probe connection carrying the SAME credentials the
    * Spark read gets: user/password (and any other driver-recognized
    * keys) pass through, and an explicit `driver` option is class-loaded
    * first — without this, the auto-bounds probe would auth-fail
    * against any credentialed database even though spark.read.jdbc with
    * identical options succeeds */
  private def openConnection(url: String,
      options: Map[String, String]): java.sql.Connection = {
    options.get("driver").foreach(Class.forName)
    val props = new java.util.Properties()
    options.filterNot(_._1 == "driver")
      .foreach { case (k, v) => props.setProperty(k, v) }
    java.sql.DriverManager.getConnection(url, props)
  }
}

/** Write-side counterpart (`copy_to` / `final_compute` against a remote
  * backend, reference: ext/LibPQExt.jl:45-49): append/overwrite a frame
  * into a JDBC table. Each task opens one connection and batch-inserts
  * its partition — coalesce first if the remote's connection budget is
  * smaller than the partition count. */
object JdbcWrite {
  /** @param maxConnections cap on concurrent connections (each task
    *        opens one): a 1000-partition frame must not open 1000
    *        connections against a database with a 100-connection
    *        budget — the frame is coalesced down first (coalesce, not
    *        repartition: no shuffle). 0 = no cap. */
  def write(df: DataFrame, url: String, table: String,
            mode: String = "error",
            options: Map[String, String] = Map.empty,
            maxConnections: Int = 0): Unit = {
    require(maxConnections >= 0,
      s"maxConnections must be >= 0 (0 = uncapped), got $maxConnections")
    val props = new java.util.Properties()
    options.foreach { case (k, v) => props.setProperty(k, v) }
    if (!props.containsKey("batchsize")) props.setProperty("batchsize", "10000")
    // Spark's Derby dialect maps StringType → CLOB, and Derby cannot
    // COMPARE a CLOB against the CHAR literals of a pushed-down string
    // predicate — a table written with defaults breaks every string
    // filter on read-back. Create string columns as VARCHAR (Derby's
    // max length) unless the caller specified their own DDL types.
    if (url.startsWith("jdbc:derby") && !props.containsKey("createTableColumnTypes")) {
      val strCols = df.schema.fields
        .filter(_.dataType == org.apache.spark.sql.types.StringType)
        .map(f => s"`${f.name}` VARCHAR(32672)")
      if (strCols.nonEmpty)
        props.setProperty("createTableColumnTypes", strCols.mkString(", "))
    }
    val bounded =
      if (maxConnections > 0 && df.rdd.getNumPartitions > maxConnections)
        df.coalesce(maxConnections)
      else df
    bounded.write.mode(mode).jdbc(url, table, props)
  }
}
