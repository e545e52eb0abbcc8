package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Immutable lazy-query handle — the Spark-native analog of the
  * reference's `SQLQuery` struct (reference: src/structs.jl:13-45).
  *
  * Where the reference accumulates SQL clause *strings* plus CTE
  * bookkeeping and state flags, here the wrapped `DataFrame`'s Catalyst
  * `LogicalPlan` *is* the lazy query: every verb is a pure
  * `TidierFrame => TidierFrame` returning a new plan, and Catalyst
  * replaces the reference's entire CTE/finalize machinery
  * (reference: src/structs.jl:100-343).
  *
  * The only real cross-verb state the reference carries that Spark's plan
  * does not encode is the *grouping / window context* consumed by the next
  * mutate/summarize/slice (reference: src/db_parsing.jl:453-472) and
  * cleared afterwards (reference: src/mutate_and_summ.jl:250-257). That
  * state lives here:
  *
  * @param df          the underlying lazy DataFrame (Catalyst plan)
  * @param groups      active `groupBy` columns (consumed+kept by summarize,
  *                    used as window PARTITION BY in grouped mutate)
  * @param winOrder    active window ORDER BY, set by `windowOrder`
  *                    (reference: src/windows.jl:4-54)
  * @param winFrame    active ROWS frame (from,to), set by `windowFrame`
  *                    (reference: src/windows.jl:59-177)
  */
final case class TidierFrame(
    df: DataFrame,
    groups: Seq[String] = Nil,
    winOrder: Seq[Column] = Nil,
    winFrame: Option[(Long, Long)] = None)
    extends CoreVerbs
    with JoinVerbs
    with SetVerbs
    with WindowVerbs
    with SliceVerbs
    with ReshapeVerbs
    with operators.PipelineVerbs {

  def spark: SparkSession = df.sparkSession

  /** Replace the plan, keep grouping/window state. */
  private[graft] def withDf(newDf: DataFrame): TidierFrame = copy(df = newDf)

  /** Replace the plan and clear grouping/window state (the reference
    * clears grouping after it is consumed —
    * reference: src/mutate_and_summ.jl:250-257). With
    * `Tidier.warnings(true)` the drop is announced, mirroring the
    * reference's `warnings(true)` toggle (reference: src/TidierDB.jl:110,
    * src/mutate_and_summ.jl:250-254). */
  private[graft] def reset(newDf: DataFrame): TidierFrame = {
    if (Tidier.warningsEnabled && groups.nonEmpty)
      Console.err.println(
        s"[graft] grouping (${groups.mkString(", ")}) was consumed and dropped; " +
          "re-group before the next grouped verb if needed")
    TidierFrame(newDf)
  }

  // ---- actions / sinks (reference: src/TidierDB_macros.jl:629-665) ----
  def collect(): Array[org.apache.spark.sql.Row] = df.collect()
  def show(n: Int = 20): Unit = df.show(n, truncate = false)
  /** `@show_query` analog (reference: src/TidierDB_macros.jl:508-569).
    * Default mode "sql" unparses the analyzed plan to readable SQL-ish
    * text ([[graft.plans.SqlPrinter]]) — the reference's user-facing
    * artifact is the finalized SQL, so that's the default here too; if
    * the plan contains something the printer can't express, it falls
    * back to formatted explain. `mode` also accepts Spark's explain
    * modes ("simple", "extended", "codegen", "cost", "formatted").
    * Returns the text (and prints it) so tooling can capture it. */
  def showQuery(mode: String = "sql"): String = {
    val text =
      if (mode == "sql")
        try {
          // clause formatting always (the reference's format_sql_query);
          // ANSI keyword color only under Tidier.color(true) — palette
          // mirrors src/TidierDB_macros.jl:544-565
          val pretty = graft.plans.SqlFormat.format(
            graft.plans.SqlPrinter.toSql(df.queryExecution.analyzed))
          if (Tidier.colorEnabled) graft.plans.SqlFormat.colorize(pretty)
          else pretty
        } catch {
          case scala.util.control.NonFatal(_) =>
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        }
      else df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString(mode))
    println(text)
    text
  }
  /** `@collect(stream=true)` analog (reference: src/TidierDB_macros.jl:591-622). */
  def streamCollect(): Iterator[org.apache.spark.sql.Row] = {
    import scala.jdk.CollectionConverters._
    df.toLocalIterator().asScala
  }
  /** `@create_table` analog (reference: src/view_compute.jl:45-94). */
  def createTable(name: String, replace: Boolean = true): Unit = {
    val w = df.write
    (if (replace) w.mode("overwrite") else w).saveAsTable(name)
  }
  /** `@create_view` analog (reference: src/view_compute.jl:13-42). */
  def createView(name: String): Unit = df.createOrReplaceTempView(name)
  /** `drop_view` analog (reference: src/view_compute.jl:36-42). */
  def dropView(name: String): Unit = spark.catalog.dropTempView(name)
  /** `write_file` analog — format from extension (reference: src/view_compute.jl:100-109). */
  def writeFile(path: String): Unit = {
    val lower = path.toLowerCase
    if (lower.endsWith(".csv")) df.write.mode("overwrite").option("header", "true").csv(path)
    else if (lower.endsWith(".json")) df.write.mode("overwrite").json(path)
    else if (lower.endsWith(".arrow") || lower.endsWith(".feather"))
      graft.sources.ArrowWrite.write(df, path)
    else if (lower.endsWith(".avro")) graft.sources.AvroWrite.write(df, path)
    else if (lower.endsWith(".orc")) df.write.mode("overwrite").orc(path)
    else df.write.mode("overwrite").parquet(path)
  }
  /** Explicit-format write: `csv`/`json`/`parquet`, plus the built-in
    * lakehouse writers — `delta` and `iceberg` create the table when
    * absent and append a new commit/snapshot when present
    * ([[graft.sources.DeltaWrite]] / [[graft.sources.IcebergWrite]];
    * single-writer scope, see their scaladocs). */
  def writeFile(path: String, format: String): Unit = format.toLowerCase match {
    case "csv" => df.write.mode("overwrite").option("header", "true").csv(path)
    case "json" => df.write.mode("overwrite").json(path)
    case "parquet" => df.write.mode("overwrite").parquet(path)
    case "orc" => df.write.mode("overwrite").orc(path)
    case "avro" => graft.sources.AvroWrite.write(df, path)
    // the scale forms: one Arrow IPC / Avro container per partition,
    // written executor-side in parallel (ShardedSink manifest commit);
    // read back with ArrowScan.readSharded / AvroScan.readSharded
    case "arrow_sharded" => graft.sources.ArrowWrite.writeSharded(df, path)
    case "avro_sharded" => graft.sources.AvroWrite.writeSharded(df, path)
    case "delta" =>
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(new org.apache.hadoop.fs.Path(path, "_delta_log")))
        graft.sources.DeltaWrite.append(spark, df, path)
      else graft.sources.DeltaWrite.create(spark, df, path)
    case "iceberg" =>
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(new org.apache.hadoop.fs.Path(path, "metadata/version-hint.text")))
        graft.sources.IcebergWrite.append(spark, df, path)
      else graft.sources.IcebergWrite.create(spark, df, path)
    case other => throw new IllegalArgumentException(
      s"writeFile format '$other' not supported (csv/json/parquet/orc/avro/delta/iceberg)")
  }
}

/** Entry points — `db_table` / `dt` analog (reference: src/TidierDB.jl:155-243). */
object Tidier {
  /** `warnings(true)` analog (reference: src/TidierDB.jl:110): announce
    * on stderr when a verb consumes and drops grouping state. Off by
    * default, like the reference. */
  @volatile private var warnFlag: Boolean = false
  def warnings(on: Boolean): Unit = warnFlag = on
  private[graft] def warningsEnabled: Boolean = warnFlag

  /** `TidierDB.color[]` analog (reference: src/TidierDB_macros.jl:544):
    * ANSI keyword coloring in `showQuery("sql")`. Off by default —
    * captured output stays escape-free unless asked. */
  @volatile private var colorFlag: Boolean = false
  def color(on: Boolean): Unit = colorFlag = on
  private[graft] def colorEnabled: Boolean = colorFlag

  /** Scan a file path (parquet/csv/json by extension, globs native). */
  def read(spark: SparkSession, path: String): TidierFrame = {
    val lower = path.toLowerCase.stripSuffix("/")
    val df =
      if (lower.contains("docs.google.com/spreadsheets"))
        graft.sources.GSheetScan.readWithHeaders(spark, path)
      else if (lower.endsWith(".csv") || lower.endsWith(".csv.gz"))
        spark.read.option("header", "true").option("inferSchema", "true").csv(path)
      else if (lower.endsWith(".json") || lower.endsWith(".ndjson"))
        spark.read.json(path)
      else if (lower.endsWith(".dta"))
        graft.sources.StataScan.read(spark, path)
      else if (lower.endsWith(".sav") || lower.endsWith(".zsav"))
        graft.sources.SavScan.read(spark, path)
      else if (lower.endsWith(".xpt"))
        graft.sources.XptScan.read(spark, path)
      else if (lower.endsWith(".sas7bdat"))
        graft.sources.Sas7bdatScan.read(spark, path)
      else if (lower.endsWith(".por"))
        graft.sources.PorScan.read(spark, path)
      else if (lower.endsWith(".arrow") || lower.endsWith(".arrows") ||
               lower.endsWith(".feather"))
        graft.sources.ArrowScan.read(spark, path)
      else if (lower.endsWith(".avro"))
        graft.sources.AvroScan.read(spark, path)
      else if (lower.endsWith(".orc"))
        spark.read.orc(path) // native Spark source (orc-core ships in jars)
      else spark.read.parquet(path)
    TidierFrame(df)
  }
  /** Multi-file scan (reference: src/TidierDB.jl:245-294). */
  def read(spark: SparkSession, paths: Seq[String]): TidierFrame =
    TidierFrame(spark.read.parquet(paths: _*))

  /** Explicit-schema scan: for CSV/JSON, schema INFERENCE is a second
    * full pass over the file — at 100 TB that doubles the scan. Passing
    * the schema makes the read single-pass (and is a no-op speedup for
    * parquet, whose schema is in the footer). */
  def read(spark: SparkSession, path: String,
           schema: org.apache.spark.sql.types.StructType): TidierFrame = {
    val lower = path.toLowerCase.stripSuffix("/")
    val df =
      if (lower.endsWith(".csv") || lower.endsWith(".csv.gz"))
        spark.read.option("header", "true").schema(schema).csv(path)
      else if (lower.endsWith(".json") || lower.endsWith(".ndjson"))
        spark.read.schema(schema).json(path)
      else spark.read.schema(schema).parquet(path)
    TidierFrame(df)
  }

  /** Sampled-inference scan: keep inference but only read
    * `samplingRatio` of the data for it — the middle ground when the
    * schema isn't known but a full inference pass is too expensive. */
  def read(spark: SparkSession, path: String, samplingRatio: Double): TidierFrame = {
    require(samplingRatio > 0.0 && samplingRatio <= 1.0,
      s"samplingRatio must be in (0, 1], got $samplingRatio")
    val lower = path.toLowerCase.stripSuffix("/")
    val df =
      if (lower.endsWith(".csv") || lower.endsWith(".csv.gz"))
        spark.read.option("header", "true").option("inferSchema", "true")
          .option("samplingRatio", samplingRatio.toString).csv(path)
      else if (lower.endsWith(".json") || lower.endsWith(".ndjson"))
        spark.read.option("samplingRatio", samplingRatio.toString).json(path)
      else spark.read.parquet(path)
    TidierFrame(df)
  }

  /** Explicit-format scan — the `iceberg_scan` / `delta_scan` analog
    * (reference: src/TidierDB.jl:161-169, 209-212). Lakehouse formats
    * dispatch through Spark's pluggable DataSource registry; when the
    * connector jar is not on the classpath the failure is rethrown with
    * the fix spelled out instead of Spark's bare ClassNotFound. */
  def read(spark: SparkSession, path: String, format: String): TidierFrame = {
    val fmt = format.toLowerCase
    fmt match {
      case "auto" => read(spark, path)
      case "parquet" => TidierFrame(spark.read.parquet(path))
      case "csv" =>
        TidierFrame(spark.read.option("header", "true").option("inferSchema", "true").csv(path))
      case "json" => TidierFrame(spark.read.json(path))
      case _ =>
        try TidierFrame(spark.read.format(fmt).load(path))
        catch {
          case e: Exception if missingSource(e) && fmt == "iceberg" =>
            // no connector jar: fall back to the dependency-free
            // metadata/manifest reader (add the iceberg-spark-runtime
            // jar + spark.sql.catalog.* conf for writes, row-level
            // deletes, and catalog tables)
            TidierFrame(graft.sources.IcebergScan.read(spark, path))
          case e: Exception if missingSource(e) && fmt == "delta" =>
            // no connector jar: fall back to the dependency-free
            // log-replay reader (add the delta-spark jar +
            // spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension
            // for write support and newer reader features)
            TidierFrame(graft.sources.DeltaScan.read(spark, path))
          case e: Exception if missingSource(e) && fmt == "avro" =>
            // no spark-avro connector jar: fall back to the built-in
            // avro-core container reader
            TidierFrame(graft.sources.AvroScan.read(spark, path))
        }
    }
  }

  /** Spark reports an unregistered source as 'Failed to find data
    * source' (DATA_SOURCE_NOT_FOUND) wrapping a ClassNotFoundException. */
  private def missingSource(e: Throwable): Boolean = {
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(5).exists { t =>
      t.isInstanceOf[ClassNotFoundException] ||
        Option(t.getMessage).exists(m =>
          m.contains("Failed to find data source") || m.contains("DATA_SOURCE_NOT_FOUND"))
    }
  }
  /** External-database scan over JDBC — the one-API counterpart of the
    * reference's per-backend `ext/` connections (reference:
    * ext/LibPQExt.jl:15-39, ext/SQLiteExt.jl, ext/ODBCExt.jl:1-57).
    * `tableOrQuery` is a table name or SQL text (auto-wrapped as a
    * derived table). Filters/projections on the returned frame push
    * into the remote database's WHERE clause. */
  def readJdbc(spark: SparkSession, url: String, tableOrQuery: String,
               options: Map[String, String] = Map.empty): TidierFrame =
    TidierFrame(graft.sources.JdbcScan.read(spark, url, tableOrQuery, options))

  /** Parallel JDBC scan: `numPartitions` concurrent range queries on
    * `partitionColumn` — the scan shape a big remote fact table needs. */
  def readJdbc(spark: SparkSession, url: String, tableOrQuery: String,
               partitionColumn: String, lowerBound: Long, upperBound: Long,
               numPartitions: Int): TidierFrame =
    TidierFrame(graft.sources.JdbcScan.readPartitioned(
      spark, url, tableOrQuery, partitionColumn, lowerBound, upperBound, numPartitions))

  /** Snowflake SQL API query → verb-chainable frame (the reference's
    * `db_table(con::SnowflakeConnection, …)` surface). */
  def readSnowflake(spark: SparkSession,
      conn: graft.sources.RestSql.SnowflakeConnection,
      sql: String): TidierFrame =
    TidierFrame(graft.sources.RestSql.querySnowflake(spark, conn, sql))

  /** Databricks Statement Execution API query → verb-chainable frame
    * (the reference's `db_table(con::DatabricksConnection, …)`). */
  def readDatabricks(spark: SparkSession,
      conn: graft.sources.RestSql.DatabricksConnection,
      sql: String): TidierFrame =
    TidierFrame(graft.sources.RestSql.queryDatabricks(spark, conn, sql))

  /** Iceberg REST catalog table → verb-chainable frame: the catalog
    * resolves `table` ("ns.name") to its current metadata-location;
    * the data plane is the ordinary [[graft.sources.IcebergScan]]. */
  def readIcebergCatalog(spark: SparkSession,
      conn: graft.sources.IcebergCatalog.Connection,
      table: String): TidierFrame =
    TidierFrame(graft.sources.IcebergCatalog.read(spark, conn, table))

  /** Catalog table scan. */
  def table(spark: SparkSession, name: String): TidierFrame =
    TidierFrame(spark.table(name))
  /** Wrap an existing DataFrame (`register_data_frame` analog,
    * reference: src/TidierDB.jl:296-307). */
  def from(df: DataFrame): TidierFrame = TidierFrame(df)
  /** `show_tables` analog (reference: src/TidierDB_macros.jl:686-688). */
  def showTables(spark: SparkSession): DataFrame = spark.sql("SHOW TABLES")
}
