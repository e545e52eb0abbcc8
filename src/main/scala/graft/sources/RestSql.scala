package graft.sources

import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** REST-SQL warehouse backends — the Spark-native counterpart of the
  * reference's HTTP warehouse clients (Snowflake SQL API,
  * `src/parsing_snowflake.jl:179-250`; Databricks SQL Statement
  * Execution API, `src/parsing_databricks.jl:1-130`). The reference
  * POSTs a SQL string and materializes the JSON result into a
  * DataFrame; this module does the same, Spark-shaped:
  *
  *  - transports are PLUGGABLE and serializable ([[RestSql.Transport]]):
  *    the live one speaks real HTTP (loud in a no-egress environment),
  *    the recorded one replays a byte transcript — the same
  *    recorded-bytes testing contract as [[GSheetScan]], extended with
  *    methods, request sequencing (a polled GET returns successive
  *    recorded responses) and presigned-link fetches;
  *  - inline JSON results parse driver-side into a TYPED DataFrame
  *    (the row set of a warehouse query is bounded — the reference's
  *    shape exactly);
  *  - Databricks EXTERNAL_LINKS result chunks are fetched on the
  *    EXECUTORS (one task per presigned chunk, no auth header on
  *    presigned URLs, per the API contract) — the one place the
  *    protocol offers real parallelism, so a multi-GB result set
  *    never serializes through the driver.
  *
  * SCALE, stated loudly: these APIs return query RESULT SETS — they
  * are the right tool for warehouse-side aggregates and dimension
  * pulls. The 100 TB path into warehouse-resident FACT data is reading
  * its storage directly ([[DeltaScan]]/[[IcebergScan]] on the same
  * files), not paging terabytes through a SQL-over-HTTP endpoint.
  */
object RestSql {

  final case class Response(
      status: Int, headers: Map[String, String], body: Array[Byte]) {
    def text: String = new String(body, StandardCharsets.UTF_8)
  }

  /** Serializable so executor-side chunk fetches can carry it. */
  trait Transport extends Serializable {
    def request(method: String, url: String, headers: Map[String, String],
        body: Option[Array[Byte]]): Response
  }

  /** Real HTTP via HttpURLConnection — fails loudly without egress. */
  object LiveTransport extends Transport {
    def request(method: String, url: String, headers: Map[String, String],
        body: Option[Array[Byte]]): Response = {
      val conn = new java.net.URI(url).toURL.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      try {
        conn.setRequestMethod(method)
        conn.setConnectTimeout(15000)
        conn.setReadTimeout(120000)
        headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
        body.foreach { b =>
          conn.setDoOutput(true)
          val out = conn.getOutputStream
          try out.write(b) finally out.close()
        }
        val status = conn.getResponseCode
        val stream = if (status >= 400) conn.getErrorStream else conn.getInputStream
        val bytes =
          if (stream == null) Array.emptyByteArray
          else try stream.readAllBytes() finally stream.close()
        val hdrs = conn.getHeaderFields.asScala.collect {
          case (k, vs) if k != null => k.toLowerCase -> vs.asScala.mkString(",")
        }.toMap
        Response(status, hdrs, bytes)
      } finally conn.disconnect()
    }
  }

  /** Byte-transcript replay: `### <METHOD> <url>` blocks in FILE ORDER;
    * repeated requests to the same (method, url) consume successive
    * blocks — exactly what a PENDING→SUCCEEDED poll loop needs. Same
    * block syntax as the [[GSheetScan]] transcripts
    * (`### METHOD url\nHTTP/1.1 <status> …\nheaders\n\n<body>`); the
    * final block's trailing bytes replay verbatim. */
  final class RecordedTransport(transcript: Array[Byte]) extends Transport {
    private val exchanges: Seq[(String, Response)] = parseTranscript(transcript)
    // mutable cursor per key — driver-side replay state; executor-side
    // copies each replay their own deserialized cursor (chunk fetches
    // hit distinct URLs once, so per-copy state is correct there)
    @transient private lazy val cursors =
      scala.collection.mutable.Map.empty[String, Int]

    def request(method: String, url: String, headers: Map[String, String],
        body: Option[Array[Byte]]): Response = synchronized {
      val key = s"$method $url"
      val from = cursors.getOrElse(key, 0)
      val idx = exchanges.indexWhere(_._1 == key, from)
      require(idx >= 0,
        s"no (more) recorded exchanges for '$key' " +
          s"(recorded: ${exchanges.map(_._1).distinct.mkString("; ")})")
      cursors(key) = idx + 1
      exchanges(idx)._2
    }
  }

  def recordedTransport(transcriptPath: String): RecordedTransport =
    new RecordedTransport(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(transcriptPath)))

  def recordedTransportFromString(transcript: String): RecordedTransport =
    new RecordedTransport(transcript.getBytes(StandardCharsets.UTF_8))

  private def parseTranscript(bytes: Array[Byte]): Seq[(String, Response)] = {
    val marker = "### ".getBytes(StandardCharsets.UTF_8)
    def indexOf(from: Int): Int = {
      var i = from
      while (i <= bytes.length - marker.length) {
        if (bytes.startsWith(marker, i) && (i == 0 || bytes(i - 1) == '\n')) return i
        i += 1
      }
      -1
    }
    val starts = Iterator.iterate(indexOf(0))(p => indexOf(p + 1))
      .takeWhile(_ >= 0).toSeq
    require(starts.nonEmpty, "transcript has no '### ' exchanges")
    starts.zipAll(starts.drop(1), -1, bytes.length).map { case (s, e) =>
      val block = java.util.Arrays.copyOfRange(bytes, s, e)
      val text = new String(block, StandardCharsets.UTF_8)
      val headerEnd = {
        val lf = text.indexOf("\n\n")
        val crlf = text.indexOf("\r\n\r\n")
        if (lf >= 0 && (crlf < 0 || lf < crlf)) (lf, 2) else (crlf, 4)
      }
      require(headerEnd._1 >= 0, s"exchange missing blank line after headers: $text")
      val head = text.substring(0, headerEnd._1).split("\r?\n").toSeq
      val reqLine = head.head.stripPrefix("### ").trim
      val status = head(1).split("\\s+")(1).toInt
      val headers = head.drop(2).collect {
        case h if h.contains(":") =>
          val Array(k, v) = h.split(":", 2)
          k.trim.toLowerCase -> v.trim
      }.toMap
      val bodyStart = s +
        text.substring(0, headerEnd._1).getBytes(StandardCharsets.UTF_8).length +
        headerEnd._2
      var bodyEnd = e
      if (e < bytes.length) { // trim the block-separator newline, non-final only
        if (bodyEnd > bodyStart && bytes(bodyEnd - 1) == '\n') bodyEnd -= 1
        if (bodyEnd > bodyStart && bytes(bodyEnd - 1) == '\r') bodyEnd -= 1
      }
      reqLine -> Response(status, headers,
        java.util.Arrays.copyOfRange(bytes, bodyStart, bodyEnd))
    }
  }

  // thread-safe once configured; never rebuild per poll/chunk
  private val mapper = new ObjectMapper()

  private def jsonBody(r: Response, what: String): JsonNode = {
    require(r.status == 200,
      s"$what failed: HTTP ${r.status}: ${r.text.take(500)}")
    mapper.readTree(r.body)
  }

  // ---------------- Snowflake SQL API ----------------

  /** Connection shape mirrors the reference's `SnowflakeConnection`
    * (`parsing_snowflake.jl:179-186`). */
  final case class SnowflakeConnection(
      apiUrl: String, authToken: String, database: String, schema: String,
      warehouse: String, transport: Transport = LiveTransport)

  /** Execute `sql` through the Snowflake SQL API and materialize the
    * JSON result: `resultSetMetaData.rowType` drives a TYPED schema —
    * `fixed` scale 0 → LONG, `fixed` scale>0 / `real` → DOUBLE,
    * `boolean` → BOOLEAN, everything else (text/date/timestamp
    * variants, which the API serializes as strings) → STRING, exactly
    * the reference's materialization contract. NULLs preserved. */
  def querySnowflake(spark: SparkSession, conn: SnowflakeConnection,
      sql: String): DataFrame = {
    val body = mapper.createObjectNode()
    body.put("statement", sql)
    body.put("database", conn.database)
    body.put("schema", conn.schema)
    body.put("warehouse", conn.warehouse)
    body.put("role", "")
    val resp = conn.transport.request("POST", conn.apiUrl,
      Map("Authorization" -> s"Bearer ${conn.authToken}",
        "Content-Type" -> "application/json"),
      Some(mapper.writeValueAsBytes(body)))
    val json = jsonBody(resp, s"Snowflake statement")
    val rowType = Option(json.path("resultSetMetaData").get("rowType"))
      .getOrElse(throw new IllegalStateException(
        "Snowflake response has no resultSetMetaData.rowType: " + resp.text.take(300)))
    val cols = rowType.elements().asScala.toSeq.map { c =>
      val name = c.get("name").asText()
      val t = c.path("type").asText("").toLowerCase
      val scale = c.path("scale").asInt(0)
      val dt: DataType = t match {
        case "fixed" if scale == 0 => LongType
        case "fixed" | "real" => DoubleType
        case "boolean" => BooleanType
        case _ => StringType
      }
      StructField(name, dt, nullable = true)
    }
    val schema = StructType(cols)
    def parse(dataArray: JsonNode): Seq[Row] =
      dataArray.elements().asScala.map { arr =>
        Row.fromSeq(cols.zipWithIndex.map { case (f, i) =>
          val v = arr.get(i)
          if (v == null || v.isNull) null
          else f.dataType match {
            case LongType => v.asText().toLong
            case DoubleType => v.asText().toDouble
            case BooleanType => v.asText().toBoolean
            case _ => v.asText()
          }
        })
      }.toSeq
    var rows = parse(json.path("data"))
    // multi-partition results: the first response carries partition 0
    // plus resultSetMetaData.partitionInfo listing the rest — fetch
    // GET {statements}/{handle}?partition=n for each (silently keeping
    // only partition 0 would truncate the result)
    val nParts = json.path("resultSetMetaData").path("partitionInfo").size()
    if (nParts > 1) {
      val handle = json.path("statementHandle").asText("")
      require(handle.nonEmpty,
        s"Snowflake result has $nParts partitions but no statementHandle to fetch them")
      for (p <- 1 until nParts) {
        val part = jsonBody(
          conn.transport.request("GET", s"${conn.apiUrl}/$handle?partition=$p",
            Map("Authorization" -> s"Bearer ${conn.authToken}"), None),
          s"Snowflake partition $p")
        rows ++= parse(if (part.isArray) part else part.path("data"))
      }
    }
    spark.createDataFrame(rows.asJava, schema)
  }

  /** The reference's `get_table_metadata` (INFORMATION_SCHEMA probe,
    * `parsing_snowflake.jl:252-261`) — (column_name, data_type) rows. */
  def snowflakeTableMetadata(spark: SparkSession, conn: SnowflakeConnection,
      table: String): DataFrame =
    // the connection's database/schema and the user-supplied table name
    // are data, not SQL: quote the identifier and escape the string
    // literals so a quote character can't break (or inject into) the
    // probe statement — same posture as JdbcScan.quoteIdent
    querySnowflake(spark, conn,
      s"""SELECT COLUMN_NAME, DATA_TYPE
         |FROM ${sfIdent(conn.database)}.INFORMATION_SCHEMA.COLUMNS
         |WHERE TABLE_SCHEMA = ${sfLit(conn.schema)}
         |AND TABLE_NAME = ${sfLit(table.toUpperCase(java.util.Locale.ROOT))}
         |ORDER BY ORDINAL_POSITION""".stripMargin)

  /** Snowflake double-quoted identifier, embedded quotes doubled. */
  private[graft] def sfIdent(name: String): String =
    "\"" + name.replace("\"", "\"\"") + "\""

  /** Snowflake single-quoted string literal, quotes and backslashes
    * doubled (Snowflake treats backslash as an escape inside literals). */
  private[graft] def sfLit(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"

  // ---------------- Databricks SQL Statement Execution API ----------------

  /** Connection shape mirrors the reference's `DatabricksConnection`
    * (`parsing_databricks.jl:2-9`); `apiUrl` ends in
    * `/api/2.0/sql/statements`. */
  final case class DatabricksConnection(
      apiUrl: String, authToken: String, warehouseId: String,
      transport: Transport = LiveTransport,
      maxPolls: Int = 120, pollDelayMs: Long = 1000L)

  /** Execute `sql`: POST the statement, poll `GET /{statement_id}`
    * while PENDING/RUNNING (bounded by `maxPolls`), then materialize —
    * inline `result.data_array` chunks follow
    * `next_chunk_internal_link` pagination driver-side;
    * EXTERNAL_LINKS chunks are fetched ON THE EXECUTORS (one task per
    * presigned URL, no Authorization header — presigned URLs are
    * self-contained, `parsing_databricks.jl:37-40`). FAILED/CANCELED
    * states and unknown dispositions fail loudly. */
  def queryDatabricks(spark: SparkSession, conn: DatabricksConnection,
      sql: String): DataFrame = {
    val auth = Map("Authorization" -> s"Bearer ${conn.authToken}",
      "Content-Type" -> "application/json")
    val post = mapper.createObjectNode()
    post.put("statement", sql)
    post.put("warehouse_id", conn.warehouseId)
    var json = jsonBody(
      conn.transport.request("POST", conn.apiUrl, auth,
        Some(mapper.writeValueAsBytes(post))),
      "Databricks statement")
    var polls = 0
    while (Seq("PENDING", "RUNNING").contains(json.path("status").path("state").asText())) {
      require(polls < conn.maxPolls,
        s"Databricks statement still ${json.path("status").path("state").asText()} " +
          s"after ${conn.maxPolls} polls")
      if (conn.pollDelayMs > 0) Thread.sleep(conn.pollDelayMs)
      val id = json.get("statement_id").asText()
      json = jsonBody(
        conn.transport.request("GET", s"${conn.apiUrl}/$id", auth, None),
        s"Databricks statement poll $id")
      polls += 1
    }
    val state = json.path("status").path("state").asText()
    require(state == "SUCCEEDED",
      s"Databricks statement ended $state: " +
        json.path("status").path("error").path("message").asText(""))

    val manifest = json.get("manifest")
    val cols = manifest.path("schema").path("columns").elements().asScala.toSeq
      .sortBy(_.path("position").asInt())
      .map { c =>
        val dt: DataType = c.path("type_name").asText("").toUpperCase match {
          case "LONG" | "BIGINT" | "INT" | "SHORT" | "BYTE" => LongType
          case "DOUBLE" | "FLOAT" | "DECIMAL" => DoubleType
          case "BOOLEAN" => BooleanType
          case _ => StringType
        }
        StructField(c.get("name").asText(), dt, nullable = true)
      }
    val schema = StructType(cols)
    val types: Seq[DataType] = cols.map(_.dataType)

    def parseRows(dataArray: JsonNode): Seq[Row] =
      dataArray.elements().asScala.map { arr =>
        Row.fromSeq(types.zipWithIndex.map { case (dt, i) =>
          val v = arr.get(i)
          if (v == null || v.isNull) null
          else dt match {
            case LongType => v.asText().toLong
            case DoubleType => v.asText().toDouble
            case BooleanType => v.asText().toBoolean
            case _ => v.asText()
          }
        })
      }.toSeq

    val result = json.path("result")
    val external = result.path("external_links")
    if (external.isArray && external.size() > 0) {
      // presigned chunks → one executor task each; links collected
      // across pagination first (driver-side link walk is metadata-only).
      // The API carries the next-chunk pointer INSIDE each
      // external_links element (next_chunk_internal_link per chunk);
      // some responses also put one at the result top level — follow
      // whichever is present, or chunk 0's rows would be the whole
      // "result", silently
      def linksOf(node: JsonNode): Vector[String] =
        node.path("external_links").elements().asScala
          .map(_.get("external_link").asText()).toVector
      def nextOf(node: JsonNode): String = {
        val elem = node.path("external_links").elements().asScala
          .map(_.path("next_chunk_internal_link").asText(""))
          .filter(_.nonEmpty).toSeq.lastOption.getOrElse("")
        if (elem.nonEmpty) elem else node.path("next_chunk_internal_link").asText("")
      }
      var links = linksOf(result)
      var next = nextOf(result)
      val base = conn.apiUrl.replace("/api/2.0/sql/statements", "")
      while (next.nonEmpty) {
        val page = jsonBody(
          conn.transport.request("GET", base + next, auth, None),
          "Databricks chunk page")
        links ++= linksOf(page)
        next = nextOf(page)
      }
      val transport = conn.transport
      val typesB = types
      val rdd = spark.sparkContext.parallelize(links, links.size).flatMap { url =>
        val body = transport.request("GET", url, Map.empty, None)
        require(body.status == 200, s"presigned chunk fetch failed: HTTP ${body.status}")
        new ObjectMapper().readTree(body.body).elements().asScala.map { arr =>
          Row.fromSeq(typesB.zipWithIndex.map { case (dt, i) =>
            val v = arr.get(i)
            if (v == null || v.isNull) null
            else dt match {
              case LongType => v.asText().toLong
              case DoubleType => v.asText().toDouble
              case BooleanType => v.asText().toBoolean
              case _ => v.asText()
            }
          })
        }
      }
      spark.createDataFrame(rdd, schema)
    } else {
      var rows = parseRows(result.path("data_array"))
      var next = result.path("next_chunk_internal_link").asText("")
      val base = conn.apiUrl.replace("/api/2.0/sql/statements", "")
      while (next.nonEmpty) {
        val page = jsonBody(
          conn.transport.request("GET", base + next, auth, None),
          "Databricks chunk page")
        rows ++= parseRows(page.path("data_array"))
        next = page.path("next_chunk_internal_link").asText("")
      }
      spark.createDataFrame(rows.asJava, schema)
    }
  }
}
