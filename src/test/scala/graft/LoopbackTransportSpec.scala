package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.sources.{GSheetScan, RestSql}

/** LIVE-transport contract test over a 127.0.0.1 server — the one code
  * path the recorded-transcript suites cannot reach without egress:
  * the real `java.net.http` client (GSheet) and `HttpURLConnection`
  * client (RestSql) against real sockets, covering redirects, charset
  * headers, auth headers, request bodies, chunked responses, and the
  * error paths. Zero egress: everything binds to loopback. */
class LoopbackTransportSpec extends SparkSpec {

  private def withServer(routes: (String, HttpExchange => Unit)*)(
      f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, h) =>
      server.createContext(path, (ex: HttpExchange) =>
        try h(ex) finally ex.close())
    }
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, status: Int, body: Array[Byte],
      headers: Map[String, String] = Map.empty, chunked: Boolean = false): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    // length 0 = chunked transfer-encoding under the JDK server
    ex.sendResponseHeaders(status, if (chunked) 0 else body.length.toLong)
    if (body.nonEmpty) { ex.getResponseBody.write(body); ex.getResponseBody.flush() }
  }

  test("GSheet java.net.http client: redirect chase, charset decode, full sheet path over a real socket") {
    // ISO-8859-1 payload: the charset in Content-Type must drive the decode
    val csv = "name,score\nrené,3\nnoël,4\n".getBytes(StandardCharsets.ISO_8859_1)
    withServer(
      "/redir" -> { ex =>
        respond(ex, 307, Array.emptyByteArray,
          Map("Location" -> s"http://${ex.getRequestHeaders.getFirst("Host")}/csv"))
      },
      "/csv" -> { ex =>
        respond(ex, 200, csv, Map("Content-Type" -> "text/csv; charset=ISO-8859-1"))
      },
      "/missing" -> { ex => respond(ex, 404, "gone".getBytes(StandardCharsets.UTF_8)) }
    ) { base =>
      // the raw client follows the 307 and surfaces lowercased headers
      val r = GSheetScan.httpGetWithHeaders(s"$base/redir")
      assert(java.util.Arrays.equals(r.body, csv))
      assert(r.headers.get("content-type").exists(_.contains("ISO-8859-1")))
      // non-200 terminal: loud
      val e = intercept[IllegalArgumentException](
        GSheetScan.httpGetWithHeaders(s"$base/missing"))
      assert(e.getMessage.contains("HTTP 404"), e.getMessage)

      // the FULL sheet path (export-URL construction → REAL http client
      // → charset decode → CSV parse → DataFrame), rewired to loopback
      val sheetUrl = "https://docs.google.com/spreadsheets/d/abc123/edit#gid=0"
      val df = GSheetScan.readWithHeaders(spark, sheetUrl, { u =>
        assert(u.contains("/abc123/export?format=csv&gid=0"), u)
        GSheetScan.httpGetWithHeaders(s"$base/redir")
      })
      val got = df.collect().map(x => (x.get(0).toString, x.get(1).toString)).toSeq
      assert(got == Seq(("rené", "3"), ("noël", "4")), got.toString)
    }
  }

  test("RestSql LiveTransport: POST body + auth header, chunked partition fetch, error stream") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val first =
      """{"statementHandle":"h1",
        |"resultSetMetaData":{
        |  "rowType":[{"name":"ID","type":"fixed","scale":0},
        |              {"name":"NAME","type":"text"}],
        |  "partitionInfo":[{"rowCount":2},{"rowCount":1}]},
        |"data":[["1","a"],["2","b"]]}""".stripMargin.getBytes(StandardCharsets.UTF_8)
    val second = """[["3","c"]]""".getBytes(StandardCharsets.UTF_8)
    @volatile var sawAuth = ""
    @volatile var sawBody = ""
    @volatile var sawMethod = ""
    withServer(
      "/api/v2/statements/h1" -> { ex => // partition fetch (GET, chunked)
        assert(ex.getRequestURI.getQuery == "partition=1")
        respond(ex, 200, second, chunked = true)
      },
      "/api/v2/statements" -> { ex =>
        if (ex.getRequestURI.getPath == "/api/v2/statements") {
          sawMethod = ex.getRequestMethod
          sawAuth = ex.getRequestHeaders.getFirst("Authorization")
          sawBody = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          respond(ex, 200, first, Map("Content-Type" -> "application/json"))
        } else respond(ex, 404, Array.emptyByteArray)
      },
      "/gone" -> { ex =>
        respond(ex, 403, """{"message":"forbidden"}""".getBytes(StandardCharsets.UTF_8))
      }
    ) { base =>
      val conn = RestSql.SnowflakeConnection(
        s"$base/api/v2/statements", "tok-123", "DB", "SC", "WH",
        transport = RestSql.LiveTransport)
      val df = RestSql.querySnowflake(spark, conn, "SELECT * FROM t")
      // typed schema from rowType; rows from partition 0 + the chunked
      // partition-1 fetch (dropping it would truncate the result)
      assert(df.schema.fieldNames.toSeq == Seq("ID", "NAME"))
      assert(df.schema.fields(0).dataType ==
        org.apache.spark.sql.types.LongType)
      val got = df.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c")), got.toString)
      assert(sawMethod == "POST" && sawAuth == "Bearer tok-123")
      assert(mapper.readTree(sawBody).get("statement").asText() == "SELECT * FROM t")
      // error responses surface the ERROR stream's body, not a hang
      val err = RestSql.LiveTransport.request("GET", s"$base/gone", Map.empty, None)
      assert(err.status == 403 && err.text.contains("forbidden"))
    }
  }
}
