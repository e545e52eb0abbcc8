package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.sources.{IcebergCatalog, IcebergScan, IcebergWrite, RestSql}

/** Iceberg REST catalog read surface: identifier → config prefix →
  * LoadTableResult → metadata-location → the ordinary scan. Recorded
  * transcripts for the protocol shapes, a loopback server for the
  * live-transport contract, and the version-pinning semantics
  * (catalog metadata-location beats version-hint). */
class IcebergCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(n: Int): String = {
    val dir = Files.createTempDirectory("graft_restcat").toString + "/t"
    IcebergWrite.create(spark,
      (1L to n.toLong).map(i => (i, s"v$i")).toDF("id", "v"), dir)
    dir
  }

  private def currentMetadataFile(dir: String): String = {
    val hint = java.nio.file.Paths.get(dir, "metadata", "version-hint.text")
    val v = new String(Files.readAllBytes(hint), UTF_8).trim
    s"$dir/metadata/v$v.metadata.json"
  }

  test("recorded transcript: config prefix + namespace path + load + read") {
    val dir = mkTable(25)
    val meta = currentMetadataFile(dir)
    val transcript =
      s"""### GET https://cat.example/v1/config
         |HTTP/1.1 200 OK
         |content-type: application/json
         |
         |{"defaults":{},"overrides":{"prefix":"p1"}}
         |### GET https://cat.example/v1/p1/namespaces/analytics%1Fraw/tables/events
         |HTTP/1.1 200 OK
         |content-type: application/json
         |
         |{"metadata-location":${com.fasterxml.jackson.databind.node.JsonNodeFactory.instance.textNode(meta)},"metadata":{},"config":{"k":"v"}}
         |""".stripMargin
    val conn = IcebergCatalog.Connection("https://cat.example",
      token = Some("tok"),
      transport = RestSql.recordedTransportFromString(transcript))
    val loaded = IcebergCatalog.loadTable(conn, "analytics.raw.events")
    assert(loaded.metadataLocation == meta && loaded.config == Map("k" -> "v"))
    // full read path through Tidier
    val got = graft.Tidier.readIcebergCatalog(spark, IcebergCatalog.Connection(
        "https://cat.example", token = Some("tok"),
        transport = RestSql.recordedTransportFromString(transcript)),
      "analytics.raw.events")
      .arrange("id").df.collect().map(_.getLong(0)).toSeq
    assert(got == (1L to 25L))
  }

  test("catalog metadata-location PINS the version — version-hint may lead") {
    val dir = mkTable(10)
    val v1Meta = currentMetadataFile(dir)
    // the table advances past what the catalog returned
    IcebergWrite.append(spark,
      (100L to 104L).map(i => (i, s"v$i")).toDF("id", "v"), dir)
    assert(IcebergScan.read(spark, dir).count() == 15)
    val pinned = IcebergScan.readAtMetadata(spark, v1Meta)
    assert(pinned.count() == 10,
      "the explicit metadata file must beat the newer version-hint")
    // and the newest metadata serves the full table
    assert(IcebergScan.readAtMetadata(spark, currentMetadataFile(dir)).count() == 15)
  }

  test("protocol errors are loud: 404 table, missing metadata-location, staged create") {
    val transcript =
      s"""### GET https://cat.example/v1/config
         |HTTP/1.1 200 OK
         |
         |{"defaults":{},"overrides":{}}
         |### GET https://cat.example/v1/namespaces/ns/tables/missing
         |HTTP/1.1 404 Not Found
         |
         |{"error":{"message":"no such table","type":"NoSuchTableException","code":404}}
         |### GET https://cat.example/v1/config
         |HTTP/1.1 200 OK
         |
         |{"defaults":{},"overrides":{}}
         |### GET https://cat.example/v1/namespaces/ns/tables/staged
         |HTTP/1.1 200 OK
         |
         |{"metadata":{}}
         |""".stripMargin
    val t = RestSql.recordedTransportFromString(transcript)
    val conn = IcebergCatalog.Connection("https://cat.example", transport = t)
    val e404 = intercept[IllegalArgumentException](
      IcebergCatalog.loadTable(conn, "ns.missing"))
    assert(e404.getMessage.contains("HTTP 404"))
    val eStaged = intercept[IllegalStateException](
      IcebergCatalog.loadTable(conn, "ns.staged"))
    assert(eStaged.getMessage.contains("metadata-location"))
    intercept[IllegalArgumentException](
      IcebergCatalog.loadTable(conn, "bare_name"))
  }

  test("loopback live contract: real HTTP client end-to-end, auth header carried") {
    val dir = mkTable(12)
    val meta = currentMetadataFile(dir)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val sawAuth = new java.util.concurrent.atomic.AtomicBoolean(false)
    def respond(ex: HttpExchange, status: Int, body: String): Unit = {
      ex.getResponseHeaders.set("Content-Type", "application/json")
      val b = body.getBytes(UTF_8)
      ex.sendResponseHeaders(status, b.length.toLong)
      ex.getResponseBody.write(b)
    }
    server.createContext("/v1/config", (ex: HttpExchange) =>
      try respond(ex, 200, """{"defaults":{"prefix":"w"},"overrides":{}}""")
      finally ex.close())
    server.createContext("/v1/w/namespaces/db/tables/t", (ex: HttpExchange) =>
      try {
        sawAuth.set(Option(ex.getRequestHeaders.getFirst("Authorization"))
          .contains("Bearer sekrit"))
        respond(ex, 200,
          s"""{"metadata-location":${com.fasterxml.jackson.databind.node.JsonNodeFactory.instance.textNode(meta)}}""")
      } finally ex.close())
    server.start()
    try {
      val conn = IcebergCatalog.Connection(
        s"http://127.0.0.1:${server.getAddress.getPort}", token = Some("sekrit"))
      val df = IcebergCatalog.read(spark, conn, "db.t")
      assert(df.count() == 12)
      assert(sawAuth.get(), "the Bearer token must ride the table request")
    } finally server.stop(0)
  }
}
