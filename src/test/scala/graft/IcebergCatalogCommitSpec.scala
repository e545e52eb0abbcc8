package graft

import java.net.InetSocketAddress
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

import graft.sources.{IcebergCatalog, IcebergCatalogFixture, IcebergWrite, RestSql}

/** The REST-catalog COMMIT path: CommitTableRequest wire shapes
  * (requirements pin the base, updates carry the snapshot), pointer
  * adoption, the 409 contract for catalog-level races, and a live
  * HTTP loopback proving the exact same client bytes work over real
  * sockets (the q_iceberg_catalog_commit gate runs the socketless
  * twin of the same fixture). */
class IcebergCatalogCommitSpec extends SparkSpec {
  import spark.implicits._

  private def hconf = spark.sparkContext.hadoopConfiguration

  private def mkTable(): String = {
    val root = Files.createTempDirectory("graft_cat_commit").toString + "/t"
    IcebergWrite.create(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), root)
    root
  }

  test("commitAppend: wire shapes validated, pointer advances, rows land") {
    val root = mkTable()
    val (conn, server) = IcebergCatalogFixture.oneTableConnection(
      hconf, root, Seq("corpus"), "t")
    val before = server.servedLocation
    val res = IcebergCatalog.commitAppend(spark, conn, "corpus.t",
      Seq((3L, "c")).toDF("id", "v"))
    assert(server.servedLocation != before)
    assert(res.newMetadataLocation == server.servedLocation)
    // the request carried the spec's requirement/update shapes
    assert(res.requestJson.contains("\"assert-table-uuid\""))
    assert(res.requestJson.contains("\"assert-ref-snapshot-id\""))
    assert(res.requestJson.contains("\"add-snapshot\""))
    assert(res.requestJson.contains("\"set-snapshot-ref\""))
    assert(res.requestJson.contains("\"ref-name\":\"main\""))
    val got = IcebergCatalog.read(spark, conn, "corpus.t")
      .orderBy("id").as[(Long, String)].collect()
    assert(got.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // a second commit chains from the adopted head
    IcebergCatalog.commitAppend(spark, conn, "corpus.t",
      Seq((4L, "d")).toDF("id", "v"))
    assert(IcebergCatalog.read(spark, conn, "corpus.t").count() == 4)
  }

  test("catalog-level race: requirement fails, 409 surfaces, pointer stays") {
    val root = mkTable()
    val (conn0, server) = IcebergCatalogFixture.oneTableConnection(
      hconf, root, Seq("corpus"), "t")
    // a "concurrent" adoption lands between the client's staging and
    // its POST: the transport seam repoints the catalog at the
    // directory head (which by then is the client's own staged commit,
    // i.e. some other snapshot than the asserted base) right before
    // the commit request goes through
    val racing = new RestSql.Transport {
      def request(m: String, u: String, h: Map[String, String],
          b: Option[Array[Byte]]): RestSql.Response = {
        if (m == "POST") {
          val v = new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(root, "metadata/version-hint.text")),
            "UTF-8").trim.toInt
          server.pointAt(s"$root/metadata/v$v.metadata.json")
        }
        server.request(m, u, h, b)
      }
    }
    val conn = conn0.copy(transport = racing)
    val before = server.servedLocation
    val e = intercept[java.util.ConcurrentModificationException] {
      IcebergCatalog.commitAppend(spark, conn, "corpus.t",
        Seq((5L, "e")).toDF("id", "v"))
    }
    assert(e.getMessage.contains("409"))
    assert(server.servedLocation != before) // the race moved it, not us
  }

  test("catalog head and directory head must agree before staging") {
    val root = mkTable()
    val (conn, server) = IcebergCatalogFixture.oneTableConnection(
      hconf, root, Seq("corpus"), "t")
    // directory advances without the catalog hearing about it
    IcebergWrite.append(spark, Seq((9L, "z")).toDF("id", "v"), root)
    val e = intercept[IllegalArgumentException] {
      IcebergCatalog.commitAppend(spark, conn, "corpus.t",
        Seq((6L, "f")).toDF("id", "v"))
    }
    assert(e.getMessage.contains("disagree"))
    assert(server.servedLocation.endsWith("v1.metadata.json"))
    // torn-commit recovery: publish the directory head, then commit
    val pub = IcebergCatalog.publishDirectoryHead(spark, conn, "corpus.t")
    assert(server.servedLocation == pub.newMetadataLocation)
    assert(IcebergCatalog.read(spark, conn, "corpus.t").count() == 3)
    IcebergCatalog.commitAppend(spark, conn, "corpus.t",
      Seq((6L, "f")).toDF("id", "v"))
    assert(IcebergCatalog.read(spark, conn, "corpus.t").count() == 4)
    // agreement → nothing to publish, loudly
    val e2 = intercept[IllegalArgumentException] {
      IcebergCatalog.publishDirectoryHead(spark, conn, "corpus.t")
    }
    assert(e2.getMessage.contains("nothing to publish"))
  }

  test("register: 404 before, read/commit after, 409 on re-register") {
    val root = mkTable()
    val (conn, server) = IcebergCatalogFixture.oneTableConnection(
      hconf, root, Seq("corpus"), "t", registered = false)
    assert(!server.isRegistered)
    intercept[IllegalArgumentException] { // loadTable 404 fails loudly
      IcebergCatalog.read(spark, conn, "corpus.t")
    }
    val metaLoc = s"$root/metadata/v1.metadata.json"
    assert(IcebergCatalog.registerTable(conn, Seq("corpus"), "t", metaLoc) == metaLoc)
    assert(server.isRegistered)
    assert(IcebergCatalog.read(spark, conn, "corpus.t").count() == 2)
    // the registered table commits through the catalog like any other
    IcebergCatalog.commitAppend(spark, conn, "corpus.t",
      Seq((3L, "c")).toDF("id", "v"))
    assert(IcebergCatalog.read(spark, conn, "corpus.t").count() == 3)
    val e = intercept[IllegalStateException] {
      IcebergCatalog.registerTable(conn, Seq("corpus"), "t", metaLoc)
    }
    assert(e.getMessage.contains("409"))
  }

  test("live HTTP loopback: the same client over real sockets") {
    val root = mkTable()
    val (_, server) = IcebergCatalogFixture.oneTableConnection(
      hconf, root, Seq("corpus"), "t")
    val http = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    http.createContext("/", (ex: HttpExchange) => {
      val body = ex.getRequestBody.readAllBytes()
      val resp = server.request(ex.getRequestMethod,
        s"http://127.0.0.1${ex.getRequestURI}", Map.empty,
        if (body.isEmpty) None else Some(body))
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(resp.status, resp.body.length)
      val os = ex.getResponseBody
      try os.write(resp.body) finally os.close()
    })
    http.start()
    try {
      val conn = IcebergCatalog.Connection(
        s"http://127.0.0.1:${http.getAddress.getPort}",
        token = Some("loopback-token"), transport = RestSql.LiveTransport)
      IcebergCatalog.commitAppend(spark, conn, "corpus.t",
        Seq((3L, "c")).toDF("id", "v"))
      assert(IcebergCatalog.read(spark, conn, "corpus.t").count() == 3)
    } finally http.stop(0)
  }
}
