package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}

/** ICEBERG REST CATALOG client (the public Apache Iceberg REST
  * Catalog OpenAPI spec) — the ecosystem's default table handoff:
  * resolve a table identifier to its current `metadata-location`
  * through `GET /v1/config` + `GET /v1/{prefix}/namespaces/{ns}/
  * tables/{name}`, then delegate the actual read to
  * [[IcebergScan.readAtMetadata]] (the catalog's metadata-location is
  * the source of truth — never the directory's version-hint).
  *
  * Transports are the same pluggable [[RestSql.Transport]] contract
  * as the warehouse clients: live HTTP in a connected deployment,
  * recorded byte transcripts in tests ([[RestSql.recordedTransport]])
  * — the gate and the loopback live-contract spec exercise the same
  * client code path byte-for-byte.
  *
  * Scale note: the catalog interaction is O(1) metadata requests per
  * table load; all data-plane work (manifest walk, delete
  * application, pruned parquet scans) happens in [[IcebergScan]]
  * against the table's storage directly. */
object IcebergCatalog {

  final case class Connection(
      uri: String,
      token: Option[String] = None,
      warehouse: Option[String] = None,
      transport: RestSql.Transport = RestSql.LiveTransport)

  /** LoadTableResult essentials */
  final case class Loaded(metadataLocation: String, config: Map[String, String])

  private val mapper = new ObjectMapper()

  private def headers(conn: Connection): Map[String, String] =
    Map("Accept" -> "application/json") ++
      conn.token.map(t => "Authorization" -> s"Bearer $t")

  private def urlEncode(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")

  /** multi-level namespaces join with the %1F unit separator in URL
    * paths, per the REST spec */
  private def nsPath(levels: Seq[String]): String =
    levels.map(urlEncode).mkString("%1F")

  /** `GET /v1/config` — the prefix the server wants in every later
    * path (overrides win over defaults, per spec) */
  def configPrefix(conn: Connection): Option[String] = {
    val q = conn.warehouse.map(w => s"?warehouse=${urlEncode(w)}").getOrElse("")
    val r = conn.transport.request("GET", s"${conn.uri.stripSuffix("/")}/v1/config$q",
      headers(conn), scala.None)
    require(r.status == 200,
      s"catalog config failed: HTTP ${r.status}: ${r.text.take(500)}")
    val node = mapper.readTree(r.body)
    def prop(section: String): Option[String] =
      Option(node.get(section)).flatMap(s => Option(s.get("prefix")))
        .map(_.asText()).filter(_.nonEmpty)
    prop("overrides").orElse(prop("defaults"))
  }

  /** `GET /v1/{prefix}/namespaces/{ns}/tables/{name}` →
    * LoadTableResult. `table` is `ns[.ns2…].name`. */
  def loadTable(conn: Connection, table: String): Loaded = {
    val parts = table.split('.').toSeq
    require(parts.size >= 2,
      s"table identifier '$table' needs at least namespace.name")
    val prefix = configPrefix(conn).map(p => s"${p.stripSuffix("/")}/").getOrElse("")
    val url = s"${conn.uri.stripSuffix("/")}/v1/$prefix" +
      s"namespaces/${nsPath(parts.dropRight(1))}/tables/${urlEncode(parts.last)}"
    val r = conn.transport.request("GET", url, headers(conn), scala.None)
    require(r.status == 200,
      s"loadTable($table) failed: HTTP ${r.status}: ${r.text.take(500)}")
    val node = mapper.readTree(r.body)
    val loc = Option(node.get("metadata-location")).map(_.asText())
      .filter(_.nonEmpty).getOrElse(throw new IllegalStateException(
        s"LoadTableResult for '$table' carries no metadata-location " +
          "(staged-create results are not readable)"))
    val cfg = Option(node.get("config")).map { c =>
      val it = c.properties().iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
      b.result()
    }.getOrElse(Map.empty)
    Loaded(loc, cfg)
  }

  /** resolve through the catalog, read through [[IcebergScan]] */
  def read(spark: SparkSession, conn: Connection, table: String): DataFrame =
    IcebergScan.readAtMetadata(spark, loadTable(conn, table).metadataLocation)
}
