package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Google Sheets scan — the reference recognizes `docs.google.com`
  * URLs in `db_table` and reads the sheet as a table
  * (reference: src/TidierDB.jl:171-174, via DuckDB's read_gsheet).
  * Spark-native equivalent: resolve the spreadsheet's public CSV
  * export URL and ingest it with Spark's CSV reader (header +
  * schema inference), so a shared-to-anyone sheet reads like any
  * other table.
  *
  * The HTTP fetch is a pluggable `Transport` (`url => bytes`): the
  * default uses `java.net.http` and needs network egress (absent in
  * this build environment — it fails loudly, not silently); everything
  * else — URL recognition, sheet-id/gid extraction, export-URL
  * construction, CSV decode, schema inference — is real code under
  * test with an injected transport. Private sheets (OAuth) are out of
  * scope, as in the reference's CSV-export path.
  */
object GSheetScan {

  type Transport = String => Array[Byte]

  private val SheetUrl =
    """https?://docs\.google\.com/spreadsheets/d/([A-Za-z0-9_-]+)[^#]*(?:[#?&]gid=(\d+))?.*""".r

  /** spreadsheet URL → (sheetId, gid) — loud on anything else */
  private[graft] def parseUrl(url: String): (String, String) = url match {
    case SheetUrl(id, gid) => (id, Option(gid).getOrElse("0"))
    case _ => throw new IllegalArgumentException(
      s"not a Google Sheets URL: $url (expected docs.google.com/spreadsheets/d/<id>...)")
  }

  private[graft] def exportUrl(url: String): String = {
    val (id, gid) = parseUrl(url)
    s"https://docs.google.com/spreadsheets/d/$id/export?format=csv&gid=$gid"
  }

  /** default transport: plain GET, follows redirects (the export URL
    * 307s to a storage host). Needs egress; fails loudly without. */
  def httpGet: Transport = url => {
    val client = java.net.http.HttpClient.newBuilder()
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url)).GET().build()
    val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofByteArray())
    require(resp.statusCode() == 200,
      s"Google Sheets export failed: HTTP ${resp.statusCode()} for $url " +
        "(is the sheet shared to anyone-with-link?)")
    resp.body()
  }

  def read(spark: SparkSession, url: String,
      transport: Transport = httpGet): DataFrame = {
    val csv = new String(transport(exportUrl(url)), StandardCharsets.UTF_8)
    import spark.implicits._
    // split preserving quoted newlines is the CSV reader's job — feed
    // whole physical lines; Spark's parser handles quoted commas, and
    // multiLine quoting across rows is rare in sheet exports
    val lines = csv.split("\r?\n", -1).toIndexedSeq.filter(_.nonEmpty)
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(lines.toDS())
  }
}
