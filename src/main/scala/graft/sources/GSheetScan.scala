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

  /** terminal HTTP response: body bytes + response headers
    * (lowercased keys) — the header-carrying twin of [[Transport]],
    * so [[read]] can honor `Content-Type: …; charset=…` instead of
    * assuming UTF-8 */
  final case class Response(body: Array[Byte], headers: Map[String, String])
  type HeaderTransport = String => Response

  private val SheetId =
    """https?://docs\.google\.com/spreadsheets/d/([A-Za-z0-9_-]+).*""".r
  private val Gid = """[#?&]gid=(\d+)""".r

  /** spreadsheet URL → (sheetId, gid) — loud on anything else. The gid
    * is matched ANYWHERE after the id (modern share links carry it in
    * the query string, `?gid=123`, not only the `#gid=123` fragment —
    * a single greedy regex silently dropped the query form and read
    * worksheet 0). */
  private[graft] def parseUrl(url: String): (String, String) = url match {
    case SheetId(id) =>
      (id, Gid.findFirstMatchIn(url).map(_.group(1)).getOrElse("0"))
    case _ => throw new IllegalArgumentException(
      s"not a Google Sheets URL: $url (expected docs.google.com/spreadsheets/d/<id>...)")
  }

  private[graft] def exportUrl(url: String): String = {
    val (id, gid) = parseUrl(url)
    s"https://docs.google.com/spreadsheets/d/$id/export?format=csv&gid=$gid"
  }

  /** default transport: plain GET, follows redirects (the export URL
    * 307s to a storage host). Needs egress; fails loudly without. */
  def httpGet: Transport = url => httpGetWithHeaders(url).body

  /** [[httpGet]] with the terminal response headers, so charset in
    * Content-Type survives to the decode */
  def httpGetWithHeaders: HeaderTransport = url => {
    val client = java.net.http.HttpClient.newBuilder()
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url)).GET().build()
    val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofByteArray())
    require(resp.statusCode() == 200,
      s"Google Sheets export failed: HTTP ${resp.statusCode()} for $url " +
        "(is the sheet shared to anyone-with-link?)")
    import scala.jdk.CollectionConverters._
    val headers = resp.headers().map().asScala.collect {
      case (k, vs) if !vs.isEmpty => k.toLowerCase -> vs.get(0)
    }.toMap
    Response(resp.body(), headers)
  }

  /** Replay transport over a RECORDED HTTP transcript (the offline
    * twin of [[httpGet]]): the transcript file holds raw
    * request-URL → response exchanges (status line, headers, body
    * bytes) in the plain `### GET <url>` / `HTTP/1.1 <code> …` format;
    * the transport follows `Location` redirects exactly like the real
    * client (the export URL 307s to a googleusercontent host), returns
    * the terminal 200 body bytes, and fails loudly on an unknown URL,
    * a non-redirect non-200 status, or a redirect loop. Lets the whole
    * sheet path — export-URL construction, redirect chase, charset
    * decode, CSV parse, schema inference — run end to end on real
    * recorded bytes with zero egress. */
  def recordedTransport(transcriptPath: String): Transport = {
    val h = recordedHeaderTransport(transcriptPath)
    url => h(url).body
  }

  /** [[recordedTransport]] that also surfaces the terminal 200's
    * recorded headers, so the charset in a recorded
    * `Content-Type: text/csv; charset=…` drives the decode exactly as
    * it would live */
  def recordedHeaderTransport(transcriptPath: String): HeaderTransport = {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(transcriptPath))
    val exchanges = parseTranscript(bytes)
    url => {
      @annotation.tailrec
      def chase(current: String, hops: Int): Response = {
        require(hops < 8, s"redirect loop replaying $url")
        val (status, headers, body) = exchanges.getOrElse(current,
          throw new IllegalArgumentException(
            s"no recorded exchange for $current in $transcriptPath " +
              s"(recorded: ${exchanges.keys.mkString(", ")})"))
        if (status >= 300 && status < 400)
          chase(headers.getOrElse("location",
            throw new IllegalStateException(
              s"recorded $status for $current has no Location header")), hops + 1)
        else {
          require(status == 200,
            s"Google Sheets export failed: HTTP $status for $current " +
              "(is the sheet shared to anyone-with-link?)")
          Response(body, headers)
        }
      }
      chase(url, 0)
    }
  }

  /** `### GET <url>\n<status line>\n<headers>\n\n<body bytes>` blocks;
    * body bytes are preserved VERBATIM (CRLFs and all) up to the next
    * marker — byte-faithful replay is the point of a transcript */
  private def parseTranscript(
      bytes: Array[Byte]): Map[String, (Int, Map[String, String], Array[Byte])] = {
    val marker = "### GET ".getBytes(StandardCharsets.UTF_8)
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
    require(starts.nonEmpty, "transcript has no '### GET ' exchanges")
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
      val url = head.head.stripPrefix("### GET ").trim
      val status = head(1).split("\\s+")(1).toInt
      val headers = head.drop(2).collect {
        case h if h.contains(":") =>
          val Array(k, v) = h.split(":", 2)
          k.trim.toLowerCase -> v.trim
      }.toMap
      val bodyStart = s + text.substring(0, headerEnd._1).getBytes(StandardCharsets.UTF_8).length + headerEnd._2
      // trim ONE trailing newline before the next marker (the
      // transcript author's block separator, not response bytes) —
      // but ONLY when a next marker follows: the FINAL exchange has no
      // separator, so its terminal bytes are genuine response bytes
      // and must replay byte-faithfully (matters for binary fixtures)
      var bodyEnd = e
      if (e < bytes.length) {
        if (bodyEnd > bodyStart && bytes(bodyEnd - 1) == '\n') bodyEnd -= 1
        if (bodyEnd > bodyStart && bytes(bodyEnd - 1) == '\r') bodyEnd -= 1
      }
      url -> ((status, headers, java.util.Arrays.copyOfRange(bytes, bodyStart, bodyEnd)))
    }.toMap
  }

  def read(spark: SparkSession, url: String,
      transport: Transport = httpGet): DataFrame =
    readWithHeaders(spark, url, u => Response(transport(u), Map.empty))

  /** charset named by the Content-Type header, UTF-8 when absent,
    * unparseable, or unsupported by the JVM (a decode should degrade,
    * not crash, on an exotic label) */
  private[graft] def charsetOf(headers: Map[String, String]): java.nio.charset.Charset = {
    val named = for {
      ct <- headers.get("content-type")
      m <- """(?i)charset\s*=\s*"?([A-Za-z0-9._\-]+)"?""".r.findFirstMatchIn(ct)
      cs <- try Some(java.nio.charset.Charset.forName(m.group(1)))
            catch { case _: Exception => None }
    } yield cs
    named.getOrElse(StandardCharsets.UTF_8)
  }

  /** [[read]] over a header-carrying transport: the terminal
    * response's `Content-Type: …; charset=…` selects the decode
    * charset (a latin-1 export must not mojibake), falling back to
    * UTF-8 when absent */
  def readWithHeaders(spark: SparkSession, url: String,
      transport: HeaderTransport = httpGetWithHeaders): DataFrame = {
    val resp = transport(exportUrl(url))
    val csv = new String(resp.body, charsetOf(resp.headers))
    import spark.implicits._
    // split preserving quoted newlines is the CSV reader's job — feed
    // whole physical lines; Spark's parser handles quoted commas, and
    // multiLine quoting across rows is rare in sheet exports
    val lines = csv.split("\r?\n", -1).toIndexedSeq.filter(_.nonEmpty)
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      // sheet exports are RFC 4180: quotes escape by DOUBLING ("") —
      // Spark's default escape is backslash and would pass the inner
      // quotes through literally (caught by the recorded-transcript
      // fixture)
      .option("escape", "\"")
      .csv(lines.toDS())
  }
}
