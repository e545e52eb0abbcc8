package graft

import graft.sources.GSheetScan

/** Google Sheets scan with an injected transport: URL recognition,
  * id/gid extraction, export-URL construction, CSV decode and schema
  * inference are all real; only the HTTP GET is substituted (the
  * default transport needs egress and fails loudly without). */
class GSheetScanSpec extends SparkSpec {

  private val sheet =
    "https://docs.google.com/spreadsheets/d/1AbC_d-EF234/edit#gid=77"

  test("sheet URL parsing: id + gid, default gid, rejects non-sheet URLs") {
    assert(GSheetScan.exportUrl(sheet) ==
      "https://docs.google.com/spreadsheets/d/1AbC_d-EF234/export?format=csv&gid=77")
    assert(GSheetScan.exportUrl(
      "https://docs.google.com/spreadsheets/d/XYZ/edit") ==
      "https://docs.google.com/spreadsheets/d/XYZ/export?format=csv&gid=0")
    // modern share links carry gid in the QUERY string, not the fragment
    assert(GSheetScan.exportUrl(
      "https://docs.google.com/spreadsheets/d/XYZ/edit?gid=123") ==
      "https://docs.google.com/spreadsheets/d/XYZ/export?format=csv&gid=123")
    assert(GSheetScan.exportUrl(
      "https://docs.google.com/spreadsheets/d/XYZ/edit?usp=sharing&gid=9#top") ==
      "https://docs.google.com/spreadsheets/d/XYZ/export?format=csv&gid=9")
    assert(intercept[IllegalArgumentException] {
      GSheetScan.exportUrl("https://example.com/spreadsheets/d/XYZ")
    }.getMessage.contains("not a Google Sheets URL"))
  }

  test("reads the exported CSV with header + inferred schema") {
    var fetched: String = null
    val transport: GSheetScan.Transport = { url =>
      fetched = url
      "name,qty,price\nwidget,3,1.5\ngadget,7,2.25\n\"two, words\",1,0.5"
        .getBytes("UTF-8")
    }
    val df = GSheetScan.read(spark, sheet, transport)
    assert(fetched ==
      "https://docs.google.com/spreadsheets/d/1AbC_d-EF234/export?format=csv&gid=77")
    assert(df.columns.toSeq == Seq("name", "qty", "price"))
    val rows = df.orderBy("name").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getString(0)).toSeq == Seq("gadget", "two, words", "widget"))
    assert(rows.map(_.getInt(1)).toSeq == Seq(7, 1, 3)) // inferred int
    assert(rows.map(_.getDouble(2)).toSeq == Seq(2.25, 0.5, 1.5))
  }

  private def transcript: String =
    getClass.getResource("/gsheet/transcript.http").getPath

  test("recorded HTTP transcript end to end: 307 redirect chase + CSV bytes") {
    val url = "https://docs.google.com/spreadsheets/d/" +
      "1AbC-dEfGhIjKlMnOpQrStUvWxYz0123456789abcde/edit#gid=0"
    val df = GSheetScan.read(spark, url, GSheetScan.recordedTransport(transcript))
    assert(df.columns.toSeq == Seq("name", "qty", "price", "city", "note"))
    val rows = df.orderBy("name").collect()
    assert(rows.length == 4)
    // quoted comma, doubled quotes, unicode — the recorded bytes are
    // real CSV-export shapes, parsed through the actual reader
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("Anvil, large", "Hammer", "Quoted \"nail\" pack", "Rope"))
    assert(rows.map(_.getInt(1)).toSeq == Seq(3, 12, 100, 1))
    val sp = rows.find(_.getString(0).startsWith("Quoted")).get
    assert(sp.getString(3) == "São Paulo" && sp.getString(4) == "unicode ✓")
    assert(rows.find(_.getString(0) == "Hammer").get.isNullAt(4)) // empty cell
  }

  test("transcript parser accepts CRLF header sections (curl-style dumps)") {
    val crlf = "### GET https://docs.google.com/spreadsheets/d/X/export?format=csv&gid=0\r\n" +
      "HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/csv\r\n" +
      "\r\n" +
      "a,b\r\n1,2\r\n"
    val p = java.nio.file.Files.createTempFile("gsheet_crlf", ".http")
    java.nio.file.Files.write(p, crlf.getBytes("UTF-8"))
    val df = GSheetScan.read(spark,
      "https://docs.google.com/spreadsheets/d/X/edit#gid=0",
      GSheetScan.recordedTransport(p.toString))
    assert(df.columns.toSeq == Seq("a", "b"))
    assert(df.head().getInt(0) == 1 && df.head().getInt(1) == 2)
  }

  test("charset in Content-Type drives the decode (latin-1 export must not mojibake)") {
    // body is ISO-8859-1 bytes: 'é' = 0xE9, invalid as UTF-8 — a
    // hardcoded UTF-8 decode would replace it with U+FFFD
    val header = ("### GET https://docs.google.com/spreadsheets/d/L1/export?format=csv&gid=0\n" +
      "HTTP/1.1 200 OK\n" +
      "Content-Type: text/csv; charset=ISO-8859-1\n" +
      "\n").getBytes("UTF-8")
    val body = "name,city\nRenée,Montréal\n".getBytes("ISO-8859-1")
    val p = java.nio.file.Files.createTempFile("gsheet_latin1", ".http")
    java.nio.file.Files.write(p, header ++ body)
    val df = GSheetScan.readWithHeaders(spark,
      "https://docs.google.com/spreadsheets/d/L1/edit#gid=0",
      GSheetScan.recordedHeaderTransport(p.toString))
    val r = df.head()
    assert(r.getString(0) == "Renée", s"mojibake: ${r.getString(0)}")
    assert(r.getString(1) == "Montréal")
  }

  test("charsetOf: parses quoted/cased labels, falls back to UTF-8 on absent or bogus") {
    assert(GSheetScan.charsetOf(Map("content-type" -> "text/csv; charset=ISO-8859-1"))
      .name == "ISO-8859-1")
    assert(GSheetScan.charsetOf(Map("content-type" -> "text/csv; CHARSET=\"utf-8\""))
      .name == "UTF-8")
    assert(GSheetScan.charsetOf(Map("content-type" -> "text/csv")).name == "UTF-8")
    assert(GSheetScan.charsetOf(Map.empty).name == "UTF-8")
    assert(GSheetScan.charsetOf(Map("content-type" -> "text/csv; charset=no-such-cs"))
      .name == "UTF-8")
  }

  test("final exchange replays byte-faithfully (no separator trim without a next marker)") {
    // the terminal response's last bytes are genuine body bytes — the
    // parser must only strip the separator newline BETWEEN blocks
    val one = ("### GET https://docs.google.com/spreadsheets/d/F1/export?format=csv&gid=0\n" +
      "HTTP/1.1 200 OK\n\n" +
      "a,b\n1,2").getBytes("UTF-8") // note: NO trailing newline
    val p1 = java.nio.file.Files.createTempFile("gsheet_exact1", ".http")
    java.nio.file.Files.write(p1, one)
    val t1 = GSheetScan.recordedTransport(p1.toString)
    assert(new String(t1("https://docs.google.com/spreadsheets/d/F1/export?format=csv&gid=0"),
      "UTF-8") == "a,b\n1,2")
    // WITH a trailing newline in the final block, that byte is body too
    val two = ("### GET https://docs.google.com/spreadsheets/d/F2/export?format=csv&gid=0\n" +
      "HTTP/1.1 200 OK\n\n" +
      "a,b\n1,2\n").getBytes("UTF-8")
    val p2 = java.nio.file.Files.createTempFile("gsheet_exact2", ".http")
    java.nio.file.Files.write(p2, two)
    val t2 = GSheetScan.recordedTransport(p2.toString)
    assert(new String(t2("https://docs.google.com/spreadsheets/d/F2/export?format=csv&gid=0"),
      "UTF-8") == "a,b\n1,2\n")
  }

  test("recorded transport is loud on unknown URLs and replays redirects only to 200") {
    val t = GSheetScan.recordedTransport(transcript)
    val e = intercept[IllegalArgumentException] {
      t("https://docs.google.com/spreadsheets/d/NOPE/export?format=csv&gid=0")
    }
    assert(e.getMessage.contains("no recorded exchange"))
    // the terminal 200 body comes back byte-decoded through the chain
    val bytes = t("https://docs.google.com/spreadsheets/d/" +
      "1AbC-dEfGhIjKlMnOpQrStUvWxYz0123456789abcde/export?format=csv&gid=0")
    val text = new String(bytes, "UTF-8")
    assert(text.startsWith("name,qty,price,city,note\r\n"))
    assert(text.contains("\"Anvil, large\""))
  }
}
