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
