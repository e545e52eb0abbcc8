package graft.sources

/** The built-in recorded Google-Sheets CSV-export HTTP transcript that
  * drives the zero-egress gate (q_gsheet_scan) and demos
  * [[GSheetScan.recordedTransport]]: the `/export?format=csv` 307
  * redirect to a googleusercontent host, then the 200 `text/csv` body
  * with quoted commas, RFC 4180 doubled quotes, unicode and CRLF line
  * endings — the response shapes the live endpoint produces. Stored
  * in-source (not as a classpath resource) so a bare compiled-classes
  * run needs no resource-copy step. */
object GSheetFixture {

  val sheetId = "1AbC-dEfGhIjKlMnOpQrStUvWxYz0123456789abcde"
  val sheetUrl = s"https://docs.google.com/spreadsheets/d/$sheetId/edit#gid=0"

  private val gusercontent =
    s"https://doc-0s-4k-sheets.googleusercontent.com/export/$sheetId?format=csv&gid=0"

  private val csvBody =
    "name,qty,price,city,note\r\n" +
      "\"Anvil, large\",3,19.99,Berlin,ok\r\n" +
      "Hammer,12,7.5,Paris,\r\n" +
      "\"Quoted \"\"nail\"\" pack\",100,0.05,São Paulo,unicode ✓\r\n" +
      "Rope,1,3.25,Kyoto,multi word note\r\n"

  val transcript: String =
    s"### GET https://docs.google.com/spreadsheets/d/$sheetId/export?format=csv&gid=0\n" +
      "HTTP/1.1 307 Temporary Redirect\n" +
      "Content-Type: text/html; charset=UTF-8\n" +
      s"Location: $gusercontent\n" +
      "X-Frame-Options: DENY\n" +
      "\n" +
      "\n" +
      s"### GET $gusercontent\n" +
      "HTTP/1.1 200 OK\n" +
      "Content-Type: text/csv\n" +
      "Content-Disposition: attachment; filename=\"sheet1.csv\"\n" +
      "X-Content-Type-Options: nosniff\n" +
      "\n" +
      csvBody

  /** write the transcript to a temp file and return its path (the
    * replay transport reads filesystem paths) */
  def transcriptFile(): String = {
    val tmp = java.nio.file.Files.createTempFile("graft_gsheet_fixture", ".http")
    tmp.toFile.deleteOnExit()
    java.nio.file.Files.write(tmp,
      transcript.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    tmp.toString
  }
}
