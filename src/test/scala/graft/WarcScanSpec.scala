package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.WarcScan

/** WARC/WET reader: ISO 28500 record grammar over plain and gzip
  * (member-per-record) layouts, HTTP response head splitting, loud
  * malformed-input errors, and the parse_warc column surface. */
class WarcScanSpec extends SparkSpec {

  private def rec(headers: Seq[(String, String)], payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder("WARC/1.0\r\n")
    headers.foreach { case (k, v) => sb.append(s"$k: $v\r\n") }
    sb.append(s"Content-Length: ${payload.length}\r\n\r\n")
    sb.toString.getBytes(UTF_8) ++ payload ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private val httpBody = "Hello <b>crawl</b> world".getBytes(UTF_8)
  private val httpPayload =
    ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n" +
      "Server: test\r\n\r\n").getBytes(UTF_8) ++ httpBody

  private val winfo = rec(Seq(
    "WARC-Type" -> "warcinfo",
    "WARC-Record-ID" -> "<urn:uuid:aaa>",
    "WARC-Date" -> "2024-01-01T00:00:00Z",
    "Content-Type" -> "application/warc-fields"),
    "software: graft-test\r\n".getBytes(UTF_8))
  private val resp = rec(Seq(
    "WARC-Type" -> "response",
    "WARC-Record-ID" -> "<urn:uuid:bbb>",
    "WARC-Target-URI" -> "https://example.com/a",
    "WARC-Date" -> "2024-01-01T00:00:01Z",
    "Content-Type" -> "application/http; msgtype=response"),
    httpPayload)
  private val conv = rec(Seq(
    "WARC-Type" -> "conversion",
    "WARC-Record-ID" -> "<urn:uuid:ccc>",
    "WARC-Target-URI" -> "https://example.com/a",
    "WARC-Date" -> "2024-01-01T00:00:02Z",
    "Content-Type" -> "text/plain"),
    "Hello crawl world".getBytes(UTF_8))

  private def gzMembers(recs: Array[Byte]*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    recs.foreach { r => // one gzip member per record — the CC layout
      val g = new GZIPOutputStream(out); g.write(r); g.finish()
    }
    out.toByteArray
  }

  private def writeTmp(name: String, bytes: Array[Byte]): String = {
    val dir = Files.createTempDirectory("warc").toFile
    val f = new java.io.File(dir, name)
    val o = new FileOutputStream(f); o.write(bytes); o.close()
    f.getAbsolutePath
  }

  test("plain WARC: three records, typed fields, HTTP head split off") {
    val p = writeTmp("t.warc", winfo ++ resp ++ conv)
    val rows = WarcScan.readWarc(spark, p).orderBy("warc_date").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[String]("warc_type")).toSeq ==
      Seq("warcinfo", "response", "conversion"))
    val r = rows(1)
    assert(r.getAs[String]("record_id") == "<urn:uuid:bbb>")
    assert(r.getAs[String]("target_uri") == "https://example.com/a")
    assert(r.getAs[Int]("http_status") == 200)
    assert(r.getAs[String]("http_content_type") == "text/html; charset=UTF-8")
    // response payload is the HTTP BODY; content_length stays the WARC length
    assert(new String(r.getAs[Array[Byte]]("payload"), UTF_8) ==
      "Hello <b>crawl</b> world")
    assert(r.getAs[Long]("content_length") == httpPayload.length)
    // non-HTTP records keep the raw payload and NULL http fields
    assert(rows(0).isNullAt(rows(0).fieldIndex("http_status")))
  }

  test("gzip member-per-record and single-member layouts both read") {
    val multi = writeTmp("m.warc.gz", gzMembers(winfo, resp, conv))
    val single = writeTmp("s.warc.gz", gzMembers(winfo ++ resp ++ conv))
    Seq(multi, single).foreach { p =>
      val df = WarcScan.readWarc(spark, p)
      assert(df.count() == 3, p)
      assert(df.filter(col("warc_type") === "response").count() == 1)
    }
  }

  test("zstd layouts read: frame-per-record and single frame") {
    // one compressed FRAME per record (newer CC crawls) vs one frame
    // for the whole file — both must stream through
    def zst(recs: Seq[Array[Byte]]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      recs.foreach(r => out.write(com.github.luben.zstd.Zstd.compress(r)))
      out.toByteArray
    }
    val multi = writeTmp("m.warc.zst", zst(Seq(winfo, resp, conv)))
    val single = writeTmp("s.warc.zst", zst(Seq(winfo ++ resp ++ conv)))
    Seq(multi, single).foreach { p =>
      val df = WarcScan.readWarc(spark, p)
      assert(df.count() == 3, p)
      assert(df.filter(col("warc_type") === "response").count() == 1)
    }
  }

  test("readWet yields conversion text directly") {
    val p = writeTmp("t.wet", winfo ++ conv)
    val wet = WarcScan.readWet(spark, p).collect()
    assert(wet.length == 1)
    assert(wet(0).getAs[String]("text") == "Hello crawl world")
    assert(wet(0).getAs[String]("target_uri") == "https://example.com/a")
  }

  test("malformed input fails loudly with location") {
    val truncated = (winfo ++ resp).dropRight(40) // cut mid-payload
    val e1 = intercept[org.apache.spark.SparkException] {
      WarcScan.readWarc(spark, writeTmp("bad.warc", truncated)).collect()
    }
    assert(e1.getMessage.contains("EOF") || e1.getCause.getMessage.contains("EOF"))
    val garbage = "NOT-A-WARC\r\n".getBytes(UTF_8) ++ winfo
    val e2 = intercept[org.apache.spark.SparkException] {
      WarcScan.readWarc(spark, writeTmp("bad2.warc", garbage)).collect()
    }
    assert(e2.getMessage.contains("version line") ||
      e2.getCause.getMessage.contains("version line"))
  }

  test("parse_warc column expression matches the file reader") {
    import spark.implicits._
    val df = Seq((1L, winfo ++ resp ++ conv)).toDF("id", "blob")
      .select(col("id"), explode(Multimodal.parseWarc(col("blob"))).as("r"))
      .select("id", "r.warc_type", "r.http_status", "r.payload")
    val got = df.collect().map(r =>
      (r.getAs[String]("warc_type"), Option(r.get(2)),
        new String(r.getAs[Array[Byte]]("payload"), UTF_8)))
    assert(got.length == 3)
    assert(got(1) == (("response", Some(200), "Hello <b>crawl</b> world")))
    // SQL surface
    GraftExtensions.register(spark)
    Seq((1L, conv)).toDF("id", "blob").createOrReplaceTempView("warc_blobs")
    val viaSql = spark.sql(
      "SELECT r.warc_type FROM (SELECT explode(parse_warc(blob)) AS r FROM warc_blobs)")
    assert(viaSql.collect().map(_.getString(0)).toSeq == Seq("conversion"))
  }
}
