package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC / WET ingestion — the input format of web-crawl corpora
  * (Common Crawl publishes ~100 TB per snapshot as `.warc.gz` /
  * `.wet.gz` files). Built-in, no connector jar: the WARC/1.x record
  * grammar (ISO 28500) is a plain header block + Content-Length
  * payload, and the standard gzip layout is one gzip MEMBER per
  * record, which `GZIPInputStream` decompresses as a concatenated
  * stream — so one sequential parser covers plain and gzip, WARC and
  * WET.
  *
  * 100 TB shape: `spark.read.format("binaryFile")` + one narrow
  * `mapPartitions` parse — parallelism = number of files, which is the
  * native unit of Common Crawl (each snapshot is tens of thousands of
  * ~1 GB segment files). Per-record gzip members make a single file
  * non-splittable, so file-level parallelism is also the only correct
  * granularity. Payload bytes stream record-at-a-time through the
  * iterator — a file is never fully materialized beyond the scan
  * buffer.
  *
  * For `response` records carrying `application/http` content the HTTP
  * head is parsed off: `http_status` / `http_content_type` are lifted
  * and `payload` is the HTTP BODY (what a text pipeline wants).
  * All other records expose the raw WARC payload.
  *
  * Malformed input fails LOUDLY with file + record offset — a corrupt
  * crawl segment should be quarantined, not silently truncated.
  */
object WarcScan {

  /** one parsed record (shared by the file reader and the
    * `parse_warc` Catalyst expression) */
  final case class Rec(
      recordId: String,
      warcType: String,
      targetUri: String,
      date: String,
      contentType: String,
      contentLength: Long,
      httpStatus: Option[Int],
      httpContentType: Option[String],
      payload: Array[Byte])

  val recordSchema: StructType = StructType(Seq(
    StructField("record_id", StringType),
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType, nullable = false),
    StructField("http_status", IntegerType),
    StructField("http_content_type", StringType),
    StructField("payload", BinaryType)))

  private val schema: StructType =
    StructType(StructField("file", StringType) +: recordSchema.fields)

  // ---- stream-level parser -------------------------------------------

  /** read one header line; CRLF per spec, lone LF tolerated. None = EOF
    * hit before any byte. */
  private def readLine(in: InputStream): Option[String] = {
    val sb = new java.lang.StringBuilder(96)
    var b = in.read()
    if (b < 0) return None
    while (b >= 0 && b != '\n') { sb.append(b.toChar); b = in.read() }
    var n = sb.length()
    if (n > 0 && sb.charAt(n - 1) == '\r') { sb.setLength(n - 1); n -= 1 }
    Some(sb.toString)
  }

  private def readFully(in: InputStream, n: Long, what: String): Array[Byte] = {
    require(n <= Int.MaxValue - 8, s"$what: Content-Length $n exceeds 2 GB record limit")
    // grow incrementally (1 MB chunks): an adversarial Content-Length
    // must hit the EOF error, not a multi-GB pre-allocation
    val out = new java.io.ByteArrayOutputStream(math.min(n, 1L << 20).toInt)
    val chunk = new Array[Byte](math.min(n, 1L << 20).toInt max 1)
    var off = 0L
    while (off < n) {
      val want = math.min(chunk.length.toLong, n - off).toInt
      val k = in.read(chunk, 0, want)
      if (k < 0) throw new EOFException(s"$what: EOF after $off of $n payload bytes")
      out.write(chunk, 0, k)
      off += k
    }
    out.toByteArray
  }

  /** parse `version-line headers CRLF payload CRLF CRLF`, repeatedly,
    * until EOF. Blank lines between records are tolerated. */
  def records(in: InputStream, where: String): Iterator[Rec] = new Iterator[Rec] {
    private var nextRec: Rec = _
    private var ix = 0
    private def advance(): Unit = {
      nextRec = null
      var line = readLine(in)
      while (line.exists(_.isEmpty)) line = readLine(in) // inter-record padding
      line match {
        case None => // clean EOF
        case Some(v) if v.startsWith("WARC/") =>
          val here = s"$where record $ix"
          val hs = scala.collection.mutable.LinkedHashMap.empty[String, String]
          var h = readLine(in).getOrElse(
            throw new EOFException(s"$here: EOF inside header block"))
          while (h.nonEmpty) {
            val c = h.indexOf(':')
            require(c > 0, s"$here: malformed header line '$h'")
            hs(h.substring(0, c).trim.toLowerCase) = h.substring(c + 1).trim
            h = readLine(in).getOrElse(
              throw new EOFException(s"$here: EOF inside header block"))
          }
          val len = hs.getOrElse("content-length",
            throw new IllegalArgumentException(s"$here: missing Content-Length")).toLong
          require(len >= 0, s"$here: negative Content-Length $len")
          val raw = readFully(in, len, here)
          val ctype = hs.getOrElse("content-type", "")
          val wtype = hs.getOrElse("warc-type", "")
          val (status, hct, payload) =
            if (wtype == "response" && ctype.startsWith("application/http"))
              parseHttp(raw)
            else (None, None, raw)
          nextRec = Rec(
            hs.getOrElse("warc-record-id", ""),
            wtype,
            hs.getOrElse("warc-target-uri", ""),
            hs.getOrElse("warc-date", ""),
            ctype, len, status, hct, payload)
          ix += 1
        case Some(junk) =>
          throw new IllegalArgumentException(
            s"$where record $ix: expected WARC/ version line, got '${junk.take(60)}'")
      }
    }
    advance()
    override def hasNext: Boolean = nextRec != null
    override def next(): Rec = {
      val r = nextRec; advance(); r
    }
  }

  /** split an application/http response payload into (status,
    * content-type, body); returns the raw bytes unsplit when no HTTP
    * head is recognizable (defensive: some crawlers store bare bodies) */
  private def parseHttp(raw: Array[Byte]): (Option[Int], Option[String], Array[Byte]) = {
    val in = new ByteArrayInputStream(raw)
    val first = readLine(in).getOrElse(return (None, None, raw))
    if (!first.startsWith("HTTP/")) return (None, None, raw)
    val status = first.split(" ", 3) match {
      case a if a.length >= 2 => a(1).toIntOption
      case _ => None
    }
    var hct: Option[String] = None
    var h = readLine(in)
    while (h.exists(_.nonEmpty)) {
      val line = h.get
      val c = line.indexOf(':')
      if (c > 0 && line.substring(0, c).trim.equalsIgnoreCase("content-type"))
        hct = Some(line.substring(c + 1).trim)
      h = readLine(in)
    }
    val body = new Array[Byte](in.available())
    in.read(body)
    (status, hct, body)
  }

  /** compression magic sniff — CC publishes `.warc.gz` (and `.warc.zst`
    * in newer crawls; zstd-jni ships with Spark), fixtures may be
    * plain. Both codecs handle concatenated frames/members, which is
    * how per-record compression arrives. */
  private def open(content: Array[Byte]): InputStream = {
    val raw = new ByteArrayInputStream(content)
    if (content.length >= 2 &&
      (content(0) & 0xff) == 0x1f && (content(1) & 0xff) == 0x8b)
      new GZIPInputStream(new BufferedInputStream(raw))
    else if (content.length >= 4 &&
      (content(0) & 0xff) == 0x28 && (content(1) & 0xff) == 0xb5 &&
      (content(2) & 0xff) == 0x2f && (content(3) & 0xff) == 0xfd) {
      val z = new com.github.luben.zstd.ZstdInputStream(
        new BufferedInputStream(raw))
      z.setContinuous(true) // read across concatenated frames
      z
    } else raw
  }

  /** used by the file reader below AND by tests over raw byte arrays */
  def parseBytes(content: Array[Byte], where: String): Iterator[Rec] =
    records(open(content), where)

  // ---- DataFrame surface ---------------------------------------------

  /** scan WARC/WET files (plain or gzip, glob ok) into one row per
    * record. Columns: file, record_id, warc_type, target_uri,
    * warc_date, content_type, content_length, http_status,
    * http_content_type, payload. */
  def readWarc(spark: SparkSession, path: String): DataFrame = {
    val files = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
    val out = files.rdd.mapPartitions(_.flatMap { row =>
      val p = row.getString(0)
      parseBytes(row.getAs[Array[Byte]](1), p).map(r => Row(
        p, r.recordId, r.warcType, r.targetUri, r.date, r.contentType,
        r.contentLength, r.httpStatus.orNull, r.httpContentType.orNull,
        r.payload))
    })
    spark.createDataFrame(out, schema)
  }

  /** WET convenience: `conversion` records only, payload decoded as
    * UTF-8 `text` — the direct input to the cleaning pipeline. */
  def readWet(spark: SparkSession, path: String): DataFrame =
    readWarc(spark, path)
      .filter(col("warc_type") === "conversion")
      .select(col("file"), col("record_id"), col("target_uri"),
        col("warc_date"), decode(col("payload"), "UTF-8").as("text"))
}
