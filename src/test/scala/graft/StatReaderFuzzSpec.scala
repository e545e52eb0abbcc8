package graft

import java.nio.file.{Files, Paths}

/** Adversarial-input hardening for the binary stat-file readers: every
  * truncation and every single-byte corruption of a valid fixture must
  * either parse to SOMETHING or throw a loud exception — never hang,
  * never crash the JVM (ArrayIndexOutOfBounds et al. are acceptable
  * only wrapped; Illegal*Exception preferred). The loop bounds double
  * as a regression net for parser non-termination. */
class StatReaderFuzzSpec extends SparkSpec {

  private def resource(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(getClass.getResource(name).getPath))

  private def readers: Seq[(String, Array[Byte], (String) => Any)] = Seq(
    ("dta", resource("/stata/sample_v118.dta"),
      (p: String) => graft.sources.StataScan.read(spark, p).collect()),
    ("sav", resource("/spss/sample_comp.sav"),
      (p: String) => graft.sources.SavScan.read(spark, p).collect()),
    ("zsav", resource("/spss/sample.zsav"),
      (p: String) => graft.sources.SavScan.read(spark, p).collect()),
    ("por", resource("/spss/sample.por"),
      (p: String) => graft.sources.PorScan.read(spark, p).collect()),
    ("xpt", resource("/xpt/sample_v5.xpt"),
      (p: String) => graft.sources.XptScan.read(spark, p).collect()),
    ("sas7bdat", resource("/sas7bdat/sample_mix.sas7bdat"),
      (p: String) => graft.sources.Sas7bdatScan.read(spark, p).collect()),
    ("warc", warcFixture(gzip = false),
      (p: String) => graft.sources.WarcScan.readWarc(spark, p).collect()),
    ("warcgz", warcFixture(gzip = true),
      (p: String) => graft.sources.WarcScan.readWarc(spark, p).collect()))

  /** in-memory WARC fixture (same grammar WarcScanSpec exercises) —
    * the crawl reader faces adversarial bytes more than any other */
  private def warcFixture(gzip: Boolean): Array[Byte] = {
    import java.nio.charset.StandardCharsets.UTF_8
    def rec(t: String, payload: Array[Byte]): Array[Byte] =
      (s"WARC/1.0\r\nWARC-Type: $t\r\nWARC-Record-ID: <urn:f:$t>\r\n" +
        s"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: ${payload.length}\r\n\r\n")
        .getBytes(UTF_8) ++ payload ++ "\r\n\r\n".getBytes(UTF_8)
    val body = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "fuzz body content").getBytes(UTF_8)
    val plain = rec("warcinfo", "x: y\r\n".getBytes(UTF_8)) ++
      rec("response", body) ++ rec("conversion", "plain text".getBytes(UTF_8))
    if (!gzip) plain
    else {
      val out = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(plain); g.close()
      out.toByteArray
    }
  }

  private def tryRead(tag: String, bytes: Array[Byte], read: String => Any,
      what: String): Unit = {
    val f = Files.createTempFile(s"fuzz_$tag", s".$tag")
    Files.write(f, bytes)
    try read(f.toString)
    catch {
      case _: IllegalArgumentException | _: IllegalStateException => () // loud & typed
      case _: ArrayIndexOutOfBoundsException | _: IndexOutOfBoundsException |
          _: NegativeArraySizeException | _: NumberFormatException |
          _: java.nio.BufferUnderflowException | _: java.io.IOException |
          _: java.util.zip.DataFormatException => () // still an exception, not a hang
      case e: org.apache.spark.SparkException => () // surfaced through the scan job
      case e: Throwable => fail(s"$tag $what: unexpected ${e.getClass.getName}: ${e.getMessage}")
    } finally Files.delete(f)
  }

  for ((tag, valid, read) <- readers) {
    test(s"$tag: every truncation terminates with a loud error or a parse") {
      // dense near the front (header/dictionary edges), sparse after
      val cuts = (0 until math.min(valid.length, 64)) ++
        (64 until valid.length by math.max(1, valid.length / 64))
      cuts.foreach(n => tryRead(tag, valid.take(n), read, s"truncated to $n"))
    }

    test(s"$tag: single-byte corruptions terminate with a loud error or a parse") {
      val rnd = new scala.util.Random(tag.hashCode)
      (0 until 200).foreach { _ =>
        val pos = rnd.nextInt(valid.length)
        val mutated = valid.clone()
        mutated(pos) = (mutated(pos) ^ (1 + rnd.nextInt(255))).toByte
        tryRead(tag, mutated, read, s"byte $pos flipped")
      }
    }
  }
}
