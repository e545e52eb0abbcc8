package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Dependency-free reader for SPSS portable (`.por`) files — the final
  * entry in the reference's readstat-routed stat-file list
  * (reference: src/TidierDB.jl:175-178). The format is fully public
  * (PSPP "Portable File Format"): a pure-text stream — 200-byte splash,
  * 256-byte character translation table, `SPSSPORT` signature, version/
  * date/time, then tagged records whose scalars are BASE-30 numbers
  * (digits 0-9 A-T, optional sign/point/exponent, '/'-terminated) and
  * length-prefixed strings; case data follows the `F` tag row-major,
  * `*.` marking SYSMIS, `Z` padding at the end.
  *
  * Supported: ASCII-encoded portables (the translation table must map
  * the signature to `SPSSPORT` — EBCDIC rewiring is refused loudly),
  * numeric + string variables, missing-value/value-label/document
  * records structurally skipped. Numbers parse exactly: the mantissa
  * accumulates as a Long and divides by 30^k once, so dyadic fixture
  * values survive bit-exactly.
  *
  * No second .por implementation exists in this container (pandas has
  * none), so like [[SavScan]] the fixtures are spec-authored
  * (tools/gen_por_fixtures.py, auditable section by section).
  */
object PorScan {

  def read(spark: SparkSession, path: String): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(p).getLen
    require(len < 1L * 1024 * 1024 * 1024, s".por file too large for the driver-side reader ($len bytes)")
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    parse(spark, new String(bytes, StandardCharsets.ISO_8859_1), path)
  }

  private final case class Var(name: String, width: Int) // width 0 = numeric

  /** 30^k as an exact double (k <= 11 keeps it under 2^53) */
  private def pow30(k: Int): Double = {
    var v = 1L; var i = 0
    while (i < k) { v *= 30L; i += 1 }
    v.toDouble
  }

  /** sequential reader over the logical char stream (newlines removed) */
  private final class Stream(s: String, path: String) {
    private var i = 0
    def pos: Int = i
    def eof: Boolean = i >= s.length
    def peek: Char = { require(!eof, s"$path: unexpected end of portable stream"); s.charAt(i) }
    def next(): Char = { val c = peek; i += 1; c }
    def take(n: Int): String = {
      require(i + n <= s.length, s"$path: unexpected end of portable stream")
      val out = s.substring(i, i + n); i += n; out
    }

    private def digit(c: Char): Int =
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'A' && c <= 'T') c - 'A' + 10
      else -1

    /** base-30 number field; None = SYSMIS (`*.`) */
    def number(): Option[Double] = {
      while (peek == ' ') next()
      if (peek == '*') { next(); require(next() == '.', s"$path: malformed SYSMIS"); return None }
      var neg = false
      if (peek == '-') { neg = true; next() }
      var mant = 0L
      var digits = 0
      var fracDigits = 0
      var seenPoint = false
      var overflow = false
      var dblAcc = 0.0 // fallback accumulator past Long range
      var c = peek
      while (digit(c) >= 0 || c == '.') {
        next()
        if (c == '.') {
          require(!seenPoint, s"$path: two points in number")
          seenPoint = true
        } else {
          val d = digit(c)
          if (!overflow && mant > (Long.MaxValue - d) / 30) { overflow = true; dblAcc = mant.toDouble }
          if (overflow) dblAcc = dblAcc * 30 + d else mant = mant * 30 + d
          digits += 1
          if (seenPoint) fracDigits += 1
        }
        c = peek
      }
      require(digits > 0, s"$path: empty number field at offset $pos")
      var exp = 0
      if (c == '+' || c == '-') {
        val negExp = c == '-'
        next()
        var e = 0
        while (digit(peek) >= 0) e = e * 30 + digit(next())
        exp = if (negExp) -e else e
      }
      require(next() == '/', s"$path: number field not '/'-terminated at offset $pos")
      val base = if (overflow) dblAcc else mant.toDouble
      // single-rounding scaling: divide by an exactly-representable
      // 30^k where possible (mant/30^k is then correctly rounded once;
      // multiplying by an inexact 30^-k would round twice)
      val k = exp - fracDigits
      val scaled =
        if (k == 0) base
        else if (k < 0 && -k <= 11) base / pow30(-k)
        else if (k > 0 && k <= 11) base * pow30(k)
        else base * math.pow(30.0, k.toDouble)
      Some(if (neg) -scaled else scaled)
    }

    def requiredNumber(): Double =
      number().getOrElse(throw new IllegalArgumentException(
        s"$path: SYSMIS where a structural number is required (offset $pos)"))

    def string(): String = {
      val n = requiredNumber()
      require(n >= 0 && n == n.floor && n < 1e6, s"$path: implausible string length $n")
      take(n.toInt)
    }
  }

  private def parse(spark: SparkSession, raw: String, path: String): DataFrame = {
    val logical = raw.filter(c => c != '\r' && c != '\n')
    require(logical.length >= 464 + 15, s"$path is not an SPSS portable file (too short)")
    val signature = logical.substring(456, 464)
    require(signature == "SPSSPORT",
      if (logical.contains("SPSSPORT"))
        s"$path: translation table is not ASCII-identity — EBCDIC portables not supported"
      else s"$path is not an SPSS portable file (no SPSSPORT signature)")
    val st = new Stream(logical, path)
    st.take(464) // splash + translation table + signature
    require(st.next() == 'A', s"$path: unsupported portable version")
    st.take(8 + 6) // date + time

    var declaredVars = -1
    val vars = scala.collection.mutable.ArrayBuffer.empty[Var]
    var lastWidth = 0
    var inData = false
    while (!inData) {
      val tag = st.next()
      tag match {
        case '1' | '2' | '3' | '6' | 'C' => st.string() // product/author/label strings
        case '4' => declaredVars = st.requiredNumber().toInt
        case '5' => st.requiredNumber() // precision
        case '7' =>
          val width = st.requiredNumber().toInt
          val name = st.string()
          (0 until 6).foreach(_ => st.requiredNumber()) // print + write formats
          vars += Var(name, width)
          lastWidth = width
        case '8' => if (lastWidth == 0) st.number() else st.string() // discrete missing
        case '9' | 'A' => st.number() // LO-THRU-x / x-THRU-HI
        case 'B' => { st.number(); st.number() } // range missing
        case 'D' => // value labels
          val nv = st.requiredNumber().toInt
          var anyString = false
          (0 until nv).foreach { _ =>
            val n = st.string()
            anyString ||= vars.exists(v => v.name == n && v.width > 0)
          }
          val nl = st.requiredNumber().toInt
          (0 until nl).foreach { _ =>
            if (anyString) st.string() else st.number()
            st.string()
          }
        case 'E' =>
          val lines = st.requiredNumber().toInt
          (0 until lines).foreach(_ => st.string())
        case 'F' => inData = true
        case 'Z' => throw new IllegalArgumentException(s"$path: no data record (tag F) found")
        case other => throw new IllegalArgumentException(
          s"$path: unrecognized portable record tag '$other'")
      }
    }
    val dict = vars.toVector
    require(dict.nonEmpty, s"$path: no variable records")
    require(declaredVars < 0 || declaredVars == dict.size,
      s"$path: variable count record says $declaredVars, found ${dict.size}")

    val rows = Vector.newBuilder[Row]
    var done = false
    while (!done) {
      while (!st.eof && st.peek == ' ') st.next()
      if (st.eof || st.peek == 'Z') done = true
      else {
        val cells = new Array[Any](dict.size)
        var c = 0
        while (c < dict.size) {
          if (dict(c).width == 0)
            cells(c) = st.number().map(java.lang.Double.valueOf).orNull
          else cells(c) = st.string().replaceAll("[ ]+$", "")
          c += 1
        }
        rows += Row(cells: _*)
      }
    }

    val schema = StructType(dict.map(v =>
      StructField(v.name, if (v.width == 0) DoubleType else StringType)))
    val data = rows.result()
    spark.createDataFrame(
      spark.sparkContext.parallelize(data,
        math.max(1, math.min(spark.sparkContext.defaultParallelism, data.size))),
      schema)
  }
}
