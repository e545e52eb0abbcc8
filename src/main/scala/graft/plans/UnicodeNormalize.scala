package graft.plans

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}
import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: Unicode canonical normalization (NFC/NFD/NFKC/
  * NFKD via the JDK's `java.text.Normalizer` — the public Unicode
  * normalization algorithm, UAX #15).
  *
  * Web-scraped corpora mix precomposed ("é") and decomposed ("e"+U+0301)
  * encodings of the same text, so exact/MinHash dedup, shingling and
  * fingerprinting silently treat identical documents as distinct unless
  * text is normalized first. The reference engine has no analog; this is
  * the standard first stage of every published corpus-cleaning recipe
  * (CCNet, RefinedWeb, FineWeb).
  *
  * Scale shape: scalar, narrow, codegen'd (one static call per row —
  * stays inside WholeStageCodegen). The ASCII fast path returns the
  * input object untouched, so the dominant (all-ASCII) case costs one
  * byte scan and zero allocation.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(UnicodeNormalize.Forms(form),
    s"normalization form must be one of NFC/NFD/NFKC/NFKD, got $form")

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize expects string, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.plans.UnicodeNormalize.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)

  override def prettyName: String = "unicode_normalize"
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** static entry point shared by interpreted eval and codegen */
  def normalize(s: UTF8String, form: String): UTF8String = {
    // ASCII fast path: every normalization form is the identity on
    // pure ASCII; skip the String allocation entirely
    var i = 0
    val n = s.numBytes()
    var ascii = true
    while (ascii && i < n) { if ((s.getByte(i) & 0x80) != 0) ascii = false; i += 1 }
    if (ascii) return s
    val str = s.toString
    val f = Normalizer.Form.valueOf(form)
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }
}

/** Native expression: repair UTF-8 mojibake ("CafÃ©" → "Café") — text
  * that was decoded as Latin-1/Windows-1252 somewhere upstream and
  * re-encoded, the single most common encoding defect in web crawl
  * text (the core fix of the public `ftfy` tool).
  *
  * Algorithm: split the text into maximal runs of chars that map back
  * to Windows-1252/Latin-1 bytes (CJK, emoji, zero-widths are hard
  * separators left verbatim, so mixed content still repairs); per run,
  * map chars to their bytes and strictly re-decode as UTF-8, accepting
  * only if decoding succeeds AND strictly shrinks the run (genuine
  * mojibake always shrinks — a multi-byte sequence collapses to one
  * char; plain Latin-1 prose fails strict UTF-8 decode and is returned
  * untouched). Applied to fixpoint (≤3 rounds) for double-encoded
  * text. Deterministic, narrow, codegen'd.
  */
case class FixMojibake(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fix_mojibake expects string, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    FixMojibake.fix(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.FixMojibake.fix($c)")

  override protected def withNewChildInternal(newChild: Expression): FixMojibake =
    copy(child = newChild)

  override def prettyName: String = "fix_mojibake"
}

object FixMojibake {

  /** chars 0x80–0x9F of Windows-1252 (cp1252's additions over
    * Latin-1); 0 marks the five undefined slots */
  private val Cp1252High: Array[Char] = Array(
    '€', 0, '‚', 'ƒ', '„', '…', '†', '‡',
    'ˆ', '‰', 'Š', '‹', 'Œ', 0, 'Ž', 0,
    0, '‘', '’', '“', '”', '•', '–', '—',
    '˜', '™', 'š', '›', 'œ', 0, 'ž', 'Ÿ')

  /** char → the byte whose mis-decode produced it, or -1.
    * cp1252's 0x80–0x9F repertoire is tried first; bare C1 controls
    * (U+0080–U+009F) map to themselves — they are what a LATIN-1
    * mis-decode of those bytes yields, and they never occur in clean
    * prose. Both mis-decode paths seen in the wild are thus reversed. */
  private def cp1252Byte(c: Char): Int = {
    if (c < 0x80) return c
    if (c >= 0xA0 && c <= 0xFF) return c
    var i = 0
    while (i < 32) { if (Cp1252High(i) == c) return 0x80 + i; i += 1 }
    if (c <= 0x9F) return c // latin-1-read C1 control
    -1
  }

  /** static entry point shared by interpreted eval and codegen */
  def fix(s: UTF8String): UTF8String = {
    // quick reject on raw UTF-8 bytes: mojibake requires at least one
    // non-ASCII char; the dominant all-ASCII row exits without
    // allocating
    var i = 0
    val n = s.numBytes()
    var ascii = true
    while (ascii && i < n) { if ((s.getByte(i) & 0x80) != 0) ascii = false; i += 1 }
    if (ascii) return s
    var cur = s.toString
    var any = false
    var rounds = 0
    var more = true
    while (more && rounds < 3) {
      val f = fixOnce(cur)
      if (f == null) more = false else { cur = f; any = true }
      rounds += 1
    }
    if (any) UTF8String.fromString(cur) else s
  }

  /** One repair round. The string is split into maximal runs of
    * byte-mappable chars (chars outside the cp1252/latin-1 repertoire —
    * CJK, emoji, zero-widths — are hard separators copied verbatim);
    * each run is repaired independently, so mojibake survives mixed
    * content. null = nothing changed. */
  private def fixOnce(str: String): String = {
    val len = str.length
    val out = new java.lang.StringBuilder(len)
    var changed = false
    var i = 0
    while (i < len) {
      val c = str.charAt(i)
      if (cp1252Byte(c) < 0) { out.append(c); i += 1 }
      else {
        var j = i + 1
        while (j < len && cp1252Byte(str.charAt(j)) >= 0) j += 1
        val run = str.substring(i, j)
        val fixed = fixRun(run)
        if (fixed != null) { changed = true; out.append(fixed) }
        else out.append(run)
        i = j
      }
    }
    if (changed) out.toString else null
  }

  /** repair one byte-mappable run; null = not mojibake (leave as is) */
  private def fixRun(run: String): String = {
    val len = run.length
    val bytes = new Array[Byte](len)
    var i = 0
    var sawHigh = false
    while (i < len) {
      val b = cp1252Byte(run.charAt(i))
      if (b >= 0x80) sawHigh = true
      bytes(i) = b.toByte
      i += 1
    }
    if (!sawHigh) return null
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try {
      val out = dec.decode(ByteBuffer.wrap(bytes)).toString
      // genuine mojibake strictly shrinks; equal-length means the
      // "high" chars were isolated Latin-1 letters (real prose)
      if (out.length < len) out else null
    } catch { case _: CharacterCodingException => null }
  }
}

/** Native expression: decode HTML character references — numeric
  * (`&#8212;`, `&#x2014;`, any valid code point) plus the named set
  * below. One left-to-right pass, so `&amp;lt;` decodes to `&lt;`
  * (correct HTML semantics — never double-decoded). Unknown or
  * malformed references pass through verbatim. Narrow, codegen'd.
  *
  * Named set (the references that dominate crawled text): amp lt gt
  * quot apos nbsp copy reg trade hellip mdash ndash lsquo rsquo ldquo
  * rdquo bull middot deg plusmn times divide euro pound yen cent sect
  * para laquo raquo shy(→removed) frac12 frac14 frac34.
  */
case class DecodeHtmlEntities(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"decode_html_entities expects string, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    DecodeHtmlEntities.decode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.DecodeHtmlEntities.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): DecodeHtmlEntities =
    copy(child = newChild)

  override def prettyName: String = "decode_html_entities"
}

object DecodeHtmlEntities {

  private val Named: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    m.put("amp", "&"); m.put("lt", "<"); m.put("gt", ">")
    m.put("quot", "\""); m.put("apos", "'"); m.put("nbsp", " ")
    m.put("copy", "©"); m.put("reg", "®"); m.put("trade", "™")
    m.put("hellip", "…"); m.put("mdash", "—"); m.put("ndash", "–")
    m.put("lsquo", "‘"); m.put("rsquo", "’")
    m.put("ldquo", "“"); m.put("rdquo", "”")
    m.put("bull", "•"); m.put("middot", "·"); m.put("deg", "°")
    m.put("plusmn", "±"); m.put("times", "×"); m.put("divide", "÷")
    m.put("euro", "€"); m.put("pound", "£"); m.put("yen", "¥")
    m.put("cent", "¢"); m.put("sect", "§"); m.put("para", "¶")
    m.put("laquo", "«"); m.put("raquo", "»"); m.put("shy", "")
    m.put("frac12", "½"); m.put("frac14", "¼"); m.put("frac34", "¾")
    m
  }

  /** static entry point shared by interpreted eval and codegen */
  def decode(s: UTF8String): UTF8String = {
    val str = s.toString
    val amp = str.indexOf('&')
    if (amp < 0) return s
    val len = str.length
    val sb = new java.lang.StringBuilder(len)
    sb.append(str, 0, amp)
    var i = amp
    while (i < len) {
      val c = str.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val semi = str.indexOf(';', i + 1)
        // longest named entity is 6 chars; numeric caps at &#x10FFFF;
        if (semi < 0 || semi - i > 9) { sb.append(c); i += 1 }
        else {
          val body = str.substring(i + 1, semi)
          val rep = decodeBody(body)
          if (rep == null) { sb.append(c); i += 1 }
          else { sb.append(rep); i = semi + 1 }
        }
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** reference body (between `&` and `;`) → replacement, or null */
  private def decodeBody(body: String): String = {
    if (body.isEmpty) return null
    if (body.charAt(0) == '#') {
      val hex = body.length > 1 && (body.charAt(1) == 'x' || body.charAt(1) == 'X')
      val digits = body.substring(if (hex) 2 else 1)
      if (digits.isEmpty || digits.length > 7) return null
      var cp = 0
      var i = 0
      val radix = if (hex) 16 else 10
      while (i < digits.length) {
        val d = Character.digit(digits.charAt(i), radix)
        if (d < 0) return null
        cp = cp * radix + d
        i += 1
      }
      if (cp <= 0 || cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF)) null
      else new String(Character.toChars(cp))
    } else Named.get(body) // null when unknown
  }
}
