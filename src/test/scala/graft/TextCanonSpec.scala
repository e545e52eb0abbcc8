package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Unicode canonicalization + HTML extraction kernels: NFC/NFKC
  * (vs hand-computed UAX #15 expectations), mojibake repair (genuine
  * repairs vs must-not-touch Latin-1 prose), entity decoding (numeric,
  * named, single-pass semantics), the full stripHtml chain, and the
  * composed canonicalizeText pass. Every non-ASCII char is written as a
  * \u escape so precomposed-vs-decomposed distinctions are explicit in
  * the source; expectations are literal — never re-derived through the
  * code under test. */
class TextCanonSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): String =
    Seq(1).toDF("i").select(c.as("v")).head().getString(0)

  private val eAcute = "é"          // é precomposed
  private val eDecomp = "é"        // e + combining acute

  // ---- NFC / NFKC ------------------------------------------------------

  test("nfc composes decomposed sequences; identity on ASCII and precomposed") {
    assert(one(TextFns.nfc(lit(s"Caf$eDecomp"))) == s"Caf$eAcute")
    assert(one(TextFns.nfc(lit("Å"))) == "Å")   // A + ring → Å
    assert(one(TextFns.nfc(lit("Å"))) == "Å")    // Angstrom sign → Å
    assert(one(TextFns.nfc(lit("plain ascii"))) == "plain ascii")
    assert(one(TextFns.nfc(lit(s"Caf$eAcute"))) == s"Caf$eAcute")
  }

  test("nfkc additionally folds compatibility forms; nfc leaves them") {
    assert(one(TextFns.nfkc(lit("ﬃ"))) == "ffi")      // ﬃ ligature
    assert(one(TextFns.nfc(lit("ﬃ"))) == "ﬃ")
    assert(one(TextFns.nfkc(lit("Ｈｉ"))) == "Hi") // fullwidth Ｈｉ
    assert(one(TextFns.nfkc(lit("①"))) == "1")        // circled ①
  }

  test("nfc handles non-BMP text (no surrogate corruption)") {
    val g = "𝄞" // 𝄞
    assert(one(TextFns.nfc(lit(s"$g $eDecomp"))) == s"$g $eAcute")
  }

  test("unicode_normalize SQL surface") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      s"SELECT unicode_normalize('Caf$eDecomp') a, unicode_normalize('ﬃ', 'NFKC') b")
      .head()
    assert(r.getString(0) == s"Caf$eAcute")
    assert(r.getString(1) == "ffi")
  }

  // ---- mojibake --------------------------------------------------------

  test("fixMojibake repairs UTF-8-as-latin1 and UTF-8-as-cp1252") {
    // é = C3 A9 read as latin1 = Ã(C3) ©(A9)
    assert(one(TextFns.fixMojibake(lit("CafÃ©"))) == s"Caf$eAcute")
    // ï = C3 AF read as latin1 = Ã ¯
    assert(one(TextFns.fixMojibake(lit("naÃ¯ve"))) == "naïve")
    // ’ = E2 80 99 read as cp1252 = â(E2) €(80) ™... actually 99=™
    assert(one(TextFns.fixMojibake(lit("donâ€™t"))) == "don’t")
    // double-encoded é: first pass yields Ã©, second pass yields é
    assert(one(TextFns.fixMojibake(
      lit("CafÃÂ©"))) == s"Caf$eAcute")
  }

  test("fixMojibake leaves real text untouched") {
    assert(one(TextFns.fixMojibake(lit("plain ascii"))) == "plain ascii")
    // genuine accented prose: isolated accents are invalid UTF-8 byte
    // sequences, so strict decode rejects and the text survives
    val deja = "déjà vu"
    assert(one(TextFns.fixMojibake(lit(deja))) == deja)
    val ang = "Ångström"
    assert(one(TextFns.fixMojibake(lit(ang))) == ang)
    // chars beyond the cp1252 repertoire → definitely not mojibake
    val jp = "日本語 é"
    assert(one(TextFns.fixMojibake(lit(jp))) == jp)
    val emoji = "🚀 Ã"
    assert(one(TextFns.fixMojibake(lit(emoji))) == emoji)
  }

  // ---- control / zero-width cleanup -----------------------------------

  test("cleanControls: CRLF→LF, controls+zero-widths out, space family → space") {
    assert(one(TextFns.cleanControls(lit("a\r\nb\rc"))) == "a\nb\nc")
    assert(one(TextFns.cleanControls(lit("abcd"))) == "abcd")
    assert(one(TextFns.cleanControls(
      lit("a​b﻿c­d‍⁠e"))) == "abcde")
    assert(one(TextFns.cleanControls(
      lit("a b c　d e"))) == "a b c d e")
    assert(one(TextFns.cleanControls(lit("keep\ttab\nand nl"))) == "keep\ttab\nand nl")
    assert(one(TextFns.cleanControls(lit("c1gone"))) == "c1gone")
  }

  test("canonicalizeText composes: mojibake → NFC → controls → squish → trim") {
    assert(one(TextFns.canonicalizeText(
      lit("  CafÃ©​  x\r\ny  z  "))) == s"Caf$eAcute x\ny z")
    // decomposed input lands composed
    assert(one(TextFns.canonicalizeText(lit(s"Caf$eDecomp "))) == s"Caf$eAcute")
  }

  // ---- entity decoding -------------------------------------------------

  test("decodeHtmlEntities: named, decimal, hex, single-pass, pass-through") {
    assert(one(TextFns.decodeHtmlEntities(lit("a &amp; b"))) == "a & b")
    assert(one(TextFns.decodeHtmlEntities(lit("&lt;p&gt;"))) == "<p>")
    assert(one(TextFns.decodeHtmlEntities(lit("x&#8212;y"))) == "x—y")
    assert(one(TextFns.decodeHtmlEntities(lit("&#x2014; &#X41;"))) == "— A")
    // single pass: &amp;lt; is the HTML encoding OF the text "&lt;"
    assert(one(TextFns.decodeHtmlEntities(lit("&amp;lt;"))) == "&lt;")
    // unknown/malformed stay verbatim
    assert(one(TextFns.decodeHtmlEntities(lit("&bogus; &#; &#xZZ; & alone"))) ==
      "&bogus; &#; &#xZZ; & alone")
    // surrogate-range and out-of-range code points stay verbatim
    assert(one(TextFns.decodeHtmlEntities(lit("&#xD800; &#1114112;"))) ==
      "&#xD800; &#1114112;")
    // non-BMP decodes to a surrogate pair
    assert(one(TextFns.decodeHtmlEntities(lit("&#x1F680;"))) == "🚀")
    assert(one(TextFns.decodeHtmlEntities(lit("&shy;soft"))) == "soft")
    assert(one(TextFns.decodeHtmlEntities(lit("x&nbsp;y"))) == "x y")
  }

  // ---- stripHtml -------------------------------------------------------

  test("stripHtml: scripts/styles/comments out, blocks → newline, entities decoded") {
    val html = "<html><head><title>T</title><style>p{color:red}</style></head>" +
      "<body><!-- hidden --><h1 class=\"x\">Head &amp; tail</h1>" +
      "<p>one <b>two</b> three</p><script>var p = \"<p>nope</p>\";</script>" +
      "<ul><li>alpha</li><li>beta &lt;tag&gt;</li></ul>tail&nbsp;&#8212;end</body></html>"
    val got = one(TextFns.stripHtml(lit(html)))
    assert(got ==
      "T\nHead & tail\n\none two three\n\nalpha\n\nbeta <tag>\n\ntail —end")
  }

  test("stripHtml: multiline lazy matching and blank-line collapse") {
    val html = "a<script type=\"text/javascript\">\nline1\nline2\n</script>b" +
      "<p></p>\n\n\n\n<p></p>c"
    assert(one(TextFns.stripHtml(lit(html))) == "a b\n\nc")
  }

  test("stripHtml without entity decoding leaves references") {
    assert(one(TextFns.stripHtml(lit("<p>a &amp; b</p>"), decodeEntities = false)) ==
      "a &amp; b")
  }

  test("fix_mojibake / decode_html_entities SQL surface") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT fix_mojibake('CafÃ©') a, decode_html_entities('&lt;x&gt;') b")
      .head()
    assert(r.getString(0) == s"Caf$eAcute")
    assert(r.getString(1) == "<x>")
  }

  test("null propagation") {
    val r = Seq(1).toDF("i").select(
      TextFns.nfc(lit(null).cast("string")).as("a"),
      TextFns.fixMojibake(lit(null).cast("string")).as("b"),
      TextFns.decodeHtmlEntities(lit(null).cast("string")).as("c")).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }
}
