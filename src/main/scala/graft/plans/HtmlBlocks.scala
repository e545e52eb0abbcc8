package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `html_blocks(html)` → array of text blocks with the densitometric
  * features boilerplate classifiers run on: per block the
  * whitespace-normalized entity-decoded text, its word count, and how
  * many of those words sit inside `<a>` anchors (Kohlschütter 2010's
  * link density numerator).
  *
  * One pass, no DOM: block-level tags (p/div/section/article/header/
  * footer/nav/aside/h1-h6/ul/ol/li/table/tr/td/th/blockquote/pre/br)
  * flush the current block; `<script>`/`<style>`/comments are skipped
  * wholesale; inline tags vanish; text runs entity-decode as they
  * land (an entity cannot span a tag). A word is a link word iff any
  * of its characters came from inside an anchor. Empty blocks drop.
  *
  * Same single-pass tolerant-tokenizer contract as
  * [[graft.functions.TextFns.stripHtml]]: real-world tag soup parses
  * without error — unclosed tags simply never flush differently,
  * because flushing is idempotent.
  */
case class HtmlBlocks(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(HtmlBlocks.blockType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"html_blocks expects string, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val blocks = HtmlBlocks.segment(input.asInstanceOf[UTF8String].toString)
    new GenericArrayData(blocks.map { b =>
      InternalRow(UTF8String.fromString(b._1), b._2, b._3)
    }.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): HtmlBlocks =
    copy(child = newChild)

  override def prettyName: String = "html_blocks"
}

object HtmlBlocks {

  val blockType: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_words", IntegerType, nullable = false),
    StructField("link_words", IntegerType, nullable = false)))

  private val blockTags = Set(
    "p", "div", "section", "article", "header", "footer", "nav", "aside",
    "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "li", "table", "tr",
    "td", "th", "blockquote", "pre", "br", "hr", "form", "main")

  /** (text, nWords, linkWords) per non-empty block */
  private[graft] def segment(html: String): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    val text = new java.lang.StringBuilder(256)
    val linked = new java.util.BitSet()
    var aDepth = 0
    val n = html.length

    def flush(): Unit = {
      // tokenize the accumulated run; a word is linked iff any char is
      var i = 0
      var words = 0; var linkWords = 0
      val norm = new java.lang.StringBuilder(text.length)
      while (i < text.length) {
        while (i < text.length && Character.isWhitespace(text.charAt(i))) i += 1
        if (i < text.length) {
          val start = i
          var isLink = false
          while (i < text.length && !Character.isWhitespace(text.charAt(i))) {
            if (linked.get(i)) isLink = true
            i += 1
          }
          if (norm.length > 0) norm.append(' ')
          norm.append(text, start, i)
          words += 1
          if (isLink) linkWords += 1
        }
      }
      if (words > 0) out += ((norm.toString, words, linkWords))
      text.setLength(0)
      linked.clear()
    }

    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.regionMatches(true, i, "<!--", 0, 4)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else {
          // tag name
          var j = i + 1
          val closing = j < n && html.charAt(j) == '/'
          if (closing) j += 1
          val ns = j
          while (j < n && (Character.isLetterOrDigit(html.charAt(j)))) j += 1
          val name = html.substring(ns, j).toLowerCase(java.util.Locale.ROOT)
          // scan to tag end (tolerate > inside quoted attrs)
          var q = 0.toChar
          while (j < n && (q != 0 || html.charAt(j) != '>')) {
            val ch = html.charAt(j)
            if (q != 0) { if (ch == q) q = 0 }
            else if (ch == '"' || ch == '\'') q = ch
            j += 1
          }
          val tagEnd = if (j < n) j + 1 else n
          if (!closing && (name == "script" || name == "style")) {
            val close = "</" + name
            var e = html.toLowerCase(java.util.Locale.ROOT).indexOf(close, tagEnd)
            if (e < 0) e = n
            else { e = html.indexOf('>', e); e = if (e < 0) n else e + 1 }
            i = e
          } else {
            if (name == "a") { if (closing) aDepth = math.max(0, aDepth - 1) else aDepth += 1 }
            else if (blockTags.contains(name)) flush()
            else () // inline tag: vanish (contributes a word break, below)
            // any tag breaks a word (\"<a>fo</a>od\" stays two runs is
            // wrong — HTML renders it joined; but a BLOCK/inline tag
            // boundary in real text is whitespace-adjacent; keep the
            // simple contract: tags do not join adjacent runs, they
            // separate them
            if (text.length > 0 && text.charAt(text.length - 1) != ' ')
              text.append(' ')
            i = tagEnd
          }
        }
      } else {
        // text run up to the next tag; decode entities now (an entity
        // cannot contain '<')
        var e = html.indexOf('<', i)
        if (e < 0) e = n
        val decoded = DecodeHtmlEntities.decode(
          UTF8String.fromString(html.substring(i, e))).toString
        val from = text.length
        text.append(decoded)
        if (aDepth > 0) linked.set(from, text.length)
        i = e
      }
    }
    flush()
    out.result()
  }
}
