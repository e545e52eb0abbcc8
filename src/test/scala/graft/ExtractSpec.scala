package graft

import org.apache.spark.sql.functions._
import graft.operators.Extract
import graft.plans.HtmlBlocks

/** Densitometric main-content extraction: block segmentation features
  * and the published decision tree, on crafted pages. */
class ExtractSpec extends SparkSpec {
  import spark.implicits._

  private def blocks(html: String): Seq[(String, Int, Int)] =
    HtmlBlocks.segment(html)

  test("segmentation: block tags split, inline tags vanish, entities decode") {
    val html = "<div>Hello &amp; <b>world</b></div><p>second block</p>"
    assert(blocks(html) == Seq(("Hello & world", 3, 0), ("second block", 2, 0)))
  }

  test("segmentation: script/style/comments skipped wholesale") {
    val html = "<p>keep</p><script>var x = 'drop me';</script>" +
      "<style>p { color: red }</style><!-- note --><p>also keep</p>"
    assert(blocks(html) == Seq(("keep", 1, 0), ("also keep", 2, 0)))
  }

  test("segmentation: anchor words counted, nesting and partial links") {
    val html = "<div><a href='#'>Home</a> <a href='#'>About us</a> plain</div>"
    assert(blocks(html) == Seq(("Home About us plain", 4, 3)))
    // unclosed anchor: everything after it counts as linked
    val open = "<div><a href='#'>one two three</div>"
    assert(blocks(open) == Seq(("one two three", 3, 3)))
  }

  test("classifier: nav and footer chrome drop, article body survives") {
    val article = (1 to 30).map(i => s"word$i").mkString(" ")
    val html =
      s"""<nav><a href='/'>Home</a> <a href='/a'>About</a> <a href='/c'>Contact</a></nav>
         |<h1>The Headline Here Stands</h1>
         |<p>$article</p>
         |<p>short closing note</p>
         |<footer><a href='/t'>Terms</a> <a href='/p'>Privacy</a></footer>""".stripMargin
    val got = Seq(html).toDF("html")
      .select(Extract.mainContent(col("html")).as("t")).as[String].head()
    assert(got.contains(article))
    assert(!got.contains("Home"))
    assert(!got.contains("Terms"))
    // the short note after a long content block survives (prev>4 rule)
    assert(got.contains("short closing note"))
  }

  test("classifier: high link density is boilerplate regardless of length") {
    val linky = (1 to 30).map(i => s"<a href='#'>link$i</a>").mkString(" ")
    // after a link-wall, only a LONG block survives (the >40 gate —
    // short text next to related-links chrome is boilerplate by design)
    val body = "real content paragraph " + (1 to 45).map(i => s"w$i").mkString(" ")
    val html = s"<div>$linky</div><p>$body</p>"
    val got = Seq(html).toDF("html")
      .select(Extract.mainContent(col("html")).as("t")).as[String].head()
    assert(!got.contains("link1"))
    assert(got.contains("real content paragraph"))
  }

  test("extractMainContent: counts and empty-page degenerate") {
    val df = Seq(
      (1L, "<p>" + (1 to 20).map(i => s"w$i").mkString(" ") + "</p><nav><a href=x>A</a> <a href=y>B</a> <a href=z>C</a></nav>"),
      (2L, "<div></div>"),
      (3L, "")).toDF("id", "html")
    val out = Extract.extractMainContent(df, "html").orderBy("id").collect()
    assert(out(0).getAs[Long]("n_blocks") == 2)
    assert(out(0).getAs[Long]("n_content_blocks") == 1)
    assert(out(1).getAs[String]("text") == "")
    assert(out(2).getAs[Long]("n_blocks") == 0)
  }

  test("crawlExtract: WARC blob to clean text rows, narrow plan, filters load-bearing") {
    import java.nio.charset.StandardCharsets.UTF_8
    def rec(kind: String, rid: String, ctype: String, payload: Array[Byte]): Array[Byte] =
      (s"WARC/1.0\r\nWARC-Type: $kind\r\nWARC-Record-ID: <urn:$rid>\r\n" +
        s"Content-Type: $ctype\r\nContent-Length: ${payload.length}\r\n\r\n")
        .getBytes(UTF_8) ++ payload ++ "\r\n\r\n".getBytes(UTF_8)
    val page = "<nav><a href=x>A</a> <a href=y>B</a> <a href=z>C</a></nav><p>" +
      (1 to 45).map(i => s"w$i").mkString(" ") + "</p>"
    val ok = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + page).getBytes(UTF_8)
    val notFound = "HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\nnope".getBytes(UTF_8)
    val blob = rec("response", "ok", "application/http; msgtype=response", ok) ++
      rec("response", "err", "application/http; msgtype=response", notFound) ++
      rec("conversion", "conv", "text/plain", "plain".getBytes(UTF_8))
    val df = Seq((1L, blob)).toDF("id", "blob")
    val out = graft.operators.Pipelines.crawlExtract(df, "blob")
    val rows = out.collect()
    assert(rows.length == 1) // 404 and non-HTML records dropped
    assert(rows(0).getAs[String]("record_id") == "<urn:ok>")
    assert(rows(0).getAs[String]("text") == (1 to 45).map(i => s"w$i").mkString(" "))
    assert(rows(0).getAs[Long]("n_content_blocks") == 1L)
    // the whole chain is one narrow projection — no shuffle anywhere
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"crawlExtract must not shuffle:\n$plan")
  }

  test("decision-tree branches: prev-link-density gate") {
    // prev block is link-heavy (density > 5/9): a 20-word block only
    // survives via next.words > 17 or its own words > 40
    def page(midWords: Int, tailWords: Int): String = {
      val mid = (1 to midWords).map(i => s"m$i").mkString(" ")
      val tail = (1 to tailWords).map(i => s"t$i").mkString(" ")
      s"<div><a href=a>One</a> <a href=b>Two</a> <a href=c>Three</a> four</div><p>$mid</p><p>$tail</p>"
    }
    def contentOf(html: String): Seq[Boolean] =
      Seq(html).toDF("html")
        .select(Extract.classifiedBlocks(col("html")).as("b"))
        .select(explode(col("b")).as("x")).select("x.is_content")
        .as[Boolean].collect().toSeq
    // mid=20 <= 40, tail=5: next.words=5 <= 17 -> mid is boilerplate
    assert(contentOf(page(20, 5))(1) == false)
    // mid=20, tail=18 -> next.words > 17 -> mid is content
    assert(contentOf(page(20, 18))(1) == true)
    // mid=41 > 40 -> content regardless of next
    assert(contentOf(page(41, 5))(1) == true)
  }
}
