package graft

import org.apache.spark.sql.functions._
import graft.operators.Robots
import graft.plans.RobotsRules

/** RFC 9309 robots evaluation: group selection, pattern grammar,
  * longest-match decisions, corpus filtering. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val body =
    """# example robots.txt
      |User-agent: googlebot
      |Disallow: /nogoogle
      |
      |User-agent: *
      |Disallow: /private
      |Allow: /private/ok
      |Disallow: /*.pdf$
      |Disallow:
      |Crawl-delay: 10
      |
      |User-agent: graftbot
      |User-agent: otherbot
      |Disallow: /
      |Allow: /welcome""".stripMargin

  test("group selection: exact agent beats *, multi-agent groups, merging") {
    val star = RobotsRules.parse(body, "randombot")
    assert(star.map(r => (r._1, r._2)) ==
      Seq((false, "/private"), (true, "/private/ok"), (false, "/*.pdf$")))
    val google = RobotsRules.parse(body, "GoogleBot")
    assert(google.map(_._2) == Seq("/nogoogle"))
    val graft = RobotsRules.parse(body, "graftbot")
    assert(graft.map(r => (r._1, r._2)) == Seq((false, "/"), (true, "/welcome")))
    assert(RobotsRules.parse(body, "otherbot") == graft)
  }

  test("pattern grammar: * wildcard, $ anchor, literal quoting") {
    assert(RobotsRules.toRegex("/a*b$") == "^\\Q/a\\E.*\\Qb\\E$")
    assert(RobotsRules.toRegex("/p") == "^\\Q/p\\E")
    assert("/x/file.pdf".matches(RobotsRules.toRegex("/*.pdf$")))
    assert(!"/x/file.pdfx".matches(RobotsRules.toRegex("/*.pdf$")))
    assert(!"/file.qdf".matches(RobotsRules.toRegex("/*.pdf$"))) // '.' literal
  }

  test("decision: longest match wins, ties go to Allow, no match allows") {
    val df = Seq(
      ("/private/ok/page", true),   // Allow /private/ok (9) beats Disallow /private (8)
      ("/private/no", false),
      ("/public/x", true),          // nothing matches
      ("/doc/file.pdf", false),     // wildcard-anchored disallow
      ("/", true)
    ).toDF("path", "expected")
    val got = df
      .withColumn("r", Robots.rules(lit(body), "somebot"))
      .withColumn("allowed", Robots.isAllowed(col("path"), col("r")))
      .select("path", "allowed", "expected").collect()
    got.foreach(r => assert(r.getBoolean(1) == r.getBoolean(2), r.getString(0)))
  }

  test("dropDisallowed: host join, missing robots allows, query matching") {
    val robots = Seq(
      ("site.com", "User-agent: *\nDisallow: /private\nDisallow: /*?*drop=1"),
      ("all-blocked.org", "User-agent: *\nDisallow: /")).toDF("host", "body")
    val urls = Seq(
      (1L, "https://site.com/public"),
      (2L, "https://site.com/private/x"),
      (3L, "https://SITE.com/page?a=2&drop=1"),   // host case-insensitive
      (4L, "https://all-blocked.org/anything"),
      (5L, "https://norobots.net/whatever")).toDF("id", "url")
    val kept = Robots.dropDisallowed(urls, "url", robots)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 5L))
  }

  test("matchPath: path + query, fragment ignored, bare host -> /") {
    def mp(u: String): String =
      Seq(u).toDF("u").select(Robots.matchPath(col("u"))).as[String].head()
    assert(mp("https://h.com/a/b?q=1#frag") == "/a/b?q=1")
    assert(mp("https://h.com") == "/")
    assert(mp("http://h.com#x") == "/")
  }
}
