package graft

import org.apache.spark.sql.functions._
import graft.text.Robots

/** robots.txt evaluation (L71): RFC 9309 group selection, longest-match,
  * wildcards/anchors, and the host-joined page filter.
  */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val basic =
    """# site policy
      |User-agent: *
      |Disallow: /private
      |Allow: /private/ok
      |Disallow: /tmp/
      |""".stripMargin

  test("longest match wins; allow beats disallow on ties; no match allows") {
    val r = Robots.rulesFor(basic)
    assert(r == Seq((false, "/private"), (true, "/private/ok"), (false, "/tmp/")))
    assert(!Robots.isAllowed(r, "/private/x"))
    assert(Robots.isAllowed(r, "/private/ok/y")) // longer allow rule
    assert(Robots.isAllowed(r, "/public"))
    assert(!Robots.isAllowed(r, "/tmp/a"))
    assert(Robots.isAllowed(r, "/tmp")) // rule is /tmp/ — shorter path no match
    assert(Robots.isAllowed(Seq.empty, "/anything"))
    assert(Robots.isAllowed(r, null))
  }

  test("exact agent group excludes the * group; multi-agent lines share") {
    val txt =
      """User-agent: *
        |Disallow: /
        |
        |User-agent: goodbot
        |User-agent: otherbot
        |Disallow: /secret
        |""".stripMargin
    // goodbot gets ONLY its group: /a allowed, /secret not
    val g = Robots.rulesFor(txt, "goodbot")
    assert(g == Seq((false, "/secret")))
    assert(Robots.isAllowed(g, "/a") && !Robots.isAllowed(g, "/secret/x"))
    assert(Robots.rulesFor(txt, "otherbot") == g) // shared group
    // unknown agents fall back to * (everything disallowed)
    assert(!Robots.isAllowed(Robots.rulesFor(txt, "randombot"), "/a"))
  }

  test("wildcards and end anchors (RFC 9309 patterns)") {
    val r = Seq((false, "/*.pdf$"), (false, "/a*z"))
    assert(!Robots.isAllowed(r, "/docs/file.pdf"))
    assert(Robots.isAllowed(r, "/docs/file.pdfx")) // $ anchored
    assert(!Robots.isAllowed(r, "/abcz/tail"))
    assert(Robots.isAllowed(r, "/abc"))
  }

  test("host/path extraction and the joined page filter") {
    val h = Seq("https://WWW.Example.com/a/b?q=1#f", "example.org/x", "http://e.net")
      .toDF("u")
      .select(Robots.urlHost(col("u")), Robots.urlPath(col("u")))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(h(0) == (("www.example.com", "/a/b?q=1")))
    assert(h(1) == (("example.org", "/x")))
    assert(h(2) == (("e.net", "/")))

    val pages = Seq(
      (1L, "http://s.com/private/x"), // disallowed by s.com robots
      (2L, "http://s.com/public/y"),
      (3L, "http://open.com/private/x") // no robots capture → allowed
    ).toDF("id", "url")
    val robots = Seq(("s.com", basic)).toDF("host", "robots_txt")
    val kept = Robots.filterAllowed(pages, "url", robots)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 3L))
    // original columns survive, helper columns don't
    assert(Robots.filterAllowed(pages, "url", robots).columns.toSeq ==
      Seq("id", "url"))
  }

  test("crawl-delay follows group selection; largest selected delay wins") {
    val txt = """User-agent: fastbot
                |Crawl-delay: 2.5
                |Disallow: /private
                |
                |User-agent: fastbot
                |Crawl-delay: 7
                |
                |User-agent: *
                |Crawl-delay: 10
                |Disallow: /tmp
                |""".stripMargin
    // both exact groups selected → conservative max; * group excluded
    assert(Robots.crawlDelayFor(txt, "FastBot") == Some(7.0))
    // unknown agent falls back to the * group
    assert(Robots.crawlDelayFor(txt, "otherbot") == Some(10.0))
    // selecting the delay must not disturb rule selection
    assert(!Robots.isAllowed(Robots.rulesFor(txt, "fastbot"), "/private/x"))
    assert(Robots.isAllowed(Robots.rulesFor(txt, "fastbot"), "/tmp/x"))
    // no delay declared / unparseable / negative → None
    assert(Robots.crawlDelayFor("User-agent: *\nDisallow: /a") == None)
    assert(Robots.crawlDelayFor("User-agent: *\nCrawl-delay: fast") == None)
    assert(Robots.crawlDelayFor("User-agent: *\nCrawl-delay: -1") == None)
    assert(Robots.crawlDelayFor(null) == None)
  }

  test("sitemaps are file-global, order-preserved, group-independent") {
    val txt = """Sitemap: https://example.com/sitemap.xml
                |User-agent: a
                |Disallow: /x
                |Sitemap: https://example.com/news.xml
                |User-agent: *
                |Allow: /
                |""".stripMargin
    assert(Robots.sitemapsOf(txt) ==
      Seq("https://example.com/sitemap.xml", "https://example.com/news.xml"))
    assert(Robots.sitemapsOf("User-agent: *\nDisallow:") == Seq.empty)
    assert(Robots.sitemapsOf(null) == Seq.empty)
    // a Sitemap line between user-agent lines ends the agent run — the
    // following user-agent starts a NEW group (positional-group contract)
    assert(Robots.rulesFor(txt, "a") == Seq((false, "/x")))
  }

  test("crawlPolicy column surfaces (crawl_delay, sitemaps) evidence") {
    val txt = "User-agent: *\nCrawl-delay: 3\nSitemap: https://e.com/s.xml\n"
    val got = Seq(("h1", txt), ("h2", "User-agent: *\nDisallow: /a"),
      ("h3", null.asInstanceOf[String]))
      .toDF("host", "robots_txt")
      .select(col("host"), Robots.crawlPolicy(col("robots_txt")).as("p"))
      .select(col("host"), col("p.crawl_delay"), col("p.sitemaps"))
      .collect().map(r => r.getString(0) -> ((
        if (r.isNullAt(1)) null else Double.box(r.getDouble(1)),
        if (r.isNullAt(2)) null else r.getSeq[String](2).toList))).toMap
    assert(got("h1") == ((Double.box(3.0), List("https://e.com/s.xml"))))
    assert(got("h2") == ((null, Nil)))
    assert(got("h3") == ((null, Nil)))
  }
}
