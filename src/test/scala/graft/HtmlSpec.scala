package graft

import org.apache.spark.sql.functions._
import graft.text.Html

/** Hand-pinned semantics of the HTML→text extraction chain (L60). The
  * cross-engine equality is the driver's t24 oracle; these pin the
  * contract cases a hash can't explain.
  */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def toText(html: String): String =
    Seq(html).toDF("h").select(Html.htmlToText(col("h"))).head().getString(0)

  private def toTitle(html: String): String =
    Seq(html).toDF("h").select(Html.htmlTitle(col("h"))).head().getString(0)

  test("full page extracts body text with paragraph structure") {
    val page = "<html><head><title>T</title><style>p{x:1}</style></head>" +
      "<body><h1>Head</h1><p>one two</p><p>three</p></body></html>"
    assert(toText(page) == "Head\none two\nthree")
  }

  test("script and style content dropped, including tag-looking strings") {
    val page = "<body><script>if(a<b){document.write(\"<p>no</p>\");}" +
      "</script><style>a > b{c:d}</style><p>kept</p></body>"
    assert(toText(page) == "kept")
  }

  test("head content (title) is metadata, not body text; htmlTitle gets it") {
    val page = "<html><head><title>My &amp; Title</title></head>" +
      "<body><p>body</p></body></html>"
    assert(toText(page) == "body")
    assert(toTitle(page) == "My & Title")
  }

  test("<header> element is a block boundary, <head> is content-dropped") {
    val page = "<head><meta x=\"1\"></head><header>site nav</header><p>text</p>"
    assert(toText(page) == "site nav\ntext")
  }

  test("entities decode exactly once: double-encoded stays literal") {
    assert(toText("<p>a &amp;lt; b</p>") == "a &lt; b")
    assert(toText("<p>a &lt; b &amp; c &#39;d&#39;</p>") == "a < b & c 'd'")
    assert(toText("x&nbsp;y") == "x y")
  }

  test("numeric character references decode generically, single-pass") {
    // decimal, hex, uppercase-X hex — beyond the named table
    assert(toText("<p>em&#8212;dash</p>") == "em—dash")
    assert(toText("<p>check &#x2713; and &#X41;</p>") == "check ✓ and A")
    // double-encoded numeric decodes exactly once
    assert(toText("<p>&amp;#60;kept</p>") == "&#60;kept")
    // amp-valued refs defer to the final amp group: one decode, the
    // produced &lt; is NOT re-decoded
    assert(toText("<p>&#038;lt; x</p>") == "&lt; x")
    assert(toText("<p>a &#38; b &#x26; c</p>") == "a & b & c")
    // out-of-BMP, lone surrogate, zero: literal pass-through
    assert(toText("<p>&#999999; &#xD800; &#0;</p>") == "&#999999; &#xD800; &#0;")
    // numeric NBSP normalizes to a plain space like &nbsp;
    assert(toText("<p>a&#160;b&#xa0;c</p>") == "a b c")
    // titles run the same decode
    assert(
      Seq("<html><head><title>T&#8211;sub</title></head><body>x</body></html>")
        .toDF("h").select(Html.htmlTitle(col("h"))).head().getString(0)
        == "T–sub")
  }

  test("comments removed; unknown entities pass through as text") {
    assert(toText("a<!-- hidden\nlines -->b") == "ab")
    assert(toText("<p>&notanentity; stays</p>") == "&notanentity; stays")
  }

  test("case-insensitive tags; self-closing and attribute forms") {
    assert(toText("<P CLASS=\"x\">a</P><BR/><DIV>b</DIV>") == "a\nb")
    assert(toText("<SCRIPT>x</SCRIPT>ok") == "ok")
  }

  test("inline tags strip without line breaks; blank lines collapse") {
    assert(toText("<p>a <b>bold</b> <a href=\"u\">link</a> z</p>") ==
      "a bold link z")
    assert(toText("<p>a</p><p></p><p></p><p>b</p>") == "a\nb")
  }

  test("whitespace normalization: runs collapse, edges trim") {
    assert(toText("  <p>a   b\t c</p>  ") == "a b c")
  }

  test("null propagates; absent title is empty string") {
    val r = Seq((1, null: String)).toDF("i", "h")
      .select(Html.htmlToText(col("h"))).head()
    assert(r.isNullAt(0))
    assert(toTitle("<body>no title</body>") == "")
  }

  test("noindex meta detected in either attribute order; lookalikes are not") {
    def noidx(html: String): Boolean =
      Seq(html).toDF("h").select(Html.htmlNoindex(col("h"))).head().getBoolean(0)
    assert(noidx("<head><meta name=\"robots\" content=\"noindex\"></head>"))
    assert(noidx("<head><META content='noindex, nofollow' name='robots'></head>"))
    assert(noidx("<meta name=robots content=NOINDEX>"))
    assert(!noidx("<meta name=\"robots\" content=\"nofollow\">"))
    assert(!noidx("<meta name=\"description\" content=\"noindex stuff\">"))
    assert(!noidx("<p>noindex robots</p>"))
    val r = Seq((1, null: String)).toDF("i", "h")
      .select(Html.htmlNoindex(col("h"))).head()
    assert(r.isNullAt(0))
  }

  test("extractLinks: quoted hrefs in order; fragments and unquoted skipped") {
    val page = "<a href=\"/a\">1</a><A HREF='b.html'>2</A>" +
      "<a class=\"x\" href=\"http://e.com/c?q=1#s\">3</a>" +
      "<a href=\"#top\">skip</a><a href=unquoted>skip</a><a>skip</a>" +
      "<a data-href=\"lazy.html\">skip</a>"
    val links = Seq(page).toDF("h")
      .select(Html.extractLinks(col("h"))).head().getSeq[String](0)
    assert(links == Seq("/a", "b.html", "http://e.com/c?q=1#s"))
  }

  test("extractImageLinks: img srcs in order, data URIs included as-is") {
    val page = "<img src=\"/i/a.png\"><IMG alt=\"x\" SRC='b.jpg'/>" +
      "<img data-src=\"lazy.png\"><img src=\"https://c.net/c.webp\">"
    val links = Seq(page).toDF("h")
      .select(Html.extractImageLinks(col("h"))).head().getSeq[String](0)
    assert(links == Seq("/i/a.png", "b.jpg", "https://c.net/c.webp"))
  }

  test("resolveUrl: absolute, scheme-relative, root-relative, relative") {
    import graft.text.TextOps
    val cases = Seq(
      ("https://s.com/dir/page.html", "http://other.com/p", "http://other.com/p"),
      ("https://s.com/dir/page.html", "mailto:a@b.c", "mailto:a@b.c"),
      ("https://s.com/dir/page.html", "//cdn.net/l.js", "https://cdn.net/l.js"),
      ("https://s.com/dir/page.html", "/root/a", "https://s.com/root/a"),
      ("https://s.com/dir/page.html", "sub/b.html", "https://s.com/dir/sub/b.html"),
      ("https://s.com", "x.html", "https://s.com/x.html"), // host-only base
      ("https://s.com/dir/page?q=1#f", "y", "https://s.com/dir/y"), // query dropped from dir
      ("https://s.com/dir/page.html", "../up.html", "https://s.com/dir/../up.html")) // no dot-normalization
    val got = cases.toDF("base", "href", "want")
      .select(TextOps.resolveUrl(col("base"), col("href")), col("want"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"${r.getString(0)} != ${r.getString(1)}"))
    val n = Seq((null: String, "x")).toDF("base", "href")
      .select(TextOps.resolveUrl(col("base"), col("href"))).head()
    assert(n.isNullAt(0))
  }

  test("table cells separate; list items each on their own line") {
    val page = "<table><tr><td>a</td><td>b</td></tr></table>" +
      "<ul><li>x</li><li>y</li></ul>"
    assert(toText(page) == "a\nb\nx\ny")
  }

  test("mainContent keeps prose, drops link chrome by length and density") {
    import graft.text.Html
    def mc(h: String, minChars: Int = 60, maxDensity: Double = 0.34) =
      Seq(Tuple1(h)).toDF("h")
        .select(Html.mainContent(col("h"), minChars, maxDensity))
        .head() match { case r => if (r.isNullAt(0)) null else r.getString(0) }
    val prose = "This paragraph carries the actual article prose and it " +
      "is comfortably longer than the minimum block size threshold."
    val page = "<html><head><title>t</title><script>nav()</script></head>" +
      "<body><div><a href=\"/\">Home</a> <a href=\"/a\">About</a></div>" +
      s"<p>$prose It cites <a href=\"/r\">one source</a> inline.</p>" +
      "<p><a href=\"/1\">A long related-article teaser link here</a> " +
      "<a href=\"/2\">another long recommended article link text</a></p>" +
      "<p>Short closer.</p>" +
      "<footer><a href=\"/terms\">Terms</a></footer></body></html>"
    val got = mc(page)
    // only the prose block survives: nav/footer/closer fail the length
    // floor, the link farm fails the density cap despite its length
    assert(got.startsWith("This paragraph carries") &&
      got.endsWith("It cites one source inline."), got)
    assert(!got.contains("Home") && !got.contains("teaser") &&
      !got.contains("Short closer") && !got.contains("Terms"), got)
    // entity decode + whitespace tail still applies to survivors
    val ent = mc("<p>" + ("x" * 60) + " &amp; more &#8212; done</p>")
    assert(ent == "x" * 60 + " & more — done", ent)
    // a page of pure chrome extracts to the empty string; null stays null
    assert(mc("<div><a href=\"/\">Home</a></div>") == "")
    assert(mc(null) == null)
    // thresholds are real knobs: lowering the floor admits the closer
    assert(mc(page, minChars = 5).contains("Short closer."))
    // density 1.0 admits the link farm
    assert(mc(page, maxDensity = 1.0).contains("teaser"))
  }
}
