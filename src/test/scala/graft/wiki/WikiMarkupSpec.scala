package graft.wiki

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Parity tests: fixtures were produced by executing the reference
  * implementation (/root/reference/WikiExtractor.py) — see
  * scripts/gen_fixtures.py. Every clean/compact/normalizeTitle output must
  * match the reference byte-for-byte.
  */
class WikiMarkupSpec extends AnyFunSuite {

  private val fixtures: java.util.Map[String, Object] = {
    val in = getClass.getResourceAsStream("/wiki_fixtures.json")
    new ObjectMapper().readValue(in, classOf[java.util.Map[String, Object]])
  }

  private def cleanCases = fixtures.get("clean")
    .asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala

  test("clean() matches the reference on all fixtures") {
    for (c <- cleanCases) {
      val input = c.get("input").asInstanceOf[String]
      val expected = c.get("cleaned").asInstanceOf[String]
      assert(WikiMarkup.clean(input) == expected, s"\ninput: ${input}")
    }
  }

  test("compact(structure=false) matches the reference") {
    for (c <- cleanCases) {
      val input = c.get("input").asInstanceOf[String]
      val expected = c.get("compact_plain").asInstanceOf[java.util.List[String]].asScala.toSeq
      assert(WikiMarkup.compact(WikiMarkup.clean(input), structure = false) == expected,
        s"\ninput: ${input}")
    }
  }

  test("compact(structure=true) matches the reference") {
    for (c <- cleanCases) {
      val input = c.get("input").asInstanceOf[String]
      val expected = c.get("compact_structure").asInstanceOf[java.util.List[String]].asScala.toSeq
      assert(WikiMarkup.compact(WikiMarkup.clean(input), structure = true) == expected,
        s"\ninput: ${input}")
    }
  }

  test("normalizeTitle matches the reference") {
    val cases = fixtures.get("titles")
      .asInstanceOf[java.util.List[java.util.Map[String, String]]].asScala
    for (c <- cases)
      assert(WikiMarkup.normalizeTitle(c.get("input")) == c.get("normalized"),
        s"\ninput: ${c.get("input")}")
  }

  test("keepLinks=true preserves anchors as <a> tags") {
    val out = WikiMarkup.clean("See [[Target|anchor]]s here", keepLinks = true)
    assert(out == "See <a href=\"Target\">anchors</a> here")
  }

  test("unescape handles named, decimal, hex, and invalid refs") {
    assert(WikiMarkup.unescape("&amp; &#65; &#x42; &bogus; &#xZZ;") == "& A B &bogus; &#xZZ;")
  }

  test("pageUrl matches reference get_url") {
    assert(WikiMarkup.pageUrl("http://en.wikipedia.org/wiki", "42") ==
      "http://en.wikipedia.org/wiki?curid=42")
  }

  test("normalizeTemplateName strips prefix, underscores, and capitalizes") {
    assert(WikiMarkup.normalizeTemplateName("Template:Infobox person") == "Infobox person")
    assert(WikiMarkup.normalizeTemplateName("template:infobox_person") == "Infobox person")
    assert(WikiMarkup.normalizeTemplateName("  convert ") == "Convert")
  }

  test("transclusionBody honors noinclude/includeonly/onlyinclude") {
    assert(WikiMarkup.transclusionBody("body<noinclude>docs</noinclude>") == "body")
    assert(WikiMarkup.transclusionBody("<includeonly>only</includeonly>") == "only")
    assert(WikiMarkup.transclusionBody("junk<onlyinclude>kept</onlyinclude>junk") == "kept")
    assert(WikiMarkup.transclusionBody("open<noinclude>to eof") == "open")
  }

  test("substituteParams handles positional, named, and defaults") {
    assert(WikiMarkup.substituteParams("Hello {{{1}}} and {{{who}}}!",
      Seq("first", "who = Ada")) == "Hello first and Ada!")
    assert(WikiMarkup.substituteParams("{{{x|fallback}}}", Seq.empty) == "fallback")
    assert(WikiMarkup.substituteParams("{{{x}}}", Seq.empty) == "{{{x}}}") // absent, no default
  }

  test("expandTemplates expands one level; unknown and nested fall to dropNested") {
    val lib = Map("Hello" -> "Hello {{{name|world}}}!", "Outer" -> "uses {{Inner}}")
    assert(WikiMarkup.expandTemplates("a {{Hello|name=Spark}} b", lib) == "a Hello Spark! b")
    assert(WikiMarkup.expandTemplates("a {{hello}} b", lib) == "a Hello world! b")
    // unknown stays in place — then clean() drops it like the reference
    assert(WikiMarkup.expandTemplates("a {{Nope|1}} b", lib) == "a {{Nope|1}} b")
    assert(WikiMarkup.clean(WikiMarkup.expandTemplates("a {{Nope|1}} b", lib)) == "a b")
    // one level only: the inner transclusion is not recursively expanded,
    // and clean() then removes it
    assert(WikiMarkup.expandTemplates("x {{Outer}} y", lib) == "x uses {{Inner}} y")
    assert(WikiMarkup.clean(WikiMarkup.expandTemplates("x {{Outer}} y", lib)) == "x uses y")
    // a second level resolves the nested transclusion; self-reference stays
    // bounded by the level count
    val lib2 = lib + ("Inner" -> "innermost") + ("Loop" -> "again {{Loop}}")
    assert(WikiMarkup.expandTemplates("x {{Outer}} y", lib2, levels = 2) == "x uses innermost y")
    assert(WikiMarkup.expandTemplates("{{Loop}}", lib2, levels = 3)
      == "again again again {{Loop}}")
    // args containing pipes inside links split correctly
    assert(WikiMarkup.expandTemplates("{{Hello|name=[[A|B]]}}", lib) == "Hello [[A|B]]!")
  }

  test("parser functions and magic invocations stay in place and drop like the reference") {
    // the reference's grammar comment (WikiExtractor.py:106) names parser
    // functions ({{#if:}}, {{#expr:}}) and magic words; it drops ALL
    // {{..}} spans via dropNested. With expansion ON these forms miss the
    // template library (their normalized names — "#if: ..", "Msg:.." —
    // never equal a Template: page key), so they are left in place by
    // expandTemplates and then removed by clean(): reference-identical
    // output, locked here so a future expansion change can't silently
    // start evaluating them.
    val lib = Map("Hello" -> "Hello {{{name|world}}}!")
    val pf = "a {{#if: x | then | else}} b"
    assert(WikiMarkup.expandTemplates(pf, lib) == pf)
    assert(WikiMarkup.clean(WikiMarkup.expandTemplates(pf, lib)) == "a b")
    // msg: is MediaWiki's explicit-transclusion prefix — the reference
    // drops it unexpanded, so we must NOT resolve it to Template:Hello
    val msg = "a {{msg:Hello}} b"
    assert(WikiMarkup.expandTemplates(msg, lib) == msg)
    assert(WikiMarkup.clean(WikiMarkup.expandTemplates(msg, lib)) == "a b")
    // magic words look like zero-arg templates; absent from the library
    // they drop the same way
    val magic = "a {{PAGENAME}} b"
    assert(WikiMarkup.expandTemplates(magic, lib) == magic)
    assert(WikiMarkup.clean(WikiMarkup.expandTemplates(magic, lib)) == "a b")
    // nested inside a known template's argument: the known layer expands,
    // the parser function inside the substituted arg still drops
    val mixed = "{{Hello|name={{#expr: 1+1}}}}"
    assert(WikiMarkup.clean(WikiMarkup.expandTemplates(mixed, lib)) == "Hello !")
  }
}
