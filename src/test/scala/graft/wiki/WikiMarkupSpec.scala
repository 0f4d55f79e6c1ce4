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
}
