package graft.text

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the crawl-side generalization of the wiki
  * cleaner (the reference strips MediaWiki markup from dump pages,
  * WikiExtractor.py:368-456; a Common-Crawl intake strips HTML from
  * fetched pages before any quality/dedup tier sees a byte).
  *
  * The whole transform is ONE deterministic regex/replace chain shared
  * between the Spark implementation and the DuckDB oracle generator
  * ([[textSteps]] renders both) — the t01 generated-oracle pattern, so
  * the two sides cannot drift. That also keeps it engine-portable: no
  * backreferences, no lookaround (RE2-safe, the [[TextOps.redactPii]]
  * convention), no UDF — it runs as codegen'd `regexp_replace` columns
  * inside any scan gate, shuffle-free at any corpus scale.
  *
  * Semantics (the lightweight text-extraction contract, not a DOM):
  *  1. comments dropped; script/style/head/noscript/svg/iframe/textarea
  *     elements dropped WITH their content (head first — a page's
  *     `<title>` is metadata, surfaced by [[htmlTitle]], not body text);
  *  2. block-level tags (p, div, h1-6, li, tr, br, …) become newlines so
  *     paragraph structure survives for the line/span dedup tiers;
  *  3. remaining tags stripped;
  *  4. one entity-decode pass over the common named + numeric entities
  *     ([[entityTable]]) — single-pass on purpose: double-encoded
  *     `&amp;lt;` decodes to the literal text `&lt;`, exactly once;
  *  5. whitespace normalization: horizontal runs collapse to one space,
  *     spaces around newlines drop, 3+ blank lines collapse to one blank
  *     line, edges trimmed.
  *
  * Exotic named entities outside [[entityTable]] and non-listed numeric
  * references pass through as literal text (documented bound, not a
  * silent failure mode — extend the table to widen coverage; the oracle
  * widens in lockstep because both sides render from it).
  */
object Html {

  /** One rendering-agnostic chain step: a regex replacement or a literal
    * string replacement (entities).
    */
  sealed trait Step
  final case class Re(pattern: String, repl: String) extends Step
  final case class Lit(from: String, to: String) extends Step

  /** Single-decode entity table. Order is load-bearing: `&amp;`/`&#38;`
    * decode LAST so `&amp;lt;` yields literal `&lt;` (one pass), never a
    * re-decoded `<`.
    */
  val entityTable: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&#60;" -> "<",
    "&gt;" -> ">", "&#62;" -> ">",
    "&quot;" -> "\"", "&#34;" -> "\"",
    "&apos;" -> "'", "&#39;" -> "'", "&#039;" -> "'",
    "&nbsp;" -> " ", "&#160;" -> " ",
    "&ndash;" -> "–", "&mdash;" -> "—",
    "&hellip;" -> "…", "&middot;" -> "·",
    "&laquo;" -> "«", "&raquo;" -> "»",
    "&ldquo;" -> "“", "&rdquo;" -> "”",
    "&lsquo;" -> "‘", "&rsquo;" -> "’",
    "&copy;" -> "©", "&reg;" -> "®", "&trade;" -> "™",
    "&deg;" -> "°", "&euro;" -> "€", "&pound;" -> "£",
    "&amp;" -> "&", "&#38;" -> "&")

  /** Elements whose CONTENT is dropped (no backreference — one chained
    * pattern per tag keeps it RE2-safe for the oracle).
    */
  private val containerTags =
    Seq("script", "style", "head", "noscript", "svg", "iframe", "textarea")

  /** Tags that terminate a text block — replaced by newlines. */
  private val blockTagAlt = "p|div|h[1-6]|li|ul|ol|dl|dt|dd|tr|table|thead|" +
    "tbody|tfoot|th|td|blockquote|pre|section|article|aside|header|footer|" +
    "nav|form|figure|figcaption|hr|br"

  /** Trailing whitespace normalization shared by text and title. */
  private val wsSteps: Seq[Step] = Seq(
    Re("[ \\t\\r\\f]+", " "),
    Re(" *\\n *", "\n"),
    Re("\\n{3,}", "\n\n"),
    Re("^[\\n ]+", ""),
    Re("[\\n ]+$", ""))

  /** The full body-extraction chain (see the object scaladoc). */
  val textSteps: Seq[Step] =
    Seq(Re("(?s)<!--.*?-->", "")) ++
      containerTags.map(t =>
        Re(s"(?is)<$t\\b[^>]*>.*?</$t\\s*>", "")) ++
      Seq(
        // a RUN of adjacent block tags (with interleaved whitespace) is
        // ONE boundary: `</p><p>` separates paragraphs by a single
        // newline — the line-unit shape dropRepeatedLines/span tiers want
        Re(s"(?i)(?:</?(?:$blockTagAlt)(?:\\s[^>]*)?/?>[ \\t\\r\\n]*)+",
          "\n"),
        Re("<[^>]*>", "")) ++
      entityTable.map { case (f, t) => Lit(f, t) } ++
      wsSteps

  /** Entity decode + whitespace for the already-extracted title text. */
  val titleSteps: Seq[Step] =
    Seq(Re("<[^>]*>", "")) ++
      entityTable.map { case (f, t) => Lit(f, t) } ++ wsSteps

  private def applySteps(c: Column, steps: Seq[Step]): Column =
    steps.foldLeft(c) {
      case (acc, Re(p, r)) => regexp_replace(acc, p, r)
      // literal replace via a quoted pattern — same all-occurrence
      // semantics as DuckDB's replace(); repls contain no $ or \
      case (acc, Lit(f, t)) => regexp_replace(acc, Pattern.quote(f), t)
    }

  /** Extracted body text of an HTML document (null in, null out). */
  def htmlToText(html: Column): Column = applySteps(html, textSteps)

  /** The document `<title>`, entity-decoded; empty string when absent
    * (regexp_extract's no-match value in both engines).
    */
  def htmlTitle(html: Column): Column =
    applySteps(regexp_extract(html, "(?is)<title[^>]*>(.*?)</title", 1),
      titleSteps)

  /** `<meta name="robots" content="… noindex …">` detection — the
    * crawl-policy gate every public pipeline applies before keeping a
    * page. Attribute order varies in the wild, so two RE2-safe
    * alternatives (no lookaround) cover name-first and content-first.
    */
  private val noindexNameFirst =
    "(?is)<meta\\s[^>]*name\\s*=\\s*[\"']?robots[^>]*" +
      "content\\s*=\\s*[\"']?[^\"'>]*noindex"
  private val noindexContentFirst =
    "(?is)<meta\\s[^>]*content\\s*=\\s*[\"']?[^\"'>]*noindex[^>]*" +
      "name\\s*=\\s*[\"']?robots"

  /** True when the page opts out of indexing (null in, null out). */
  def htmlNoindex(html: Column): Column =
    html.rlike(noindexNameFirst) || html.rlike(noindexContentFirst)

  // same `(?:[^>]*\s)?` discipline as the img pattern: `data-href`
  // lazy-loader attributes are not links
  private val hrefPattern =
    "(?i)<a\\s+(?:[^>]*\\s)?href\\s*=\\s*[\"']([^\"'>#][^\"'>]*)[\"']"

  /** Outlink hrefs of a page, in document order (quoted `href`s of `<a>`
    * tags; fragment-only links excluded; raw attribute values — decode
    * entities / resolve with [[TextOps.resolveUrl]] downstream). The
    * crawl-frontier feed: extract → resolve against the page URL →
    * `normalizeUrl` → the (src, dst) edges `operators.PageRank` ranks.
    */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html, lit(hrefPattern), lit(1))

  /** DuckDB expression computing [[extractLinks]] of `inner`. */
  def duckLinks(inner: String): String =
    s"regexp_extract_all($inner, '${sq(hrefPattern)}', 1)"

  // `(?:[^>]*\s)?src` keeps `data-src` lazy-loader attributes out: the
  // attribute name must start the tag body or follow whitespace
  private val imgSrcPattern =
    "(?i)<img\\s+(?:[^>]*\\s)?src\\s*=\\s*[\"']([^\"'>][^\"'>]*)[\"']"

  /** Image `src` URLs in document order — the MEDIA frontier feed: resolve
    * with [[TextOps.resolveUrl]], fetch, and hand the blobs to the
    * multimodal intake (`MediaPipeline.curateMedia`).
    */
  def extractImageLinks(html: Column): Column =
    regexp_extract_all(html, lit(imgSrcPattern), lit(1))

  // ---- DuckDB oracle rendering (the t01 lockstep-generation pattern) ----

  private def sq(s: String): String = s.replace("'", "''")

  private def duckRepl(r: String): String =
    if (r.contains("\n")) "e'" + sq(r).replace("\n", "\\n") + "'"
    else "'" + sq(r) + "'"

  private def duckSteps(inner: String, steps: Seq[Step]): String =
    steps.foldLeft(inner) {
      case (acc, Re(p, r)) =>
        s"regexp_replace($acc, '${sq(p)}', ${duckRepl(r)}, 'g')"
      case (acc, Lit(f, t)) =>
        s"replace($acc, '${sq(f)}', '${sq(t)}')"
    }

  /** DuckDB expression computing [[htmlToText]] of `inner`. */
  def duckText(inner: String): String = duckSteps(inner, textSteps)

  /** DuckDB expression computing [[htmlTitle]] of `inner`. */
  def duckTitle(inner: String): String =
    duckSteps(
      s"regexp_extract($inner, '(?is)<title[^>]*>(.*?)</title', 1)",
      titleSteps)

  /** A Scala string as a DuckDB literal (newlines via chr(10) so the
    * oracle text never depends on e-string escape handling).
    */
  def duckLit(s: String): String =
    "'" + sq(s).replace("\n", "' || chr(10) || '") + "'"

  /** DuckDB expression computing [[htmlNoindex]] of `inner`. */
  def duckNoindex(inner: String): String =
    s"(regexp_matches($inner, '${sq(noindexNameFirst)}') OR " +
      s"regexp_matches($inner, '${sq(noindexContentFirst)}'))"
}
