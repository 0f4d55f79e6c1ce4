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
  *  4. one entity-decode pass: the GENERIC numeric character-reference
  *     decode ([[NumRefs]] — any `&#NNNN;`/`&#xHHHH;` to its BMP code
  *     point) followed by the common named entities ([[entityTable]]) —
  *     single-pass on purpose: double-encoded `&amp;lt;` decodes to the
  *     literal text `&lt;`, exactly once (the amp-valued references
  *     `&#38;`/`&#x26;` decode LAST with `&amp;` for the same reason);
  *  5. whitespace normalization: horizontal runs collapse to one space
  *     (NBSP — decoded or raw — included), spaces around newlines drop,
  *     3+ blank lines collapse to one blank line, edges trimmed.
  *
  * Exotic named entities outside [[entityTable]] and numeric references
  * above the BMP pass through as literal text (documented bound, not a
  * silent failure mode — extend the table to widen coverage; the oracle
  * widens in lockstep because both sides render from it).
  */
object Html {

  /** One rendering-agnostic chain step: a regex replacement, a literal
    * string replacement (entities), or the generic numeric
    * character-reference decode (a fold, not a replacement — see
    * [[NumRefs]]).
    */
  sealed trait Step
  final case class Re(pattern: String, repl: String) extends Step
  final case class Lit(from: String, to: String) extends Step

  /** Generic `&#NNNN;` / `&#xHHHH;` decode — the step a finite entity
    * table can't express: each matched reference decodes to its Unicode
    * code point. Rendered as the same fold on both sides (Spark:
    * `aggregate(regexp_extract_all(...), text, replace)`; DuckDB:
    * `list_reduce(list_prepend(...), replace)`), so the engines cannot
    * drift. Bounds, identical both sides by construction: BMP code
    * points only (1..0xFFFF excluding surrogates — `chr` above the BMP
    * would need surrogate-pair assembly Spark's `decode` can't express
    * portably; >0xFFFF references pass through as literal text),
    * digit-count capped by the pattern (no 64-bit wraparound aliasing),
    * and code 38 (`&`) DEFERRED to the entity table's final amp group so
    * `&#038;lt;` decodes to literal `&lt;` exactly once — the
    * single-pass contract.
    */
  case object NumRefs extends Step

  /** Digit counts capped: 7 decimal / 6 hex digits keep every parse far
    * inside integer range, so overflow can never alias into the valid
    * code-point window.
    */
  val numRefPattern: String = "&#(?:[0-9]{1,7}|[xX][0-9a-fA-F]{1,6});"

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
    "&amp;" -> "&", "&#38;" -> "&", "&#038;" -> "&", "&#x26;" -> "&")

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

  /** Comment/container drops + block→newline segmentation — the shared
    * structural prefix of [[textSteps]] and [[mainContent]]'s pre-density
    * pass (tags still unstripped, so link markup stays measurable there).
    * A RUN of adjacent block tags (with interleaved whitespace) is ONE
    * boundary: `</p><p>` separates paragraphs by a single newline — the
    * line-unit shape dropRepeatedLines/span tiers want.
    */
  private val structureSteps: Seq[Step] =
    Seq(Re("(?s)<!--.*?-->", "")) ++
      containerTags.map(t =>
        Re(s"(?is)<$t\\b[^>]*>.*?</$t\\s*>", "")) ++
      Seq(Re(s"(?i)(?:</?(?:$blockTagAlt)(?:\\s[^>]*)?/?>[ \\t\\r\\n]*)+",
        "\n"))

  /** The full body-extraction chain (see the object scaladoc). */
  val textSteps: Seq[Step] =
    structureSteps ++
      Seq(Re("<[^>]*>", "")) ++
      // generic numeric refs BEFORE the named table (its amp group must
      // stay LAST — NumRefs defers code 38 to it); decoded U+00A0 (and
      // raw NBSP in page text) normalizes to a plain space like &nbsp;
      Seq(NumRefs, Lit(" ", " ")) ++
      entityTable.map { case (f, t) => Lit(f, t) } ++
      wsSteps
  /** Entity decode + whitespace after block selection. */
  private val postBlockSteps: Seq[Step] =
    Seq(NumRefs, Lit(" ", " ")) ++
      entityTable.map { case (f, t) => Lit(f, t) } ++ wsSteps

  private val anchorElem = "(?is)<a\\b[^>]*>.*?</a\\s*>"
  private val anyTag = "<[^>]*>"

  /** MAIN-CONTENT extraction by LINK DENSITY (the Boilerpipe-family
    * heuristic): nav bars, footers, and related-article rails are short
    * blocks whose text is mostly anchor text; article prose is long and
    * mostly unlinked. Blocks (the [[textSteps]] boundary segmentation)
    * keep only if their visible text is ≥ `minBlockChars` AND the share
    * of it inside `<a>` elements is ≤ `maxLinkDensity`; survivors then
    * take the normal strip/decode/whitespace tail. Complements the
    * line-dedup tiers: those need the boilerplate SEEN elsewhere, this
    * drops link-heavy chrome on sight, first fetch included.
    *
    * Same contract as [[htmlToText]]: one engine-portable regex chain +
    * array algebra (RE2-safe, no UDF, codegen'd — scan-gate safe), with
    * the DuckDB oracle rendered from the SAME steps ([[duckMainContent]])
    * so the engines cannot drift. Null html → null.
    */
  def mainContent(html: Column, minBlockChars: Int = 60,
                  maxLinkDensity: Double = 0.34): Column = {
    val pre = applySteps(html, structureSteps)
    val kept = filter(split(pre, "\n"), b => {
      val total = length(trim(regexp_replace(b, anyTag, "")))
      val nonLink = length(trim(
        regexp_replace(regexp_replace(b, anchorElem, ""), anyTag, "")))
      total >= lit(minBlockChars) &&
        (total - nonLink).cast("double") <= lit(maxLinkDensity) * total
    })
    applySteps(
      array_join(transform(kept, b => regexp_replace(b, anyTag, "")), "\n"),
      postBlockSteps)
  }

  /** Entity decode + whitespace for the already-extracted title text. */
  val titleSteps: Seq[Step] =
    Seq(Re("<[^>]*>", ""), NumRefs, Lit(" ", " ")) ++
      entityTable.map { case (f, t) => Lit(f, t) } ++ wsSteps

  // the shared numeric-ref decode, Spark rendering: fold the matched
  // references over the text; each valid code becomes its BMP char via a
  // 2-byte UTF-16BE decode (hex path through conv, decimal direct)
  private def sparkNumRefs(acc: Column): Column = {
    val refs = regexp_extract_all(acc, lit(numRefPattern), lit(0))
    aggregate(refs, acc, (a, r) => {
      val isHex = substr(r, lit(3), lit(1)).isin("x", "X")
      val digits = when(isHex, substr(r, lit(4), length(r) - 4))
        .otherwise(substr(r, lit(3), length(r) - 3))
      val code = when(isHex, conv(digits, 16, 10)).otherwise(digits)
        .cast("long")
      val valid = code.between(1, 0xFFFF) &&
        !code.between(0xD800, 0xDFFF) && code =!= 38
      org.apache.spark.sql.functions.replace(a, r,
        when(valid, decode(unhex(lpad(hex(code), 4, "0")), "UTF-16BE"))
          .otherwise(r))
    })
  }

  private def applySteps(c: Column, steps: Seq[Step]): Column =
    steps.foldLeft(c) {
      case (acc, Re(p, r)) => regexp_replace(acc, p, r)
      // literal replace via a quoted pattern — same all-occurrence
      // semantics as DuckDB's replace(); repls contain no $ or \
      case (acc, Lit(f, t)) => regexp_replace(acc, Pattern.quote(f), t)
      case (acc, NumRefs) => sparkNumRefs(acc)
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

  // the shared numeric-ref decode, DuckDB rendering: the same fold as
  // sparkNumRefs — list_prepend supplies the initial accumulator, the
  // code expression repeats inline (SQL has no lambda-local bindings)
  private def duckNumRefs(acc: String): String = {
    val code = "(CASE WHEN substr(r,3,1) IN ('x','X') " +
      "THEN TRY_CAST('0x' || substr(r, 4, length(r)-4) AS BIGINT) " +
      "ELSE TRY_CAST(substr(r, 3, length(r)-3) AS BIGINT) END)"
    s"list_reduce(list_prepend($acc, " +
      s"regexp_extract_all($acc, '${sq(numRefPattern)}')), " +
      s"(a, r) -> replace(a, r, CASE WHEN $code BETWEEN 1 AND 65535 " +
      s"AND NOT $code BETWEEN 55296 AND 57343 AND $code <> 38 " +
      s"THEN chr(CAST($code AS INTEGER)) ELSE r END))"
  }

  private def duckSteps(inner: String, steps: Seq[Step]): String =
    steps.foldLeft(inner) {
      case (acc, Re(p, r)) =>
        s"regexp_replace($acc, '${sq(p)}', ${duckRepl(r)}, 'g')"
      case (acc, Lit(f, t)) =>
        s"replace($acc, '${sq(f)}', '${sq(t)}')"
      case (acc, NumRefs) => duckNumRefs(acc)
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

  /** DuckDB expression computing [[mainContent]] of `inner` — rendered
    * from the same steps/patterns/thresholds as the Spark side.
    */
  def duckMainContent(inner: String, minBlockChars: Int = 60,
                      maxLinkDensity: Double = 0.34): String = {
    val pre = duckSteps(inner, structureSteps)
    def strip(e: String) = s"regexp_replace($e, '${sq(anyTag)}', '', 'g')"
    def noA(e: String) = s"regexp_replace($e, '${sq(anchorElem)}', '', 'g')"
    val total = s"length(trim(${strip("b")}))"
    val nonLink = s"length(trim(${strip(noA("b"))}))"
    val kept = s"list_filter(string_split($pre, chr(10)), " +
      s"b -> $total >= $minBlockChars AND " +
      s"CAST($total - $nonLink AS DOUBLE) <= $maxLinkDensity * $total)"
    duckSteps(
      s"array_to_string(list_transform($kept, b -> ${strip("b")}), chr(10))",
      postBlockSteps)
  }

  /** DuckDB expression computing [[htmlNoindex]] of `inner`. */
  def duckNoindex(inner: String): String =
    s"(regexp_matches($inner, '${sq(noindexNameFirst)}') OR " +
      s"regexp_matches($inner, '${sq(noindexContentFirst)}'))"
}
