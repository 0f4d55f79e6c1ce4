package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf
import graft.wiki.WikiMarkup

/** Column-level wiki-markup functions.
  *
  * These are Scala UDFs rather than Catalyst expressions deliberately: the
  * markup scanner is an irreducibly imperative multi-pass string transform
  * (regex + stack scanner), so codegen would buy nothing — the per-row cost
  * is the regex work itself, and a UDF keeps it a single JIT-friendly call.
  * Everything around them (filters, projections, aggregations) stays native.
  */
object WikiFunctions {

  /** Full markup→text cleaning (reference `clean`, WikiExtractor.py:368). */
  def wiki_clean(text: Column): Column = cleanUdf(text)

  /** Cleaning with `[[..]]` rendered as `<a>` anchors. */
  def wiki_clean_keep_links(text: Column): Column = cleanKeepUdf(text)

  /** Compacted paragraph lines (reference `compact`, WikiExtractor.py:460). */
  def wiki_compact(text: Column): Column = compactUdf(text)

  /** Structure-mode compaction (`<hN>`/`<li>` lines). */
  def wiki_compact_structure(text: Column): Column = compactStructUdf(text)

  /** Canonical page title (reference `normalizeTitle`, WikiExtractor.py:163). */
  def normalize_title(title: Column): Column = normTitleUdf(title)

  /** HTML/XML character-reference unescaping (WikiExtractor.py:205). */
  def html_unescape(text: Column): Column = unescapeUdf(text)

  private val cleanUdf = udf((t: String) => WikiMarkup.clean(t))
  private val cleanKeepUdf = udf((t: String) => WikiMarkup.clean(t, keepLinks = true))
  private val compactUdf = udf((t: String) => WikiMarkup.compact(WikiMarkup.clean(t)))
  private val compactStructUdf =
    udf((t: String) => WikiMarkup.compact(WikiMarkup.clean(t), structure = true))
  private val normTitleUdf = udf((t: String) => WikiMarkup.normalizeTitle(t))
  private val unescapeUdf = udf((t: String) => WikiMarkup.unescape(t))
}
