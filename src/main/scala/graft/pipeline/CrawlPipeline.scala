package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.{Html, Robots, TextOps}

/** Crawl-side compositions — the steps between the HTML tier and the
  * fetcher that every large-scale crawl pipeline runs but none of the
  * standalone operators owns end-to-end.
  */
object CrawlPipeline {

  /** Next-fetch FRONTIER from a batch of fetched pages — the composed
    * step between the crawl graph and the fetcher: outlinks in document
    * order ([[Html.extractLinks]]) → resolved against their page URL
    * ([[TextOps.resolveUrl]]) → collapsed to canonical URL identity
    * ([[TextOps.normalizeUrl]] — http/https, ±www, tracking params and
    * fragments are one frontier entry) → minus the batch's OWN pages
    * (links back into what was just fetched) → optionally minus every
    * URL any previous run already scheduled (the cross-run content-hash
    * registry, keyed on the normalized URL — the L27 machinery verbatim,
    * appends under the same delta-file failure contract) → optionally
    * gated by the per-host robots registry (RFC 9309 [[Robots]] rules for
    * `agent`; hosts without captures allow) → optionally capped per host
    * ([[graft.operators.Skew.saltedTopN]] — a hub host's million
    * outlinks rank in salted lanes, never one task).
    *
    * Returns one row per frontier URL: (`url`, `host`, `n_refs`,
    * `crawl_delay`) — `n_refs` is the batch-wide citation count (a
    * prioritization signal: rank by it or feed PageRank), `crawl_delay`
    * the politeness evidence from the host's robots capture (null
    * without one). Deterministic: no RNG anywhere; the per-host cap
    * keeps the lexicographically smallest URLs.
    *
    * Scale shape: extraction/resolution/normalization are scan-local
    * column chains (the t24/t28/t20 plan guards); the candidate collapse
    * is one partial-aggregated groupBy on the unskewed URL; the self and
    * registry drops are anti-joins keyed on the URL (hash) — the
    * ever-growing registry side stays bucketed and unshuffled; the
    * robots frame is orders smaller than the link set (AQE broadcasts
    * it); the host cap is the salted two-phase top-N.
    */
  def frontier(pages: DataFrame, urlCol: String, htmlCol: String,
               robotsByHost: Option[DataFrame] = None,
               seenRegistryTable: Option[String] = None,
               maxPerHost: Int = 0,
               agent: String = "*",
               updateRegistry: Boolean = true): DataFrame = {
    val resolved = pages
      .select(col(urlCol).as("__base"),
        explode(Html.extractLinks(col(htmlCol))).as("__href"))
      .withColumn("url",
        TextOps.normalizeUrl(TextOps.resolveUrl(col("__base"), col("__href"))))
      .filter(col("url").isNotNull && col("url") =!= "")
    val self = pages
      .select(TextOps.normalizeUrl(col(urlCol)).as("url")).distinct()
    val cand = resolved.groupBy(col("url"))
      .agg(count(lit(1)).as("n_refs"))
      .join(self, Seq("url"), "left_anti")
    val fresh = seenRegistryTable match {
      case Some(t) =>
        graft.dedup.Dedup.dedupAgainstRegistry(cand, "url", "url", t,
          update = updateRegistry)
      case None => cand
    }
    val hosted = fresh.withColumn("host", Robots.urlHost(col("url")))
    val gated = robotsByHost match {
      case Some(r) =>
        val pol = r.select(lower(col("host")).as("host"),
          Robots.crawlPolicy(col("robots_txt"), agent)
            .getField("crawl_delay").as("crawl_delay"))
        Robots.filterAllowed(hosted, "url", r, agent)
          .join(pol, Seq("host"), "left")
      case None =>
        hosted.withColumn("crawl_delay", lit(null).cast("double"))
    }
    val out = gated.select(col("url"), col("host"), col("n_refs"),
      col("crawl_delay"))
    if (maxPerHost > 0)
      graft.operators.Skew.saltedTopN(out, Seq(col("host")), col("url"),
        Seq(col("url")), maxPerHost)
    else out
  }

  /** [[frontier]]'s incremental twin for a live crawl intake: each
    * micro-batch's outlinks run the same row-local
    * extract→resolve→normalize chain, then a URL emits the FIRST time it
    * is sighted within the watermark horizon
    * (`dropDuplicatesWithinWatermark` — 32 bytes of state per distinct
    * frontier URL in the horizon), optionally minus the persisted seen
    * registry (stream-STATIC anti-join on the bucketed table — probed,
    * never stream-mutated: registering fetched URLs stays the batch
    * append, the L16g index convention), optionally gated by the static
    * robots frame with `crawl_delay` evidence, optionally admission-
    * capped per host over the stream's life
    * ([[graft.streaming.EventStreams.quotaPerSource]] — one long of
    * state per host).
    *
    * Differences from the batch twin, stated honestly: there is no
    * batch-wide `n_refs` (a stream can't see future citations — rank
    * frontier priority downstream, e.g. per-window counts or PageRank
    * over accumulated edges), and "minus the batch's own pages"
    * generalizes to the registry: a stream cannot order same-batch
    * self-sightings deterministically, so register fetched URLs in the
    * seen registry and only same-page self links drop row-locally.
    *
    * Returns (`tsCol`, url, host, crawl_delay) in append mode.
    */
  def frontierStream(pages: DataFrame, urlCol: String, htmlCol: String,
                     tsCol: String, watermark: String = "1 hour",
                     robotsByHost: Option[DataFrame] = None,
                     seenRegistryTable: Option[String] = None,
                     maxPerHost: Int = 0,
                     agent: String = "*"): DataFrame = {
    val spark = pages.sparkSession
    val links = pages
      .select(col(tsCol), col(urlCol).as("__base"),
        explode(Html.extractLinks(col(htmlCol))).as("__href"))
      .withColumn("url",
        TextOps.normalizeUrl(TextOps.resolveUrl(col("__base"), col("__href"))))
      .filter(col("url").isNotNull && col("url") =!= "" &&
        // same-page self links drop row-locally (see scaladoc)
        col("url") =!= TextOps.normalizeUrl(col("__base")))
      .select(col(tsCol), col("url"))
    val unseen = seenRegistryTable match {
      case Some(t) =>
        links.withColumn("content_hash", sha2(col("url").cast("binary"), 256))
          .join(spark.table(t), Seq("content_hash"), "left_anti")
          .drop("content_hash")
      case None => links
    }
    val first = unseen
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("url")
      .withColumn("host", Robots.urlHost(col("url")))
    val gated = robotsByHost match {
      case Some(r) =>
        val pol = r.select(lower(col("host")).as("host"),
          Robots.crawlPolicy(col("robots_txt"), agent)
            .getField("crawl_delay").as("crawl_delay"))
        Robots.filterAllowed(first, "url", r, agent)
          .join(pol, Seq("host"), "left")
      case None =>
        first.withColumn("crawl_delay", lit(null).cast("double"))
    }
    val out = gated.select(col(tsCol), col("url"), col("host"),
      col("crawl_delay"))
    if (maxPerHost > 0)
      graft.streaming.EventStreams.quotaPerSource(
        out.withColumn("__adm", xxhash64(col("url"))),
        "host", "__adm", maxPerHost).drop("__adm")
    else out
  }
}
