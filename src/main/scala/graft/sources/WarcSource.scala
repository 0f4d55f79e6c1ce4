package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapreduce.lib.input.TextInputFormat
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One parsed WARC record (ISO 28500 layout: version line, named headers,
  * blank line, content block). For `response` records the HTTP envelope is
  * parsed off the payload: `httpStatus`/`httpContentType` come from the
  * HTTP head and `body` is the entity body alone. `truncated` flags a
  * record whose payload came back materially SHORTER than its declared
  * `Content-Length` — the signature of a false split (a payload that
  * itself contained the record delimiter byte sequence, e.g. a page
  * quoting raw WARC content), so intake filters can quarantine the
  * evidence instead of silently ingesting a cut-off document.
  */
case class WarcRecord(
    warcType: String,
    url: String,
    date: String,
    recordId: String,
    contentType: String,
    httpStatus: Int,
    httpContentType: String,
    body: String,
    truncated: Boolean)

/** Scalable WARC (web-archive / Common Crawl) reader — the crawl-side
  * twin of [[WikiXmlSource]]: same splittable record-delimiter design, so
  * an uncompressed WARC corpus parses with every HDFS block an
  * independent task and no shuffle anywhere in read→extract→curate.
  *
  * Records split on `CRLF CRLF "WARC/"` — the record terminator plus the
  * next record's version-line PREFIX, so WARC/1.0 and WARC/1.1 archives
  * (ISO 28500:2017 — what wget ≥ 1.20 emits) both split correctly, and a
  * payload line containing the bare string `WARC/…` mid-text does not
  * false-split (it would need the preceding blank line AND the
  * line-positioned version prefix — the [[WikiXmlSource]] `</page>`
  * assumption, strictly narrower here). The FIRST record of each file
  * keeps its whole version line and later chunks keep the version
  * remainder (`1.0`/`1.1`); [[parseRecord]] tolerates both shapes.
  *
  * Compression: real Common Crawl `.warc.gz` archives are per-record
  * gzip MEMBERS — [[recordsGz]] reads them at BLOCK parallelism through
  * [[WarcGzInputFormat]] (each task resynchronizes on a validated member
  * header and decompresses its split's members; no recode pass, no
  * one-task-per-file cliff). [[records]] also accepts `.gz` through the
  * Hadoop codec (one sequential task per file) for odd single-stream
  * gzip files that are NOT member-per-record.
  *
  * Text decode: payloads are decoded as UTF-8 text by the Hadoop line
  * reader (invalid bytes replaced) — the right trade for a TEXT pipeline;
  * binary payloads (images) should be routed by `httpContentType` to a
  * bytes-preserving ingest instead. `Content-Length` is deliberately not
  * used for FRAMING after decode (byte offsets shift); the delimiter
  * carries the record structure. The delimiter bound, stated honestly: a
  * payload that legitimately CONTAINS the `CRLF CRLF "WARC/"` byte
  * sequence (a page quoting raw WARC content, unusual binary payloads)
  * DOES false-split — the record's body is cut at that point and the
  * tail is dropped as a non-record chunk. [[parseRecord]] therefore
  * cross-checks the parsed payload against the record's declared
  * `Content-Length` and flags materially-short records `truncated`, so
  * the (rare) false splits surface as filterable evidence rather than
  * silent data loss; reference WARC readers frame by Content-Length and
  * pay for it with strictly sequential reads.
  */
object WarcSource {

  /** Read a WARC file/directory into parsed records. */
  def records(spark: SparkSession, path: String,
              maxSplitBytes: Long = 16L * 1024 * 1024): Dataset[WarcRecord] = {
    import spark.implicits._
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    conf.set("textinputformat.record.delimiter", "\r\n\r\nWARC/")
    conf.setLong("mapreduce.input.fileinputformat.split.maxsize", maxSplitBytes)
    spark.sparkContext
      .newAPIHadoopFile(path, classOf[TextInputFormat],
        classOf[LongWritable], classOf[Text], conf)
      .map(_._2.toString)
      .flatMap(parseRecord)
      .toDS()
  }

  /** Read a per-record-gzip-member `.warc.gz` (the Common Crawl layout)
    * at block parallelism: [[WarcGzInputFormat]] emits one decompressed
    * member per value — a complete record chunk starting `WARC/x.y` —
    * through the same [[parseRecord]] as the uncompressed path, so the
    * two row-equal on the same archive (spec-pinned). `maxSplitBytes`
    * bounds split size exactly like [[records]].
    */
  def recordsGz(spark: SparkSession, path: String,
                maxSplitBytes: Long = 16L * 1024 * 1024): Dataset[WarcRecord] = {
    import spark.implicits._
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    conf.setLong("mapreduce.input.fileinputformat.split.maxsize", maxSplitBytes)
    spark.sparkContext
      .newAPIHadoopFile(path, classOf[WarcGzInputFormat],
        classOf[LongWritable], classOf[Text], conf)
      .map(_._2.toString)
      // a member USUALLY holds one record (the CC layout), but some
      // writers pack several per member — split on the same delimiter as
      // the uncompressed path (later chunks carry the version remainder,
      // exactly the shape parseRecord already accepts)
      .flatMap(_.split("\r\n\r\nWARC/", -1).iterator)
      .flatMap(parseRecord)
      .toDS()
  }

  private val versionRemainder =
    java.util.regex.Pattern.compile("^\\d+\\.\\d+\r\n")

  /** Parse one delimiter-split chunk; None for non-record chunks. First
    * chunks carry a full `WARC/x.y` version line, later chunks the
    * remainder after the delimiter's `WARC/` prefix — both dropped.
    */
  def parseRecord(chunk: String): Option[WarcRecord] = {
    val rec0 =
      if (chunk.startsWith("WARC/")) {
        val nl = chunk.indexOf("\r\n")
        if (nl < 0) return None else chunk.substring(nl + 2)
      } else {
        val m = versionRemainder.matcher(chunk)
        if (m.find()) chunk.substring(m.end()) else chunk
      }
    if (rec0.trim.isEmpty) return None
    val headEnd = rec0.indexOf("\r\n\r\n")
    if (headEnd < 0) return None
    val headers = parseHeaders(rec0.substring(0, headEnd))
    val warcType = headers.getOrElse("warc-type", return None)
    val payload = stripTrailingCrlf(rec0.substring(headEnd + 4))
    // truncation evidence: a false split (payload containing the record
    // delimiter) leaves this chunk's payload materially shorter than the
    // record's declared Content-Length. UTF-8 replacement decode can only
    // GROW the re-encoded byte length (invalid byte → 3-byte U+FFFD) and
    // stripTrailingCrlf removes at most the record-terminator CRLFs, so a
    // small slack absorbs the decode ambiguity without masking real cuts.
    val declaredLen = headers.get("content-length")
      .flatMap(s => scala.util.Try(s.trim.toLong).toOption).getOrElse(-1L)
    val truncated = declaredLen > 0 && {
      val got = payload.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
      got + 8 < declaredLen
    }
    val (status, httpCt, body) =
      if (payload.startsWith("HTTP/")) parseHttp(payload)
      else (-1, null: String, payload)
    Some(WarcRecord(
      warcType = warcType,
      url = headers.getOrElse("warc-target-uri", null),
      date = headers.getOrElse("warc-date", null),
      recordId = headers.getOrElse("warc-record-id", null),
      contentType = headers.getOrElse("content-type", null),
      httpStatus = status,
      httpContentType = httpCt,
      body = body,
      truncated = truncated))
  }

  private def parseHeaders(head: String): Map[String, String] =
    head.split("\r\n").iterator.flatMap { line =>
      val i = line.indexOf(':')
      if (i <= 0) None
      else Some(line.substring(0, i).trim.toLowerCase -> line.substring(i + 1).trim)
    }.toMap

  private def stripTrailingCrlf(s: String): String = {
    var end = s.length
    while (end >= 2 && s.charAt(end - 2) == '\r' && s.charAt(end - 1) == '\n')
      end -= 2
    s.substring(0, end)
  }

  /** Split an HTTP response payload into (status, content-type, body). */
  private def parseHttp(payload: String): (Int, String, String) = {
    val headEnd = payload.indexOf("\r\n\r\n")
    val (head, body) =
      if (headEnd < 0) (payload, "")
      else (payload.substring(0, headEnd), payload.substring(headEnd + 4))
    val statusLine = head.takeWhile(c => c != '\r' && c != '\n')
    val status = statusLine.split(" ").lift(1)
      .flatMap(_.toIntOption).getOrElse(-1)
    val ct = parseHeaders(head).get("content-type").orNull
    (status, ct, body)
  }

  /** STREAMING twin of [[records]] — a WARC drop directory consumed as a
    * Structured Streaming file source (each landed `.warc` file becomes
    * micro-batch input): the text source's `lineSep` carries the same
    * record delimiter the batch reader uses, and the per-chunk parse is
    * identical, so streamed records ≡ batch records on the same files
    * (spec-pinned). Compressed drops read through the same codec path.
    */
  def recordsStream(spark: SparkSession, dir: String): Dataset[WarcRecord] = {
    import spark.implicits._
    spark.readStream.format("text")
      .option("lineSep", "\r\n\r\nWARC/")
      .load(dir)
      .as[String]
      .flatMap(parseRecord)
  }

  /** Streaming [[htmlDocuments]]: adds `ts` (the WARC-Date as an event
    * timestamp) so the result feeds watermark-bounded downstream state
    * (`EventStreams.curateDocs` and friends) directly.
    */
  def htmlDocumentsStream(spark: SparkSession, dir: String): DataFrame =
    recordsStream(spark, dir)
      .filter(r => r.warcType == "response" &&
        r.httpStatus >= 200 && r.httpStatus < 300 &&
        r.httpContentType != null &&
        r.httpContentType.toLowerCase.startsWith("text/html"))
      .toDF()
      .select(col("url"),
        to_timestamp(col("date")).as("ts"),
        graft.text.Html.htmlTitle(col("body")).as("title"),
        graft.text.Html.htmlToText(col("body")).as("text"),
        graft.text.Html.htmlNoindex(col("body")).as("noindex"))

  /** The per-host robots registry from the crawl's own robots.txt
    * captures (2xx responses whose path is exactly `/robots.txt`):
    * (host, robots_txt), ready for `Robots.filterAllowed`. One capture
    * per host is kept (smallest record id — deterministic under
    * re-crawls carrying duplicates).
    */
  def robotsByHost(spark: SparkSession, path: String,
                   maxSplitBytes: Long = 16L * 1024 * 1024,
                   gzMembers: Boolean = false): DataFrame = {
    val r = (if (gzMembers) recordsGz(spark, path, maxSplitBytes)
             else records(spark, path, maxSplitBytes))
      .filter(r => r.warcType == "response" &&
        r.httpStatus >= 200 && r.httpStatus < 300 && r.url != null)
      .toDF()
      .filter(graft.text.Robots.urlPath(col("url")) === "/robots.txt")
      .select(graft.text.Robots.urlHost(col("url")).as("host"),
        col("recordId"), col("body"))
    r.groupBy("host")
      .agg(min_by(col("body"), col("recordId")).as("robots_txt"))
  }

  /** The crawl intake head: successful HTML responses extracted to
    * (url, title, text) via the [[graft.text.Html]] chain — feed this
    * straight into `CorpusPipeline.curate` (with `TextOps.normalizeUrl`
    * for the URL identity tier). `gzMembers = true` routes the read
    * through the splittable [[recordsGz]] path for per-record-member
    * `.warc.gz` archives (the Common Crawl layout). `mainContentOnly`
    * swaps the body extraction for [[graft.text.Html.mainContent]]'s
    * link-density cut — nav/footer/link-farm chrome dropped at intake,
    * before any dedup tier pays for it.
    */
  def htmlDocuments(spark: SparkSession, path: String,
                    maxSplitBytes: Long = 16L * 1024 * 1024,
                    gzMembers: Boolean = false,
                    mainContentOnly: Boolean = false): DataFrame = {
    (if (gzMembers) recordsGz(spark, path, maxSplitBytes)
     else records(spark, path, maxSplitBytes))
      .filter(r => r.warcType == "response" &&
        r.httpStatus >= 200 && r.httpStatus < 300 &&
        r.httpContentType != null &&
        r.httpContentType.toLowerCase.startsWith("text/html"))
      .toDF()
      .select(col("url"),
        graft.text.Html.htmlTitle(col("body")).as("title"),
        (if (mainContentOnly) graft.text.Html.mainContent(col("body"))
         else graft.text.Html.htmlToText(col("body"))).as("text"),
        // evidence, not policy: the caller decides whether to honor it
        graft.text.Html.htmlNoindex(col("body")).as("noindex"))
  }
}
