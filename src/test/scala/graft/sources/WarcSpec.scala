package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** WARC source (L61): ISO 28500 record parsing, HTTP envelope split, the
  * gzip fallback path, and the htmlDocuments crawl-intake head.
  */
class WarcSpec extends SparkSpec {

  private val CRLF = "\r\n"

  private def record(headers: Seq[(String, String)], payload: String): String =
    "WARC/1.0" + CRLF +
      headers.map { case (k, v) => s"$k: $v" }.mkString(CRLF) +
      CRLF + CRLF + payload + CRLF + CRLF

  private def httpResponse(status: String, ct: String, body: String): String =
    s"HTTP/1.1 $status" + CRLF +
      s"Content-Type: $ct" + CRLF +
      "Server: test" + CRLF + CRLF + body

  private def sampleWarc: String = {
    val html = "<html><head><title>Page &amp; One</title></head>" +
      "<body><script>var s = \"WARC/1.0\";</script>" +
      "<p>hello crawl</p><p>second para</p></body></html>"
    record(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Date" -> "2026-08-14T00:00:00Z",
      "WARC-Record-ID" -> "<urn:uuid:info-1>",
      "Content-Type" -> "application/warc-fields"),
      "software: graft-test" + CRLF) +
      record(Seq(
        "WARC-Type" -> "request",
        "WARC-Target-URI" -> "http://example.com/a",
        "WARC-Record-ID" -> "<urn:uuid:req-1>",
        "Content-Type" -> "application/http;msgtype=request"),
        "GET /a HTTP/1.1" + CRLF + "Host: example.com" + CRLF) +
      record(Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> "http://example.com/a",
        "WARC-Date" -> "2026-08-14T00:00:01Z",
        "WARC-Record-ID" -> "<urn:uuid:resp-1>",
        "Content-Type" -> "application/http;msgtype=response"),
        httpResponse("200 OK", "text/html; charset=UTF-8", html)) +
      record(Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> "http://example.com/missing",
        "WARC-Record-ID" -> "<urn:uuid:resp-2>",
        "Content-Type" -> "application/http;msgtype=response"),
        httpResponse("404 Not Found", "text/html", "<p>nope</p>")) +
      record(Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> "http://example.com/robots.txt",
        "WARC-Record-ID" -> "<urn:uuid:resp-3>",
        "Content-Type" -> "application/http;msgtype=response"),
        httpResponse("200 OK", "text/plain", "User-agent: *"))
  }

  private def writeFile(name: String, bytes: Array[Byte]): String = {
    val dir = Files.createDirectories(Paths.get("target/tmp"))
    val p = dir.resolve(name)
    Files.write(p, bytes)
    p.toString
  }

  test("parses all record types with headers and HTTP envelopes split") {
    val p = writeFile("sample.warc", sampleWarc.getBytes("UTF-8"))
    val recs = WarcSource.records(spark, p).collect()
    assert(recs.length == 5)
    assert(recs.map(_.warcType).sorted.toSeq ==
      Seq("request", "response", "response", "response", "warcinfo"))

    val info = recs.find(_.warcType == "warcinfo").get
    assert(info.url == null && info.httpStatus == -1)
    assert(info.body == "software: graft-test")

    val ok = recs.find(_.recordId == "<urn:uuid:resp-1>").get
    assert(ok.url == "http://example.com/a")
    assert(ok.httpStatus == 200)
    assert(ok.httpContentType == "text/html; charset=UTF-8")
    assert(ok.body.startsWith("<html>") && ok.body.endsWith("</html>"))
    // the payload's embedded "WARC/1.0" string did NOT false-split
    assert(ok.body.contains("WARC/1.0"))

    val notFound = recs.find(_.recordId == "<urn:uuid:resp-2>").get
    assert(notFound.httpStatus == 404)

    val req = recs.find(_.warcType == "request").get
    assert(req.httpStatus == -1 && req.body.startsWith("GET /a"))
  }

  test("gzip WARC reads through the Hadoop codec (one task per file)") {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(sampleWarc.getBytes("UTF-8")); gz.close()
    val p = writeFile("sample.warc.gz", bos.toByteArray)
    val recs = WarcSource.records(spark, p).collect()
    assert(recs.length == 5)
    assert(recs.count(_.warcType == "response") == 3)
  }

  test("htmlDocuments keeps only 2xx text/html and extracts title + text") {
    val p = writeFile("sample2.warc", sampleWarc.getBytes("UTF-8"))
    val docs = WarcSource.htmlDocuments(spark, p).collect()
    assert(docs.length == 1)
    val d = docs.head
    assert(d.getString(0) == "http://example.com/a")
    assert(d.getString(1) == "Page & One")
    assert(d.getString(2) == "hello crawl\nsecond para")
  }

  test("garbage and truncated chunks yield no records, not failures") {
    val junk = "WARC/1.0" + CRLF + "no-colon-line" + CRLF + CRLF +
      "WARC-Type only half" + CRLF + CRLF + "WARC/1.0" + CRLF
    val p = writeFile("junk.warc", junk.getBytes("UTF-8"))
    assert(WarcSource.records(spark, p).collect().isEmpty)
  }
}
