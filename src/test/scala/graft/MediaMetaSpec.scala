package graft

import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}

import graft.multimodal.{ImageCodec, MediaMeta, Multimodal, PpmCodec}

/** Container-metadata probing: every parser is fed a REAL instance of its
  * format — JRE-writable containers come from the platform encoders, the
  * reader-less ones (WebP, MP3, OGG, MP4) are byte-crafted to their
  * public layouts — and corrupt bytes must yield None, never a throw.
  */
class MediaMetaSpec extends SparkSpec {
  import spark.implicits._

  private def img(w: Int, h: Int): PpmCodec.Image =
    PpmCodec.Image(w, h, Array.tabulate(w * h * 3)(i => (i * 31 % 251).toByte))

  private def viaImageIO(fmt: String, w: Int, h: Int): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) bi.setRGB(x, y, (x * 31 + y) % 0xffffff)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(bi, fmt, bos)
    bos.toByteArray
  }

  test("png/gif/bmp/jpeg dimensions parse from real encoder output") {
    val png = MediaMeta.probe(ImageCodec.encodePng(img(17, 9))).get
    assert(png.mime == "image/png" && png.width.contains(17) && png.height.contains(9))
    for ((fmt, mime) <- Seq(("gif", "image/gif"), ("bmp", "image/bmp"),
        ("jpg", "image/jpeg"))) {
      val m = MediaMeta.probe(viaImageIO(fmt, 33, 21)).get
      assert(m.mime == mime && m.width.contains(33) && m.height.contains(21),
        s"$fmt: $m")
    }
  }

  test("animated gif duration sums the frame delays; a still gif has none") {
    // Crafted GIF89a with explicit GCE delays (centiseconds): the parser
    // must sum them exactly. (ImageIO's sequence writer emits no GCE on
    // this JRE, so delays are byte-crafted to the public block layout.)
    def le(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def frame(delayCs: Int): Array[Byte] =
      Array[Byte](0x21, 0xf9.toByte, 4, 0) ++ le(delayCs) ++ Array[Byte](0, 0) ++
        Array[Byte](0x2c) ++ le(0) ++ le(0) ++ le(5) ++ le(4) ++ Array[Byte](0) ++
        Array[Byte](2, 1, 0x44, 0) // LZW min code size + 1 data block + term
    val anim = "GIF89a".getBytes("ISO-8859-1") ++ le(5) ++ le(4) ++
      Array[Byte](0, 0, 0) ++ frame(10) ++ frame(25) ++ Array[Byte](0x3b)
    val m = MediaMeta.probe(anim).get
    assert(m.width.contains(5) && m.height.contains(4))
    assert(m.durationMs.contains(350L), s"animated: $m")
    val still = MediaMeta.probe(viaImageIO("gif", 5, 4)).get
    assert(still.durationMs.forall(_ == 0L), s"still: $still")
  }

  test("webp dimensions parse from crafted VP8L and VP8X headers") {
    // VP8L: 0x2f signature then 14-bit (w-1) | 14-bit (h-1) little-endian
    def vp8l(w: Int, h: Int): Array[Byte] = {
      val bits = ((w - 1) & 0x3fff).toLong | (((h - 1) & 0x3fff).toLong << 14)
      val head = "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++ "WEBP".getBytes ++
        "VP8L".getBytes ++ Array[Byte](5, 0, 0, 0) ++ Array(0x2f.toByte) ++
        Array.tabulate(4)(i => ((bits >> (8 * i)) & 0xff).toByte) ++
        Array[Byte](0)
      head
    }
    val l = MediaMeta.probe(vp8l(320, 240)).get
    assert(l.mime == "image/webp" && l.width.contains(320) && l.height.contains(240))
    // VP8X: 24-bit little-endian canvas-minus-one at +24/+27
    def vp8x(w: Int, h: Int): Array[Byte] =
      "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++ "WEBP".getBytes ++
        "VP8X".getBytes ++ Array[Byte](10, 0, 0, 0) ++
        Array[Byte](0, 0, 0, 0) ++
        Array.tabulate(3)(i => (((w - 1) >> (8 * i)) & 0xff).toByte) ++
        Array.tabulate(3)(i => (((h - 1) >> (8 * i)) & 0xff).toByte)
    val x = MediaMeta.probe(vp8x(1920, 1080)).get
    assert(x.width.contains(1920) && x.height.contains(1080))
  }

  test("netpbm dimensions parse from the codec's own encoder output") {
    val m = MediaMeta.probe(PpmCodec.encode(img(17, 9))).get
    assert(m.mime == "image/x-portable-pixmap" &&
      m.width.contains(17) && m.height.contains(9), s"$m")
    // a comment between the magic and the dims must be skipped
    val commented = "P6\n# a comment\n5 4\n255\n".getBytes("US-ASCII") ++
      new Array[Byte](5 * 4 * 3)
    val c = MediaMeta.probe(commented).get
    assert(c.width.contains(5) && c.height.contains(4), s"$c")
    // a header with no digits yields None, not garbage
    assert(MediaMeta.probe("P6\nxx yy\n255\n".getBytes("US-ASCII") ++
      new Array[Byte](32)).isEmpty)
  }

  test("wav duration comes from the JRE header parser") {
    val rate = 8000f
    val n = 4000 // half a second
    val pcm = Array.tabulate(n * 2)(i =>
      (if (i % 2 == 0) (math.sin(i * 0.1) * 8000).toInt & 0xff
       else ((math.sin(i * 0.1) * 8000).toInt >> 8) & 0xff).toByte)
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val m = MediaMeta.probe(bos.toByteArray).get
    assert(m.mime == "audio/wav" && m.durationMs.contains(500L), s"$m")
  }

  test("mp3 duration walks crafted CBR frames exactly") {
    // MPEG1 Layer III, 128 kbps, 44100 Hz: header FF FB 90 00, frame
    // length 144*128000/44100 = 417 bytes, 1152 samples per frame
    val frame = Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte, 0) ++
      new Array[Byte](413)
    val ten = Array.fill(10)(frame).flatten
    val m = MediaMeta.probe(ten).get
    val want = (10 * 1152 * 1000.0 / 44100).round
    assert(m.mime == "audio/mpeg" && m.durationMs.contains(want), s"$m want=$want")
    // an ID3v2 tag in front must be skipped (syncsafe size = 100)
    val id3 = "ID3".getBytes ++ Array[Byte](4, 0, 0, 0, 0, 0, 100) ++
      new Array[Byte](100)
    assert(MediaMeta.probe(id3 ++ ten).get.durationMs.contains(want))
  }

  test("ogg duration derives from the terminal granule position") {
    def page(typ: Int, granule: Long, body: Array[Byte]): Array[Byte] =
      "OggS".getBytes ++ Array[Byte](0, typ.toByte) ++
        Array.tabulate(8)(i => ((granule >> (8 * i)) & 0xff).toByte) ++
        new Array[Byte](4 + 4 + 4) ++ // serial, seq, crc (unchecked)
        Array[Byte](1, body.length.toByte) ++ body
    // OpusHead: version 1, 1 channel, pre-skip 0, rate 48000 (granules
    // are 48 kHz by spec regardless)
    val opusHead = "OpusHead".getBytes ++ Array[Byte](1, 1, 0, 0) ++
      Array.tabulate(4)(i => ((48000 >> (8 * i)) & 0xff).toByte) ++
      Array[Byte](0, 0, 0)
    val blob = page(2, 0L, opusHead) ++ page(4, 96000L, Array[Byte](0))
    val m = MediaMeta.probe(blob).get
    assert(m.mime == "audio/opus" && m.durationMs.contains(2000L), s"$m")
  }

  test("mp4 duration and track dimensions parse from a crafted moov") {
    def box(tag: String, content: Array[Byte]): Array[Byte] =
      Array.tabulate(4)(i => (((content.length + 8) >> (8 * (3 - i))) & 0xff).toByte) ++
        tag.getBytes ++ content
    def be(v: Long): Array[Byte] =
      Array.tabulate(4)(i => ((v >> (8 * (3 - i))) & 0xff).toByte)
    val mvhd = box("mvhd", new Array[Byte](12) ++ be(1000) ++ be(5000) ++
      new Array[Byte](80))
    val tkhd = box("tkhd", new Array[Byte](76) ++ be(640L << 16) ++ be(360L << 16))
    val blob = box("ftyp", "isom".getBytes ++ new Array[Byte](4)) ++
      box("moov", mvhd ++ box("trak", tkhd))
    val m = MediaMeta.probe(blob).get
    assert(m.mime == "video/mp4" && m.durationMs.contains(5000L) &&
      m.width.contains(640) && m.height.contains(360), s"$m")
  }

  test("jpeg marker walk skips legal 0xFF fill bytes before a marker") {
    // SOI, one fill byte, then SOF0 (ISO 10918 B.1.1.2 allows any number
    // of 0xFF padding bytes before a marker — a length-jump there
    // desynchronizes the walk into entropy data)
    val b = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte,
      0xff.toByte, 0xc0.toByte, 0, 17, 8, 0, 21, 0, 33)
    val m = MediaMeta.probe(b).get
    assert(m.mime == "image/jpeg" && m.width.contains(33) && m.height.contains(21), s"$m")
  }

  test("mp4 v1 mvhd parses 64-bit duration; a truncated v1 box yields none") {
    def box(tag: String, content: Array[Byte]): Array[Byte] =
      Array.tabulate(4)(i => (((content.length + 8) >> (8 * (3 - i))) & 0xff).toByte) ++
        tag.getBytes ++ content
    def be(v: Long, n: Int): Array[Byte] =
      Array.tabulate(n)(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte)
    // v1 layout: ver(1)+flags(3), ctime(8), mtime(8), timescale(4), duration(8)
    val v1 = box("mvhd", Array[Byte](1, 0, 0, 0) ++ be(0, 8) ++ be(0, 8) ++
      be(1000, 4) ++ be(7500, 8) ++ new Array[Byte](76))
    val full = box("ftyp", "isom".getBytes ++ new Array[Byte](4)) ++ box("moov", v1)
    assert(MediaMeta.probe(full).get.durationMs.contains(7500L))
    // truncated right after the timescale: must NOT fall back to v0
    // offsets (which would read the creation-time bytes as a duration)
    val cut = box("mvhd", Array[Byte](1, 0, 0, 0) ++ be(0, 8) ++ be(0, 8) ++
      be(1000, 4))
    assert(MediaMeta.probe(
      box("ftyp", "isom".getBytes ++ new Array[Byte](4)) ++ box("moov", cut)).isEmpty)
  }

  test("ogg backward scan rejects a false 'OggS' sync inside the last page body") {
    def page(typ: Int, granule: Long, body: Array[Byte]): Array[Byte] =
      "OggS".getBytes ++ Array[Byte](0, typ.toByte) ++
        Array.tabulate(8)(i => ((granule >> (8 * i)) & 0xff).toByte) ++
        new Array[Byte](4 + 4 + 4) ++
        Array[Byte](1, body.length.toByte) ++ body
    val opusHead = "OpusHead".getBytes ++ Array[Byte](1, 1, 0, 0) ++
      Array.tabulate(4)(i => ((48000 >> (8 * i)) & 0xff).toByte) ++
      Array[Byte](0, 0, 0)
    // terminal page's payload contains raw "OggS" bytes followed by junk
    // that cannot be a page header (version 0xFF) — the scan must skip it
    // and land on the real terminal header
    val body = "OggS".getBytes ++ Array.fill(40)(0xff.toByte)
    val m = MediaMeta.probe(page(2, 0L, opusHead) ++ page(4, 96000L, body)).get
    assert(m.mime == "audio/opus" && m.durationMs.contains(2000L), s"$m")
  }

  test("corrupt and truncated blobs yield None, never a throw") {
    val cases = Seq[Array[Byte]](
      null, Array[Byte](1, 2, 3), new Array[Byte](64),
      "RIFF????WEBPJUNK".getBytes ++ new Array[Byte](20),
      "OggS".getBytes ++ new Array[Byte](40), // no recognizable id header
      Array.fill(16)(0xff.toByte), // mp3 sync but bad bitrate index (15)
      ImageCodec.encodePng(img(4, 4)).take(20)) // truncated IHDR
    for (c <- cases) assert(MediaMeta.probe(c).isEmpty,
      s"expected None for ${if (c == null) "null" else c.length + " bytes"}")
  }

  test("probeMetadata fills the media schema and degrades per-row") {
    val rows = Seq(
      (1L, ImageCodec.encodePng(img(17, 9))),
      (2L, Array[Byte](9, 9, 9, 9)),
      (3L, null.asInstanceOf[Array[Byte]]))
    val out = Multimodal.probeMetadata(
        Multimodal.asMedia(rows.toDF("id", "payload"), "id", "payload", "x/seed"))
      .select("media_id", "mime", "width", "height", "duration_ms")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[String](1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out(1L) == (("image/png", Some(17), Some(9))))
    // unrecognized content keeps the caller's mime, null dimensions
    assert(out(2L) == (("x/seed", None, None)))
    assert(out(3L) == (("x/seed", None, None)))
    assert(out.size == 3)
  }
}
