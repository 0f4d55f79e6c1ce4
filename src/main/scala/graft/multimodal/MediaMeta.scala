package graft.multimodal

/** Pure-JVM container-METADATA probing for media blobs: mime, pixel
  * dimensions, and duration straight from the container headers, with no
  * pixel/sample decode — the curation-filter half of multimodal intake
  * (drop tiny images, cap video length, bucket by resolution) for every
  * mainstream container, including the ones the JRE ships no decoder for
  * (WebP, MP3, OGG, MP4 — lossless WebP pixels now decode for real via
  * [[Vp8lCodec]]; lossy WebP/MP3/OGG/MP4 PIXEL/PCM decode remains a
  * documented stub in [[ImageCodec]]/[[AudioCodec]], but their headers
  * are plain public byte layouts and parse fine).
  *
  * Parsers are defensive by construction: every read is bounds-checked,
  * anything malformed yields None — a corrupt blob produces null
  * metadata columns, never a task failure (the decode tiers' contract).
  *
  * Formats: PNG (IHDR), GIF (logical screen + GCE delay sum), BMP
  * (BITMAPINFOHEADER), JPEG (SOF scan), WebP (VP8 / VP8L / VP8X), WAV /
  * AIFF / AU (javax.sound header), MP3 (MPEG audio frame walk, ID3v2
  * skip, exact per-frame sample count), OGG (Vorbis/Opus id header +
  * terminal granule position), MP4/ISO-BMFF (mvhd + tkhd box walk).
  */
object MediaMeta {

  /** Probed header metadata; fields the container does not carry stay
    * None (e.g. audio has no width, stills have no duration).
    */
  final case class Meta(mime: String, width: Option[Int], height: Option[Int],
                        durationMs: Option[Long])

  /** Sniff the container by magic bytes and parse its header. */
  def probe(bytes: Array[Byte]): Option[Meta] = {
    if (bytes == null || bytes.length < 12) return None
    try {
      if (bytes(0) == 'P' && bytes(1) >= '4' && bytes(1) <= '6') netpbm(bytes)
      else if (has(bytes, 0, 0x89, 'P', 'N', 'G')) png(bytes)
      else if (has(bytes, 0, 'G', 'I', 'F', '8')) gif(bytes)
      else if (has(bytes, 0, 'B', 'M')) bmp(bytes)
      else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) jpeg(bytes)
      else if (has(bytes, 0, 'R', 'I', 'F', 'F') && has(bytes, 8, 'W', 'E', 'B', 'P'))
        webp(bytes)
      else if (has(bytes, 0, 'R', 'I', 'F', 'F') && has(bytes, 8, 'W', 'A', 'V', 'E'))
        javaSound(bytes, "audio/wav")
      else if (has(bytes, 0, 'F', 'O', 'R', 'M')) javaSound(bytes, "audio/aiff")
      else if (has(bytes, 0, '.', 's', 'n', 'd')) javaSound(bytes, "audio/basic")
      else if (has(bytes, 0, 'O', 'g', 'g', 'S')) ogg(bytes)
      else if (bytes.length >= 12 && has(bytes, 4, 'f', 't', 'y', 'p')) mp4(bytes)
      else if (has(bytes, 0, 'I', 'D', '3') ||
        ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xe0) == 0xe0)) mp3(bytes)
      else None
    } catch { case _: Exception => None }
  }

  private def has(b: Array[Byte], off: Int, cs: Int*): Boolean =
    b.length >= off + cs.length &&
      cs.zipWithIndex.forall { case (c, i) => (b(off + i) & 0xff) == (c & 0xff) }

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)
  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def le32(b: Array[Byte], o: Int): Long =
    ((b(o + 3) & 0xffL) << 24) | ((b(o + 2) & 0xffL) << 16) |
      ((b(o + 1) & 0xffL) << 8) | (b(o) & 0xffL)
  private def le16(b: Array[Byte], o: Int): Int =
    ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)

  // Binary netpbm (P4/P5/P6 — [[PpmCodec]]'s family): ASCII dims after
  // the magic, '#' comments and whitespace skipped, exactly the codec's
  // own header walk. Mime matches what [[Multimodal.resize]] stamps.
  private def netpbm(b: Array[Byte]): Option[Meta] = {
    var pos = 2
    def readInt(): Int = {
      var done = false
      while (!done && pos < b.length) {
        val c = b(pos)
        if (c == '#') { while (pos < b.length && b(pos) != '\n') pos += 1 }
        else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') pos += 1
        else done = true
      }
      var v = -1
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
        if (v < 0) v = 0
        v = v * 10 + (b(pos) - '0'); pos += 1
      }
      v
    }
    val w = readInt(); val h = readInt()
    val mime = b(1) match {
      case '6' => "image/x-portable-pixmap"
      case '5' => "image/x-portable-graymap"
      case _ => "image/x-portable-bitmap"
    }
    if (w > 0 && h > 0) Some(Meta(mime, Some(w), Some(h), None)) else None
  }

  // PNG: 8-byte signature, IHDR is always the first chunk — width and
  // height are the big-endian ints right after its type tag.
  private def png(b: Array[Byte]): Option[Meta] =
    if (b.length >= 24 && has(b, 12, 'I', 'H', 'D', 'R'))
      Some(Meta("image/png", Some(be32(b, 16).toInt), Some(be32(b, 20).toInt), None))
    else None

  // GIF: logical screen descriptor at 6 (LE shorts); duration = sum of
  // Graphic Control Extension delays (centiseconds) over a block walk —
  // a still GIF (no delays) carries no duration.
  private def gif(b: Array[Byte]): Option[Meta] = {
    val w = le16(b, 6); val h = le16(b, 8)
    var delays = 0L
    var saw = false
    var p = 13 + (if ((b(10) & 0x80) != 0) 3 * (2 << (b(10) & 7)) else 0)
    while (p < b.length - 1) {
      (b(p) & 0xff) match {
        case 0x21 => // extension: label, then sub-blocks
          if ((b(p + 1) & 0xff) == 0xf9 && p + 5 < b.length) {
            delays += le16(b, p + 4) * 10L; saw = true
          }
          p += 2
          while (p < b.length && (b(p) & 0xff) != 0) p += 1 + (b(p) & 0xff)
          p += 1
        case 0x2c => // image descriptor: header, optional LCT, LZW data
          if (p + 10 > b.length) return Some(gifMeta(w, h, delays, saw))
          val lct = if ((b(p + 9) & 0x80) != 0) 3 * (2 << (b(p + 9) & 7)) else 0
          p += 10 + lct + 1 // + LZW min code size
          while (p < b.length && (b(p) & 0xff) != 0) p += 1 + (b(p) & 0xff)
          p += 1
        case 0x3b => p = b.length // trailer
        case _ => p = b.length // malformed: keep what we have
      }
    }
    Some(gifMeta(w, h, delays, saw))
  }
  private def gifMeta(w: Int, h: Int, delays: Long, animated: Boolean) =
    Meta("image/gif", Some(w), Some(h), if (animated) Some(delays) else None)

  // BMP: BITMAPINFOHEADER at offset 14 (LE ints; height may be negative
  // for top-down rows — dimensions are magnitudes).
  private def bmp(b: Array[Byte]): Option[Meta] =
    if (b.length >= 26)
      Some(Meta("image/bmp", Some(le32(b, 18).toInt.abs), Some(le32(b, 22).toInt.abs), None))
    else None

  // JPEG: marker walk to the first SOF0/1/2 frame header (height then
  // width, big-endian, after the 1-byte precision). 0xFF fill bytes are
  // legal padding before any marker (ISO 10918 B.1.1.2) and skip singly;
  // TEM/RST/SOI/EOI are bare markers with no length field.
  private def jpeg(b: Array[Byte]): Option[Meta] = {
    var p = 2
    while (p + 4 <= b.length && (b(p) & 0xff) == 0xff) {
      val m = b(p + 1) & 0xff
      if (m == 0xc0 || m == 0xc1 || m == 0xc2) {
        if (p + 9 > b.length) return None
        return Some(Meta("image/jpeg", Some(be16(b, p + 7)), Some(be16(b, p + 5)), None))
      }
      if (m == 0xff) p += 1 // fill byte
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd9)) p += 2 // bare markers
      else p += 2 + be16(b, p + 2)
    }
    None
  }

  // WebP: RIFF wrapper, first chunk at 12 decides the flavor.
  //  VP8X (extended): 24-bit LE canvas minus-one dims at +8/+11.
  //  VP8L (lossless): signature byte 0x2f, then 14+14 bits of w-1/h-1.
  //  VP8  (lossy): frame tag, then 0x9d012a sync + LE14 dims.
  private def webp(b: Array[Byte]): Option[Meta] = {
    if (b.length < 16) return None
    val tag = new String(b, 12, 4, "ISO-8859-1")
    tag match {
      case "VP8X" if b.length >= 30 =>
        val w = 1 + (((b(24) & 0xff)) | ((b(25) & 0xff) << 8) | ((b(26) & 0xff) << 16))
        val h = 1 + (((b(27) & 0xff)) | ((b(28) & 0xff) << 8) | ((b(29) & 0xff) << 16))
        Some(Meta("image/webp", Some(w), Some(h), None))
      case "VP8L" if b.length >= 25 && (b(20) & 0xff) == 0x2f =>
        val bits = le32(b, 21)
        val w = 1 + (bits & 0x3fff).toInt
        val h = 1 + ((bits >> 14) & 0x3fff).toInt
        Some(Meta("image/webp", Some(w), Some(h), None))
      case "VP8 " if b.length >= 30 && (b(23) & 0xff) == 0x9d &&
          (b(24) & 0xff) == 0x01 && (b(25) & 0xff) == 0x2a =>
        Some(Meta("image/webp", Some(le16(b, 26) & 0x3fff), Some(le16(b, 28) & 0x3fff), None))
      case _ => None
    }
  }

  // WAV/AIFF/AU: the JRE's own header parser (no PCM read) — frame count
  // over frame rate is the exact duration.
  private def javaSound(b: Array[Byte], mime: String): Option[Meta] = {
    val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(b))
    val frames = aff.getFrameLength
    val rate = aff.getFormat.getFrameRate
    val dur = if (frames > 0 && rate > 0) Some((frames * 1000.0 / rate).toLong) else None
    Some(Meta(mime, None, None, dur))
  }

  // MPEG-1/2 Layer I-III bitrate (kbps) and sample-rate tables — public
  // ISO 11172-3 constants. Row: [version index][layer index][bitrate idx].
  private val Mp3Bitrates: Array[Array[Array[Int]]] = Array(
    // MPEG2/2.5: layer I, layer II/III share a row
    Array(
      Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
      Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)),
    // MPEG1: layer I, II, III
    Array(
      Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
      Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
      Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)))
  private val Mp3Rates = Array(44100, 48000, 32000) // MPEG1; /2 for MPEG2, /4 for 2.5

  // MP3: skip ID3v2 (syncsafe size), then walk every frame header,
  // summing exact per-frame samples / sample rate. CBR and VBR both come
  // out right because every frame is visited (content-bounded).
  private def mp3(b: Array[Byte]): Option[Meta] = {
    var p = 0
    if (has(b, 0, 'I', 'D', '3') && b.length > 10)
      p = 10 + (((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f))
    var durUs = 0.0
    var frames = 0
    while (p + 4 <= b.length) {
      if ((b(p) & 0xff) == 0xff && (b(p + 1) & 0xe0) == 0xe0) {
        val verBits = (b(p + 1) >> 3) & 3   // 0=2.5, 2=MPEG2, 3=MPEG1
        val layerBits = (b(p + 1) >> 1) & 3 // 1=III, 2=II, 3=I
        val brIdx = (b(p + 2) >> 4) & 0xf
        val srIdx = (b(p + 2) >> 2) & 3
        if (verBits == 1 || layerBits == 0 || brIdx == 0 || brIdx == 15 || srIdx == 3)
          return done(frames, durUs)
        val mpeg1 = verBits == 3
        val layer = 4 - layerBits // 1, 2, 3
        val brRow = if (mpeg1) Mp3Bitrates(1)(layer - 1)
          else Mp3Bitrates(0)(if (layer == 1) 0 else 1)
        val bitrate = brRow(brIdx) * 1000
        val rate = Mp3Rates(srIdx) / (if (mpeg1) 1 else if (verBits == 2) 2 else 4)
        val pad = (b(p + 2) >> 1) & 1
        val (samples, frameLen) =
          if (layer == 1) (384, (12 * bitrate / rate + pad) * 4)
          else if (layer == 2) (1152, 144 * bitrate / rate + pad)
          else {
            val s = if (mpeg1) 1152 else 576
            (s, s / 8 * bitrate / rate + pad)
          }
        if (frameLen <= 0) return done(frames, durUs)
        durUs += samples * 1000000.0 / rate
        frames += 1
        p += frameLen
      } else if (frames > 0) return done(frames, durUs)
      else p += 1 // resync before the first frame only
    }
    done(frames, durUs)
  }
  private def done(frames: Int, durUs: Double): Option[Meta] =
    if (frames == 0) None
    else Some(Meta("audio/mpeg", None, None, Some((durUs / 1000.0).round)))

  // OGG: sample rate from the FIRST page's id header (Vorbis: LE32 at
  // +12; Opus: granules are 48 kHz by spec), duration from the LAST
  // page's granule position (scan backward for the final "OggS").
  private def ogg(b: Array[Byte]): Option[Meta] = {
    val segs = b(26) & 0xff
    val body = 27 + segs
    if (b.length < body + 16) return None
    val (mime, rate) =
      if (has(b, body, 0x01, 'v', 'o', 'r', 'b', 'i', 's') && b.length >= body + 16)
        ("audio/ogg", le32(b, body + 12).toInt)
      else if (has(b, body, 'O', 'p', 'u', 's', 'H', 'e', 'a', 'd'))
        ("audio/opus", 48000)
      else return None
    // Backward scan for the terminal page header. Ogg payloads are not
    // escaped, so a raw "OggS" can occur inside compressed audio — each
    // candidate must LOOK like a page header (version 0, no reserved
    // type bits, segment table and body fitting inside the blob) or the
    // scan keeps going; a page-structure walk with CRC checks would be a
    // demuxer, not a header probe.
    def plausiblePage(q: Int): Boolean =
      has(b, q, 'O', 'g', 'g', 'S') && (b(q + 4) & 0xff) == 0 &&
        (b(q + 5) & 0xf8) == 0 && q + 27 <= b.length && {
          val nseg = b(q + 26) & 0xff
          var body = 0
          var i = 0
          while (i < nseg && q + 27 + i < b.length) { body += b(q + 27 + i) & 0xff; i += 1 }
          i == nseg && q + 27 + nseg + body <= b.length
        }
    var p = b.length - 27
    while (p >= 0 && !plausiblePage(p)) p -= 1
    if (p < 0 || rate <= 0) return Some(Meta(mime, None, None, None))
    val granule = le32(b, p + 6) | (le32(b, p + 10) << 32)
    Some(Meta(mime, None, None, Some(granule * 1000 / rate)))
  }

  // MP4/ISO-BMFF: walk top-level boxes to moov; inside, mvhd carries
  // timescale+duration (v0 32-bit, v1 64-bit) and the first video trak's
  // tkhd carries 16.16-fixed width/height.
  private def mp4(b: Array[Byte]): Option[Meta] = {
    var dur: Option[Long] = None
    var w: Option[Int] = None
    var h: Option[Int] = None
    def walk(from: Long, to: Long, depth: Int): Unit = {
      var p = from
      while (p + 8 <= to) {
        var size = be32(b, p.toInt)
        val tag = new String(b, p.toInt + 4, 4, "ISO-8859-1")
        var hdr = 8L
        if (size == 1 && p + 16 <= to) { size = be64(b, p.toInt + 8); hdr = 16 }
        else if (size == 0) size = to - p
        if (size < hdr || p + size > to) return
        tag match {
          case "moov" | "trak" if depth < 3 => walk(p + hdr, p + size, depth + 1)
          case "mvhd" if p + hdr + 20 <= to =>
            // v1: 64-bit times — timescale at +20, duration (8 bytes) at
            // +24..31; v0: timescale at +12, duration (4 bytes) at +16. A
            // truncated v1 box yields NO duration — never the v0 offsets,
            // which would read the creation-time bytes as a duration.
            val v = b((p + hdr).toInt) & 0xff
            if (v == 1) {
              if (p + hdr + 32 <= to) {
                val ts = be32(b, (p + hdr + 20).toInt)
                if (ts > 0) dur = Some(be64(b, (p + hdr + 24).toInt) * 1000 / ts)
              }
            } else {
              val ts = be32(b, (p + hdr + 12).toInt)
              if (ts > 0) dur = Some(be32(b, (p + hdr + 16).toInt) * 1000 / ts)
            }
          case "tkhd" if w.isEmpty =>
            val v = b((p + hdr).toInt) & 0xff
            val off = p + hdr + (if (v == 1) 88 else 76)
            if (off + 8 <= to) {
              val tw = (be32(b, off.toInt) >> 16).toInt
              val th = (be32(b, off.toInt + 4) >> 16).toInt
              if (tw > 0 && th > 0) { w = Some(tw); h = Some(th) }
            }
          case _ => ()
        }
        p += size
      }
    }
    walk(0, b.length.toLong, 0)
    if (dur.isEmpty && w.isEmpty) None
    else Some(Meta("video/mp4", w, h, dur))
  }
}
