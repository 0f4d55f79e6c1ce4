package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** VP8L (lossless WebP) decoder spec. The suite carries a minimal
  * test-side ENCODER producing conformant VP8L streams — literals with
  * full code-length-coded prefix trees (incl. 17/18 zero-run codes),
  * simple 1/2-symbol codes, color cache, LZ77 distance-1 runs, and each
  * transform (subtract-green, single-tile predictor, single-tile color
  * transform, palette with pixel bundling) — so every decoder path is
  * pinned by exact round-trips on deterministic noise images, and the
  * judge-level claim holds: the dHash of a VP8L twin equals the PNG
  * twin's.
  */
class Vp8lSpec extends AnyFunSuite {

  // ------------------------------------------------------------ images

  private def noise(seed: Long, w: Int, h: Int): PpmCodec.Image = {
    val rgb = new Array[Byte](w * h * 3)
    val rng = new scala.util.Random(seed)
    rng.nextBytes(rgb)
    PpmCodec.Image(w, h, rgb)
  }

  private def fewColors(w: Int, h: Int, colors: Seq[Int]): PpmCodec.Image = {
    val rgb = new Array[Byte](w * h * 3)
    for (i <- 0 until w * h) {
      val c = colors(((i * 7) ^ (i >> 3)) % colors.size)
      rgb(i * 3) = ((c >> 16) & 0xff).toByte
      rgb(i * 3 + 1) = ((c >> 8) & 0xff).toByte
      rgb(i * 3 + 2) = (c & 0xff).toByte
    }
    PpmCodec.Image(w, h, rgb)
  }

  private def argbOf(img: PpmCodec.Image): Array[Int] =
    Array.tabulate(img.width * img.height) { i =>
      0xff000000 | ((img.rgb(i * 3) & 0xff) << 16) |
        ((img.rgb(i * 3 + 1) & 0xff) << 8) | (img.rgb(i * 3 + 2) & 0xff)
    }

  // --------------------------------------------------------- bit writer

  private final class BW {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var n = 0
    def w(v: Int, bits: Int): Unit = {
      var i = 0
      while (i < bits) {
        cur |= ((v >> i) & 1) << n
        n += 1
        if (n == 8) { buf += cur.toByte; cur = 0; n = 0 }
        i += 1
      }
    }
    def wCodeMsb(code: Int, len: Int): Unit = {
      var d = len - 1
      while (d >= 0) { w((code >> d) & 1, 1); d -= 1 }
    }
    def bytes: Array[Byte] =
      (if (n > 0) buf :+ cur.toByte else buf).toArray
  }

  // ------------------------------------------- canonical huffman encode

  /** Complete equal-depth-ish code lengths for `syms` (the equal-weight
    * Huffman shape: k symbols at depth L, rest at L−1 — Kraft-exact).
    */
  private def equalLengths(nSyms: Int): (Int, Int) = {
    require(nSyms >= 2)
    var l = 1
    while ((1 << l) < nSyms) l += 1
    val atL = 2 * nSyms - (1 << l) // count at depth l; rest at l-1
    (l, atL)
  }

  private def canonicalCodes(lengths: Map[Int, Int]): Map[Int, (Int, Int)] = {
    val maxLen = lengths.values.max
    val blCount = new Array[Int](maxLen + 1)
    lengths.values.foreach(l => blCount(l) += 1)
    val nextCode = new Array[Int](maxLen + 1)
    var code = 0
    for (l <- 1 to maxLen) {
      code = (code + (if (l >= 2) blCount(l - 1) else 0)) << 1
      nextCode(l) = code
    }
    lengths.toSeq.sortBy { case (s, l) => (l, s) }.map { case (s, l) =>
      val c = nextCode(l)
      nextCode(l) += 1
      s -> (c, l)
    }.toMap
  }

  private val ClcOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Write one prefix code for `alphabet` symbols given the used-symbol
    * set; returns sym → (code, len) for the emission loop (empty length
    * means the zero-bit single-symbol code).
    */
  private def writeCode(bw: BW, alphabet: Int,
                        used: Seq[Int]): Map[Int, (Int, Int)] = {
    require(used.nonEmpty)
    if (used.size == 1 && used.head < 256) {
      bw.w(1, 1); bw.w(0, 1) // simple, one symbol
      bw.w(1, 1); bw.w(used.head, 8)
      Map(used.head -> (0, 0))
    } else if (used.size == 2 && used.forall(_ < 256)) {
      val Seq(s0, s1) = used.sorted.toSeq
      bw.w(1, 1); bw.w(1, 1) // simple, two symbols
      bw.w(1, 1); bw.w(s0, 8); bw.w(s1, 8)
      Map(s0 -> (0, 1), s1 -> (1, 1))
    } else {
      bw.w(0, 1) // code-length-coded
      val (l, atL) = equalLengths(used.size)
      val sorted = used.sorted
      val lens: Map[Int, Int] = sorted.zipWithIndex.map { case (s, i) =>
        s -> (if (i < used.size - atL) l - 1 else l)
      }.toMap
      // plan the lengths stream: literals + 17/18 zero runs
      sealed trait Tok
      case class Lit(len: Int) extends Tok
      case class Zeros(rep: Int) extends Tok
      val toks = scala.collection.mutable.ArrayBuffer.empty[Tok]
      var sym = 0
      while (sym < alphabet) {
        if (lens.contains(sym)) { toks += Lit(lens(sym)); sym += 1 }
        else {
          var run = 0
          while (sym + run < alphabet && !lens.contains(sym + run)) run += 1
          var left = run
          while (left >= 3) {
            val take = math.min(left, 138)
            toks += Zeros(take)
            left -= take
          }
          var i = 0
          while (i < left) { toks += Lit(0); i += 1 }
          sym += run
        }
      }
      val clcUsed = toks.flatMap {
        case Lit(v) => Seq(v)
        case Zeros(r) => Seq(if (r <= 10) 17 else 18)
      }.distinct.sorted
      val clcLens: Map[Int, Int] =
        if (clcUsed.size == 1) Map(clcUsed.head -> 1, (clcUsed.head + 1) % 19 -> 1)
        else {
          val (cl, cAtL) = equalLengths(clcUsed.size)
          clcUsed.zipWithIndex.map { case (s, i) =>
            s -> (if (i < clcUsed.size - cAtL) cl - 1 else cl)
          }.toMap
        }
      val clcCodes = canonicalCodes(clcLens)
      val numCl = math.max(4,
        clcLens.keys.map(s => ClcOrder.indexOf(s) + 1).max)
      bw.w(numCl - 4, 4)
      for (i <- 0 until numCl) bw.w(clcLens.getOrElse(ClcOrder(i), 0), 3)
      bw.w(0, 1) // no max-symbol shortcut
      toks.foreach {
        case Lit(v) =>
          val (c, cl) = clcCodes(v); bw.wCodeMsb(c, cl)
        case Zeros(r) =>
          if (r <= 10) {
            val (c, cl) = clcCodes(17); bw.wCodeMsb(c, cl); bw.w(r - 3, 3)
          } else {
            val (c, cl) = clcCodes(18); bw.wCodeMsb(c, cl); bw.w(r - 11, 7)
          }
      }
      canonicalCodes(lens)
    }
  }

  // ------------------------------------------------------ token streams

  private sealed trait Op
  private case class LitP(a: Int, r: Int, g: Int, b: Int) extends Op
  private case class Run(len: Int) extends Op // LZ77 distance 1
  private case class Hit(idx: Int) extends Op // color cache

  private def lengthPrefix(v: Int): (Int, Int, Int) = { // sym, extra, bits
    if (v <= 4) (v - 1, 0, 0)
    else {
      var sym = 4
      while (sym < 24) {
        val e = (sym - 2) >> 1
        val off = (2 + (sym & 1)) << e
        if (v >= off + 1 && v <= off + (1 << e)) return (sym, v - off - 1, e)
        sym += 1
      }
      sys.error(s"length $v out of range")
    }
  }

  private def ops(pix: Array[Int], cacheBits: Int,
                  lz77: Boolean): Seq[Op] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Op]
    val cache = new Array[Int](if (cacheBits > 0) 1 << cacheBits else 1)
    val seen = new Array[Boolean](cache.length)
    def key(p: Int) = (0x1e35a7bd * p) >>> (32 - cacheBits)
    var i = 0
    while (i < pix.length) {
      val p = pix(i)
      if (lz77 && i > 0 && pix(i - 1) == p) {
        var run = 0
        while (i + run < pix.length && pix(i + run) == p && run < 4096) run += 1
        out += Run(run)
        if (cacheBits > 0) { val k = key(p); cache(k) = p; seen(k) = true }
        i += run
      } else if (cacheBits > 0 && seen(key(p)) && cache(key(p)) == p) {
        out += Hit(key(p))
        i += 1
      } else {
        out += LitP(p >>> 24, (p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
        if (cacheBits > 0) { val k = key(p); cache(k) = p; seen(k) = true }
        i += 1
      }
    }
    out.toSeq
  }

  /** Entropy-code one ARGB image (no transforms here) into `bw`;
    * `metaBit` emits the level-0 no-meta-prefix flag, which sits AFTER
    * the cache header in the stream (auxiliary images have no such bit).
    */
  private def writeEntropy(bw: BW, pix: Array[Int], cacheBits: Int,
                           lz77: Boolean, metaBit: Boolean = false): Unit = {
    bw.w(if (cacheBits > 0) 1 else 0, 1)
    if (cacheBits > 0) bw.w(cacheBits, 4)
    if (metaBit) bw.w(0, 1) // level-0: no meta prefix image
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val stream = ops(pix, cacheBits, lz77)
    val greens = scala.collection.mutable.LinkedHashSet.empty[Int]
    val reds = scala.collection.mutable.LinkedHashSet.empty[Int]
    val blues = scala.collection.mutable.LinkedHashSet.empty[Int]
    val alphas = scala.collection.mutable.LinkedHashSet.empty[Int]
    var distUsed = false
    stream.foreach {
      case LitP(a, r, g, b) =>
        greens += g; reds += r; blues += b; alphas += a
      case Run(len) =>
        greens += 256 + lengthPrefix(len)._1; distUsed = true
      case Hit(idx) => greens += 280 + idx
    }
    if (reds.isEmpty) { reds += 0; blues += 0; alphas += 0xff }
    val gc = writeCode(bw, 256 + 24 + cacheSize, greens.toSeq)
    val rc = writeCode(bw, 256, reds.toSeq)
    val bc = writeCode(bw, 256, blues.toSeq)
    val ac = writeCode(bw, 256, alphas.toSeq)
    val dc = writeCode(bw, 40, Seq(if (distUsed) 1 else 0)) // plane code 2 → dist 1
    def emit(codes: Map[Int, (Int, Int)], sym: Int): Unit = {
      val (c, l) = codes(sym); bw.wCodeMsb(c, l)
    }
    stream.foreach {
      case LitP(a, r, g, b) =>
        emit(gc, g); emit(rc, r); emit(bc, b); emit(ac, a)
      case Run(len) =>
        val (sym, extra, ebits) = lengthPrefix(len)
        emit(gc, 256 + sym)
        if (ebits > 0) bw.w(extra, ebits)
        emit(dc, 1) // prefix value 2 → plane code 2 → (1,0) → dist 1
      case Hit(idx) => emit(gc, 280 + idx)
    }
  }

  // --------------------------------------------------------- the encoder

  private sealed trait Tf
  private case object TfNone extends Tf
  private case object TfSubGreen extends Tf
  private case class TfPredict(mode: Int) extends Tf
  private case class TfColor(g2r: Int, g2b: Int, r2b: Int) extends Tf
  private case object TfPalette extends Tf

  private def delta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5

  private def encodeVp8l(img: PpmCodec.Image, tf: Tf = TfNone,
                         cacheBits: Int = 0, lz77: Boolean = false): Array[Byte] = {
    val w = img.width
    val h = img.height
    val pix = argbOf(img)
    val bw = new BW
    bw.w(0x2f, 8)
    bw.w(w - 1, 14); bw.w(h - 1, 14)
    bw.w(0, 1); bw.w(0, 3)
    def sizeBitsFor(n: Int): Int = { // one tile covers the whole image
      var b = 2
      while ((1 << b) < n) b += 1
      require(b <= 9); b
    }
    // a 1×1 auxiliary image: zero-bit codes for every channel
    def writeOnePixelImage(p: Int): Unit = {
      bw.w(0, 1) // no cache
      writeCode(bw, 256 + 24, Seq((p >> 8) & 0xff))
      writeCode(bw, 256, Seq((p >> 16) & 0xff))
      writeCode(bw, 256, Seq(p & 0xff))
      writeCode(bw, 256, Seq(p >>> 24))
      writeCode(bw, 40, Seq(0))
    }
    val coded: Array[Int] = tf match {
      case TfNone =>
        bw.w(0, 1)
        pix
      case TfSubGreen =>
        bw.w(1, 1); bw.w(2, 2); bw.w(0, 1)
        pix.map { p =>
          val g = (p >> 8) & 0xff
          val r = (((p >> 16) & 0xff) - g) & 0xff
          val b = ((p & 0xff) - g) & 0xff
          (p & 0xff000000) | (r << 16) | (g << 8) | b
        }
      case TfPredict(mode) =>
        val bits = sizeBitsFor(math.max(w, h))
        bw.w(1, 1); bw.w(0, 2); bw.w(bits - 2, 3)
        writeOnePixelImage(0xff000000 | (mode << 8))
        bw.w(0, 1) // no more transforms
        val res = new Array[Int](pix.length)
        for (y <- 0 until h; x <- 0 until w) {
          val pos = y * w + x
          val pred =
            if (x == 0 && y == 0) 0xff000000
            else if (y == 0) pix(pos - 1)
            else if (x == 0) pix(pos - w)
            else {
              val l = pix(pos - 1); val t = pix(pos - w)
              val tr = pix(pos - w + 1); val tl = pix(pos - w - 1)
              mode match {
                case 1 => l
                case 2 => t
                case 11 => // Select
                  var pa = 0; var pb = 0; var sh = 0
                  while (sh < 32) {
                    val cl = (l >>> sh) & 0xff; val ct = (t >>> sh) & 0xff
                    val ctl = (tl >>> sh) & 0xff
                    val p = cl + ct - ctl
                    pa += math.abs(p - cl); pb += math.abs(p - ct); sh += 8
                  }
                  if (pa <= pb) l else t
                case _ => sys.error("unsupported test mode")
              }
            }
          var out = 0; var sh = 0
          while (sh < 32) {
            out |= ((((pix(pos) >>> sh) & 0xff) - ((pred >>> sh) & 0xff)) & 0xff) << sh
            sh += 8
          }
          res(pos) = out
        }
        res
      case TfColor(g2r, g2b, r2b) =>
        val bits = sizeBitsFor(math.max(w, h))
        bw.w(1, 1); bw.w(1, 2); bw.w(bits - 2, 3)
        writeOnePixelImage(0xff000000 | (r2b << 16) | (g2b << 8) | g2r)
        bw.w(0, 1)
        pix.map { p =>
          val g = (p >> 8) & 0xff
          val r0 = (p >> 16) & 0xff
          val b0 = p & 0xff
          val r = (r0 - delta(g2r, g)) & 0xff
          val b = (b0 - delta(g2b, g) - delta(r2b, r0)) & 0xff
          (p & 0xff000000) | (r << 16) | (g << 8) | b
        }
      case TfPalette =>
        val pal = pix.distinct
        require(pal.length <= 256)
        bw.w(1, 1); bw.w(3, 2); bw.w(pal.length - 1, 8)
        // palette rides as channel deltas
        val deltas = pal.zipWithIndex.map { case (p, i) =>
          if (i == 0) p
          else {
            var out = 0; var sh = 0
            while (sh < 32) {
              out |= ((((p >>> sh) & 0xff) - ((pal(i - 1) >>> sh) & 0xff)) & 0xff) << sh
              sh += 8
            }
            out
          }
        }
        writeEntropy(bw, deltas, cacheBits = 0, lz77 = false)
        bw.w(0, 1) // no more transforms
        val idxOf = pal.zipWithIndex.toMap
        val widthBits =
          if (pal.length <= 2) 3 else if (pal.length <= 4) 2
          else if (pal.length <= 16) 1 else 0
        if (widthBits == 0)
          pix.map(p => 0xff000000 | (idxOf(p) << 8))
        else {
          val perPixel = 8 >> widthBits
          val bundled = 1 << widthBits
          val pw = (w + bundled - 1) >> widthBits
          val out = new Array[Int](pw * h)
          for (y <- 0 until h; x <- 0 until w) {
            val slot = y * pw + (x >> widthBits)
            val sh = perPixel * (x & (bundled - 1))
            out(slot) |= idxOf(pix(y * w + x)) << sh
          }
          out.map(b => 0xff000000 | ((b & 0xff) << 8))
        }
    }
    writeEntropy(bw, coded, cacheBits, lz77, metaBit = true)
    val payload = bw.bytes
    riff(payload)
  }

  private def riff(vp8l: Array[Byte]): Array[Byte] = {
    val pad = vp8l.length % 2
    val total = 4 + 8 + vp8l.length + pad
    val out = java.nio.ByteBuffer.allocate(8 + total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes); out.putInt(total); out.put("WEBP".getBytes)
    out.put("VP8L".getBytes); out.putInt(vp8l.length); out.put(vp8l)
    if (pad == 1) out.put(0.toByte)
    out.array()
  }

  // --------------------------------------------------------------- tests

  private def roundTrip(img: PpmCodec.Image, tf: Tf = TfNone,
                        cacheBits: Int = 0, lz77: Boolean = false): Unit = {
    val bytes = encodeVp8l(img, tf, cacheBits, lz77)
    val got = Vp8lCodec.decode(bytes)
    assert(got.isDefined, s"decode failed for $tf cache=$cacheBits lz77=$lz77")
    assert(got.get.width == img.width && got.get.height == img.height)
    assert(java.util.Arrays.equals(got.get.rgb, img.rgb),
      s"pixels diverge for $tf cache=$cacheBits lz77=$lz77")
  }

  test("literal streams round-trip: full trees, simple codes, odd sizes") {
    roundTrip(noise(1, 17, 9)) // full code-length-coded trees
    roundTrip(fewColors(11, 5, Seq(0x102030, 0xfedcba))) // 2-sym simple
    roundTrip(noise(2, 1, 1))
    roundTrip(noise(3, 33, 1))
    roundTrip(noise(4, 1, 29))
  }

  test("color cache and LZ77 distance-1 runs round-trip") {
    // blocky image: long identical runs (LZ77) + recurring colors (cache)
    val img = fewColors(40, 13, Seq(0xaa0000, 0x00bb00, 0x0000cc, 0xdddddd))
    roundTrip(img, cacheBits = 4)
    roundTrip(img, lz77 = true)
    roundTrip(img, cacheBits = 3, lz77 = true)
    roundTrip(noise(5, 23, 7), cacheBits = 6, lz77 = true)
  }

  test("transforms invert exactly: subtract-green, predictors, color, palette") {
    roundTrip(noise(6, 19, 11), TfSubGreen)
    roundTrip(noise(7, 16, 8), TfPredict(1))
    roundTrip(noise(8, 16, 8), TfPredict(2))
    roundTrip(noise(9, 16, 8), TfPredict(11)) // Select
    roundTrip(noise(10, 14, 10), TfColor(23, -45 & 0xff, 112))
    roundTrip(fewColors(30, 9, Seq(0x111111, 0x222222, 0x333333)), TfPalette) // bundled ×4
    roundTrip(fewColors(21, 6, (0 until 11).map(i => i * 0x010203)), TfPalette) // bundled ×2
    roundTrip(fewColors(9, 9, (0 until 40).map(i => i * 0x050301)), TfPalette) // unbundled
  }

  test("dHash of a VP8L twin equals the PNG twin's through the image tier") {
    val img = noise(11, 40, 30)
    val png = ImageCodec.decode(ImageCodec.encodePng(img))
    val webp = ImageCodec.decode(encodeVp8l(img))
    assert(png.isDefined && webp.isDefined)
    assert(java.util.Arrays.equals(png.get.rgb, webp.get.rgb),
      "decoded pixels diverge between PNG and VP8L twins")
    // and at the perceptual level the judge's criterion verbatim
    assert(Multimodal.dhashOf(webp.get) ==
      Multimodal.dhashOf(png.get))
  }

  test("malformed and truncated webp bytes return None, never throw") {
    val good = encodeVp8l(noise(12, 12, 12))
    assert(Vp8lCodec.decode(null).isEmpty)
    assert(Vp8lCodec.decode(Array[Byte]()).isEmpty)
    assert(Vp8lCodec.decode("RIFFxxxxWEBP".getBytes).isEmpty)
    for (cut <- Seq(5, 13, 21, good.length / 2))
      assert(Vp8lCodec.decode(good.take(cut)).isEmpty, s"cut=$cut")
    Vp8lCodec.decode(good.dropRight(1)) // last byte may be padding: just no throw
    // flipped signature byte
    val bad = good.clone(); bad(20) = 0x11
    assert(Vp8lCodec.decode(bad).isEmpty)
  }

  /** Palette (with ×4 pixel bundling) followed by a predictor transform —
    * the legal combination libwebp's encoder never emits but the spec
    * allows: the predictor's tile sub-image must be sized from the
    * REDUCED (bundled) width. Chosen dims make the wrong sizing
    * detectable: pw = ceil(20/4) = 5 → 2 predictor tiles at bits=2,
    * where sizing from the original width would read 5 tiles and desync.
    */
  private def encodePaletteThenPredict(img: PpmCodec.Image): Array[Byte] = {
    val w = img.width; val h = img.height
    val pix = argbOf(img)
    val bw = new BW
    bw.w(0x2f, 8); bw.w(w - 1, 14); bw.w(h - 1, 14); bw.w(0, 1); bw.w(0, 3)
    // transform 1: palette, 3-4 colors → widthBits = 2 (4 px/byte)
    val pal = pix.distinct
    require(pal.length >= 3 && pal.length <= 4, s"palette ${pal.length}")
    bw.w(1, 1); bw.w(3, 2); bw.w(pal.length - 1, 8)
    val deltas = pal.zipWithIndex.map { case (p, i) =>
      if (i == 0) p
      else {
        var out = 0; var sh = 0
        while (sh < 32) {
          out |= ((((p >>> sh) & 0xff) - ((pal(i - 1) >>> sh) & 0xff)) & 0xff) << sh
          sh += 8
        }
        out
      }
    }
    writeEntropy(bw, deltas, cacheBits = 0, lz77 = false)
    val idxOf = pal.zipWithIndex.toMap
    val pw = (w + 3) >> 2
    val bund = new Array[Int](pw * h)
    for (y <- 0 until h; x <- 0 until w) {
      val slot = y * pw + (x >> 2)
      bund(slot) |= idxOf(pix(y * w + x)) << (2 * (x & 3))
    }
    val bundArgb = bund.map(b => 0xff000000 | ((b & 0xff) << 8))
    // transform 2: predictor over the BUNDLED image, 2 tiles across
    val bits = 2
    val tw = (pw + 3) >> 2; val th = (h + 3) >> 2
    require(tw >= 2, "need >=2 predictor tiles across the bundled width")
    bw.w(1, 1); bw.w(0, 2); bw.w(bits - 2, 3)
    writeEntropy(bw, Array.fill(tw * th)(0xff000000 | (1 << 8)),
      cacheBits = 0, lz77 = false) // all tiles mode 1 (L)
    bw.w(0, 1) // no more transforms
    val res = new Array[Int](bundArgb.length)
    for (y <- 0 until h; x <- 0 until pw) {
      val pos = y * pw + x
      val pred =
        if (x == 0 && y == 0) 0xff000000
        else if (y == 0) bundArgb(pos - 1)
        else if (x == 0) bundArgb(pos - pw)
        else bundArgb(pos - 1)
      var out = 0; var sh = 0
      while (sh < 32) {
        out |= ((((bundArgb(pos) >>> sh) & 0xff) - ((pred >>> sh) & 0xff)) & 0xff) << sh
        sh += 8
      }
      res(pos) = out
    }
    writeEntropy(bw, res, cacheBits = 0, lz77 = false, metaBit = true)
    riff(bw.bytes)
  }

  test("predictor after bundled palette sizes its tiles from the reduced width") {
    val img = fewColors(20, 4, Seq(0x112233, 0x445566, 0x778899))
    val got = Vp8lCodec.decode(encodePaletteThenPredict(img))
    assert(got.isDefined, "palette+predictor stream failed to decode")
    assert(got.get.width == 20 && got.get.height == 4)
    assert(java.util.Arrays.equals(got.get.rgb, img.rgb),
      "bundled-width predictor tiles decoded wrong pixels")
  }

  test("a bomb header claiming 16384x16384 is rejected before allocation") {
    val bw = new BW
    bw.w(0x2f, 8); bw.w(16383, 14); bw.w(16383, 14); bw.w(0, 1); bw.w(0, 3)
    bw.w(0, 1); bw.w(0, 1); bw.w(0, 1)
    assert(Vp8lCodec.decode(riff(bw.bytes)).isEmpty,
      "a ~30-byte header must not buy a gigabyte of pixel buffers")
  }

  test("the generated distance map matches the spec's published prefix") {
    // the table is private; pin it through a crafted two-row backref:
    // plane code 1 = (0,1) → distance = image width (copy from the row
    // above). 4×2 image: second row = LZ77 run with plane code 1.
    val bw = new BW
    bw.w(0x2f, 8); bw.w(3, 14); bw.w(1, 14); bw.w(0, 1); bw.w(0, 3)
    bw.w(0, 1) // no transforms
    bw.w(0, 1) // no cache
    bw.w(0, 1) // no meta
    val pix = Array(0xff102030, 0xff405060, 0xff708090, 0xffa0b0c0)
    val gc = writeCode(bw, 256 + 24, pix.map(p => (p >> 8) & 0xff).toSeq :+ (256 + 3))
    val rc = writeCode(bw, 256, pix.map(p => (p >> 16) & 0xff).toSeq)
    val bc = writeCode(bw, 256, pix.map(p => p & 0xff).toSeq)
    val ac = writeCode(bw, 256, Seq(0xff))
    val dc = writeCode(bw, 40, Seq(0)) // prefix value 1 → plane code 1
    def emit(codes: Map[Int, (Int, Int)], sym: Int): Unit = {
      val (c, l) = codes(sym); bw.wCodeMsb(c, l)
    }
    pix.foreach { p =>
      emit(gc, (p >> 8) & 0xff); emit(rc, (p >> 16) & 0xff)
      emit(bc, p & 0xff); emit(ac, 0xff)
    }
    emit(gc, 256 + 3) // length prefix sym 3 → length 4
    emit(dc, 0) // prefix value 1 → (0,1) → dist = width = 4
    val got = Vp8lCodec.decode(riff(bw.bytes))
    assert(got.isDefined, "plane-code-1 stream failed to decode")
    val exp = PpmCodec.Image(4, 2, (pix ++ pix).flatMap(p => Seq(
      ((p >> 16) & 0xff).toByte, ((p >> 8) & 0xff).toByte,
      (p & 0xff).toByte)).toArray)
    assert(java.util.Arrays.equals(got.get.rgb, exp.rgb),
      "plane code 1 did not copy the row above")
  }
}
