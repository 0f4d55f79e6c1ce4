package graft.multimodal

/** Pure-JVM decoder for LOSSLESS WebP (the VP8L bitstream, RFC 9649) —
  * closes the largest honest decode stub of the perceptual tier: a
  * VP8L-encoded image now lands in the same [[PpmCodec.Image]] every
  * other format does, so dHash near-dup and the media feature pass treat
  * `cwebp -lossless` output as a first-class citizen. Lossy WebP (VP8)
  * remains a stub: it needs a full DCT/bool-coder implementation whose
  * cost/benefit is documented in [[Multimodal]].
  *
  * Coverage is the COMPLETE lossless bitstream: LSB-first bit reading;
  * canonical prefix codes in both the simple (1–2 symbol) and
  * code-length-coded forms (incl. the max-symbol early-stop and 16/17/18
  * repeat codes); color cache; LZ77 backward references with the 120
  * two-dimensional distance plane-codes; meta-prefix tiling; and all
  * four transforms inverted in reverse read order — predictor (14
  * modes, libwebp's wrap-around top-right at the row edge), color
  * (signed 3.5 fixed-point deltas, blue after the updated red),
  * subtract-green, and color indexing with sub-byte pixel bundling.
  *
  * The distance map is GENERATED from the spec's own construction — the
  * 120 offsets are exactly {(x,0): 1≤x≤8} ∪ {(x,y): 1≤y≤7, −7≤x≤8}
  * ordered by (x²+y² asc, y desc, x desc) — and spec-pinned against the
  * published table's documented prefix.
  *
  * Any malformed, truncated, or non-VP8L input returns None — the
  * corpus-scale never-kill-the-job contract of every codec here. Alpha
  * is decoded but dropped at the packed-RGB boundary (the ImageIO
  * convention of [[ImageCodec]]).
  */
object Vp8lCodec {

  /** Decompression-bomb limit: a crafted ~30-byte header can claim
    * 16384×16384 (the format maximum) and would otherwise allocate ~1.8 GB
    * of pixel buffers before a single data byte is validated — on a
    * corpus-scale executor decoding untrusted crawl bytes that allocation
    * spike evicts caches even though the OOME itself is caught. 16M pixels
    * (4096×4096, ~64 MB ARGB) covers every real intake image; beyond it we
    * return None like any other undecodable blob.
    */
  private val MaxPixels: Long = 1L << 24

  def decode(bytes: Array[Byte]): Option[PpmCodec.Image] =
    try decodeImpl(bytes)
    catch { case _: Throwable => None }

  private def decodeImpl(b: Array[Byte]): Option[PpmCodec.Image] = {
    if (b == null || b.length < 21) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P')) return None
    // walk chunks for VP8L (a VP8X extended container may precede it)
    var off = 12
    while (off + 8 <= b.length) {
      val tag = new String(b, off, 4, "ISO-8859-1")
      val size = le32(b, off + 4)
      if (size < 0 || off + 8 + size > b.length) return None
      if (tag == "VP8L") return decodeStream(b, off + 8, size)
      off += 8 + size + (size & 1)
    }
    None
  }

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private def decodeStream(b: Array[Byte], start: Int,
                           len: Int): Option[PpmCodec.Image] = {
    val br = new BitReader(b, start, len)
    if (br.read(8) != 0x2f) return None
    val w = br.read(14) + 1
    val h = br.read(14) + 1
    if (w.toLong * h > MaxPixels) return None // bomb guard, pre-allocation
    br.read(1) // alpha hint
    if (br.read(3) != 0) return None // version
    val argb = decodeImageStream(w, h, level0 = true, br)
    val rgb = new Array[Byte]((w * h * 3).toInt)
    var i = 0
    while (i < w * h) {
      val p = argb(i)
      rgb(i * 3) = ((p >> 16) & 0xff).toByte
      rgb(i * 3 + 1) = ((p >> 8) & 0xff).toByte
      rgb(i * 3 + 2) = (p & 0xff).toByte
      i += 1
    }
    Some(PpmCodec.Image(w, h, rgb))
  }

  // ---------------------------------------------------------------- bits

  private final class BitReader(b: Array[Byte], start: Int, len: Int) {
    private var pos = start
    private var bit = 0
    private val end = start + len
    def readBit(): Int = {
      if (pos >= end) throw new IllegalStateException("vp8l: eof")
      val v = (b(pos) >> bit) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= readBit() << i; i += 1 }
      v
    }
  }

  // ------------------------------------------------------------- huffman

  /** Prefix-code decoder as a binary trie; codes walk MSB-first (the
    * DEFLATE canonical convention VP8L shares). `single >= 0` is the
    * zero-bit one-symbol code.
    */
  private final class HuffTree {
    private var nodes = new Array[Int](2) // node i: children at 2i, 2i+1
    private var nNodes = 1
    java.util.Arrays.fill(nodes, 0)
    var single: Int = -1

    private def ensure(n: Int): Unit =
      if (n * 2 > nodes.length) nodes = java.util.Arrays.copyOf(nodes, n * 4)

    def insert(sym: Int, code: Int, len: Int): Unit = {
      var node = 0
      var d = len - 1
      while (d >= 0) {
        val b = (code >> d) & 1
        val slot = node * 2 + b
        if (d == 0) {
          require(nodes(slot) == 0, "vp8l: duplicate code")
          nodes(slot) = -(sym + 1)
        } else {
          if (nodes(slot) == 0) {
            ensure(nNodes + 1)
            nodes(slot) = nNodes
            nodes(nNodes * 2) = 0
            nodes(nNodes * 2 + 1) = 0
            nNodes += 1
          }
          require(nodes(slot) > 0, "vp8l: code under a leaf")
          node = nodes(slot)
        }
        d -= 1
      }
    }

    def read(br: BitReader): Int = {
      if (single >= 0) return single
      var node = 0
      while (true) {
        val nxt = nodes(node * 2 + br.readBit())
        if (nxt < 0) return -nxt - 1
        require(nxt != 0, "vp8l: invalid code")
        node = nxt
      }
      -1
    }
  }

  /** Canonical tree from code lengths (DEFLATE assignment: sorted by
    * (length, symbol), next_code doubling). A single used symbol is a
    * zero-bit code; an incomplete multi-symbol code surfaces as an
    * invalid-code failure at read time.
    */
  private def treeFromLengths(lengths: Array[Int]): HuffTree = {
    val t = new HuffTree
    var used = 0
    var lone = -1
    var maxLen = 0
    var i = 0
    while (i < lengths.length) {
      if (lengths(i) > 0) { used += 1; lone = i; maxLen = math.max(maxLen, lengths(i)) }
      i += 1
    }
    require(used > 0, "vp8l: empty code")
    if (used == 1) { t.single = lone; return t }
    require(maxLen <= 15, "vp8l: code length > 15")
    val blCount = new Array[Int](maxLen + 1)
    i = 0
    while (i < lengths.length) { if (lengths(i) > 0) blCount(lengths(i)) += 1; i += 1 }
    val nextCode = new Array[Int](maxLen + 1)
    var code = 0
    var l = 1
    while (l <= maxLen) {
      code = (code + blCount(l - 1)) << 1
      nextCode(l) = code
      l += 1
    }
    i = 0
    while (i < lengths.length) {
      val ln = lengths(i)
      if (ln > 0) { t.insert(i, nextCode(ln), ln); nextCode(ln) += 1 }
      i += 1
    }
    t
  }

  private val ClcOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  private def readHuffmanCode(alphabetSize: Int, br: BitReader): HuffTree = {
    if (br.read(1) == 1) { // simple code: 1 or 2 symbols, stream order kept
      val t = new HuffTree
      val numSym = br.read(1) + 1
      val first8 = br.read(1) == 1
      val s0 = br.read(if (first8) 8 else 1)
      require(s0 < alphabetSize, "vp8l: simple symbol out of range")
      if (numSym == 1) t.single = s0
      else {
        val s1 = br.read(8)
        require(s1 < alphabetSize, "vp8l: simple symbol out of range")
        t.insert(s0, 0, 1)
        t.insert(s1, 1, 1)
      }
      t
    } else {
      val numCl = 4 + br.read(4)
      val clLens = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLens(ClcOrder(i)) = br.read(3); i += 1 }
      val clTree = treeFromLengths(clLens)
      val lengths = new Array[Int](alphabetSize)
      var budget =
        if (br.read(1) == 1) {
          val nbits = 2 + 2 * br.read(3)
          2 + br.read(nbits)
        } else alphabetSize
      var sym = 0
      var prev = 8
      while (sym < alphabetSize && budget > 0) {
        budget -= 1
        val cl = clTree.read(br)
        if (cl < 16) {
          lengths(sym) = cl
          sym += 1
          if (cl != 0) prev = cl
        } else {
          val (rep, v) = cl match {
            case 16 => (3 + br.read(2), prev)
            case 17 => (3 + br.read(3), 0)
            case _  => (11 + br.read(7), 0)
          }
          var r = 0
          while (r < rep && sym < alphabetSize) { lengths(sym) = v; sym += 1; r += 1 }
        }
      }
      treeFromLengths(lengths)
    }
  }

  // -------------------------------------------------------------- stream

  private def subSize(n: Int, bits: Int): Int = (n + (1 << bits) - 1) >> bits

  private sealed trait Transform
  private case object SubtractGreen extends Transform
  private final case class Predictor(bits: Int, data: Array[Int]) extends Transform
  private final case class ColorTx(bits: Int, data: Array[Int]) extends Transform
  private final case class ColorIndex(widthBits: Int, palette: Array[Int]) extends Transform

  /** The 120 LZ77 distance plane-codes, generated from the spec's
    * construction (see the object scaladoc).
    */
  private val DistMap: Array[(Int, Int)] = {
    val pairs = for {
      y <- 0 to 7
      x <- -7 to 8
      if !(y == 0 && x <= 0)
    } yield (x, y)
    pairs.sortBy { case (x, y) => (x * x + y * y, -y, -x) }.toArray
  }

  private def prefixValue(sym: Int, br: BitReader): Int =
    if (sym < 4) sym + 1
    else {
      val extra = (sym - 2) >> 1
      val offset = (2 + (sym & 1)) << extra
      offset + br.read(extra) + 1
    }

  private def decodeImageStream(width: Int, height: Int, level0: Boolean,
                                br: BitReader): Array[Int] = {
    var w = width
    // head of the list = LAST transform read = FIRST to invert
    var transforms = List.empty[Transform]
    if (level0) {
      var seen = Set.empty[Int]
      while (br.read(1) == 1) {
        val t = br.read(2)
        require(!seen(t), "vp8l: duplicate transform")
        seen += t
        t match {
          case 2 => transforms ::= SubtractGreen
          case 0 | 1 =>
            val bits = br.read(3) + 2
            // sub-image dims use the CURRENT effective width: if a
            // color-indexing transform with pixel bundling was read
            // earlier in the stream, libwebp sizes later transforms from
            // the reduced (bundled) width — matching the inversion side,
            // which strides by subSize(curW, bits)
            val img = decodeImageStream(subSize(w, bits),
              subSize(height, bits), level0 = false, br)
            transforms ::= (if (t == 0) Predictor(bits, img)
            else ColorTx(bits, img))
          case _ =>
            val n = br.read(8) + 1
            val pal = decodeImageStream(n, 1, level0 = false, br)
            var i = 1
            while (i < n) { pal(i) = addPixels(pal(i), pal(i - 1)); i += 1 }
            val widthBits =
              if (n <= 2) 3 else if (n <= 4) 2 else if (n <= 16) 1 else 0
            transforms ::= ColorIndex(widthBits, pal)
            if (widthBits > 0) w = subSize(width, widthBits)
        }
      }
    }
    val cacheBits = if (br.read(1) == 1) br.read(4) else 0
    require(cacheBits <= 11, "vp8l: cache bits")
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    var metaBits = 0
    var metaImg: Array[Int] = null
    var numGroups = 1
    if (level0 && br.read(1) == 1) {
      metaBits = br.read(3) + 2
      metaImg = decodeImageStream(subSize(w, metaBits),
        subSize(height, metaBits), level0 = false, br)
      var mx = 0
      var i = 0
      while (i < metaImg.length) {
        mx = math.max(mx, (metaImg(i) >> 8) & 0xffff); i += 1
      }
      numGroups = mx + 1
    }
    val metaW = if (metaImg != null) subSize(w, metaBits) else 0
    val groups = Array.fill(numGroups)(Array(
      readHuffmanCode(256 + 24 + cacheSize, br),
      readHuffmanCode(256, br),
      readHuffmanCode(256, br),
      readHuffmanCode(256, br),
      readHuffmanCode(40, br)))
    val cache = new Array[Int](math.max(cacheSize, 1))
    val n = w * height
    val out = new Array[Int](n)
    var pos = 0
    def insertCache(p: Int): Unit =
      if (cacheBits > 0) cache((0x1e35a7bd * p) >>> (32 - cacheBits)) = p
    while (pos < n) {
      val g =
        if (metaImg == null) groups(0)
        else {
          val x = pos % w
          val y = pos / w
          val mi = metaImg((y >> metaBits) * metaW + (x >> metaBits))
          groups((mi >> 8) & 0xffff)
        }
      val s = g(0).read(br)
      if (s < 256) {
        val red = g(1).read(br)
        val blue = g(2).read(br)
        val alpha = g(3).read(br)
        val p = (alpha << 24) | (red << 16) | (s << 8) | blue
        out(pos) = p
        insertCache(p)
        pos += 1
      } else if (s < 280) {
        val length = prefixValue(s - 256, br)
        val distCode = prefixValue(g(4).read(br), br)
        val dist =
          if (distCode > 120) distCode - 120
          else {
            val (dx, dy) = DistMap(distCode - 1)
            math.max(1, dy * w + dx)
          }
        require(dist <= pos && pos + length <= n, "vp8l: bad backref")
        var i = 0
        while (i < length) {
          val p = out(pos - dist)
          out(pos) = p
          insertCache(p)
          pos += 1
          i += 1
        }
      } else {
        val idx = s - 280
        require(idx < cacheSize, "vp8l: cache index")
        out(pos) = cache(idx)
        pos += 1
      }
    }
    var img = out
    var curW = w
    transforms.foreach { t =>
      val (nimg, nw) = invert(t, img, curW, height, width)
      img = nimg
      curW = nw
    }
    img
  }

  // ---------------------------------------------------------- transforms

  private def addPixels(a: Int, b: Int): Int = {
    val al = ((a >>> 24) + (b >>> 24)) & 0xff
    val r = (((a >> 16) & 0xff) + ((b >> 16) & 0xff)) & 0xff
    val g = (((a >> 8) & 0xff) + ((b >> 8) & 0xff)) & 0xff
    val bl = ((a & 0xff) + (b & 0xff)) & 0xff
    (al << 24) | (r << 16) | (g << 8) | bl
  }

  private def invert(t: Transform, img: Array[Int], w: Int, h: Int,
                     fullW: Int): (Array[Int], Int) = t match {
    case SubtractGreen =>
      var i = 0
      while (i < img.length) {
        val p = img(i)
        val g = (p >> 8) & 0xff
        val r = (((p >> 16) & 0xff) + g) & 0xff
        val b = ((p & 0xff) + g) & 0xff
        img(i) = (p & 0xff000000) | (r << 16) | (g << 8) | b
        i += 1
      }
      (img, w)
    case ColorTx(bits, data) =>
      val tw = subSize(w, bits)
      var pos = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val cte = data((y >> bits) * tw + (x >> bits))
          val g2r = (cte & 0xff).toByte
          val g2b = ((cte >> 8) & 0xff).toByte
          val r2b = ((cte >> 16) & 0xff).toByte
          val p = img(pos)
          val g = (p >> 8) & 0xff
          var r = (p >> 16) & 0xff
          var b = p & 0xff
          r = (r + ((g2r * g.toByte) >> 5)) & 0xff
          b = (b + ((g2b * g.toByte) >> 5)) & 0xff
          b = (b + ((r2b * r.toByte) >> 5)) & 0xff
          img(pos) = (p & 0xff000000) | (r << 16) | (g << 8) | b
          pos += 1
          x += 1
        }
        y += 1
      }
      (img, w)
    case Predictor(bits, data) =>
      val tw = subSize(w, bits)
      var pos = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val pred =
            if (x == 0 && y == 0) 0xff000000
            else if (y == 0) img(pos - 1) // mode 1 (L) on the first row
            else if (x == 0) img(pos - w) // mode 2 (T) on the first column
            else {
              val mode = (data((y >> bits) * tw + (x >> bits)) >> 8) & 0xff
              predict(mode, img(pos - 1), img(pos - w),
                img(pos - w + 1), img(pos - w - 1))
            }
          img(pos) = addPixels(img(pos), pred)
          pos += 1
          x += 1
        }
        y += 1
      }
      (img, w)
    case ColorIndex(widthBits, pal) =>
      def look(idx: Int): Int = if (idx < pal.length) pal(idx) else 0
      if (widthBits == 0) {
        var i = 0
        while (i < img.length) { img(i) = look((img(i) >> 8) & 0xff); i += 1 }
        (img, w)
      } else {
        val out = new Array[Int](fullW * h)
        val perPixel = 8 >> widthBits
        val mask = (1 << perPixel) - 1
        val bundled = 1 << widthBits
        var y = 0
        while (y < h) {
          var x = 0
          while (x < fullW) {
            val packed = (img(y * w + (x >> widthBits)) >> 8) & 0xff
            val idx = (packed >> (perPixel * (x & (bundled - 1)))) & mask
            out(y * fullW + x) = look(idx)
            x += 1
          }
          y += 1
        }
        (out, fullW)
      }
  }

  private def predict(mode: Int, l: Int, t: Int, tr: Int, tl: Int): Int =
    mode match {
      case 0  => 0xff000000
      case 1  => l
      case 2  => t
      case 3  => tr
      case 4  => tl
      case 5  => avg2(avg2(l, tr), t)
      case 6  => avg2(l, tl)
      case 7  => avg2(l, t)
      case 8  => avg2(tl, t)
      case 9  => avg2(t, tr)
      case 10 => avg2(avg2(l, tl), avg2(t, tr))
      case 11 => select(l, t, tl)
      case 12 => clampAddSubFull(l, t, tl)
      case 13 => clampAddSubHalf(avg2(l, t), tl)
      case _  => throw new IllegalStateException(s"vp8l: predictor $mode")
    }

  private def avg2(a: Int, b: Int): Int = {
    val al = (((a >>> 24) + (b >>> 24)) / 2) & 0xff
    val r = ((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) / 2) & 0xff
    val g = ((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) / 2) & 0xff
    val bl = (((a & 0xff) + (b & 0xff)) / 2) & 0xff
    (al << 24) | (r << 16) | (g << 8) | bl
  }

  private def select(l: Int, t: Int, tl: Int): Int = {
    var pa = 0
    var pb = 0
    var sh = 0
    while (sh < 32) {
      val cl = (l >>> sh) & 0xff
      val ct = (t >>> sh) & 0xff
      val ctl = (tl >>> sh) & 0xff
      val p = cl + ct - ctl
      pa += math.abs(p - cl)
      pb += math.abs(p - ct)
      sh += 8
    }
    if (pa <= pb) l else t
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def clampAddSubFull(l: Int, t: Int, tl: Int): Int = {
    var out = 0
    var sh = 0
    while (sh < 32) {
      val c = clamp255(((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) -
        ((tl >>> sh) & 0xff))
      out |= c << sh
      sh += 8
    }
    out
  }

  private def clampAddSubHalf(ave: Int, tl: Int): Int = {
    var out = 0
    var sh = 0
    while (sh < 32) {
      val a = (ave >>> sh) & 0xff
      val c = clamp255(a + (a - ((tl >>> sh) & 0xff)) / 2)
      out |= c << sh
      sh += 8
    }
    out
  }
}
