package graft.multimodal

/** Pure-JVM codec for the binary netpbm family — PPM (P6, RGB), PGM (P5,
  * grayscale), and PBM (P4, bitmap) — the uncompressed formats let the
  * multimodal pipeline run REAL decode/feature/resize work in this
  * environment (no native image libraries). Compressed formats (JPEG/PNG/
  * video) remain behind the deterministic stub in [[Multimodal]].
  */
object PpmCodec {

  /** Decoded raster: width, height, packed RGB bytes (3 per pixel).
    * Grayscale/bitmap sources are expanded to RGB on decode so every
    * downstream op (resize, grid features) is format-agnostic.
    */
  final case class Image(width: Int, height: Int, rgb: Array[Byte])

  /** Parse a binary netpbm image — P6 (maxval 255), P5 (maxval 255), or
    * P4. Returns None on any malformed input — at pipeline scale a corrupt
    * blob must never kill the job.
    */
  def decode(bytes: Array[Byte]): Option[Image] = {
    try {
      if (bytes == null || bytes.length < 8 || bytes(0) != 'P') return None
      val kind = bytes(1)
      if (kind != '6' && kind != '5' && kind != '4') return None
      var pos = 2
      def skipWs(): Unit = {
        var done = false
        while (!done && pos < bytes.length) {
          val c = bytes(pos)
          if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
          else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') pos += 1
          else done = true
        }
      }
      def readInt(): Int = {
        skipWs()
        var v = 0
        while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
          v = v * 10 + (bytes(pos) - '0'); pos += 1
        }
        v
      }
      val w = readInt(); val h = readInt()
      val maxval = if (kind == '4') 1 else readInt()
      pos += 1 // single whitespace before the raster
      if (w <= 0 || h <= 0 || (kind != '4' && maxval != 255)) return None
      kind match {
        case '6' =>
          val n = w * h * 3
          if (bytes.length - pos < n) return None
          Some(Image(w, h, java.util.Arrays.copyOfRange(bytes, pos, pos + n)))
        case '5' =>
          val n = w * h
          if (bytes.length - pos < n) return None
          val rgb = new Array[Byte](n * 3)
          var i = 0
          while (i < n) {
            val g = bytes(pos + i)
            rgb(i * 3) = g; rgb(i * 3 + 1) = g; rgb(i * 3 + 2) = g
            i += 1
          }
          Some(Image(w, h, rgb))
        case _ => // P4: 1 bit/pixel, rows padded to byte boundary; 1 = black
          val rowBytes = (w + 7) / 8
          if (bytes.length - pos < rowBytes * h) return None
          val rgb = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val bit = (bytes(pos + y * rowBytes + (x >> 3)) >> (7 - (x & 7))) & 1
              val v: Byte = if (bit == 1) 0 else -1 // 0xFF = white
              val di = (y * w + x) * 3
              rgb(di) = v; rgb(di + 1) = v; rgb(di + 2) = v
              x += 1
            }
            y += 1
          }
          Some(Image(w, h, rgb))
      }
    } catch { case _: Exception => None }
  }

  /** Encode a raster back to P6. */
  def encode(img: Image): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  /** Nearest-neighbor resize. */
  def resize(img: Image, w: Int, h: Int): Image = {
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val sy = (y.toLong * img.height / h).toInt
      var x = 0
      while (x < w) {
        val sx = (x.toLong * img.width / w).toInt
        val si = (sy * img.width + sx) * 3
        val di = (y * w + x) * 3
        out(di) = img.rgb(si); out(di + 1) = img.rgb(si + 1); out(di + 2) = img.rgb(si + 2)
        x += 1
      }
      y += 1
    }
    Image(w, h, out)
  }

  /** Feature vector: mean R/G/B over a `grid`×`grid` spatial partition
    * (grid²×3 floats in [0,1]) — the classic cheap visual embedding.
    */
  def features(img: Image, grid: Int = 2): Array[Float] = {
    val sums = new Array[Double](grid * grid * 3)
    val counts = new Array[Int](grid * grid)
    var y = 0
    while (y < img.height) {
      val gy = math.min(y * grid / img.height, grid - 1)
      var x = 0
      while (x < img.width) {
        val gx = math.min(x * grid / img.width, grid - 1)
        val cell = gy * grid + gx
        val si = (y * img.width + x) * 3
        sums(cell * 3) += (img.rgb(si) & 0xFF)
        sums(cell * 3 + 1) += (img.rgb(si + 1) & 0xFF)
        sums(cell * 3 + 2) += (img.rgb(si + 2) & 0xFF)
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    val out = new Array[Float](grid * grid * 3)
    var c = 0
    while (c < grid * grid) {
      val n = math.max(counts(c), 1)
      out(c * 3) = (sums(c * 3) / n / 255.0).toFloat
      out(c * 3 + 1) = (sums(c * 3 + 1) / n / 255.0).toFloat
      out(c * 3 + 2) = (sums(c * 3 + 2) / n / 255.0).toFloat
      c += 1
    }
    out
  }
}
