package graft.multimodal

/** Unified still-image decode: the pure-JVM netpbm parser first (cheapest,
  * no framework), then the JDK's `javax.imageio.ImageIO` for the
  * compressed formats every JRE ships readers for — PNG, BMP, GIF, JPEG,
  * WBMP, TIFF (JDK 9+). ImageIO decodes fully headless with zero native
  * dependencies; LOSSLESS WebP decodes through the pure-JVM
  * [[Vp8lCodec]], so "compressed formats need external libraries" is
  * only true past this set (lossy WebP/VP8, AVIF, video — those remain
  * stubbed in [[Multimodal]]).
  *
  * Everything lands in [[PpmCodec.Image]] (packed RGB), keeping every
  * downstream op (resize, grid features) format-agnostic. Any malformed
  * or unsupported input returns None — at pipeline scale a corrupt blob
  * must never kill the job.
  *
  * Headless note: this class sets `java.awt.headless=true` on first load
  * UNLESS the embedder already chose a value — and the property is a
  * no-op once AWT has initialized, so an embedder that touches AWT before
  * the first decode must configure headless mode itself (executor JVMs in
  * practice never do; the guard is for exotic driver embeddings).
  */
object ImageCodec {

  // decoding never needs a display, but be explicit so a misconfigured
  // driver JVM can't try to initialize one; respect an embedder's explicit
  // choice (see the headless note above)
  if (System.getProperty("java.awt.headless") == null)
    System.setProperty("java.awt.headless", "true")

  def decode(bytes: Array[Byte]): Option[PpmCodec.Image] =
    PpmCodec.decode(bytes)
      .orElse(Vp8lCodec.decode(bytes)) // lossless WebP, pure JVM
      .orElse(imageIoDecode(bytes))

  private def imageIoDecode(bytes: Array[Byte]): Option[PpmCodec.Image] = {
    if (bytes == null || bytes.length == 0) None
    else try {
      // getRGB in fromBuffered converts any color model to sRGB
      fromBuffered(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    } catch { case _: Throwable => None }
  }

  /** Decode the individual frames of a MULTI-FRAME image (animated GIF —
    * and multi-page TIFF on JDK 9+) through the same ImageIO readers:
    * returns the frame count and a by-index decoder, so a sampler can
    * read only the frames it needs instead of materializing the whole
    * animation. Frames decode independently (no GIF disposal-method
    * compositing — each frame is what its image descriptor carries),
    * which is the cheap deterministic contract a frame-sampling feature
    * pass wants. None when no reader claims the format or it carries no
    * frames.
    */
  def frames(bytes: Array[Byte]): Option[(Int, Int => Option[PpmCodec.Image])] = {
    if (bytes == null || bytes.length == 0) return None
    // count frames with properly-released resources: a mapPartitions pass
    // over many corrupt blobs must not accumulate undisposed readers and
    // MemoryCacheImageInputStreams until GC
    withReader(bytes) { reader =>
      val n = reader.getNumImages(true)
      if (n <= 0) None
      else {
        // decode on demand: re-open per call (the byte array is the source
        // of truth; readers are not serializable and must not leak into
        // closures that outlive this call)
        def frameAt(i: Int): Option[PpmCodec.Image] =
          if (i < 0 || i >= n) None
          else withReader(bytes)(r => fromBuffered(r.read(i)))
        Some((n, frameAt))
      }
    }
  }

  // Open an ImageReader over the bytes, run `f`, and ALWAYS dispose the
  // reader and close the stream — exceptions (corrupt input, mid-decode
  // failures) map to None.
  private def withReader[A](bytes: Array[Byte])(
      f: javax.imageio.ImageReader => Option[A]): Option[A] = {
    var iis: javax.imageio.stream.ImageInputStream = null
    var reader: javax.imageio.ImageReader = null
    try {
      iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        reader = readers.next()
        reader.setInput(iis)
        f(reader)
      }
    } catch { case _: Throwable => None }
    finally {
      if (reader != null) try reader.dispose() catch { case _: Throwable => }
      if (iis != null) try iis.close() catch { case _: Throwable => }
    }
  }

  private def fromBuffered(img: java.awt.image.BufferedImage): Option[PpmCodec.Image] = {
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    if (w <= 0 || h <= 0) return None
    val rgb = new Array[Byte](w * h * 3)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val p = row(x)
        val di = (y * w + x) * 3
        rgb(di) = ((p >> 16) & 0xFF).toByte
        rgb(di + 1) = ((p >> 8) & 0xFF).toByte
        rgb(di + 2) = (p & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    Some(PpmCodec.Image(w, h, rgb))
  }

  /** Encode a raster as PNG via the JDK writer (always registered). */
  def encodePng(img: PpmCodec.Image): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(
      img.width, img.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val si = (y * img.width + x) * 3
        val p = ((img.rgb(si) & 0xFF) << 16) |
          ((img.rgb(si + 1) & 0xFF) << 8) | (img.rgb(si + 2) & 0xFF)
        bi.setRGB(x, y, p)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", out)
    out.toByteArray
  }
}
