package graft.multimodal

/** Unified still-image decode: the pure-JVM netpbm parser first (cheapest,
  * no framework), then the JDK's `javax.imageio.ImageIO` for the
  * compressed formats every JRE ships readers for — PNG, BMP, GIF, JPEG,
  * WBMP, TIFF (JDK 9+). ImageIO decodes fully headless with zero native
  * dependencies, so "compressed formats need external libraries" is only
  * true past this set (WebP, AVIF, video — those remain stubbed in
  * [[Multimodal]]).
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
    PpmCodec.decode(bytes).orElse(imageIoDecode(bytes))

  private def imageIoDecode(bytes: Array[Byte]): Option[PpmCodec.Image] = {
    if (bytes == null || bytes.length == 0) None
    else try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None // no registered reader claimed the format
      else {
        val w = img.getWidth
        val h = img.getHeight
        if (w <= 0 || h <= 0) None
        else {
          val rgb = new Array[Byte](w * h * 3)
          val row = new Array[Int](w)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, row, 0, w) // converts any color model to sRGB
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
      }
    } catch { case _: Throwable => None }
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
