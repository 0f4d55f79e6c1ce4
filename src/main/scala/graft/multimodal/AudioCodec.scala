package graft.multimodal

import java.io.ByteArrayInputStream
import javax.sound.sampled.{AudioFormat, AudioSystem}

/** Pure-JRE audio decoding for the multimodal tier: WAV/AIFF/AU via
  * `javax.sound.sampled` (part of Java SE, headless-safe — the audio
  * twin of [[ImageCodec]]'s ImageIO path, zero native dependencies).
  * Compressed formats the JRE has no SPI for (MP3, OGG, AAC) return
  * `None` and fall back to the deterministic stub upstream, exactly like
  * WebP does on the image side.
  *
  * Decoded audio is normalized to mono float samples in [-1, 1]:
  * multi-channel input is mean-mixed, and any PCM width the reader
  * offers is converted to signed 16-bit first (the one target every
  * JRE converter supports), so downstream features never see format
  * variety.
  */
object AudioCodec {

  /** Decoded, mono-mixed PCM. `durationMs` derives from the frame count
    * at the source rate — it is metadata a real pipeline stores next to
    * the opaque bytes.
    */
  final case class Pcm(sampleRate: Float, channels: Int, samples: Array[Float]) {
    def durationMs: Long =
      if (sampleRate <= 0) 0L else ((samples.length / sampleRate) * 1000).toLong
  }

  /** Decode bytes if the JRE has a reader for them; None otherwise —
    * callers degrade to the stub path, never fail.
    */
  def decode(bytes: Array[Byte]): Option[Pcm] = {
    if (bytes == null || bytes.length < 12) return None
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val src = in.getFormat
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels,
          src.getChannels * 2, src.getSampleRate, false)
        val pcm = AudioSystem.getAudioInputStream(target, in)
        val raw = pcm.readAllBytes()
        val ch = target.getChannels
        val nFrames = raw.length / (2 * ch)
        val mono = new Array[Float](nFrames)
        var f = 0
        while (f < nFrames) {
          var acc = 0.0f
          var c = 0
          while (c < ch) {
            val o = (f * ch + c) * 2
            val s = ((raw(o) & 0xFF) | (raw(o + 1) << 8)).toShort
            acc += s / 32768.0f
            c += 1
          }
          mono(f) = acc / ch
          f += 1
        }
        Some(Pcm(src.getSampleRate, src.getChannels, mono))
      } finally in.close()
    } catch {
      case _: Exception => None // unsupported/corrupt → stub upstream
    }
  }

  /** Fixed-dimension audio features from decoded PCM: `dim` equal-width
    * windows, each contributing its RMS energy — the deterministic,
    * batch-shaped analogue of the image grid-color features, and enough
    * to make silence/tone/speech-shaped content separable in tests and
    * dedup heuristics.
    */
  def features(pcm: Pcm, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val n = pcm.samples.length
    if (n == 0) return out
    var w = 0
    while (w < dim) {
      val lo = (w.toLong * n / dim).toInt
      val hi = math.max(lo + 1, ((w + 1).toLong * n / dim).toInt)
      var acc = 0.0
      var i = lo
      while (i < math.min(hi, n)) { val s = pcm.samples(i); acc += s * s; i += 1 }
      out(w) = math.sqrt(acc / math.max(1, math.min(hi, n) - lo)).toFloat
      w += 1
    }
    out
  }

  // mean |first difference| per window — proportional to frequency ×
  // amplitude for narrowband content, the cheap spectral-brightness proxy
  // the fingerprint's second half compares against the window's RMS
  private def meanAbsDeriv(pcm: Pcm, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val n = pcm.samples.length
    if (n < 2) return out
    var w = 0
    while (w < dim) {
      val lo = math.max(1, (w.toLong * n / dim).toInt)
      val hi = math.max(lo + 1, ((w + 1).toLong * n / dim).toInt)
      var acc = 0.0
      var i = lo
      while (i < math.min(hi, n)) {
        acc += math.abs(pcm.samples(i) - pcm.samples(i - 1)); i += 1
      }
      out(w) = (acc / math.max(1, math.min(hi, n) - lo)).toFloat
      w += 1
    }
    out
  }

  /** 64-bit perceptual audio fingerprint — the audio twin of the image
    * dHash, feeding the same shared Hamming engine:
    *
    *  - bits 0–31: ENVELOPE — sign of each adjacent per-window RMS delta
    *    over 33 equal windows (dHash's adjacent-cell comparison, on the
    *    time axis). Captures temporal dynamics; re-encodings of the same
    *    PCM (WAV ↔ AIFF ↔ AU) decode to identical samples and hash
    *    identically.
    *  - bits 32–63: BRIGHTNESS — per-window mean |first difference|
    *    compared against the window's RMS scaled by 4√2·600/sampleRate
    *    (for a pure tone the ratio is ≈4√2·f/sr independent of
    *    amplitude, so the bit is ~"is this window's content above
    *    ~600 Hz"), separating same-envelope content of clearly
    *    different pitch.
    *
    * Deliberately coarse: clips collapse on gross envelope + brightness
    * shape, not audio identity — compose with [[features]]-based
    * embedding dedup when finer discrimination matters. All-silence
    * clips share fingerprint 0 (silence IS a duplicate class).
    */
  def fingerprint(pcm: Pcm): Long = {
    val rms33 = features(pcm, 33)
    val rms32 = features(pcm, 32)
    val deriv = meanAbsDeriv(pcm, 32)
    val tau = if (pcm.sampleRate > 0) 5.6569f * 600.0f / pcm.sampleRate else 0.0f
    var h = 0L
    var i = 0
    while (i < 32) {
      if (rms33(i + 1) > rms33(i)) h |= 1L << i
      if (deriv(i) > rms32(i) * tau) h |= 1L << (32 + i)
      i += 1
    }
    h
  }
}
