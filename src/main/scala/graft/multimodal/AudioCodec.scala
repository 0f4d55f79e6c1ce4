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
}
