package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.{ImageCodec, Multimodal, PpmCodec}

/** Multimodal queries over media synthesized DETERMINISTICALLY from the
  * driver's documents table: the test corpus carries no binary media
  * column, and the decode path needs real image bytes — so each doc_id
  * becomes a tiny procedurally generated image, and the query exercises
  * the full decode → dHash → hamming-dedup path end to end under the
  * per-round driver gate (previously the L32 tier was spec-only).
  * Rows-only: DuckDB has no image decoder — the L32 inexpressibility
  * argument; the collapse/survive semantics are spec-gated
  * (MultimodalSpec / StreamingMultimodalSpec).
  */
object MultimodalQ {

  /** Deterministic 16×16 RGB noise image for a seed (xorshift over a
    * splitmix-scrambled seed — stable across JVMs, no java.util.Random).
    */
  private def imageFor(seed: Long): PpmCodec.Image = {
    val rgb = new Array[Byte](16 * 16 * 3)
    var x = seed * 6364136223846793005L + 1442695040888963407L
    if (x == 0) x = 1
    var i = 0
    while (i < rgb.length) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      rgb(i) = (x & 0xff).toByte
      i += 1
    }
    PpmCodec.Image(16, 16, rgb)
  }

  private val pngUdf = udf { (seed: Long) => ImageCodec.encodePng(imageFor(seed)) }
  private val ppmUdf = udf { (seed: Long) => PpmCodec.encode(imageFor(seed)) }
  // below m02's width floor: 8×8 crops of the same deterministic noise
  private val smallPngUdf = udf { (seed: Long) =>
    val img = imageFor(seed)
    ImageCodec.encodePng(PpmCodec.Image(8, 8,
      Array.tabulate(8 * 8 * 3)(i => img.rgb((i / 24) * 48 + i % 24))))
  }

  // splitmix64 — the JVM-stable scrambler behind the audio/video
  // generators (java.util.Random's documented finalizer, no JRE state)
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  // -------- m03 audio generation --------
  // 33 windows × 240 samples of an 8 kHz square tone whose per-window
  // amplitude is a seed-keyed pseudo-random level in [0.2, 0.8]: the
  // audio fingerprint's envelope half reads the adjacent-window RMS
  // delta signs, so distinct seeds land ~16 bits apart while the
  // brightness half (tone period 16 ≈ 500 Hz, amplitude-invariant)
  // stays constant. `dip` crushes ONE window to near-silence, flipping
  // at most the two adjacent delta bits — a planted near-twin within
  // any radius ≥ 2.
  private def audioSamples(seed: Long, dip: Boolean): Array[Short] = {
    val out = new Array[Short](33 * 240)
    var w = 0
    while (w < 33) {
      val lvl = 0.2 + 0.6 * ((mix(seed * 33 + w) >>> 11).toDouble / (1L << 53))
      val a = (30000 * (if (dip && w == 16) lvl * 0.08 else lvl)).toInt
      var i = 0
      while (i < 240) {
        out(w * 240 + i) = (if ((i / 8) % 2 == 0) a else -a).toShort
        i += 1
      }
      w += 1
    }
    out
  }

  private def encodeAudio(samples: Array[Short],
                          kind: javax.sound.sampled.AudioFileFormat.Type,
                          big: Boolean): Array[Byte] = {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val s = samples(i)
      if (big) { raw(i * 2) = ((s >> 8) & 0xFF).toByte; raw(i * 2 + 1) = (s & 0xFF).toByte }
      else { raw(i * 2) = (s & 0xFF).toByte; raw(i * 2 + 1) = ((s >> 8) & 0xFF).toByte }
      i += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, big)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length), kind, bos)
    bos.toByteArray
  }

  private val wavUdf = udf { (seed: Long) =>
    encodeAudio(audioSamples(seed, dip = false),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, big = false)
  }
  private val aiffUdf = udf { (seed: Long) =>
    encodeAudio(audioSamples(seed, dip = false),
      javax.sound.sampled.AudioFileFormat.Type.AIFF, big = true)
  }
  private val wavDipUdf = udf { (seed: Long) =>
    encodeAudio(audioSamples(seed, dip = true),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, big = false)
  }

  // -------- m04 video generation --------
  // Per-id 3-frame animation whose frames are 8×8 light-left patterns
  // with the light region's right edge at columns (a, b, a+b mod 7)+1
  // for a = id%7, b = id/7 — an MDS [3,2] code over Z7, so any two ids
  // agree in AT MOST ONE frame position and `minMatches = 2` can never
  // cross-drop originals. Each frame's dHash carries one bit per row at
  // the edge column: same edge → distance 0, different edges →
  // distance 16, a frame-0 corner tweak → distance 1-2.
  private def edges(id: Long): Seq[Int] = {
    val a = (id % 7).toInt
    val b = ((id / 7) % 7).toInt
    Seq(a + 1, b + 1, (a + b) % 7 + 1)
  }

  private def frame(edge: Int, size: Int, tweak: Boolean): java.awt.image.BufferedImage = {
    val bi = new java.awt.image.BufferedImage(size, size,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until size; x <- 0 until size) {
      val (gx, gy) = (x * 8 / size, y * 8 / size)
      val light = gx < edge && !(tweak && gx == edge - 1 && gy == 0)
      bi.setRGB(x, y, if (light) 0xFFFFFF else 0)
    }
    bi
  }

  private def gifFor(es: Seq[Int], size: Int, tweakFrame0: Boolean): Array[Byte] = {
    import javax.imageio.{IIOImage, ImageIO}
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for ((e, k) <- es.zipWithIndex)
      writer.writeToSequence(
        new IIOImage(frame(e, size, tweakFrame0 && k == 0), null, null), null)
    writer.endWriteSequence(); writer.dispose(); ios.close()
    bos.toByteArray
  }

  private val gifUdf = udf { (id: Long) => gifFor(edges(id), 8, tweakFrame0 = false) }
  private val gifScaledUdf = udf { (id: Long) => gifFor(edges(id), 16, tweakFrame0 = false) }
  private val gifTweakUdf = udf { (id: Long) => gifFor(edges(id), 8, tweakFrame0 = true) }
  // swap the first two frames: vs its own original only position 2 still
  // matches (1 < minMatches), and the swapped pattern (b, a, a+b) can
  // only 2-agree with the TRANSPOSED id 7a+b — for ids ≡ 6 (mod 7) that
  // transpose is ≥ 42, outside the corpus, so the cut survives every
  // cluster by construction
  private val gifReorderUdf = udf { (id: Long) =>
    val e = edges(id)
    gifFor(Seq(e(1), e(0), e(2)), 8, tweakFrame0 = false)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // L32: batch perceptual near-dedup end to end. 120 distinct images
    // (PNG), a re-encoded PPM twin for every 4th (identical pixels →
    // identical dHash → the exact tier collapses it onto the original),
    // and one undecodable blob (NULL fingerprint — no evidence, must
    // survive). Expected survivors: the 120 originals + the corrupt row.
    "m01_perceptual_dedup" -> { (s, dir) =>
      val ids = Tables(s, dir, "documents")
        .select(col("doc_id")).filter(col("doc_id") < 120)
      val originals = ids.select(col("doc_id").as("media_id"),
        pngUdf(col("doc_id")).as("content"))
      val twins = ids.filter(col("doc_id") % 4 === 0)
        .select((col("doc_id") + 5000).as("media_id"),
          ppmUdf(col("doc_id")).as("content"))
      val corrupt = ids.filter(col("doc_id") === 0)
        .select((col("doc_id") + 9999).as("media_id"),
          lit(Array[Byte](1, 2, 3, 4)).as("content"))
      Multimodal.dedupePerceptual(
          originals.unionByName(twins).unionByName(corrupt))
        .select(col("media_id"))
        .orderBy("media_id")
    },

    // L39: the composed media pipeline end to end — header gate (no
    // decode) ahead of the one-decode-pass dedup tiers. 100 large PNGs
    // survive; 20 small PNGs fail the width floor WITHOUT being decoded;
    // PPM re-encodes of every 4th large image dedup onto the originals;
    // an unparseable blob is dropped at intake (keepUnprobed default).
    // Rows-only: DuckDB decodes neither headers nor pixels (m01's
    // argument); gate/dedup semantics are spec-gated (MediaPipelineSpec).
    "m02_curate_media" -> { (s, dir) =>
      import graft.pipeline.MediaPipeline
      val ids = Tables(s, dir, "documents")
        .select(col("doc_id")).filter(col("doc_id") < 120)
      val large = ids.filter(col("doc_id") < 100)
        .select(col("doc_id").as("media_id"),
          pngUdf(col("doc_id")).as("content"))
      val small = ids.filter(col("doc_id") >= 100)
        .select(col("doc_id").as("media_id"),
          smallPngUdf(col("doc_id")).as("content"))
      val twins = ids.filter(col("doc_id") < 100 && col("doc_id") % 4 === 0)
        .select((col("doc_id") + 5000).as("media_id"),
          ppmUdf(col("doc_id")).as("content"))
      val corrupt = ids.filter(col("doc_id") === 0)
        .select((col("doc_id") + 9999).as("media_id"),
          lit(Array[Byte](9, 9, 9)).as("content"))
      MediaPipeline.curateMedia(
          Multimodal.asMedia(
            large.unionByName(small).unionByName(twins).unionByName(corrupt),
            "media_id", "content", "media/unknown"),
          MediaPipeline.MediaConfig(minWidth = Some(12)))
        .select(col("media_id"), col("width"), col("height"))
        .orderBy("media_id")
    },

    // L35: audio perceptual near-dedup end to end. 60 distinct envelope
    // walks (WAV), an AIFF re-encode twin for every 4th (identical PCM →
    // identical fingerprint → exact tier), a one-window near-silence dip
    // for every 10th (≤2 envelope bits flip → near tier at radius 4),
    // and one undecodable blob (NULL fingerprint — survives). Expected
    // survivors: the 60 originals + the corrupt row. Rows-only: DuckDB
    // decodes no audio (the L35 inexpressibility argument); the
    // collapse/survive semantics are spec-gated (StreamingMultimodalSpec).
    "m03_audio_dedup" -> { (s, dir) =>
      val ids = Tables(s, dir, "documents")
        .select(col("doc_id")).filter(col("doc_id") < 60)
      val originals = ids.select(col("doc_id").as("media_id"),
        wavUdf(col("doc_id")).as("content"))
      val reencodes = ids.filter(col("doc_id") % 4 === 0)
        .select((col("doc_id") + 5000).as("media_id"),
          aiffUdf(col("doc_id")).as("content"))
      val nears = ids.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 7000).as("media_id"),
          wavDipUdf(col("doc_id")).as("content"))
      val corrupt = ids.filter(col("doc_id") === 0)
        .select((col("doc_id") + 9999).as("media_id"),
          lit(Array[Byte](7, 7, 7, 7)).as("content"))
      Multimodal.dedupeAudioPerceptual(
          Multimodal.asMedia(
            originals.unionByName(reencodes).unionByName(nears)
              .unionByName(corrupt),
            "media_id", "content", "audio/mixed"),
          maxHamming = 4)
        .select(col("media_id"))
        .orderBy("media_id")
    },

    // L34: video perceptual near-dedup end to end. 40 distinct 3-frame
    // animations whose frame edges form an MDS code (any two ids share
    // at most ONE frame position, so minMatches=2 never cross-drops), a
    // 16×16 scaled re-encode for every 4th (blocky upscale → per-frame
    // hash-identical → exact tier), a frame-0 corner tweak for every
    // 10th (1-2 bits on one position, other two exact → near tier), ONE
    // reordered cut of id 13 (same frames, misaligned positions — MUST
    // survive: order is content), and one corrupt blob (survives).
    // Expected survivors: 40 originals + the reordered cut + corrupt.
    // Rows-only: m01's DuckDB argument; semantics spec-gated.
    "m04_video_dedup" -> { (s, dir) =>
      val ids = Tables(s, dir, "documents")
        .select(col("doc_id")).filter(col("doc_id") < 40)
      val originals = ids.select(col("doc_id").as("media_id"),
        gifUdf(col("doc_id")).as("content"))
      val scaled = ids.filter(col("doc_id") % 4 === 0)
        .select((col("doc_id") + 5000).as("media_id"),
          gifScaledUdf(col("doc_id")).as("content"))
      val tweaked = ids.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 7000).as("media_id"),
          gifTweakUdf(col("doc_id")).as("content"))
      val reordered = ids.filter(col("doc_id") === 13)
        .select((col("doc_id") + 8000).as("media_id"),
          gifReorderUdf(col("doc_id")).as("content"))
      val corrupt = ids.filter(col("doc_id") === 0)
        .select((col("doc_id") + 9999).as("media_id"),
          lit(Array[Byte](4, 4, 4)).as("content"))
      Multimodal.dedupeVideoPerceptual(
          Multimodal.asMedia(
            originals.unionByName(scaled).unionByName(tweaked)
              .unionByName(reordered).unionByName(corrupt),
            "media_id", "content", "image/gif"),
          n = 3, minMatches = 2, maxHamming = 2)
        .select(col("media_id"))
        .orderBy("media_id")
    }
  )

  // The m-family oracles sidestep the decoder question entirely: every
  // blob is SYNTHESIZED from a deterministic generator (xorshift pixels,
  // splitmix square-wave PCM, MDS-coded GIF edge patterns), so the oracle
  // recomputes the CONTENT from the same recurrence and replays the
  // fingerprint + dedup semantics exactly; codec round-trip correctness
  // (PNG/PPM/GIF/WAV/AIFF encode->decode identity) stays spec-gated.
  // Only t35 (DEFLATE) remains rows-only in this file's sibling TextQ.

  // Shared m01/m02 machinery: xorshift pixel recurrence + 9x8 gradient
  // dHash + hamming closure, parameterized by the id range and the final
  // projection (m02's gate drops the 8x8 crops on the width floor and the
  // unprobed blob BY CONSTRUCTION, so its oracle is the <100 slice with
  // the probed 16x16 metadata emitted).
  private def dhashDedupSql(maxId: Int, radius: Int, finalSelect: String,
                            extraMedia: String): String =
    s"""CREATE OR REPLACE MACRO g_xs(x) AS
       #  (xor(xor(x, (x << 13) & 18446744073709551615),
       #       xor(x, (x << 13) & 18446744073709551615) >> 7));
       #CREATE OR REPLACE MACRO g_xs2(x) AS
       #  (xor(g_xs(x), (g_xs(x) << 17) & 18446744073709551615)
       #   & 18446744073709551615);
       #CREATE OR REPLACE MACRO g_m01gray(bs, y, x) AS
       #  (bs[(2*y*16 + (16*x)//9)*3 + 1]::INT
       #   + bs[(2*y*16 + (16*x)//9)*3 + 2]::INT
       #   + bs[(2*y*16 + (16*x)//9)*3 + 3]::INT);
       #WITH media AS (
       #  SELECT doc_id AS media_id, doc_id AS seed FROM documents
       #  WHERE doc_id < $maxId
       #  UNION ALL
       #  SELECT doc_id + 5000, doc_id FROM documents
       #  WHERE doc_id < $maxId AND doc_id % 4 = 0
       #), st AS (
       #  WITH RECURSIVE r(media_id, i, x) AS (
       #    SELECT media_id, 0,
       #      CASE WHEN ((g_mul64(seed::HUGEINT, 6364136223846793005)
       #                  + 1442695040888963407) & 18446744073709551615) = 0
       #           THEN 1::HUGEINT
       #           ELSE (g_mul64(seed::HUGEINT, 6364136223846793005)
       #                 + 1442695040888963407) & 18446744073709551615 END
       #    FROM media
       #    UNION ALL
       #    SELECT media_id, i + 1, g_xs2(x) FROM r WHERE i < 768
       #  ) SELECT media_id, i, x FROM r WHERE i >= 1
       #), blist AS MATERIALIZED (
       #  SELECT media_id, list((x & 255)::INT ORDER BY i) AS bs
       #  FROM st GROUP BY media_id
       #), hashes AS MATERIALIZED (
       #  SELECT media_id, g_s64(list_sum(list_transform(range(0, 64), k ->
       #    CASE WHEN g_m01gray(bs, k // 8, k % 8)
       #              > g_m01gray(bs, k // 8, k % 8 + 1)
       #         THEN (1::HUGEINT << k) ELSE 0::HUGEINT END))) AS h
       #  FROM blist
       #), reps AS (SELECT h, min(media_id) AS rep FROM hashes GROUP BY h),
       #edges AS (
       #  SELECT DISTINCT a.h AS h1, b.h AS h2 FROM reps a, reps b
       #  WHERE a.h <> b.h AND bit_count(xor(a.h, b.h)) <= $radius
       #), comp AS (
       #  WITH RECURSIVE c(h, lbl) AS (
       #    SELECT h, rep FROM reps
       #    UNION
       #    SELECT e.h2, c.lbl FROM c JOIN edges e ON c.h = e.h1
       #  ) SELECT h, min(lbl) AS lbl FROM c GROUP BY h
       #)
       #$finalSelect$extraMedia
       #ORDER BY media_id""".stripMargin('#')

  val oracles: Map[String, String] = Map(
    // m01: pixels recompute from the xorshift recurrence (one recursive
    // CTE step per byte), then the 9x8 resize + gradient dHash and the
    // hamming<=4 min-label closure replay exactly; the undecodable blob
    // survives with a NULL fingerprint.
    "m01_perceptual_dedup" ->
      (OracleHashLib.preamble + dhashDedupSql(120, 4,
        s"""SELECT hh.media_id FROM hashes hh JOIN comp c USING (h)
           #WHERE hh.media_id = c.lbl
           #UNION ALL
           #SELECT doc_id + 9999 FROM documents WHERE doc_id = 0"""
          .stripMargin('#'), "")),

    // m02: the gate is decided BY CONSTRUCTION (8x8 crops fail the
    // minWidth=12 floor, the unparseable blob drops with keepUnprobed
    // off), so the oracle is the <100 dHash dedup with the probed 16x16
    // metadata; header-parsing correctness stays spec-gated.
    "m02_curate_media" ->
      (OracleHashLib.preamble + dhashDedupSql(100, 4,
        s"""SELECT hh.media_id, 16::INT AS width, 16::INT AS height
           #FROM hashes hh JOIN comp c USING (h)
           #WHERE hh.media_id = c.lbl""".stripMargin('#'), "")),

    // m03: the audio fingerprint replayed — the square-wave generator's
    // window sums are EXACT integers (sums of a^2/|2a| below 2^53), so
    // the double sqrt/division and the single float rounding per window
    // are IEEE-identical in both engines; envelope bits compare adjacent
    // 33-window RMS (= the window amplitude exactly), brightness bits
    // compare mean |dsample| to RMS*tau in FLOAT. PCM decode correctness
    // (WAV/AIFF round-trip) stays spec-gated.
    "m03_audio_dedup" ->
      (OracleHashLib.preamble +
        s"""CREATE OR REPLACE MACRO g_splitmix_a(x) AS
           #  (g_mul64(xor((x + 11400714819323198485) & 18446744073709551615,
           #               ((x + 11400714819323198485) & 18446744073709551615)
           #                 >> 30), 13787848793156543929));
           #CREATE OR REPLACE MACRO g_splitmix_b(x) AS
           #  (g_mul64(xor(g_splitmix_a(x), g_splitmix_a(x) >> 27),
           #           10723151780598845931));
           #CREATE OR REPLACE MACRO g_splitmix(x) AS
           #  (xor(g_splitmix_b(x), g_splitmix_b(x) >> 31));
           #WITH media AS (
           #  SELECT doc_id AS media_id, doc_id AS seed, false AS dip
           #  FROM documents WHERE doc_id < 60
           #  UNION ALL
           #  SELECT doc_id + 5000, doc_id, false FROM documents
           #  WHERE doc_id < 60 AND doc_id % 4 = 0
           #  UNION ALL
           #  SELECT doc_id + 7000, doc_id, true FROM documents
           #  WHERE doc_id < 60 AND doc_id % 10 = 0
           #),
           #amps AS MATERIALIZED (
           #  SELECT media_id, w,
           #    trunc(30000.0 * (CASE WHEN dip AND w = 16
           #      THEN (0.2 + 0.6 * ((g_splitmix((seed*33 + w)::HUGEINT) >> 11)::DOUBLE
           #            / 9007199254740992.0)) * 0.08
           #      ELSE 0.2 + 0.6 * ((g_splitmix((seed*33 + w)::HUGEINT) >> 11)::DOUBLE
           #            / 9007199254740992.0) END))::BIGINT AS a
           #  FROM media, (SELECT unnest(range(0, 33)) AS w)
           #),
           #rms33 AS (SELECT media_id, w, a::FLOAT AS rf FROM amps),
           #samples AS MATERIALIZED (
           #  SELECT m.media_id, i, a.a,
           #    CASE WHEN (i // 8) % 2 = 0 THEN a.a ELSE -a.a END AS s
           #  FROM media m, (SELECT unnest(range(0, 7920)) AS i) g
           #  JOIN amps a ON true
           #  WHERE a.media_id = m.media_id AND a.w = i // 240
           #),
           #rms32 AS (
           #  SELECT media_id, (i * 32) // 7920 AS w,
           #    (sqrt(sum(a*a)::DOUBLE / count(*)))::FLOAT AS rf
           #  FROM samples GROUP BY 1, 2
           #),
           #deriv AS (
           #  SELECT s1.media_id, (s1.i * 32) // 7920 AS w,
           #    (sum(abs(s1.s - s0.s))::DOUBLE / count(*))::FLOAT AS df
           #  FROM samples s1 JOIN samples s0
           #    ON s0.media_id = s1.media_id AND s0.i = s1.i - 1
           #  WHERE s1.i >= 1
           #  GROUP BY 1, 2
           #),
           #fp AS MATERIALIZED (
           #  SELECT m.media_id, g_s64(
           #    (SELECT coalesce(sum(CASE WHEN b.rf > a.rf
           #         THEN (1::HUGEINT << a.w::INT) ELSE 0::HUGEINT END),
           #         0::HUGEINT)
           #     FROM rms33 a JOIN rms33 b
           #       ON b.media_id = a.media_id AND b.w = a.w + 1
           #     WHERE a.media_id = m.media_id AND a.w < 32)
           #    +
           #    (SELECT coalesce(sum(CASE WHEN d.df >
           #         (r.rf * (5.6569::FLOAT * 600.0::FLOAT / 8000.0::FLOAT))::FLOAT
           #         THEN (1::HUGEINT << (32 + d.w::INT)) ELSE 0::HUGEINT END),
           #         0::HUGEINT)
           #     FROM deriv d JOIN rms32 r
           #       ON r.media_id = d.media_id AND r.w = d.w
           #     WHERE d.media_id = m.media_id)
           #  ) AS h
           #  FROM media m
           #),
           #reps AS (SELECT h, min(media_id) AS rep FROM fp GROUP BY h),
           #exactdrop AS (
           #  SELECT media_id FROM fp JOIN reps USING (h) WHERE media_id <> rep),
           #edges AS (
           #  SELECT DISTINCT a.h AS h1, b.h AS h2 FROM reps a, reps b
           #  WHERE a.h <> b.h AND bit_count(xor(a.h, b.h)) <= 4),
           #comp AS (
           #  WITH RECURSIVE c(h, lbl) AS (
           #    SELECT h, rep FROM reps
           #    UNION
           #    SELECT e.h2, c.lbl FROM c JOIN edges e ON c.h = e.h1
           #  ) SELECT h, min(lbl) AS lbl FROM c GROUP BY h),
           #neardrop AS (
           #  SELECT f.media_id FROM fp f JOIN comp c USING (h)
           #  WHERE f.media_id <> c.lbl)
           #SELECT media_id FROM (
           #  SELECT media_id FROM media
           #  UNION ALL SELECT doc_id + 9999 FROM documents WHERE doc_id = 0)
           #WHERE media_id NOT IN (SELECT media_id FROM exactdrop)
           #  AND media_id NOT IN (SELECT media_id FROM neardrop)
           #ORDER BY media_id""".stripMargin('#')),

    // m04: the GIF frames are DETERMINISTIC 8x8 light-left patterns
    // (edge columns from the id's MDS code), and the nearest-pixel
    // resize maps both the 8x8 and 16x16 encodes onto the SAME 9-wide
    // sample columns, so each frame's dHash is a closed-form function of
    // (edge, tweak). Exact tier (full-vector min-id), per-position
    // hamming<=2 / >=2-matching-frames edge rule, min-label closure; the
    // corrupt blob (no decodable frames) survives.
    "m04_video_dedup" ->
      (OracleHashLib.preamble +
        s"""CREATE OR REPLACE MACRO g_m04light(sxv, e, tw, y) AS
           #  (CASE WHEN tw AND y = 0 THEN sxv < e - 1 ELSE sxv < e END);
           #CREATE OR REPLACE MACRO g_m04hash(e, tw) AS (
           #  g_s64(list_sum(list_transform(range(0, 64), k ->
           #    CASE WHEN g_m04light([0,0,1,2,3,4,5,6,7][(k % 8) + 1], e, tw, k // 8)
           #          AND NOT g_m04light([0,0,1,2,3,4,5,6,7][(k % 8) + 2], e, tw, k // 8)
           #         THEN (1::HUGEINT << k) ELSE 0::HUGEINT END))));
           #WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 40),
           #ed AS (
           #  SELECT doc_id, (doc_id % 7)::INT + 1 AS e0,
           #         ((doc_id // 7) % 7)::INT + 1 AS e1,
           #         ((doc_id % 7 + (doc_id // 7) % 7) % 7)::INT + 1 AS e2
           #  FROM ids),
           #frames AS (
           #  SELECT doc_id AS media_id, fi,
           #    g_m04hash(CASE fi WHEN 0 THEN e0 WHEN 1 THEN e1 ELSE e2 END,
           #              false) AS h
           #  FROM ed, (SELECT unnest(range(0,3)) AS fi)
           #  UNION ALL
           #  SELECT doc_id + 5000, fi,
           #    g_m04hash(CASE fi WHEN 0 THEN e0 WHEN 1 THEN e1 ELSE e2 END, false)
           #  FROM ed, (SELECT unnest(range(0,3)) AS fi) WHERE doc_id % 4 = 0
           #  UNION ALL
           #  SELECT doc_id + 7000, fi,
           #    g_m04hash(CASE fi WHEN 0 THEN e0 WHEN 1 THEN e1 ELSE e2 END, fi = 0)
           #  FROM ed, (SELECT unnest(range(0,3)) AS fi) WHERE doc_id % 10 = 0
           #  UNION ALL
           #  SELECT doc_id + 8000, fi,
           #    g_m04hash(CASE fi WHEN 0 THEN e1 WHEN 1 THEN e0 ELSE e2 END, false)
           #  FROM ed, (SELECT unnest(range(0,3)) AS fi) WHERE doc_id = 13
           #),
           #allmedia AS (
           #  SELECT doc_id AS media_id FROM ids
           #  UNION ALL SELECT doc_id + 5000 FROM ids WHERE doc_id % 4 = 0
           #  UNION ALL SELECT doc_id + 7000 FROM ids WHERE doc_id % 10 = 0
           #  UNION ALL SELECT doc_id + 8000 FROM ids WHERE doc_id = 13
           #  UNION ALL SELECT doc_id + 9999 FROM ids WHERE doc_id = 0
           #),
           #vecs AS (
           #  SELECT media_id, list(h ORDER BY fi) AS v FROM frames
           #  GROUP BY media_id),
           #reps AS (SELECT v, min(media_id) AS rep FROM vecs GROUP BY v),
           #exactdrop AS (
           #  SELECT media_id FROM vecs JOIN reps USING (v) WHERE media_id <> rep),
           #repframes AS (
           #  SELECT f.media_id, f.fi, f.h FROM frames f
           #  JOIN reps r ON r.rep = f.media_id),
           #medges AS (
           #  SELECT a, b FROM (
           #    SELECT least(a.media_id, b.media_id) AS a,
           #           greatest(a.media_id, b.media_id) AS b,
           #           count(DISTINCT a.fi) AS k
           #    FROM repframes a JOIN repframes b ON a.fi = b.fi
           #      AND a.media_id < b.media_id
           #      AND bit_count(xor(a.h, b.h)) <= 2
           #    GROUP BY 1, 2)
           #  WHERE k >= 2
           #),
           #sym AS (SELECT a, b FROM medges UNION SELECT b, a FROM medges),
           #nodes AS (SELECT rep AS id FROM reps),
           #comp AS (
           #  WITH RECURSIVE c(id, lbl) AS (
           #    SELECT id, id FROM nodes
           #    UNION
           #    SELECT s.b, c.lbl FROM c JOIN sym s ON c.id = s.a
           #  ) SELECT id, min(lbl) AS lbl FROM c GROUP BY id),
           #neardrop AS (SELECT id AS media_id FROM comp WHERE id <> lbl)
           #SELECT media_id FROM allmedia
           #WHERE media_id NOT IN (SELECT media_id FROM exactdrop)
           #  AND media_id NOT IN (SELECT media_id FROM neardrop)
           #ORDER BY media_id""".stripMargin('#')))
}
