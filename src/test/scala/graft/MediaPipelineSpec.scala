package graft

import java.io.ByteArrayOutputStream
import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.functions._
import graft.multimodal.{ImageCodec, Multimodal, PpmCodec}
import graft.pipeline.MediaPipeline
import graft.pipeline.MediaPipeline.MediaConfig

/** The composed media curation flow: header gates run before any decode,
  * the dedup tiers consume ONE shared fingerprint pass, and the cross-run
  * stages wire through to the persisted registry/index operators.
  */
class MediaPipelineSpec extends SparkSpec {
  import spark.implicits._

  // deterministic RGB noise — distinct seeds give distinct dHashes
  private def noise(seed: Long, w: Int, h: Int): PpmCodec.Image = {
    val rgb = new Array[Byte](w * h * 3)
    var x = seed * 6364136223846793005L + 1442695040888963407L
    var i = 0
    while (i < rgb.length) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      rgb(i) = (x & 0xff).toByte
      i += 1
    }
    PpmCodec.Image(w, h, rgb)
  }

  private def wav(seconds: Double): Array[Byte] = {
    val rate = 8000f
    val n = (rate * seconds).toInt
    val pcm = Array.tabulate(n * 2)(i =>
      (if (i % 2 == 0) (math.sin(i * 0.1) * 8000).toInt & 0xff
       else ((math.sin(i * 0.1) * 8000).toInt >> 8) & 0xff).toByte)
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def media(rows: (Long, Array[Byte])*) = Multimodal.asMedia(
    rows.toDF("id", "payload"), "id", "payload", "media/unknown")

  test("curateMedia gates on probed headers, dedups, and carries evidence columns") {
    val a = noise(1, 40, 30)
    val out = MediaPipeline.curateMedia(media(
        1L -> ImageCodec.encodePng(a),
        2L -> ImageCodec.encodePng(noise(2, 8, 8)), // below the width floor
        3L -> PpmCodec.encode(a), // netpbm re-encode: probed AND deduped onto 1
        4L -> "not a container".getBytes("UTF-8"), // unprobed → dropped
        5L -> ImageCodec.encodePng(noise(3, 40, 30))),
      MediaConfig(minWidth = Some(16)))
    val rows = out.select("media_id", "mime", "width", "phash")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.isNullAt(3))).toMap
    assert(rows.keySet == Set(1L, 5L), s"survivors: ${rows.keySet}")
    assert(rows(1L) == (("image/png", 40, false)), s"evidence: ${rows(1L)}")
    // keepUnprobed keeps the evidence-free blob (null phash) through
    // every dedup tier
    val kept = MediaPipeline.curateMedia(media(
        1L -> ImageCodec.encodePng(a),
        4L -> "not a container".getBytes("UTF-8")),
      MediaConfig(minWidth = Some(16), keepUnprobed = true))
      .select("media_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 4L), s"keepUnprobed survivors: $kept")
  }

  test("curateMedia duration and mime-prefix gates apply only where probed") {
    val out = MediaPipeline.curateMedia(media(
        1L -> wav(0.5), // inside the duration cap
        2L -> wav(2.0), // over it
        3L -> ImageCodec.encodePng(noise(4, 40, 30))), // wrong mime family
      MediaConfig(maxDurationMs = Some(1000), mimePrefixes = Seq("audio/")))
      .select("media_id").as[Long].collect().toSeq
    assert(out == Seq(1L), s"survivors: $out")
  }

  test("curateMedia registry mode drops re-encoded re-posts across runs") {
    graft.sources.Warehouse.dropTableAndLocation(spark, "mp_reg")
    Multimodal.createPerceptualRegistry(spark, "mp_reg", buckets = 4)
    val a = noise(5, 40, 30)
    val b = noise(6, 40, 30)
    val cfg = MediaConfig(minWidth = Some(16), registryTable = Some("mp_reg"))
    val run1 = MediaPipeline.curateMedia(media(1L -> ImageCodec.encodePng(a)), cfg)
      .select("media_id").as[Long].collect().toSeq
    assert(run1 == Seq(1L))
    assert(spark.table("mp_reg").count() == 1)
    val run2 = MediaPipeline.curateMedia(media(
        10L -> PpmCodec.encode(a), // re-encode of run 1's image
        11L -> ImageCodec.encodePng(b)), cfg)
      .select("media_id").as[Long].collect().sorted.toSeq
    assert(run2 == Seq(11L), s"run 2 survivors: $run2")
    assert(spark.table("mp_reg").count() == 2)
  }

  test("curateMedia hamming-index mode drops NEAR replays across runs") {
    import graft.dedup.Dedup
    for (t <- Seq("mp_hidx", "mp_hidx_hspec"))
      graft.sources.Warehouse.dropTableAndLocation(spark, t)
    def halves(lightLeft: Boolean) = Array.tabulate(8 * 8 * 3) { i =>
      val x = (i / 3) % 8
      (if ((x < 4) == lightLeft) 255 else 0).toByte
    }
    val base = PpmCodec.Image(8, 8, halves(lightLeft = false))
    val nearRgb = halves(lightLeft = false)
    nearRgb(0) = 255.toByte; nearRgb(1) = 255.toByte; nearRgb(2) = 255.toByte
    Dedup.writeHammingIndex(
      Multimodal.perceptualHash(media(100L -> PpmCodec.encode(base)))
        .select($"media_id".as("id"), $"phash".as("h")),
      "mp_hidx", maxHamming = 4, buckets = 4)
    val out = MediaPipeline.curateMedia(media(
        1L -> PpmCodec.encode(PpmCodec.Image(8, 8, nearRgb)), // 1 bit away
        2L -> PpmCodec.encode(PpmCodec.Image(8, 8, halves(lightLeft = true)))),
      MediaConfig(hammingIndexTable = Some("mp_hidx")))
      .select("media_id").as[Long].collect().toSeq
    assert(out == Seq(2L), s"survivors: $out")
  }

  test("m03/m04 driver gates keep planted-twin shapes: twins drop, reorder + corrupt survive") {
    // the audio/video driver-gate queries are rows-only (no DuckDB
    // oracle), so CI pins their survivor SHAPE here: every +5000
    // re-encode and +7000 near twin drops, the +8000 reordered cut and
    // the +9999 corrupt blob survive, originals all survive
    val dir = "/root/testdata/sf0.001"
    val m03 = graft.queries.MultimodalQ.queries("m03_audio_dedup")(spark, dir)
      .select("media_id").as[Long].collect().sorted.toSeq
    assert(m03.count(_ < 5000) == 60 && m03.contains(9999L) &&
      !m03.exists(i => i >= 5000 && i < 9000), s"m03 survivors: $m03")
    val m04 = graft.queries.MultimodalQ.queries("m04_video_dedup")(spark, dir)
      .select("media_id").as[Long].collect().sorted.toSeq
    assert(m04.count(_ < 5000) == 40 && m04.contains(8013L) &&
      m04.contains(9999L) &&
      !m04.exists(i => i >= 5000 && i < 8000), s"m04 survivors: $m04")
  }

  test("a caller-supplied fingerprint column is used instead of decoding") {
    // content is NULL everywhere: a second decode pass would fingerprint
    // nothing and keep all rows — collapsing the equal fakes proves the
    // tiers consume the carried column (curateMedia's one-decode contract)
    val df = Seq((1L, 42L), (2L, 42L), (3L, 7L))
      .toDF("media_id", "ph")
      .withColumn("content", lit(null).cast("binary"))
    val out = Multimodal.dedupePerceptual(df, maxHamming = 0,
        phashCol = Some("ph"))
      .select("media_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 3L), s"survivors: $out")
  }
}
