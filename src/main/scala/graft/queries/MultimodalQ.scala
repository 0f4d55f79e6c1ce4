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
    }
  )

  /** No SQL oracles: DuckDB cannot decode images (rows-only checks). */
  val oracles: Map[String, String] = Map.empty
}
