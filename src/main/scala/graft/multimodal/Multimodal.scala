package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media as opaque `binary` with typed
  * metadata, processed in partition-sized batches.
  *
  * Still images decode for REAL: netpbm via the pure-JVM [[PpmCodec]] and
  * PNG/BMP/GIF/JPEG via the JDK's headless ImageIO ([[ImageCodec]]) — no
  * native dependencies. Only formats the JRE has no reader for (WebP,
  * audio, video) fall back to `decodeStub`, a deterministic fake that
  * keeps the batch contract (one fixed-length float array per row) so the
  * Spark-side plumbing is exercised end to end regardless of codec
  * coverage.
  */
object Multimodal {

  /** Canonical media schema: content plus typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Wrap arbitrary bytes into the media schema (metadata unknown → null). */
  def asMedia(df: DataFrame, idCol: String, binCol: String, mime: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(binCol).cast("binary").as("content"),
      lit(mime).as("mime"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"))

  /** STUB decode: deterministic pseudo-features from the content bytes.
    * Real implementation decodes the image/audio and emits embeddings;
    * the batch shape (one output row per input row, fixed-length
    * float array) is the contract a real decoder must keep.
    */
  private def decodeStub(content: Array[Byte], dim: Int): Array[Float] = {
    if (content == null) Array.fill(dim)(0.0f)
    else {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < content.length) { h = 31 * h + content(i); i += 1 }
      i = 0
      while (i < dim) {
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17
        out(i) = (h.toDouble / Long.MaxValue).toFloat
        i += 1
      }
      out
    }
  }

  /** Feature extraction over media batches: mapPartitions so a real decoder
    * can amortize model/codec init per partition (the Scala analogue of a
    * batched pandas UDF). Output schema: (media_id, features array<float>).
    *
    * netpbm AND PNG/BMP/GIF/JPEG content is REALLY decoded ([[ImageCodec]])
    * into a grid-color feature vector; undecodable formats fall back to
    * the deterministic stub. A corrupt blob yields stub features, never a
    * task failure.
    */
  def extractFeatures(media: DataFrame, dim: Int = 12): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select("media_id", "content").mapPartitions { rows =>
      // per-partition init happens here in a real decoder
      rows.map { r =>
        val content = r.getAs[Array[Byte]](1)
        val feats = ImageCodec.decode(content) match {
          case Some(img) =>
            val f = PpmCodec.features(img)
            if (f.length >= dim) f.take(dim)
            else f ++ Array.fill(dim - f.length)(0.0f)
          case None => decodeStub(content, dim)
        }
        Row(r.getLong(0), feats.toSeq)
      }
    }(enc)
  }

  /** Resize: REAL nearest-neighbor resample for any [[ImageCodec]]-decodable
    * content (netpbm, PNG/BMP/GIF/JPEG). netpbm re-encodes as P6; ImageIO
    * formats re-encode as PNG (lossless, writer in every JRE) and the mime
    * column is updated to match. Undecodable content keeps its bytes and
    * only the metadata changes (stub path).
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val resizeUdf = udf { (content: Array[Byte]) =>
      PpmCodec.decode(content) match {
        case Some(img) => (PpmCodec.encode(PpmCodec.resize(img, w, h)), "image/x-portable-pixmap")
        case None => ImageCodec.decode(content) match {
          case Some(img) => (ImageCodec.encodePng(PpmCodec.resize(img, w, h)), "image/png")
          case None => (content, null)
        }
      }
    }
    media
      .withColumn("__r", resizeUdf(col("content")))
      .withColumn("content", col("__r._1"))
      .withColumn("mime", coalesce(col("__r._2"), col("mime")))
      .withColumn("width", lit(w))
      .withColumn("height", lit(h))
      .drop("__r")
  }

  /** STUB frame sampling for video: emits `n` (media_id, frame_idx) rows
    * per video — the explode shape a real sampler produces.
    */
  def sampleFrames(media: DataFrame, n: Int): DataFrame =
    media.select(col("media_id"),
      explode(sequence(lit(0), lit(n - 1))).as("frame_idx"))
}
