package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.storage.StorageLevel
import graft.multimodal.Multimodal

/** The end-to-end MEDIA curation flow — [[CorpusPipeline.curate]]'s
  * multimodal twin, composed from the library's media operators in the
  * order a real intake pipeline runs them: the cheap header-only gates
  * first, so the expensive decode tiers only ever see rows that already
  * passed resolution/duration/format policy, then within-run perceptual
  * dedup, then the cross-run stages against persisted state:
  *
  *   1. metadata probe + gate   (container HEADERS only — no pixel/PCM
  *                               decode; [[Multimodal.probeMetadata]])
  *   2. perceptual dedup        (ONE real decode pass → dHash; exact
  *                               collapse + hamming-radius clustering,
  *                               [[Multimodal.dedupePerceptual]])
  *   3. cross-run exact         (optional: phash registry anti-join,
  *                               [[Multimodal.dedupePerceptualAgainstRegistry]])
  *   4. cross-run near          (optional: persisted hamming index probe,
  *                               [[Multimodal.dedupePerceptualAgainstIndex]])
  *
  * Stage order is a correctness contract, not a preference: the gate
  * must precede the dedup tiers (a gated-out image must not claim the
  * min-id representative slot of a cluster whose survivors it will never
  * join), and the within-run collapse must precede the cross-run probes
  * (the registry/index appends register each distinct fingerprint once —
  * [[graft.dedup.Dedup.dedupAgainstRegistry]]'s discipline). The
  * cross-run appends inside stages 3-4 execute EAGERLY, so by the time
  * curateMedia() returns, the next run already sees this batch. Same
  * single-writer-per-table contract as the text pipeline.
  *
  * Scale shape: stage 1 is one mapPartitions pass over headers (a few
  * hundred bytes read per row — content bytes never shuffle); stages 2-4
  * shuffle only (id, fingerprint) skeletons, with content riding the
  * final unskewed id joins (each operator's own documented discipline).
  */
object MediaPipeline {

  /** Gate policy + cross-run wiring for [[curateMedia]].
    *
    * `minWidth`/`minHeight` drop images below the resolution floor,
    * `maxDurationMs` drops over-long audio/video, `mimePrefixes` (if
    * non-empty) keeps only probed mimes matching a prefix (e.g. "image/"),
    * all evaluated on PROBED header metadata. `keepUnprobed` decides rows
    * carrying no probed evidence (null width, height, AND duration —
    * unrecognized containers): real intake pipelines usually drop them
    * (default); keeping them preserves the dedup tiers'
    * corrupt-rows-survive semantics downstream. A dimension/duration gate
    * is only applied to rows whose container CARRIES that field (audio
    * has no width; stills have no duration).
    *
    * `materialize` governs the hashed survivor set that every dedup tier
    * reads (see [[Materialize]] — the same cluster-safety tradeoffs as
    * the text pipeline, with content bytes in the persisted rows).
    * `compactEveryNFiles` mirrors [[CorpusPipeline.Config.compactEveryNFiles]]:
    * de-fragment the cross-run tables BEFORE the run's appends — never
    * after, because the returned frame derives from the appends' delta
    * files, which a post-hoc compaction would delete.
    */
  case class MediaConfig(
      minWidth: Option[Int] = None,
      minHeight: Option[Int] = None,
      maxDurationMs: Option[Long] = None,
      mimePrefixes: Seq[String] = Nil,
      keepUnprobed: Boolean = false,
      maxHamming: Int = 4,
      registryTable: Option[String] = None,
      registryUpdate: Boolean = true,
      hammingIndexTable: Option[String] = None,
      hammingIndexUpdate: Boolean = true,
      materialize: Materialize = Materialize.Disk,
      compactEveryNFiles: Option[Int] = None)

  /** Curate `media` (the [[Multimodal.mediaSchema]] shape, or anything
    * with media_id + content): returns the surviving rows WITH the probed
    * metadata columns filled and the `phash` fingerprint — the gate's and
    * the dedup tiers' evidence stays on the row for downstream routing.
    *
    * Decode runs ONCE: the gated survivors are fingerprinted in a single
    * [[Multimodal.perceptualHash]] pass, materialized (every tier and the
    * final anti-joins re-read it), and every dedup stage consumes the
    * carried `phash` column instead of decoding again — at intake scale
    * the decode pass dominates all three tiers combined, so a naive
    * composition of the standalone operators would triple the pipeline's
    * dominant cost.
    */
  def curateMedia(media: DataFrame, cfg: MediaConfig = MediaConfig()): DataFrame = {
    cfg.compactEveryNFiles.foreach { maxFiles =>
      val spark = media.sparkSession
      (cfg.registryTable.toSeq ++ cfg.hammingIndexTable.toSeq).foreach(t =>
        graft.sources.Warehouse.compactIfFragmented(spark, t, maxFiles))
    }
    val probed = Multimodal.probeMetadata(media)
    val unprobed = col("width").isNull && col("height").isNull &&
      col("duration_ms").isNull
    // a gate applies only where the container carries the field: probed
    // rows missing it pass that gate, unprobed rows ride keepUnprobed
    val gates = Seq(
      cfg.minWidth.map(w => col("width").isNull || col("width") >= w),
      cfg.minHeight.map(h => col("height").isNull || col("height") >= h),
      cfg.maxDurationMs.map(d => col("duration_ms").isNull || col("duration_ms") <= d),
      if (cfg.mimePrefixes.isEmpty) None
      else Some(cfg.mimePrefixes.map(p => col("mime").startsWith(p))
        .reduce(_ || _))).flatten
    val pass = gates.foldLeft(lit(true))(_ && _)
    val gated = probed.filter(
      when(unprobed, lit(cfg.keepUnprobed)).otherwise(pass))
    // the ONE decode pass; every tier below reads phash from the row
    val hashed = cfg.materialize match {
      case Materialize.Off => Multimodal.perceptualHash(gated)
      case Materialize.Local => Multimodal.perceptualHash(gated).localCheckpoint()
      case Materialize.Disk =>
        Bridge.persistedCopy(Multimodal.perceptualHash(gated), StorageLevel.DISK_ONLY)
      case Materialize.Reliable(dir) =>
        val path = s"$dir/curate-media-${java.util.UUID.randomUUID().toString.take(8)}"
        Multimodal.perceptualHash(gated).write.mode("overwrite").parquet(path)
        media.sparkSession.read.parquet(path)
    }
    val ph = Some("phash")
    val withinRun = Multimodal.dedupePerceptual(hashed, cfg.maxHamming, ph)
    val afterRegistry = cfg.registryTable match {
      case None => withinRun
      case Some(t) =>
        Multimodal.dedupePerceptualAgainstRegistry(withinRun, t,
          cfg.registryUpdate, ph)
    }
    cfg.hammingIndexTable match {
      case None => afterRegistry
      case Some(t) =>
        Multimodal.dedupePerceptualAgainstIndex(afterRegistry, t,
          cfg.hammingIndexUpdate, ph)
    }
  }
}
