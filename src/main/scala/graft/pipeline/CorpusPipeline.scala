package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.TextOps

/** The end-to-end training-corpus curation flow, composed from the
  * library's operators in the order a real pipeline runs them — cheap
  * row-local filters first, the (shuffling) dedup passes on the survivors
  * only, contamination last on the smallest set:
  *
  *   1. language ID + quality gate      (columnar, no shuffle)
  *   2. exact dedup                     (one shuffle on a content hash)
  *   3. MinHash-LSH near-dedup          (banded shuffle, candidates only)
  *   4. benchmark-contamination drop    (broadcast anti-join, optional)
  *   5. train/val/test assignment       (columnar, deterministic)
  *
  * Every stage is the already-spec'd operator; this object only fixes the
  * composition order and threads the columns through.
  *
  * Recompute control: near-dedup reads its input THREE times (the LSH
  * candidates branch, the gram projection for Jaccard verify, and the
  * left side of the survivor anti-join), and the contamination stage reads
  * its input twice more — composed naively, each read re-runs the quality
  * scan and the exact-dedup shuffle, a ~3× full-corpus recompute that is
  * real money at 100 TB. `Config.persistSurvivors` (default on)
  * materializes the post-gate and post-near-dedup survivor sets via an
  * eager `localCheckpoint`, so every downstream branch reads a
  * constant-lineage materialized table instead of re-deriving it.
  */
object CorpusPipeline {

  /** @param langs             kept language codes (from [[TextOps.langId]])
    * @param minQuality        [[TextOps.qualityScore]] threshold
    * @param nearDupThreshold  n-gram Jaccard above which a doc is a dup;
    *                          a value > 1.0 DISABLES the near-dedup stage
    *                          entirely (no signature pass, no band shuffle) —
    *                          the exact-only configuration
    * @param maxContamination  drop docs sharing ≥ this many distinct n-grams
    *                          with the benchmark (when one is given)
    * @param persistSurvivors  materialize intermediate survivor sets so the
    *                          multi-branch dedup stages don't recompute their
    *                          upstream (turn off only for single-pass plans
    *                          or when the caller persists externally)
    */
  case class Config(
      langs: Set[String] = Set("en"),
      minQuality: Double = 0.5,
      nearDupThreshold: Double = 0.7,
      contaminationNgram: Int = 8,
      maxContamination: Long = 1,
      trainPct: Int = 90,
      valPct: Int = 5,
      persistSurvivors: Boolean = true)

  /** Curate `docs`: returns the surviving rows plus `lang`, `quality`, and
    * `split` columns. `benchmark` (if given) is an eval set whose n-grams
    * must not leak into training data.
    */
  def curate(docs: DataFrame, textCol: String, idCol: String,
             cfg: Config = Config(),
             benchmark: Option[DataFrame] = None): DataFrame = {
    val scored = docs
      .withColumn("lang", TextOps.langId(col(textCol)))
      .withColumn("quality", TextOps.qualityScore(col(textCol)))
      .filter(col("lang").isin(cfg.langs.toSeq: _*) &&
        col("quality") >= cfg.minQuality)

    // Eager localCheckpoint: materialized before use, lineage truncated, and
    // the blocks are freed when the DataFrame is GC'd — no session-lifetime
    // cache entry to leak. Applied only where a stage genuinely fans out
    // into multiple downstream reads.
    def materialize(df: DataFrame, branches: Int): DataFrame =
      if (cfg.persistSurvivors && branches > 1) df.localCheckpoint() else df

    val nearDedupOn = cfg.nearDupThreshold <= 1.0
    // near-dedup reads its input 3×; contamination adds 2 more reads
    val exactBranches = (if (nearDedupOn) 3 else 1) +
      (if (!nearDedupOn && benchmark.isDefined) 1 else 0)
    val exact = materialize(Dedup.exact(scored, textCol, idCol), exactBranches)

    val deduped =
      if (!nearDedupOn) exact
      else materialize(Dedup.nearDedup(exact, textCol, idCol, cfg.nearDupThreshold),
        if (benchmark.isDefined) 2 else 1)

    val decontaminated = benchmark match {
      case None => deduped
      case Some(b) =>
        val dirty = Dedup.contamination(deduped, b, textCol, idCol, cfg.contaminationNgram)
          .filter(col("n_shared") >= cfg.maxContamination)
          .select(col(idCol))
        deduped.join(dirty, Seq(idCol), "left_anti")
    }

    decontaminated.withColumn("split",
      TextOps.splitAssign(col(textCol), cfg.trainPct, cfg.valPct))
  }
}
