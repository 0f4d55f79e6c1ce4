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
  * composition order and threads the columns through. At real corpus scale,
  * persist (or write out) the post-filter survivors before the dedup
  * stages — near-dedup's candidate and verify branches both read their
  * input, and recomputing the quality gate twice on 100 TB is real money.
  */
object CorpusPipeline {

  /** @param langs             kept language codes (from [[TextOps.langId]])
    * @param minQuality        [[TextOps.qualityScore]] threshold
    * @param nearDupThreshold  n-gram Jaccard above which a doc is a dup
    * @param maxContamination  drop docs sharing ≥ this many distinct n-grams
    *                          with the benchmark (when one is given)
    */
  case class Config(
      langs: Set[String] = Set("en"),
      minQuality: Double = 0.5,
      nearDupThreshold: Double = 0.7,
      contaminationNgram: Int = 8,
      maxContamination: Long = 1,
      trainPct: Int = 90,
      valPct: Int = 5)

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

    val exact = Dedup.exact(scored, textCol, idCol)
    val deduped = Dedup.nearDedup(exact, textCol, idCol, cfg.nearDupThreshold)

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
