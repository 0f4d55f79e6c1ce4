package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al., "Data
  * Selection for Language Models via Importance Resampling", 2023): given a
  * small TARGET corpus that looks like what you want to train on and a huge
  * RAW crawl, score every raw document by how much more likely its bigram
  * bag is under the target's n-gram distribution than under the raw
  * corpus's own —
  *
  *   log w(x) = Σ_g k_g · ( ln p̂_target(g) − ln p̂_raw(g) )
  *
  * with Laplace smoothing over the shared feature space — and keep the
  * top-weighted documents. This is the distribution-matching selector the
  * pointwise quality tiers can't express: a document can pass every
  * heuristic gate ([[TextOps.qualityScore]]), the classifier ([[Classifier]])
  * and the reference LM ([[LangModel]]) and still be from the wrong domain;
  * the likelihood RATIO is relative to the raw pool, so it up-weights
  * exactly what is target-like AND rare in the crawl.
  *
  * Features are token bigrams, either EXACT (`hashBuckets = None` — the
  * gram string is the feature; model size is the corpus's distinct-bigram
  * count, the [[LangModel.trainBigramLm]] regime) or HASHED
  * (`hashBuckets = Some(m)` — DSIR's own trick: grams hash into a fixed
  * m-dimensional space, so the model is bounded at m rows regardless of
  * corpus size and broadcasts at any scale; collisions blur the estimate
  * but preserve the expected ratio). Tokenization is the empty-filtered
  * whitespace split (the span-cut convention), identical in the DuckDB
  * oracle.
  *
  * Shuffle shape at scale — the [[LangModel.crossEntropy]] discipline:
  * raw token occurrences never cross the wire; document grams collapse to
  * distinct (id, gram, k) rows map-side on the unskewed (id, gram) key
  * before the gram-keyed model join, so a boilerplate bigram routes one
  * row per containing document. Model totals are two scalars (the
  * IVF-centroid precedent). Selection is a global TOP-N on the rounded
  * weight with the id as tie-break — a sort-based shuffle, the one
  * inherently global stage, and Spark's sort scales it.
  */
object Importance {

  /** Gram-ratio model: one row per feature (`gk`) with its raw / target
    * occurrence counts, plus the two corpus totals and the Laplace feature
    * count (`features` = distinct observed grams when exact, the bucket
    * count when hashed — the fixed dimension smoothing divides by).
    */
  final case class ImportanceModel(grams: DataFrame, rawTotal: Long,
                                   targetTotal: Long, features: Long,
                                   hashBuckets: Option[Int])

  // The feature key of an exploded gram struct `g`: the "w1 w2" string
  // (tokens cannot contain whitespace, so the join key is unambiguous) or
  // its hash bucket. Keying model AND documents through this one function
  // is what makes a hashed model impossible to probe with exact keys.
  private def keyOf(hashBuckets: Option[Int]): Column = hashBuckets match {
    case None => concat_ws(" ", col("g.w1"), col("g.w2"))
    case Some(m) => pmod(hash(col("g.w1"), col("g.w2")), lit(m))
  }

  private def gramCounts(df: DataFrame, textCol: String,
                         hashBuckets: Option[Int], as: String): DataFrame =
    df.select(explode(LangModel.grams(col(textCol))).as("g"))
      .select(keyOf(hashBuckets).as("gk"))
      .groupBy("gk").agg(count(lit(1)).as(as))

  /** Train the ratio model: one scan of each corpus, map-side partial
    * aggregation into gram counts, a full outer join on the feature key.
    * Two driver actions (the totals pair, and — exact mode only — the
    * distinct-feature count).
    */
  def trainImportanceModel(raw: DataFrame, target: DataFrame, textCol: String,
                           hashBuckets: Option[Int] = None): ImportanceModel = {
    hashBuckets.foreach(m => require(m > 0, s"hashBuckets=$m"))
    val model = gramCounts(raw, textCol, hashBuckets, "rcnt")
      .join(gramCounts(target, textCol, hashBuckets, "tcnt"), Seq("gk"), "full_outer")
      .select(col("gk"),
        coalesce(col("rcnt"), lit(0L)).as("rcnt"),
        coalesce(col("tcnt"), lit(0L)).as("tcnt"))
    val tot = model.agg(sum("rcnt"), sum("tcnt")).head()
    val features = hashBuckets.map(_.toLong).getOrElse(model.count())
    ImportanceModel(model, tot.getLong(0), tot.getLong(1), features, hashBuckets)
  }

  /** Per-document log importance weight under `model`: (`idCol`,
    * `n_grams`, `log_weight` rounded to 4 decimals). Documents with fewer
    * than 2 tokens have no features — `n_grams` 0, null weight (no
    * evidence either way; [[resampleTop]] ranks them last).
    */
  def importanceWeights(docs: DataFrame, textCol: String, idCol: String,
                        model: ImportanceModel): DataFrame = {
    val lnT = log((coalesce(col("tcnt"), lit(0L)) + lit(1.0)) /
      lit(model.targetTotal + model.features.toDouble))
    val lnR = log((coalesce(col("rcnt"), lit(0L)) + lit(1.0)) /
      lit(model.rawTotal + model.features.toDouble))
    val docGrams = docs
      .select(col(idCol), explode(LangModel.grams(col(textCol))).as("g"))
      .select(col(idCol), keyOf(model.hashBuckets).as("gk"))
      .groupBy(col(idCol), col("gk")).agg(count(lit(1)).as("k"))
    val scored = docGrams
      .join(model.grams, Seq("gk"), "left")
      .select(col(idCol), col("k"), (lnT - lnR).as("__lw"))
      .groupBy(col(idCol)).agg(
        sum(col("k")).cast("int").as("n_grams"),
        round(sum(col("k") * col("__lw")), 4).as("log_weight"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0)).as("n_grams"),
        col("log_weight"))
  }

  /** The selector: the `n` highest-weighted documents (deterministic:
    * rounded weight descending, nulls last, `idCol` as tie-break), with
    * their weights attached. Train on (raw, target), score raw, keep the
    * top — DSIR's selection step with the rank-based deterministic rule
    * (the [[TextOps.sourceQuota]] no-RNG convention) in place of Gumbel
    * sampling.
    */
  def resampleTop(raw: DataFrame, target: DataFrame, textCol: String,
                  idCol: String, n: Int,
                  hashBuckets: Option[Int] = None): DataFrame = {
    require(n > 0, s"n=$n")
    val model = trainImportanceModel(raw, target, textCol, hashBuckets)
    importanceWeights(raw, textCol, idCol, model)
      .orderBy(col("log_weight").desc_nulls_last, col(idCol))
      .limit(n)
  }
}
