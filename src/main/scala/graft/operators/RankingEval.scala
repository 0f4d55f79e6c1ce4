package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-quality metrics for retrieval audits — the numbers an engineer
  * actually reads after building an index or a fusion: given per-query
  * RESULT lists and per-query binary TRUTH sets, report per query
  * `recall@k` (hits / truth size), `MRR@k` (1/rank of the first hit, 0 if
  * none in the top k), and binary `nDCG@k` (DCG over hit ranks /
  * ideal DCG at min(k, truth size)).
  *
  * Scale shape: result lists are per-query TOP-K by contract (the rrfFuse
  * contract — auditing unbounded lists is a scorer bug), so the rank
  * window is bounded; truth joins on (query, id) and every aggregate keys
  * on the query — nothing scales past the audit's own size. Ranks derive
  * here from (scoreCol desc, idCol), a total order.
  *
  * Determinism (the §5 float discipline): the DCG weight `1/log2(r+1)` is
  * precomputed driver-side per rank 1..k, scaled to an exact long
  * (×10¹²), and enters the plan as a literal map — the summed DCG and the
  * ideal-DCG prefix are order-free long sums, and an oracle embeds the
  * SAME constants rather than re-deriving log2 in another engine's libm.
  *
  * Output: one row per TRUTH query — (queryIdCol, n_truth, n_hits,
  * recall, mrr, ndcg); a truth query absent from the results reports
  * zeros, a result query with no truth is dropped (its metrics are
  * undefined). Duplicate truth ids collapse.
  */
object RankingEval {

  /** Exact scaled DCG weight for rank r (shared with oracle builders). */
  def dcgWeight(r: Int): Long =
    math.round(1e12 / (math.log(r + 1) / math.log(2.0)))

  def metrics(results: DataFrame, truth: DataFrame, queryIdCol: String,
              idCol: String, scoreCol: String, k: Int): DataFrame = {
    require(k > 0, s"rankingMetrics: k=$k")
    val weights = (1 to k).map(i => i -> dcgWeight(i)).toMap
    val prefix = (1 to k).scanLeft(0L)((acc, i) => acc + weights(i))
    val prefixMap = (1 to k).map(i => i -> prefix(i)).toMap
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    val topk = results.select(col(queryIdCol), col(idCol), col(scoreCol))
      .withColumn("__r", row_number().over(w)).filter(col("__r") <= k)
    val truthIds = truth.select(col(queryIdCol), col(idCol)).distinct()
    val tn = truthIds.groupBy(col(queryIdCol)).agg(count(lit(1)).as("n_truth"))
    val hits = topk.join(truthIds, Seq(queryIdCol, idCol))
      .groupBy(col(queryIdCol))
      .agg(count(lit(1)).as("n_hits"), min(col("__r")).as("__fr"),
        sum(element_at(typedlit(weights), col("__r"))).as("__dcg"))
    tn.join(hits, Seq(queryIdCol), "left")
      .select(col(queryIdCol), col("n_truth"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double") /
          col("n_truth"), 6).as("recall"),
        round(coalesce(lit(1.0) / col("__fr"), lit(0.0)), 6).as("mrr"),
        round(coalesce(col("__dcg"), lit(0L)).cast("double") /
          element_at(typedlit(prefixMap),
            least(lit(k), col("n_truth")).cast("int")), 6).as("ndcg"))
  }
}
