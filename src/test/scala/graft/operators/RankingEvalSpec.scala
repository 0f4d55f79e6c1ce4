package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RankingEvalSpec extends SparkSpec {
  import spark.implicits._

  private def w(r: Int) = RankingEval.dcgWeight(r)

  test("rankingMetrics: hand-computed recall/MRR/nDCG, zero and edge rows") {
    // q1: truth {1,2,3,4}; results ranked (by score desc, id) 2, 9, 1, 7 —
    // k=3 cuts 7; hits at ranks 1 and 3
    // q2: truth {5}; results miss entirely
    // q3: truth {6}; query absent from results → zero row
    // q4: results only, no truth → dropped
    val results = Seq(
      ("q1", 2L, 0.9), ("q1", 9L, 0.8), ("q1", 1L, 0.7), ("q1", 7L, 0.6),
      ("q2", 8L, 1.0),
      ("q4", 1L, 1.0)).toDF("qid", "id", "score")
    val truth = Seq(("q1", 1L), ("q1", 2L), ("q1", 3L), ("q1", 4L),
      ("q1", 2L), // duplicate truth id collapses
      ("q2", 5L), ("q3", 6L)).toDF("qid", "id")
    val got = RankingEval.metrics(results, truth, "qid", "id", "score", k = 3)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    def r6(x: Double) = BigDecimal.decimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ndcgQ1 = r6((w(1) + w(3)).toDouble / (w(1) + w(2) + w(3)))
    assert(got == Map(
      "q1" -> ((4L, 2L, 0.5, 1.0, ndcgQ1)),
      "q2" -> ((1L, 0L, 0.0, 0.0, 0.0)),
      "q3" -> ((1L, 0L, 0.0, 0.0, 0.0))), got.toString)
    // perfect ranking: all metrics 1 (idcg prefix = min(k, n_truth) hits)
    val perfect = RankingEval.metrics(
      Seq(("p", 1L, 3.0), ("p", 2L, 2.0), ("p", 3L, 1.0)).toDF("qid", "id", "score"),
      Seq(("p", 1L), ("p", 2L), ("p", 3L)).toDF("qid", "id"),
      "qid", "id", "score", k = 3).head()
    assert((perfect.getDouble(3), perfect.getDouble(4), perfect.getDouble(5))
      == ((1.0, 1.0, 1.0)))
    // truth larger than k: recall caps at k/|truth|, ndcg ideal uses k
    val capped = RankingEval.metrics(
      Seq(("c", 1L, 2.0), ("c", 2L, 1.0)).toDF("qid", "id", "score"),
      (1L to 10L).map(i => ("c", i)).toDF("qid", "id"),
      "qid", "id", "score", k = 2).head()
    assert(capped.getDouble(3) == 0.2) // 2 hits / 10 truth
    assert(capped.getDouble(5) == 1.0) // ideal at min(k, 10) = 2 = achieved
  }
}
