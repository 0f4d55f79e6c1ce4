package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword search over the corpus — BM25 (Robertson/Spärck Jones; the
  * Lucene-default `ln(1 + (N - df + 0.5)/(df + 0.5))` idf form), the
  * retrieval complement of the embedding ANN tiers: a curation engineer
  * asks "which documents talk about X" with no embedding model in sight.
  *
  * Scale shape: scoring is ROW-LOCAL — per query term, tf comes from a
  * `size(filter(tokens))` column expression (the query has a handful of
  * terms; no explode, no term-keyed shuffle, no inverted index to
  * maintain), document length and per-term document frequencies come
  * from ONE partial-aggregated stats pass whose single row broadcasts
  * back, and the top-k is Spark's TakeOrdered. Two scans total at any
  * corpus size.
  *
  * Determinism (the §5 float discipline): all corpus aggregates are
  * integer-valued doubles (exact at any partitioning), the per-document
  * score sums its per-term contributions in a FIXED left-to-right
  * expression tree with each term's contribution rounded to 6 decimals,
  * and the final score rounds to 4 — the DuckDB oracle mirrors the same
  * nesting, so rankings hash-match cross-engine (ln at 4 decimals is the
  * t13 precedent).
  */
object Search {

  /** Top-`topK` documents for a whitespace query, scored by BM25.
    * Returns (idCol, score) ordered by (score desc, id); zero-score and
    * null-text documents are excluded. Matching is lowercase-exact on
    * whitespace tokens (the span-cut convention).
    */
  def bm25(df: DataFrame, textCol: String, idCol: String, query: String,
           topK: Int = 20, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = query.toLowerCase.split("\\s+").filter(_.nonEmpty)
      .distinct.toSeq
    require(terms.nonEmpty, "bm25: empty query")
    require(topK > 0, s"bm25: topK=$topK")
    val toks = filter(split(lower(col(textCol)), "\\s+"), t => t =!= "")
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(col("__toks"), x => x === lit(t))).cast("double")
        .as(s"__tf$i")
    }
    val withTf = df
      .select(col(idCol), toks.as("__toks"),
        size(toks).cast("double").as("__dl"))
      .select(col(idCol) +: col("__dl") +: tfCols: _*)
    val statsCols =
      avg(col("__dl")).as("__avgdl") +:
        terms.indices.map(i =>
          sum(when(col(s"__tf$i") > 0, 1).otherwise(0)).cast("double")
            .as(s"__df$i"))
    val stats = withTf.agg(
      count(lit(1)).cast("double").as("__n"), statsCols: _*)
    val perTerm: Seq[Column] = terms.indices.map { i =>
      val idf = log(lit(1.0) +
        (col("__n") - col(s"__df$i") + lit(0.5)) / (col(s"__df$i") + lit(0.5)))
      round(idf * col(s"__tf$i") * lit(k1 + 1.0) /
        (col(s"__tf$i") +
          lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("__dl") / col("__avgdl"))),
        6)
    }
    withTf.crossJoin(broadcast(stats))
      .withColumn("score", round(perTerm.reduce(_ + _), 4))
      .filter(col("score") > 0)
      .select(col(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
  }
}
