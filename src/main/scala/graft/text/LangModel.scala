package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical n-gram language-model scoring — the CCNet-style quality
  * signal: score each document by its per-token cross-entropy under a
  * bigram model trained on a reference corpus (train on a trusted slice,
  * score the crawl; documents whose token transitions look nothing like
  * the reference score high and get filtered or bucketed into quality
  * tiers). Model-free heuristics (length, repetition, symbol density)
  * catch structural garbage; this catches fluent-looking token soup.
  *
  * The model is Laplace-smoothed: P(w2|w1) = (c(w1,w2)+1) / (c(w1,·)+V),
  * with V the training vocabulary size. Counts live in DataFrames, so a
  * model trained on billions of tokens never touches the driver (V is the
  * one deliberate scalar, the IVF-centroid precedent); scoring is a pair
  * of joins against those count tables.
  *
  * Shuffle shape at scale (the rareTokenStats discipline): raw token
  * occurrences never cross the wire — document grams collapse to distinct
  * (id, w1, w2, k) rows map-side on the unskewed (id, gram) key before the
  * gram-keyed model join, so a boilerplate bigram routes one row per
  * containing document, not one per occurrence. The final per-document
  * aggregation keys on the id alone.
  *
  * Tokenization is the empty-filtered whitespace split (the span-cut
  * convention, L20c), identical in the DuckDB oracle.
  */
object LangModel {

  /** Bigram counts (`w1`,`w2`,`cnt`), their per-context marginals
    * (`w1`,`ctx`), and the vocabulary size. `contexts` derives from
    * `bigrams`, so persisting `bigrams` (plus the scalar) persists the
    * whole model.
    */
  final case class BigramLm(bigrams: DataFrame, contexts: DataFrame, vocab: Long)

  private def toks(textCol: Column): Column =
    filter(split(textCol, "\\s+"), t => t =!= "")

  /** Adjacent-token pairs as (`w1`,`w2`) structs; empty below 2 tokens. */
  private def grams(textCol: Column): Column = {
    val t = toks(textCol)
    val n = greatest(size(t) - 1, lit(0))
    zip_with(slice(t, lit(1), n), slice(t, lit(2), n),
      (a, b) => struct(a.as("w1"), b.as("w2")))
  }

  /** Train a Laplace-smoothed bigram model over `df`'s `textCol`. One
    * corpus scan; the gram explode partial-aggregates map-side into
    * (w1, w2) counts. `vocab` (distinct token count) is the one action.
    */
  def trainBigramLm(df: DataFrame, textCol: String): BigramLm = {
    val g = df.select(explode(grams(col(textCol))).as("g"))
      .select(col("g.w1"), col("g.w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
    val ctx = g.groupBy("w1").agg(sum("cnt").as("ctx"))
    val v = df.select(explode(toks(col(textCol))).as("t"))
      .agg(count_distinct(col("t"))).head().getLong(0)
    BigramLm(g, ctx, v)
  }

  /** Per-document cross-entropy under `lm`: mean −ln P(w2|w1) over the
    * document's bigrams (rounded to 4 decimals), plus the bigram count.
    * Documents with fewer than 2 tokens emit `n_bigrams` 0 and a null
    * score. Unseen grams and contexts are smoothed, never dropped — a
    * document from outside the training distribution scores high, which
    * is exactly the signal.
    */
  def crossEntropy(df: DataFrame, textCol: String, idCol: String,
                   lm: BigramLm): DataFrame = {
    // distinct (id, gram, k) map-side collapse before the gram-keyed joins
    val docGrams = df.select(col(idCol), explode(grams(col(textCol))).as("g"))
      .groupBy(col(idCol), col("g.w1").as("w1"), col("g.w2").as("w2"))
      .agg(count(lit(1)).as("k"))
    val scored = docGrams
      .join(lm.bigrams, Seq("w1", "w2"), "left")
      .join(lm.contexts, Seq("w1"), "left")
      .select(col(idCol), col("k"),
        log((coalesce(col("cnt"), lit(0L)) + lit(1.0)) /
            (coalesce(col("ctx"), lit(0L)) + lit(lm.vocab.toDouble))).as("__lp"))
      .groupBy(col(idCol)).agg(
        sum(col("k")).cast("int").as("n_bigrams"),
        round(-sum(col("k") * col("__lp")) / sum(col("k")), 4).as("cross_entropy"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0)).as("n_bigrams"),
        col("cross_entropy"))
  }
}
