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

  private[text] def toks(textCol: Column): Column =
    filter(split(textCol, "\\s+"), t => t =!= "")

  /** Adjacent-token pairs as (`w1`,`w2`) structs; empty below 2 tokens. */
  private[text] def grams(textCol: Column): Column = {
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

  /** Persist a trained [[BigramLm]] as warehouse tables — the reference
    * LM becomes a versionable cross-run artifact like the BPE merge
    * table (train once on the blessed reference slice, score every day's
    * crawl with the same model): the bigram counts land in `<table>` and
    * the vocabulary scalar in a one-row `<table>_meta`; the context
    * marginals re-derive from the counts on load (they are a groupBy of
    * `bigrams` — persisting them would be redundant state that could
    * drift).
    */
  def saveModel(spark: org.apache.spark.sql.SparkSession, lm: BigramLm,
                table: String): Unit = {
    import spark.implicits._
    lm.bigrams.write.mode("overwrite").format("parquet").saveAsTable(table)
    Seq(lm.vocab).toDF("vocab")
      .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_meta")
  }

  /** Load a [[saveModel]] model; scores are identical to the saved
    * model's by construction (counts are exact integers; marginals
    * re-derive deterministically).
    */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
                table: String): BigramLm = {
    val g = spark.table(table)
    val ctx = g.groupBy("w1").agg(sum("cnt").as("ctx"))
    val v = spark.table(s"${table}_meta").head().getLong(0)
    BigramLm(g, ctx, v)
  }

  /** Driver-resident serving form of a [[BigramLm]] — the artifact shape
    * a production gate actually deploys (CCNet ships its reference LM to
    * every scorer): counts in hash maps small enough to broadcast, so
    * scoring is a row-local pass with NO joins — usable inside a
    * streaming gate or a scan→filter pipeline where the join-based
    * [[crossEntropy]] cannot run.
    */
  final case class ServedBigramLm(
      bigrams: java.util.HashMap[String, Long],
      contexts: java.util.HashMap[String, Long],
      vocab: Long) extends Serializable

  private def gramKey(w1: String, w2: String): String = w1 + "\u0000" + w2

  /** Collect `lm` into a broadcastable [[ServedBigramLm]]. `minCount`
    * prunes rare bigrams the standard LM way — a pruned gram scores as
    * UNSEEN (numerator smoothing only; context denominators stay exact,
    * so pruning is monotone: scores can only rise). Sizes above
    * `maxEntries` fail LOUDLY instead of silently truncating — a model
    * too big to broadcast should be scored with [[crossEntropy]]'s joins
    * or pruned harder, not quietly mis-scored.
    */
  def serve(lm: BigramLm, minCount: Long = 1,
            maxEntries: Int = 4000000): ServedBigramLm = {
    val biDf = lm.bigrams.filter(col("cnt") >= minCount)
    // count BEFORE collecting: the require must fire before the
    // oversized model lands on the driver heap (Bpe.train's guard order)
    val nBi = biDf.count()
    require(nBi <= maxEntries,
      s"$nBi bigrams above minCount=$minCount exceeds maxEntries=" +
        s"$maxEntries: prune harder or score with crossEntropy()")
    val bi = biDf.collect()
    val nCtx = lm.contexts.count()
    require(nCtx <= maxEntries,
      s"$nCtx contexts exceed maxEntries=$maxEntries")
    val ctx = lm.contexts.collect()
    val bm = new java.util.HashMap[String, Long](bi.length * 2)
    bi.foreach(r => bm.put(gramKey(r.getString(0), r.getString(1)), r.getLong(2)))
    val cm = new java.util.HashMap[String, Long](ctx.length * 2)
    ctx.foreach(r => cm.put(r.getString(0), r.getLong(1)))
    ServedBigramLm(bm, cm, lm.vocab)
  }

  /** Row-local cross-entropy column under a served model — same
    * tokenization, smoothing, and ROUND(…,4) as [[crossEntropy]]
    * (spec-pinned equal at minCount 1); null for gram-free documents.
    * One broadcast, no shuffle: safe in streams and scan gates.
    */
  def scoreColumn(spark: org.apache.spark.sql.SparkSession,
                  served: ServedBigramLm, text: Column): Column = {
    val bc = spark.sparkContext.broadcast(served)
    val u = udf { (s: String) =>
      if (s == null) null
      else {
        val m = bc.value
        val toks = s.split("\\s+").filter(_.nonEmpty)
        if (toks.length < 2) null
        else {
          var sum = 0.0
          var i = 0
          while (i < toks.length - 1) {
            val cnt = m.bigrams.getOrDefault(gramKey(toks(i), toks(i + 1)), 0L)
            val ctx = m.contexts.getOrDefault(toks(i), 0L)
            sum -= math.log((cnt + 1.0) / (ctx + m.vocab.toDouble))
            i += 1
          }
          // match Spark's Round EXACTLY: HALF_UP over the shortest decimal
          // repr (BigDecimal.valueOf goes through Double.toString, like
          // Spark's BigDecimal.decimal) — `new BigDecimal(double)` takes
          // the exact binary expansion and disagrees at representation
          // boundaries (2.67455 binary-expands below ...455, rounding DOWN
          // where Spark rounds up), which would break the crossEntropy
          // parity contract for boundary documents
          java.lang.Double.valueOf(java.math.BigDecimal.valueOf(sum / (toks.length - 1))
            .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue())
        }
      }
    }
    u(text)
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
