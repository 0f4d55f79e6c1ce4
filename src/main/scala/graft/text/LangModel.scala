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

  // ---------------------------------------------------------------------
  // Interpolated Kneser–Ney trigram tier — the smoothing the production
  // CCNet-style gates actually ship (KenLM trains interpolated
  // modified-KN; this is the fixed-discount interpolated-KN form, the
  // textbook Chen & Goodman 1999 eq. set). Laplace bigrams (above) are
  // the cheap tier; KN's continuation counts fix Laplace's known failure
  // — "Francisco" gets a huge unigram count from one context, Laplace
  // overweights it everywhere, KN weights it by how many DISTINCT
  // contexts it completes.
  //
  // EVERYTHING derives from one trigram-count table, the textbook trick:
  // the bigram-level model is built from trigram CONTINUATION counts
  // (N1+(·w2w3) = distinct w1 preceding the bigram), the unigram level
  // from bigram continuations, so persisting trigram counts (+2 scalars)
  // persists the whole model and no derived table can drift.
  // ---------------------------------------------------------------------

  /** Interpolated-KN trigram model. `trigrams` (w1,w2,w3,cnt) is the one
    * authoritative table; `ctx2`/`contBi`/`ctx1`/`contUni` re-derive
    * from it (see [[trainKnTrigramLm]]); `nBigramTypes` = N1+(··)
    * (distinct (w2,w3) continuation pairs), `nUnigramTypes` = distinct
    * w3 with any continuation mass, `vocab` = training token types.
    */
  final case class KnTrigramLm(trigrams: DataFrame, ctx2: DataFrame,
                               contBi: DataFrame, ctx1: DataFrame,
                               contUni: DataFrame, nBigramTypes: Long,
                               nUnigramTypes: Long, vocab: Long,
                               discount: Double)

  /** Per-document trigram structs; empty below 3 tokens. */
  private[text] def grams3(textCol: Column): Column = {
    val t = toks(textCol)
    val n = greatest(size(t) - 2, lit(0))
    zip_with(
      zip_with(slice(t, lit(1), n), slice(t, lit(2), n),
        (a, b) => struct(a.as("w1"), b.as("w2"))),
      slice(t, lit(3), n),
      (p, c) => struct(p.getField("w1").as("w1"), p.getField("w2").as("w2"),
        c.as("w3")))
  }

  /** Train an interpolated-KN trigram model over `df`'s `textCol`. One
    * corpus scan builds the trigram counts; the four derived tables are
    * groupBys of those counts (each a partial-aggregated exchange on its
    * own unskewed gram key); the three scalars are the one driver
    * action (the `vocab` precedent). `discount` is the standard fixed
    * D ∈ (0,1) — 0.75 is the Chen–Goodman default; a production tune
    * would estimate D = n1/(n1+2n2) from count-of-count statistics.
    */
  def trainKnTrigramLm(df: DataFrame, textCol: String,
                       discount: Double = 0.75): KnTrigramLm = {
    require(discount > 0 && discount < 1,
      s"KN discount must be in (0,1): $discount")
    val tri = df.select(explode(grams3(col(textCol))).as("g"))
      .select(col("g.w1"), col("g.w2"), col("g.w3"))
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("cnt"))
    // highest-order context stats: total mass + continuation fanout
    val ctx2 = tri.groupBy("w1", "w2")
      .agg(sum("cnt").as("ctx2"), count_distinct(col("w3")).as("n1p2"))
    // bigram-level CONTINUATION counts: in how many distinct left
    // contexts does (w2,w3) appear — the KN substitute for raw bigram
    // counts at the interpolated lower order
    val contBi = tri.groupBy("w2", "w3")
      .agg(count_distinct(col("w1")).as("ccnt"))
    val ctx1 = contBi.groupBy("w2")
      .agg(sum("ccnt").as("cctx1"), count_distinct(col("w3")).as("n1p1"))
    val contUni = contBi.groupBy("w3")
      .agg(count_distinct(col("w2")).as("ucnt"))
    val sc = contBi.agg(count(lit(1)), count_distinct(col("w3"))).head()
    // a reference corpus with no trigram leaves every ladder level 0/0 —
    // fail at train time, not as a NaN inside a scoring job
    require(sc.getLong(0) > 0,
      "KN model is degenerate: the reference corpus yields no trigrams " +
        "(need at least one document with 3+ tokens)")
    val v = df.select(explode(toks(col(textCol))).as("t"))
      .agg(count_distinct(col("t"))).head().getLong(0)
    KnTrigramLm(tri, ctx2, contBi, ctx1, contUni,
      sc.getLong(0), sc.getLong(1), v, discount)
  }

  /** Persist a [[KnTrigramLm]]: trigram counts in `<table>`, the scalars
    * in a one-row `<table>_meta`. The derived tables re-derive on load
    * (the [[saveModel]] no-drift convention).
    */
  def saveKnModel(spark: org.apache.spark.sql.SparkSession, lm: KnTrigramLm,
                  table: String): Unit = {
    import spark.implicits._
    lm.trigrams.write.mode("overwrite").format("parquet").saveAsTable(table)
    Seq((lm.vocab, lm.discount))
      .toDF("vocab", "discount")
      .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_meta")
  }

  /** Load a [[saveKnModel]] model; scores are identical to the saved
    * model's (counts exact, derivations deterministic, scalars
    * re-counted from the same counts). */
  def loadKnModel(spark: org.apache.spark.sql.SparkSession,
                  table: String): KnTrigramLm = {
    val tri = spark.table(table)
    val meta = spark.table(s"${table}_meta").head()
    val ctx2 = tri.groupBy("w1", "w2")
      .agg(sum("cnt").as("ctx2"), count_distinct(col("w3")).as("n1p2"))
    val contBi = tri.groupBy("w2", "w3")
      .agg(count_distinct(col("w1")).as("ccnt"))
    val ctx1 = contBi.groupBy("w2")
      .agg(sum("ccnt").as("cctx1"), count_distinct(col("w3")).as("n1p1"))
    val contUni = contBi.groupBy("w3")
      .agg(count_distinct(col("w2")).as("ucnt"))
    val sc = contBi.agg(count(lit(1)), count_distinct(col("w3"))).head()
    require(sc.getLong(0) > 0,
      s"KN model at '$table' is degenerate: no trigram counts")
    KnTrigramLm(tri, ctx2, contBi, ctx1, contUni,
      sc.getLong(0), sc.getLong(1), meta.getLong(0), meta.getDouble(1))
  }

  /** Driver-resident serving form of a [[KnTrigramLm]] — the
    * [[ServedBigramLm]] contract for the KN tier: all five count tables
    * in broadcastable hash maps, so scoring is a row-local pass usable
    * in streaming gates. Paired stats pack as 2-element arrays.
    */
  final case class ServedKnLm(
      tri: java.util.HashMap[String, Long],
      ctx2: java.util.HashMap[String, Array[Long]],
      cbi: java.util.HashMap[String, Long],
      ctx1: java.util.HashMap[String, Array[Long]],
      cuni: java.util.HashMap[String, Long],
      nBigramTypes: Long, nUnigramTypes: Long, vocab: Long,
      discount: Double) extends Serializable

  /** Collect `lm` into a broadcastable [[ServedKnLm]]. No pruning knob:
    * KN's interpolation weights are exact count ratios — dropping rare
    * trigrams would silently shift mass between ladder levels (unlike
    * Laplace, where pruning is monotone); a model too big to broadcast
    * scores with [[knCrossEntropy]]'s joins. `maxEntries` bounds the
    * LARGEST table (trigrams) and fails loudly (the [[serve]] guard
    * order: count before collect).
    */
  def serveKn(lm: KnTrigramLm, maxEntries: Int = 4000000): ServedKnLm = {
    require(lm.nBigramTypes > 0,
      "KN model is degenerate (no trigram counts): scoring would be 0/0")
    val nTri = lm.trigrams.count()
    require(nTri <= maxEntries,
      s"$nTri trigrams exceed maxEntries=$maxEntries: " +
        "score with knCrossEntropy() or train on a smaller reference")
    val tm = new java.util.HashMap[String, Long]((nTri * 2).toInt)
    lm.trigrams.collect().foreach(r => tm.put(
      r.getString(0) + "\u0000" + r.getString(1) + "\u0000" + r.getString(2),
      r.getLong(3)))
    val c2 = new java.util.HashMap[String, Array[Long]]()
    lm.ctx2.collect().foreach(r => c2.put(
      r.getString(0) + "\u0000" + r.getString(1),
      Array(r.getLong(2), r.getLong(3))))
    val cb = new java.util.HashMap[String, Long]()
    lm.contBi.collect().foreach(r =>
      cb.put(r.getString(0) + "\u0000" + r.getString(1), r.getLong(2)))
    val c1 = new java.util.HashMap[String, Array[Long]]()
    lm.ctx1.collect().foreach(r =>
      c1.put(r.getString(0), Array(r.getLong(1), r.getLong(2))))
    val cu = new java.util.HashMap[String, Long]()
    lm.contUni.collect().foreach(r => cu.put(r.getString(0), r.getLong(1)))
    ServedKnLm(tm, c2, cb, c1, cu,
      lm.nBigramTypes, lm.nUnigramTypes, lm.vocab, lm.discount)
  }

  /** Row-local KN cross-entropy column — same ladder, tokenization, and
    * ROUND(…,4) as [[knCrossEntropy]] (spec-pinned equal); null under 3
    * tokens. One broadcast, no shuffle: safe in streams and scan gates.
    */
  def scoreKnColumn(spark: org.apache.spark.sql.SparkSession,
                    served: ServedKnLm, text: Column): Column = {
    val bc = spark.sparkContext.broadcast(served)
    val u = udf { (s: String) =>
      if (s == null) null
      else {
        val m = bc.value
        val d = m.discount
        val nn = m.nBigramTypes.toDouble
        val floor = d * m.nUnigramTypes.toDouble / nn *
          (1.0 / (m.vocab.toDouble + 1.0))
        val toks = s.split("\\s+").filter(_.nonEmpty)
        if (toks.length < 3) null
        else {
          var sum = 0.0
          var i = 0
          while (i < toks.length - 2) {
            val (w1, w2, w3) = (toks(i), toks(i + 1), toks(i + 2))
            val p1 = math.max(
              m.cuni.getOrDefault(w3, 0L).toDouble - d, 0.0) / nn + floor
            val s1 = m.ctx1.get(w2)
            val p2 = if (s1 == null) p1
              else math.max(m.cbi.getOrDefault(w2 + "\u0000" + w3, 0L)
                .toDouble - d, 0.0) / s1(0).toDouble +
                d * s1(1).toDouble / s1(0).toDouble * p1
            val s2 = m.ctx2.get(w1 + "\u0000" + w2)
            val p3 = if (s2 == null) p2
              else math.max(m.tri.getOrDefault(
                w1 + "\u0000" + w2 + "\u0000" + w3, 0L).toDouble - d, 0.0) /
                s2(0).toDouble +
                d * s2(1).toDouble / s2(0).toDouble * p2
            sum -= math.log(p3)
            i += 1
          }
          // HALF_UP over the shortest decimal repr — the scoreColumn
          // round-parity discipline
          java.lang.Double.valueOf(java.math.BigDecimal
            .valueOf(sum / (toks.length - 2))
            .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue())
        }
      }
    }
    u(text)
  }

  /** Per-document cross-entropy under interpolated KN: mean −ln P(w3|w1,w2)
    * over the document's trigrams (ROUND 4), plus the trigram count;
    * documents under 3 tokens emit 0/null (the [[crossEntropy]] shape).
    *
    * The probability ladder (Chen & Goodman interpolated KN, fixed D):
    *  - P1(w) = max(N1+(·w)−D,0)/N1+(··) + D·W/N1+(··)·1/(V+1) — the
    *    continuation unigram interpolated with a uniform floor over
    *    V+1 types (the +1 is the OOV type, so out-of-vocabulary tokens
    *    carry mass and −ln stays finite — exactly the high score an
    *    out-of-distribution document should get)
    *  - P2(w3|w2) = max(N1+(·w2w3)−D,0)/N1+(·w2·) + D·N1+(w2·)/N1+(·w2·)·P1(w3),
    *    falling back to P1 when w2 has no continuation mass
    *  - P3(w3|w1,w2) = max(c−D,0)/c(w1w2·) + D·N1+(w1w2·)/c(w1w2·)·P2,
    *    falling back to P2 when the context is unseen
    *
    * Shuffle shape = [[crossEntropy]]'s: per-document grams collapse
    * map-side to distinct (id, gram, k) before the five gram-keyed model
    * joins (each on its own unskewed key; the model side of each join is
    * partial-aggregated counts, not occurrences), and the final
    * aggregation keys on the id alone. The three scalars enter as
    * literals. The expression tree mirrors the DuckDB oracle term for
    * term (same associativity), the t13 parity discipline.
    */
  def knCrossEntropy(df: DataFrame, textCol: String, idCol: String,
                     lm: KnTrigramLm): DataFrame = {
    require(lm.nBigramTypes > 0,
      "KN model is degenerate (no trigram counts): scoring would be 0/0")
    val d = lm.discount
    val nn = lm.nBigramTypes.toDouble
    val ww = lm.nUnigramTypes.toDouble
    val vp1 = lm.vocab.toDouble + 1.0
    val docGrams = df.select(col(idCol), explode(grams3(col(textCol))).as("g"))
      .groupBy(col(idCol), col("g.w1").as("w1"), col("g.w2").as("w2"),
        col("g.w3").as("w3"))
      .agg(count(lit(1)).as("k"))
    val joined = docGrams
      .join(lm.trigrams, Seq("w1", "w2", "w3"), "left")
      .join(lm.ctx2, Seq("w1", "w2"), "left")
      .join(lm.contBi, Seq("w2", "w3"), "left")
      .join(lm.ctx1, Seq("w2"), "left")
      .join(lm.contUni, Seq("w3"), "left")
    val p1 = greatest(coalesce(col("ucnt"), lit(0L)).cast("double") - lit(d),
        lit(0.0)) / lit(nn) +
      lit(d) * lit(ww) / lit(nn) * (lit(1.0) / lit(vp1))
    val p2 = when(col("cctx1").isNull, p1).otherwise(
      greatest(coalesce(col("ccnt"), lit(0L)).cast("double") - lit(d),
        lit(0.0)) / col("cctx1").cast("double") +
      lit(d) * col("n1p1").cast("double") / col("cctx1").cast("double") * p1)
    val p3 = when(col("ctx2").isNull, p2).otherwise(
      greatest(coalesce(col("cnt"), lit(0L)).cast("double") - lit(d),
        lit(0.0)) / col("ctx2").cast("double") +
      lit(d) * col("n1p2").cast("double") / col("ctx2").cast("double") * p2)
    val scored = joined
      .select(col(idCol), col("k"), log(p3).as("__lp"))
      .groupBy(col(idCol)).agg(
        sum(col("k")).cast("int").as("n_trigrams"),
        round(-sum(col("k") * col("__lp")) / sum(col("k")), 4)
          .as("cross_entropy"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_trigrams"), lit(0)).as("n_trigrams"),
        col("cross_entropy"))
  }
}
