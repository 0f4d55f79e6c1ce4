package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram language-model tokenizer (Kudo 2018, the SentencePiece unigram
  * family) — the OTHER production subword tokenizer, complementing [[Bpe]]:
  * BPE composes greedily bottom-up from learned merges; a unigram tokenizer
  * keeps a scored piece vocabulary and segments each word by VITERBI — the
  * maximum-likelihood split under independent piece log-probabilities. The
  * practical difference a data pipeline cares about: unigram models give a
  * principled per-document log-likelihood (a quality/fit signal BPE cannot
  * produce) and degrade gracefully on unseen words via an explicit `<unk>`
  * piece instead of char-soup fallback.
  *
  * Scale split — identical to [[Bpe.train]]'s: training needs only the WORD
  * HISTOGRAM (vocabulary-sized, not corpus-sized), computed in one
  * distributed scan with map-side partial aggregation, collected behind a
  * loud `maxWords` guard; the EM loop then runs driver-local over the
  * histogram. Encoding broadcasts the scored vocabulary and runs row-local
  * with a per-executor word cache (natural text reuses words heavily).
  *
  * Determinism — the property every boundary here is built around:
  *  - Scores are INTEGER micro-nats (`round(ln(p)·1e6)`): Viterbi sums and
  *    compares exact longs, so the argmax segmentation is bit-reproducible
  *    on any engine that can add integers — which is what lets the driver
  *    oracle replay encoding in SQL against the exported vocabulary.
  *  - Viterbi ties break by a strict total order: higher score, then FEWER
  *    pieces, then the LONGER final piece. Together with integer scores
  *    this pins one canonical segmentation per word.
  *  - Training is hard-EM (Viterbi counts, not forward–backward): counts
  *    stay integers, pruning is (usage desc, piece asc), and the word
  *    histogram is an exact aggregate — so the same corpus yields the same
  *    tokenizer on any cluster layout. (Real SentencePiece uses soft EM;
  *    hard EM trades a sliver of likelihood for cross-run determinism,
  *    which a 100 TB pipeline re-tokenizing shards on different clusters
  *    values more.)
  *
  * Words are whitespace tokens (the [[Bpe]] / span-cut convention); pieces
  * never cross word boundaries.
  */
object Unigram {

  /** The unknown-piece label emitted for characters no vocabulary piece
    * covers. Never stored as a regular piece (rows are kind-tagged in
    * [[saveModel]] / the oracle export, so a corpus word spelled literally
    * "<unk>" cannot collide with it).
    */
  val Unk = "<unk>"

  /** A trained model: scored pieces (micro-nat log-probs), the unknown
    * score (strictly below every piece score, so `<unk>` is only ever
    * chosen when no piece covers a character), and the max piece length
    * the DP scans.
    */
  final case class UnigramModel(pieces: Seq[(String, Long)], unkScore: Long,
                                maxPieceLen: Int) extends Serializable {
    require(pieces.nonEmpty, "empty vocabulary")
    require(maxPieceLen >= 1, s"maxPieceLen=$maxPieceLen")
  }

  private def micronats(num: Long, den: Long): Long =
    math.round(math.log(num.toDouble / den.toDouble) * 1e6)

  /** Train a `vocabSize`-piece model from `df`'s `textCol`.
    *
    * Seeding: every substring of length 1..`maxPieceLen` of every distinct
    * word, weighted by word frequency; all single characters are always
    * kept (encodability floor — `vocabSize` is exceeded iff the corpus has
    * more distinct characters than `vocabSize`). Each EM iteration
    * Viterbi-segments the histogram under current scores, prunes to the
    * target size by (usage desc, piece asc), and re-scores with add-one
    * smoothing (unused-but-kept characters keep finite mass).
    */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
            maxPieceLen: Int = 3, emIters: Int = 3,
            maxWords: Int = 1 << 22): UnigramModel = {
    require(vocabSize >= 1, s"vocabSize=$vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen=$maxPieceLen")
    require(emIters >= 1, s"emIters=$emIters")
    val histDf = df
      .select(explode(filter(split(col(textCol), "\\s+"), t => t =!= "")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    // guard BEFORE the collect (the Bpe.train discipline): the cap exists
    // to prevent the driver-heap OOM, so it must fire before the heap fills
    val distinctWords = histDf.count()
    require(distinctWords <= maxWords,
      s"$distinctWords distinct words exceed maxWords=$maxWords: " +
        "raise the cap or pre-filter the corpus")
    val hist = histDf.collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)

    // seed: weighted substring counts up to maxPieceLen
    val sub = scala.collection.mutable.HashMap[String, Long]()
    for ((w, c) <- hist; l <- 1 to math.min(maxPieceLen, w.length);
         i <- 0 to w.length - l) {
      val p = w.substring(i, i + l)
      sub(p) = sub.getOrElse(p, 0L) + c
    }
    val chars = sub.keysIterator.filter(_.length == 1).toSeq.sorted
    require(chars.nonEmpty, "corpus has no words to train on")
    val seedCap = math.max(vocabSize * 4, chars.size)
    val seedMulti = sub.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, seedCap - chars.size)).map(_._1)
    var vocab: Seq[String] = chars ++ seedMulti
    val seedTotal = vocab.iterator.map(sub).sum
    var scores: Map[String, Long] =
      vocab.iterator.map(p => p -> micronats(sub(p), seedTotal)).toMap

    for (_ <- 1 to emIters) {
      val sMap = new java.util.HashMap[String, java.lang.Long](scores.size * 2)
      scores.foreach { case (p, s) => sMap.put(p, s) }
      val unk = scores.values.min - 1000000L
      // E-step: Viterbi counts over the histogram (integer usage)
      val usage = scala.collection.mutable.HashMap[String, Long]()
      var totalUsage = 0L
      for ((w, c) <- hist) {
        val (pieces, _) = viterbiWord(w, sMap, unk, maxPieceLen)
        for (p <- pieces if p != Unk) {
          usage(p) = usage.getOrElse(p, 0L) + c
          totalUsage += c
        }
      }
      // prune: chars unconditionally; multi-char by (usage desc, piece asc)
      // until vocabSize; zero-usage multi-char pieces never survive
      val keptMulti = vocab.iterator
        .filter(p => p.length > 1 && usage.getOrElse(p, 0L) > 0L).toSeq
        .sortBy(p => (-usage(p), p))
        .take(math.max(0, vocabSize - chars.size))
      vocab = chars ++ keptMulti
      // M-step: add-one smoothing keeps unused-but-kept chars finite
      val v = vocab.size.toLong
      scores = vocab.iterator
        .map(p => p -> micronats(usage.getOrElse(p, 0L) + 1L, totalUsage + v))
        .toMap
    }
    UnigramModel(scores.toSeq.sortBy(_._1), scores.values.min - 1000000L,
      maxPieceLen)
  }

  /** Viterbi DP over one word: best segmentation under integer scores with
    * the canonical tie order (score desc, piece count asc, last piece
    * longest). An `<unk>` candidate consuming one character is always on
    * offer at `unkScore` (strictly below every piece score), so every
    * position is reachable and unknown characters surface as [[Unk]]
    * instead of failing. Returns (pieces, total score).
    */
  private[text] def viterbiWord(w: String,
      scores: java.util.HashMap[String, java.lang.Long],
      unkScore: Long, maxPieceLen: Int): (Array[String], Long) = {
    val n = w.length
    if (n == 0) return (Array.empty[String], 0L)
    val best = new Array[Long](n + 1)
    val nPieces = new Array[Int](n + 1)
    val backLen = new Array[Int](n + 1)
    val backUnk = new Array[Boolean](n + 1)
    var k = 1
    while (k <= n) {
      var bS = Long.MinValue; var bN = Int.MaxValue; var bL = 0; var bU = false
      val lMax = math.min(maxPieceLen, k)
      var l = 1
      while (l <= lMax) {
        val s = scores.get(w.substring(k - l, k))
        if (s != null) {
          val cS = best(k - l) + s
          val cN = nPieces(k - l) + 1
          if (cS > bS || (cS == bS && (cN < bN || (cN == bN && l > bL)))) {
            bS = cS; bN = cN; bL = l; bU = false
          }
        }
        l += 1
      }
      locally { // the <unk> single-char fallback candidate
        val cS = best(k - 1) + unkScore
        val cN = nPieces(k - 1) + 1
        if (cS > bS || (cS == bS && (cN < bN || (cN == bN && 1 > bL)))) {
          bS = cS; bN = cN; bL = 1; bU = true
        }
      }
      best(k) = bS; nPieces(k) = bN; backLen(k) = bL; backUnk(k) = bU
      k += 1
    }
    val out = new Array[String](nPieces(n))
    var pos = n
    var i = nPieces(n) - 1
    while (pos > 0) {
      out(i) = if (backUnk(pos)) Unk else w.substring(pos - backLen(pos), pos)
      pos -= backLen(pos)
      i -= 1
    }
    (out, best(n))
  }

  // row-local whole-document encode: all words' pieces plus the summed
  // micro-nat score — one pass so count/score queries don't encode twice.
  // Public (not private) deliberately: whole-stage codegen's generated
  // Java reads the accessors, and a private case class silently drops the
  // whole projection to interpreter mode.
  final case class UniEnc(pieces: Seq[String], n: Int, score: Long)

  private def encUdf(spark: SparkSession, model: UnigramModel) = {
    val bc = spark.sparkContext.broadcast {
      val m = new java.util.HashMap[String, java.lang.Long](model.pieces.size * 2)
      model.pieces.foreach { case (p, s) => m.put(p, s) }
      (m, model.unkScore, model.maxPieceLen, modelTokens.incrementAndGet())
    }
    udf { (s: String) =>
      if (s == null) null
      else {
        val (scores, unk, lMax, token) = bc.value
        val cache = encodeCache.get()
        var n = 0
        var total = 0L
        val acc = scala.collection.mutable.ArrayBuffer[String]()
        s.split("\\s+").foreach { w =>
          if (w.nonEmpty) {
            val key = (token, w)
            var e = cache.get(key)
            if (e == null) {
              e = viterbiWord(w, scores, unk, lMax)
              if (cache.size < (1 << 16)) cache.put(key, e)
            }
            acc ++= e._1
            n += e._1.length
            total += e._2
          }
        }
        UniEnc(acc.toSeq, n, total)
      }
    }
  }

  /** Row-local Viterbi encode under a broadcast model: `array<string>` of
    * pieces (unknown characters as [[Unk]]), null text → null.
    */
  def encode(spark: SparkSession, model: UnigramModel, text: Column): Column =
    encUdf(spark, model)(text).getField("pieces")

  /** Trained-tokenizer token count (includes `<unk>` pieces). */
  def tokenCount(spark: SparkSession, model: UnigramModel, text: Column): Column =
    encUdf(spark, model)(text).getField("n")

  /** Struct column `{pieces, n, score}` — `score` is the document's total
    * Viterbi log-likelihood in micro-nats, the model-fit signal unigram
    * tokenizers exist to provide (more negative = worse fit; comparable
    * across documents under one model).
    */
  def encodeDetail(spark: SparkSession, model: UnigramModel, text: Column): Column =
    encUdf(spark, model)(text)

  /** Per-group tokenizer-coverage report — the monitoring signal a trained
    * vocabulary needs in production: per `groupCol` (source, crawl day,
    * language), total pieces, `<unk>` pieces, and the integral
    * parts-per-million OOV rate. "Is this slice drifting outside my
    * tokenizer's alphabet" answered BEFORE a training run pays for `<unk>`
    * soup. One scan, row-local encode, one partial-agg shuffle on the
    * group key; ppm is integral division so the rate is engine-exact.
    * Shared verbatim by the batch query and the streaming probe twin, so
    * the two can never diverge (the `histogramOf` convention).
    */
  def oovReport(spark: SparkSession, df: DataFrame, textCol: String,
                groupCol: String, model: UnigramModel): DataFrame = {
    val e = encodeDetail(spark, model, col(textCol))
    df.select(col(groupCol), e.as("e"))
      .select(col(groupCol), col("e.n").as("n"),
        size(filter(col("e.pieces"), p => p === lit(Unk))).as("nu"))
      .groupBy(groupCol)
      .agg(sum("n").as("n_pieces"), sum("nu").as("n_unk"))
      .withColumn("oov_ppm",
        when(coalesce(col("n_pieces"), lit(0L)) > 0,
          expr("n_unk * CAST(1000000 AS BIGINT) div n_pieces")))
  }

  /** Persist the model as a warehouse table — a versionable artifact like
    * the BPE merge table ([[Bpe.saveModel]]): rows kind-tagged `piece` /
    * `unk` / `meta` so sentinel labels can never collide with corpus
    * pieces; `meta`'s score carries `maxPieceLen`.
    */
  def saveModel(spark: SparkSession, model: UnigramModel, table: String): Unit = {
    import spark.implicits._
    (model.pieces.map { case (p, s) => (p, s, "piece") }
      :+ (("", model.unkScore, "unk"))
      :+ (("", model.maxPieceLen.toLong, "meta")))
      .toDF("piece", "score", "kind")
      .coalesce(1)
      .write.mode("overwrite").format("parquet").saveAsTable(table)
  }

  /** Load a [[saveModel]] table back; fails loudly on a malformed table. */
  def loadModel(spark: SparkSession, table: String): UnigramModel = {
    val rows = spark.table(table).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val pieces = rows.collect { case (p, s, "piece") => (p, s) }.toSeq.sortBy(_._1)
    val unk = rows.collect { case (_, s, "unk") => s }
    val meta = rows.collect { case (_, s, "meta") => s }
    require(unk.length == 1 && meta.length == 1,
      s"malformed unigram model table $table")
    UnigramModel(pieces, unk.head, meta.head.toInt)
  }

  // per-executor word→(pieces, score) cache, keyed by a per-broadcast model
  // token so two models never cross-contaminate (the Bpe.encodeCache
  // pattern). The token is an AtomicLong draw at broadcast-build time —
  // NOT System.identityHashCode of the broadcast map, which is not
  // guaranteed unique among live objects (two concurrently live models in
  // one JVM could collide and silently return the other model's
  // segmentation).
  private[text] val modelTokens = new java.util.concurrent.atomic.AtomicLong()
  private lazy val encodeCache =
    new ThreadLocal[java.util.HashMap[(Long, String), (Array[String], Long)]] {
      override def initialValue() = new java.util.HashMap()
    }
}
