package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and encoding (Sennrich et al.
  * 2016, the GPT-2 tokenizer family) — the real subword tokenizer behind
  * the [[TextOps.bpeTokenCount]] approximation: token budgets, packing and
  * shard sizing ([[TextOps.packBins]], [[TextOps.shardByTokenBudget]]) are
  * only as good as the token counts they run on, and those come from a
  * trained merge table, not a regex.
  *
  * Scale split — the shape every production BPE trainer uses: merge
  * learning needs only the WORD HISTOGRAM, which is vocabulary-sized, not
  * corpus-sized. The histogram is computed distributed (one scan,
  * map-side partial aggregation into (word, count)), collected behind a
  * loud `maxWords` guard (the [[LangModel.serve]] / classifier precedent:
  * model-sized driver state only — a 100 TB English crawl has a few tens
  * of millions of distinct words, far under the default cap), and the
  * merge loop runs driver-local over the histogram with an incremental
  * pair-count index (subtract a touched word's pairs, re-merge, add back
  * — never a full rescan per merge). Encoding broadcasts the rank table
  * and runs row-local with a per-executor word cache: natural text reuses
  * words heavily, so most rows encode from the cache without touching the
  * merge loop.
  *
  * Determinism: merge selection is (max pair count, then lexicographically
  * smallest pair) — no RNG, no partition-order dependence (counts are
  * exact sums), so the same corpus always yields the same tokenizer, on
  * any cluster layout. Words are whitespace tokens (the span-cut
  * convention) with the classic `</w>` end-of-word sentinel as the final
  * symbol, so merges never cross word boundaries.
  */
object Bpe {

  /** An ordered merge table — rank i is the i-th learned merge. */
  final case class BpeModel(merges: Seq[(String, String)]) extends Serializable

  private val EOW = "</w>"

  private def wordSymbols(w: String): Array[String] =
    w.map(_.toString).toArray :+ EOW

  /** Learn `numMerges` merges from `df`'s `textCol`. One distributed scan
    * (the word histogram); driver state is the histogram (≤ `maxWords`,
    * enforced loudly) and the pair index.
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 1 << 22): BpeModel = {
    require(numMerges >= 0, s"numMerges=$numMerges")
    val histDf = df
      .select(explode(filter(split(col(textCol), "\\s+"), t => t =!= "")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    // guard BEFORE the collect — a require after it fires only once the
    // oversized histogram already sits on the driver heap, which is the
    // OOM the guard exists to prevent
    val distinctWords = histDf.count()
    require(distinctWords <= maxWords,
      s"$distinctWords distinct words exceed maxWords=$maxWords: " +
        "raise the cap or pre-filter the corpus")
    val hist = histDf.collect()
    // deterministic word order (only affects index layout, never counts)
    val words = hist.map(r => (wordSymbols(r.getString(0)), r.getLong(1)))
      .sortBy(_._1.mkString("\u0000"))
    val pairCounts = new scala.collection.mutable.HashMap[(String, String), Long]()
    val pairWords = new scala.collection.mutable.HashMap[(String, String),
      scala.collection.mutable.BitSet]()
    def addWord(wi: Int, sign: Long): Unit = {
      val (syms, c) = words(wi)
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        val n = pairCounts.getOrElse(p, 0L) + sign * c
        if (n == 0L) { pairCounts.remove(p); pairWords.get(p).foreach(_.remove(wi)) }
        else {
          pairCounts(p) = n
          if (sign > 0) pairWords.getOrElseUpdate(p,
            new scala.collection.mutable.BitSet()).add(wi)
        }
        i += 1
      }
      // on removal (sign < 0) the word's id may stay behind in pairWords
      // sets for pairs it no longer contains — the merge loop detects such
      // stale entries by re-checking the word's current symbols
    }
    for (wi <- words.indices) addWord(wi, 1L)
    def mergeWord(syms: Array[String], a: String, b: String): Array[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toArray
    }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var m = 0
    while (m < numMerges && pairCounts.nonEmpty) {
      var best: (String, String) = null
      var bestC = Long.MinValue
      for ((p, c) <- pairCounts) {
        if (c > bestC || (c == bestC &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestC = c
        }
      }
      merges += best
      val touched = pairWords.getOrElse(best, new scala.collection.mutable.BitSet())
        .toArray
      for (wi <- touched) {
        val (syms, _) = words(wi)
        // stale index entries (word already re-merged past this pair) are
        // detected by absence and skipped
        var has = false
        var i = 0
        while (i < syms.length - 1 && !has) {
          has = syms(i) == best._1 && syms(i + 1) == best._2
          i += 1
        }
        if (has) {
          addWord(wi, -1L)
          words(wi) = (mergeWord(syms, best._1, best._2), words(wi)._2)
          addWord(wi, 1L)
        }
      }
      pairCounts.remove(best)
      pairWords.remove(best)
      m += 1
    }
    BpeModel(merges.toSeq)
  }

  // Greedy rank-based encoding of one word (lowest-rank merge first —
  // exactly the order training learned them).
  private def encodeWord(w: String,
                         ranks: java.util.HashMap[(String, String), Int]): Array[String] = {
    var syms = wordSymbols(w)
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrDefault((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val (a, b) = {
          // re-find the pair of bestRank (first occurrence merges all)
          var j = 0; var p: (String, String) = null
          while (p == null) {
            if (ranks.getOrDefault((syms(j), syms(j + 1)), Int.MaxValue) == bestRank)
              p = (syms(j), syms(j + 1))
            j += 1
          }
          p
        }
        val out = scala.collection.mutable.ArrayBuffer[String]()
        var k = 0
        while (k < syms.length) {
          if (k < syms.length - 1 && syms(k) == a && syms(k + 1) == b) {
            out += (a + b); k += 2
          } else { out += syms(k); k += 1 }
        }
        syms = out.toArray
      }
    }
    syms
  }

  /** Persist a trained merge table as a warehouse table — the tokenizer
    * becomes a versionable artifact like the dedup registries and ANN
    * indexes, so every pipeline run (and every OTHER cluster) tokenizes
    * with byte-identical merges instead of retraining. One row per merge
    * with its rank; rank order IS the model.
    */
  def saveModel(spark: SparkSession, model: BpeModel, table: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "left", "right")
      .coalesce(1)
      .write.mode("overwrite").format("parquet").saveAsTable(table)
  }

  /** Load a [[saveModel]] table back into rank order. */
  def loadModel(spark: SparkSession, table: String): BpeModel =
    BpeModel(spark.table(table).orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq)

  /** Row-local BPE encode under a broadcast model: `array<string>` of
    * subword tokens (each word's final subword carries the `</w>`
    * sentinel), null text → null. A per-executor word cache makes repeated
    * words (most of natural text) a hash lookup.
    */
  def encode(spark: SparkSession, model: BpeModel, text: Column): Column = {
    val bc = spark.sparkContext.broadcast {
      val m = new java.util.HashMap[(String, String), Int](model.merges.size * 2)
      model.merges.zipWithIndex.foreach { case (p, i) => m.put(p, i) }
      (m, modelTokens.incrementAndGet())
    }
    val u = udf { (s: String) =>
      if (s == null) null
      else {
        val (ranks, token) = bc.value
        val cache = encodeCache.get()
        s.split("\\s+").filter(_.nonEmpty).flatMap { w =>
          var enc = cache.get((token, w))
          if (enc == null) {
            enc = encodeWord(w, ranks)
            if (cache.size < (1 << 16))
              cache.put((token, w), enc)
          }
          enc
        }
      }
    }
    u(text)
  }

  /** Trained-tokenizer token count — the budget [[TextOps.packBins]] /
    * [[TextOps.shardByTokenBudget]] should really run on.
    */
  def tokenCount(spark: SparkSession, model: BpeModel, text: Column): Column =
    size(encode(spark, model, text))

  // per-executor (thread-shared) word→encoding cache, keyed by a
  // per-broadcast model token so two models never cross-contaminate.
  // The token is an AtomicLong draw at broadcast-build time — NOT
  // System.identityHashCode of the rank map, which is not guaranteed
  // unique among live objects (two concurrently live models in one JVM
  // could collide and silently return the other model's encoding).
  private[text] val modelTokens = new java.util.concurrent.atomic.AtomicLong()
  private lazy val encodeCache =
    new ThreadLocal[java.util.HashMap[(Long, String), Array[String]]] {
      override def initialValue() = new java.util.HashMap()
    }
}
