package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** N-gram seam of [[Dedup]] — gram sets (string + hashed + positional),
  * benchmark contamination (exact, Bloom, span-surgical). Split from the
  * single Dedup.scala (round 15); no public-API change.
  */
private[graft] trait DedupNgram { this: Dedup.type =>

  /** Distinct word n-gram set of a text column. Compute this ONCE per
    * document (projection before any join) — tokenizing inside a pair loop
    * multiplies the regex work by the candidate count.
    *
    * Sub-`n`-token documents contribute one degenerate gram built from the
    * TOKEN SEQUENCE (space-joined), not the raw text: two short docs that
    * differ only in whitespace ("a  b" vs "a b") share a gram, exactly as
    * the hashed twin [[ngramHashSet]] folds the token-hash sequence. Raw
    * text here would silently diverge from the hashed path.
    */
  def ngramSet(c: Column, n: Int = 2): Column = {
    val toks = split(c, "\\s+")
    val cnt = size(toks)
    when(cnt < n, array(concat_ws(" ", toks)))
      .otherwise(array_distinct(transform(sequence(lit(1), cnt - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
  }

  /** Near-dup pair EXPLANATION — the human-readable evidence behind a
    * dedup verdict: for each (a, b) pair, both sides' distinct n-gram
    * counts, the SHARED count, the integral-ppm Jaccard, and the
    * lexicographically smallest shared n-gram as a concrete example —
    * "these two documents share 84% of their bigrams, e.g. 'click the'".
    * The d23 cluster profile answers what dedup found in aggregate; this
    * answers WHY for a specific pair, which is what a curation reviewer
    * auditing borderline drops actually reads.
    *
    * Determinism: grams are [[ngramSet]]'s (textual twin of the hashed
    * join representation), the ppm is exact integer division, the
    * example is a MIN over the shared set (order-free). Scale shape:
    * `pairs` is a bounded skeleton by contract (an audit sample, not the
    * corpus pair closure); the gram projection runs once per REFERENCED
    * document via the pair joins, and everything after the two joins is
    * row-local array algebra.
    */
  def explainPairs(docs: DataFrame, pairs: DataFrame, textCol: String,
                   idCol: String, n: Int = 2): DataFrame = {
    require(n >= 1, s"n=$n")
    val g = docs.select(col(idCol).as("__id"), ngramSet(col(textCol), n).as("__g"))
    pairs
      .join(g.select(col("__id").as("a"), col("__g").as("__ga")), "a")
      .join(g.select(col("__id").as("b"), col("__g").as("__gb")), "b")
      .withColumn("__sh", array_intersect(col("__ga"), col("__gb")))
      .withColumn("n_a", size(col("__ga")))
      .withColumn("n_b", size(col("__gb")))
      .withColumn("n_shared", size(col("__sh")))
      .withColumn("jaccard_ppm",
        when(col("n_a") + col("n_b") - col("n_shared") > 0,
          expr("CAST(n_shared AS BIGINT) * 1000000 div " +
            "CAST(n_a + n_b - n_shared AS BIGINT)")))
      .withColumn("example_gram", array_min(col("__sh")))
      .select("a", "b", "n_a", "n_b", "n_shared", "jaccard_ppm",
        "example_gram")
  }

  /** Distinct word n-gram set as 64-bit hashes, built in one tight loop
    * (token murmur hashes combined per gram). The join-side representation
    * for Jaccard verification at scale: 8-byte elements instead of strings
    * make the per-pair `array_intersect` both smaller to shuffle and far
    * faster to evaluate.
    */
  def ngramHashSet(c: Column, n: Int = 2): Column = ngramHashUdf(n)(c)

  private def ngramHashUdf(n: Int) = udf { (s: String) => ngramHashSetOf(s, n) }

  /** The per-row kernel behind [[ngramHashSet]], exposed for map-side
    * consumers (the streaming decontamination filter) that need the gram
    * set inside their own UDF without a second tokenization pass.
    */
  private[graft] def ngramHashSetOf(s: String, n: Int): Array[Long] = {
    if (s == null) Array.empty[Long]
    else {
      // limit -1: same tokenization as Spark's split()/DuckDB's
      // string_split_regex (trailing empty tokens kept) — see ngramSet
      val toks = WS.split(s, -1)
      val th = new Array[Long](toks.length)
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        th(i) = (scala.util.hashing.MurmurHash3.stringHash(t).toLong << 32) |
          (scala.util.hashing.MurmurHash3.stringHash(t, 0x9747b28c).toLong & 0xFFFFFFFFL)
        i += 1
      }
      val set = new java.util.HashSet[Long]()
      if (toks.length < n) set.add(th.foldLeft(1125899906842597L)(_ * 31 + _))
      else {
        i = 0
        while (i <= toks.length - n) {
          var h = 1125899906842597L
          var j = 0
          while (j < n) { h = h * 0x100000001B3L + th(i + j); j += 1 }
          set.add(h)
          i += 1
        }
      }
      val out = new Array[Long](set.size)
      val it = set.iterator()
      i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }
  }

  /** Benchmark-contamination report: for each corpus document, the number
    * of distinct word n-grams it shares with ANY benchmark document (docs
    * absent from the output are clean). Benchmark eval sets are tiny and
    * curated, so their distinct gram set broadcasts; the corpus is touched
    * once — grams hashed to 8 bytes per doc, exploded, broadcast-joined,
    * counted. No shuffle of text, no corpus×corpus pairing.
    */
  def contamination(corpus: DataFrame, benchmark: DataFrame, textCol: String,
                    idCol: String, n: Int = 8): DataFrame =
    corpus.select(col(idCol), explode(ngramHashSet(col(textCol), n)).as("__g"))
      .join(broadcast(benchGrams(benchmark, textCol, n)), "__g")
      .groupBy(idCol).agg(count(lit(1)).as("n_shared"))

  /** A benchmark's distinct gram-hash set — the shared ingredient of every
    * contamination flavor (exact broadcast join, Bloom build, Bloom-path
    * exact verify), factored so sizing/tokenization fixes can never drift
    * between them.
    */
  private def benchGrams(benchmark: DataFrame, textCol: String, n: Int): DataFrame =
    benchmark.select(explode(ngramHashSet(col(textCol), n)).as("__g")).distinct()

  // Bloom build needs TWO actions over the gram set (size it, then fill
  // it); `sized` persists across them so the tokenize+explode+distinct
  // work — multi-minute for the benchmarks this path exists for — runs
  // once. `retain` keeps the persisted copy alive for a caller that joins
  // against the grams afterwards (blocks are LRU-evictable and lineage is
  // kept, so retaining is safe at any benchmark size).
  private def bloomOf(grams: DataFrame, fpp: Double,
                      retain: Boolean): (org.apache.spark.util.sketch.BloomFilter, DataFrame) = {
    val sized = grams.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bf = sized.stat.bloomFilter("__g", math.max(sized.count(), 1L), fpp)
    if (!retain) sized.unpersist()
    (bf, sized)
  }

  /** Bloom filter of a benchmark's distinct gram hashes — the broadcastable
    * artifact behind [[contaminationBloom]] and the streaming
    * decontamination stage
    * ([[graft.streaming.EventStreams.curateDocs]]). Stateless once built:
    * membership tests run map-side wherever the filter is shipped. Sized
    * from the measured distinct-gram count at the given false-positive
    * rate; a consumer with no exact-verify join (the streaming path)
    * over-drops a clean g-gram document with probability ≲ g·fpp, so the
    * default fpp is tight.
    */
  def benchmarkBloom(benchmark: DataFrame, textCol: String, n: Int = 8,
                     fpp: Double = 1e-4): org.apache.spark.util.sketch.BloomFilter =
    bloomOf(benchGrams(benchmark, textCol, n), fpp, retain = false)._1

  /** Bloom-filter contamination — the documented escape hatch of
    * [[contamination]] for benchmarks too large to broadcast as an exact
    * gram set. A Bloom filter of the benchmark grams (`fpp` false-positive
    * rate, sized from the measured distinct-gram count) is broadcast
    * instead; corpus grams are pruned MAP-SIDE by `mightContain` — no
    * shuffle, no join for the overwhelmingly-clean majority — and only the
    * survivors meet the exact gram set in a join that kills the false
    * positives. Same results as [[contamination]] by construction (the
    * driver hash-gates d07 against d06's oracle); the broadcast shrinks
    * from O(grams × 8 bytes) to O(−n·ln(fpp)/ln²2 bits).
    */
  def contaminationBloom(corpus: DataFrame, benchmark: DataFrame, textCol: String,
                         idCol: String, n: Int = 8, fpp: Double = 0.01): DataFrame = {
    val (bf, bench) = bloomOf(benchGrams(benchmark, textCol, n), fpp, retain = true)
    val bcBf = corpus.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf { (g: Long) => bcBf.value.mightContainLong(g) }
    corpus.select(col(idCol), explode(ngramHashSet(col(textCol), n)).as("__g"))
      .filter(mightContain(col("__g")))
      .join(bench, "__g")
      .groupBy(idCol).agg(count(lit(1)).as("n_shared"))
  }

  /** POSITIONAL word n-gram hashes over the EMPTY-FILTERED tokenization:
    * element i is the hash of the gram starting at (filtered) token i —
    * the same token murmur pass and rolling combine as [[ngramHashSetOf]],
    * but over the span cut's token convention and keeping positions
    * instead of collapsing to a set, so a gram hit can be mapped back to
    * the spans it covers. Sub-`n`-token documents yield one degenerate
    * whole-sequence gram at position 0 (the [[ngramSet]] convention).
    */
  private[graft] def ngramHashesPosOf(s: String, n: Int): Array[Long] = {
    if (s == null) Array.empty[Long]
    else {
      val toks = WS.split(s, -1).filter(_.nonEmpty)
      val th = new Array[Long](toks.length)
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        th(i) = (scala.util.hashing.MurmurHash3.stringHash(t).toLong << 32) |
          (scala.util.hashing.MurmurHash3.stringHash(t, 0x9747b28c).toLong & 0xFFFFFFFFL)
        i += 1
      }
      if (toks.length < n) Array(th.foldLeft(1125899906842597L)(_ * 31 + _))
      else {
        val out = new Array[Long](toks.length - n + 1)
        i = 0
        while (i <= toks.length - n) {
          var h = 1125899906842597L
          var j = 0
          while (j < n) { h = h * 0x100000001B3L + th(i + j); j += 1 }
          out(i) = h
          i += 1
        }
        out
      }
    }
  }

  private def ngramHashesPosUdf(n: Int) = udf { (s: String) => ngramHashesPosOf(s, n) }

  /** SPAN-SURGICAL benchmark decontamination: instead of dropping a whole
    * document that shares n-grams with the benchmark ([[contamination]]'s
    * report feeding a doc-level gate), cut it into `spanTokens`-token
    * spans ([[dedupSpans]]'s cutting, verbatim), remove exactly the spans
    * any matching benchmark gram OVERLAPS (starts in or crosses into —
    * the gram starting at token p covers spans ⌊p/st⌋..⌊(p+n-1)/st⌋), and
    * reassemble the clean remainder in order. This is the standard
    * open-pipeline middle ground: a 10k-token article quoting one
    * benchmark question loses ~one span, not the article. Documents whose
    * every span is contaminated disappear entirely.
    *
    * Unlike [[contamination]] (whose unfiltered-edge-token convention is
    * shared with its oracle), grams here are computed over the SAME
    * empty-filtered tokenization as the span cut, so gram token positions
    * and span boundaries can never misalign on leading-whitespace
    * documents — both sides of the match use [[ngramHashesPosOf]].
    *
    * Returns (idCol, n_spans, n_kept, clean_text) — [[dedupSpans]]'s
    * shape. Scale: the benchmark gram set broadcasts (tiny, curated); the
    * corpus is scanned once for gram hits (map-side broadcast join — no
    * shuffle for the overwhelmingly-clean majority) and once for spans;
    * contaminated span indices aggregate per doc (bounded by the doc's
    * own span count) and span text shuffles exactly once, on the unskewed
    * id, reused by the reassembly group.
    */
  def decontaminateSpans(corpus: DataFrame, benchmark: DataFrame,
                         textCol: String, idCol: String,
                         spanTokens: Int = 3, n: Int = 8): DataFrame = {
    val bench = benchmark
      .select(explode(ngramHashesPosUdf(n)(col(textCol))).as("__g")).distinct()
    val hits = corpus
      .select(col(idCol), posexplode(ngramHashesPosUdf(n)(col(textCol)))
        .as(Seq("__p", "__g")))
      .join(broadcast(bench), "__g")
    val badPerDoc = hits
      .select(col(idCol), explode(sequence(
        floor(col("__p") / lit(spanTokens)).cast("int"),
        floor((col("__p") + lit(n - 1)) / lit(spanTokens)).cast("int"))).as("__bad"))
      .groupBy(col(idCol)).agg(collect_set(col("__bad")).as("__badset"))
    val tokenized = corpus.select(col(idCol),
      filter(split(col(textCol), "\\s+"), t => t =!= "").as("__toks"))
    val nSpans = ceil(size(col("__toks")) / lit(spanTokens.toDouble)).cast("long")
    val spans = tokenized.select(col(idCol), nSpans.as("n_spans"),
      posexplode(when(nSpans >= 1,
        transform(sequence(lit(0), (nSpans - 1).cast("int")),
          i => concat_ws(" ", slice(col("__toks"), i * spanTokens + 1, lit(spanTokens)))))
        .otherwise(array()))
        .as(Seq("pos", "span")))
    spans.join(badPerDoc, Seq(idCol), "left")
      .filter(col("__badset").isNull || !array_contains(col("__badset"), col("pos")))
      .groupBy(col(idCol), col("n_spans"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("span")))),
          x => x.getField("span")), " ").as("clean_text"))
  }
}
