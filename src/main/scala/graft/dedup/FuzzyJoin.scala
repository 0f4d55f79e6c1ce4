package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join (Ed-Join / Gravano-family q-gram
  * prefix filtering) — fuzzy identity for SHORT strings: titles, names,
  * URLs, product labels, the places where near-dup content hides behind
  * a one-character typo that token-level MinHash (whole-word shingles)
  * is blind to.
  *
  * Blocking rests on two classical facts: (1) ed(a,b) <= k implies
  * |len(a) - len(b)| <= k; (2) one edit destroys at most `gramLen`
  * q-grams, so a and b share all but <= gramLen*k of their DISTINCT
  * grams. The pigeonhole that makes prefix filtering recall-exact
  * therefore needs gram-set DIVERSITY: when a side carries
  * > gramLen*k distinct grams, its first gramLen*k + 1 grams IN A
  * GLOBAL CANONICAL ORDER (hash order here, so the "prefix" grams are
  * effectively a random, selective sample rather than the common
  * leading characters) must intersect the partner's gram set — and a
  * low-diversity side that emits ALL of its grams still intersects any
  * high-diversity partner's prefix (the partner keeps >= 1 shared gram
  * after k edits, and the low side emits everything). The ONLY
  * unguaranteed corner is a pair where BOTH sides have <= gramLen*k
  * distinct grams (e.g. "abc"/"axc" at k=1 — two disjoint bigram sets
  * of size 2): one edit can then wipe the whole intersection. Every
  * such low-diversity string (which subsumes len < gramLen, whose gram
  * set is empty) emits a shared sentinel bucket, so recall stays exact;
  * candidates are verified with the exact `levenshtein` (codegen'd,
  * both engines count code points — identical on any text). The
  * sentinel bucket is quadratic in the count of low-diversity strings
  * only (bounded-length/near-constant titles), and the len filter
  * still prunes inside it.
  *
  * Scale shape: gram posting-list join (skeletons: id, len, gram — the
  * payload string rides only to the bounded verify), candidates
  * distinct-collapsed BEFORE the levenshtein, per-string fan-out
  * bounded by gramLen*k + 1. Hash order makes hot grams unlikely
  * (a stop-gram like "th" is selected into a signature only when a
  * string has few rarer grams); a boilerplate flood concentrating one
  * gram is the same failure mode as d02's hot band bucket and is
  * handled the same way upstream — exact-dedup replicas first.
  */
object FuzzyJoin {

  /** All unordered pairs (a_id < b_id) with levenshtein <= maxDist.
    * Returns (a_id, b_id, dist).
    */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
                        maxDist: Int, gramLen: Int = 2): DataFrame = {
    val (cands, base) =
      candidates(df, idCol, strCol, maxDist, gramLen, gramLen)
    cands
      .join(base.select(col("__id").as("a_id"), col("__s").as("__sa")), "a_id")
      .join(base.select(col("__id").as("b_id"), col("__s").as("__sb")), "b_id")
      .withColumn("dist", levenshtein(col("__sa"), col("__sb"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("a_id"), col("b_id"), col("dist").cast("long").as("dist"))
  }

  /** The shared blocking stage: (candidate id pairs, base frame).
    * `damagePerEdit` is the max distinct q-grams ONE edit unit can
    * destroy under the verify metric — `gramLen` for plain Levenshtein
    * (substitution/ins/del touch gramLen grams); `gramLen + 1` for
    * Damerau (an adjacent transposition touches gramLen + 1 grams).
    * The prefix length, sentinel threshold, and length filter all
    * scale with it, keeping the pigeonhole recall-exact per metric.
    */
  private def candidates(df: DataFrame, idCol: String, strCol: String,
                         maxDist: Int, gramLen: Int,
                         damagePerEdit: Int): (DataFrame, DataFrame) = {
    require(maxDist >= 0, s"maxDist=$maxDist")
    require(gramLen >= 1, s"gramLen=$gramLen")
    val prefixLen = damagePerEdit * maxDist + 1
    // gram extraction (distinct + hash-sort signature) and the
    // broadcast self-join both evaluate on the scan's partitioning —
    // balance an under-split input first so they parallelize (no-op on
    // well-split inputs; round 18, see Balance)
    val base = graft.operators.Balance.input(
        df.select(col(idCol).as("__id"), col(strCol).as("__s"))
          .filter(col("__s").isNotNull))
      .withColumn("__len", length(col("__s")))
    // canonical-order signature: grams sorted by (xxhash64, gram), first
    // prefixLen; the sentinel closes the short-string corner
    val gramsExpr = when(col("__len") < gramLen, array().cast("array<string>"))
      .otherwise(expr(
        s"transform(sequence(1, length(__s) - ${gramLen - 1}), " +
          s"i -> substring(__s, i, $gramLen))"))
    val sig = base
      .withColumn("__grams", array_distinct(gramsExpr))
      .withColumn("__sig", slice(array_sort(transform(
        col("__grams"),
        g => struct(xxhash64(g).as("h"), g.as("g")))), 1, prefixLen))
      // sentinel whenever the distinct-gram count is <= damage*k: below
      // that, k edits can destroy the ENTIRE gram intersection, so the
      // prefix pigeonhole gives no guarantee (subsumes len < gramLen,
      // whose gram set is empty)
      .withColumn("__sig",
        when(size(col("__grams")) <= damagePerEdit * maxDist,
          array_union(col("__sig"),
            array(struct(lit(Long.MinValue).as("h"),
              lit("\u0000short").as("g")))))
          .otherwise(col("__sig")))
      .select(col("__id"), col("__len"),
        explode(col("__sig")).as("__e"))
      .select(col("__id"), col("__len"), col("__e.g").as("__g"))
    // BANDED verify downstream (editDistancePairs uses Spark's
    // thresholded levenshtein: Ukkonen-style O(k·n) early exit, −1
    // above the bound — the exact distance is unchanged for qualifying
    // pairs, so the oracle contract holds; the full O(n·m) DP was the
    // candidate tier's dominant cpu term)
    (sig.as("a").join(sig.as("b"),
        col("a.__g") === col("b.__g") &&
          col("a.__id") < col("b.__id") &&
          abs(col("a.__len") - col("b.__len")) <= maxDist)
      .select(col("a.__id").as("a_id"), col("b.__id").as("b_id"))
      .distinct(), base)
  }

  /** All unordered pairs (a_id < b_id) with unrestricted
    * DAMERAU–Levenshtein <= maxDist — the typo metric where an
    * adjacent transposition ("teh" → "the") costs ONE edit; plain
    * [[editDistancePairs]] double-charges it, so a k-budget misses
    * exactly the most common typo class. Blocking widens per edit
    * (a transposition damages gramLen+1 distinct grams — the
    * `damagePerEdit` knob), keeping recall exact for the Damerau ball;
    * verify is the codegen'd [[graft.functions.Damerau]] kernel (the
    * oracle's own function is an independent implementation of the
    * same unrestricted variant). Returns (a_id, b_id, dist).
    */
  def damerauPairs(df: DataFrame, idCol: String, strCol: String,
                   maxDist: Int, gramLen: Int = 2): DataFrame = {
    val (cands, base) =
      candidates(df, idCol, strCol, maxDist, gramLen, gramLen + 1)
    cands
      .join(base.select(col("__id").as("a_id"), col("__s").as("__sa")), "a_id")
      .join(base.select(col("__id").as("b_id"), col("__s").as("__sb")), "b_id")
      // cheap banded PRE-verify: one transposition replaces at most two
      // plain edits, so DL <= k forces levenshtein <= 2k — the
      // O(k·n)-banded built-in discards the junk candidates before the
      // full O(n·m) Damerau DP runs (the d29 banding lesson applied to
      // a metric whose own DP cannot band — the unrestricted
      // transposition term reaches outside any diagonal band)
      .withColumn("__lv",
        levenshtein(col("__sa"), col("__sb"), maxDist * 2))
      .filter(col("__lv") >= 0)
      .withColumn("dist",
        graft.functions.Damerau(col("__sa"), col("__sb")))
      .filter(col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"), col("dist").cast("long").as("dist"))
  }

  /** Blocked pairs SCORED by Jaro–Winkler — the record-linkage combo
    * (Febrl-style): the q-gram prefix filter blocks to within `maxDist`
    * edits (complete for that block by [[editDistancePairs]]'s
    * pigeonhole), then the codegen'd
    * [[graft.functions.JaroWinkler]] scores each candidate and
    * `minJw` keeps the high-confidence matches. JW is the right scorer
    * for SHORT names/titles (a 1-letter typo in a 5-char name is 20% of
    * it by edit distance; JW weighs the shared prefix humans rarely
    * mistype). The block is part of the contract: pairs beyond
    * `maxDist` edits are out of scope regardless of their JW (at high
    * thresholds ≥0.9 on bounded-length strings the block is vacuous in
    * practice — high JW forces high character overlap).
    *
    * Returns (a_id, b_id, jw) with a_id < b_id, jw >= minJw.
    */
  def jaroWinklerPairs(df: DataFrame, idCol: String, strCol: String,
                       maxDist: Int, minJw: Double,
                       gramLen: Int = 2): DataFrame = {
    require(minJw > 0 && minJw <= 1, s"minJw=$minJw")
    val base = df.select(col(idCol).as("__jid"), col(strCol).as("__js"))
      .filter(col("__js").isNotNull)
    editDistancePairs(df, idCol, strCol, maxDist, gramLen)
      .join(base.select(col("__jid").as("a_id"), col("__js").as("__ja")),
        "a_id")
      .join(base.select(col("__jid").as("b_id"), col("__js").as("__jb")),
        "b_id")
      .withColumn("jw",
        graft.functions.JaroWinkler(col("__ja"), col("__jb")))
      .filter(col("jw") >= minJw)
      .select(col("a_id"), col("b_id"), col("jw"))
  }
}
