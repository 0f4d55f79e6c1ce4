package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Exact frequent-items ("heavy hitters") above a frequency fraction,
  * found WITHOUT a full-cardinality group-by.
  *
  * The naive plan — `groupBy(key).count.filter(cnt > frac*n)` — is exact
  * but its hash aggregate holds one state per DISTINCT key: over a
  * 100 TB token stream that is billions of states, spilling every
  * executor even though the ANSWER is a handful of rows. This operator
  * is exact at FIXED executor memory:
  *
  *  1. **Misra–Gries pass** (Misra & Gries 1982): one `mapPartitions`
  *     sweep with k counters per task — no shuffle, no spill, no
  *     per-distinct-key state. The MG undercount per partition is
  *     ≤ n_p/(k+1); summed over partitions the total undercount is
  *     ≤ Σn_p/(k+1) = n/(k+1), so any key with true count > n/(k+1)
  *     retains a positive counter in at least one partition and appears
  *     in the candidate union. Each task emits ≤ k+1 rows.
  *  2. **Exact recount of candidates only**: rescan, keep rows whose key
  *     is in the broadcast candidate set, `groupBy(key).count`. The
  *     aggregate now has ≤ |candidates| states — bounded by the TASK
  *     COUNT times k, never by data cardinality — and map-side partial
  *     agg keeps the shuffle at ≤ tasks·|candidates| skinny rows.
  *  3. Filter `cnt · 10⁶ > fracPpm · n` (integer arithmetic end to end,
  *     no float threshold drift). Completeness requires
  *     frac > 1/(k+1), i.e. k ≥ ⌈10⁶/fracPpm⌉, which is enforced.
  *
  * Result = EXACTLY the keys with count > frac·n, with exact counts —
  * the same rows as the naive plan at any partitioning (the MG
  * candidate SET varies with partitioning, but every true heavy hitter
  * is always in it and the recount+filter discard the rest), which is
  * what the t40 oracle gates. Two scans, one bounded shuffle, NO
  * driver collect: the summary union (≤ tasks·(k+1) rows — which at
  * fracPpm=1 on a 10⁴-task corpus would be 10¹⁰ rows, too big to ever
  * collect) stays in-plan as a lineage-cut persisted frame; n rides a
  * broadcast 1-row aggregate and candidates a broadcast join frame.
  * Null keys are not counted and never returned.
  */
object HeavyHitters {

  /** Per-partition Misra–Gries summary: at most k (key, lowerBound)
    * survivors. Decrement-all is O(k) but charged against k prior
    * increments — O(1) amortized per item.
    */
  private[graft] def misraGries(it: Iterator[String], k: Int): Iterator[(String, Long)] = {
    val counters = new java.util.HashMap[String, Long](k * 2)
    while (it.hasNext) {
      val key = it.next()
      if (key != null) {
        val c = counters.get(key) // 0L when absent — 0-count keys never survive below
        if (c != 0L) counters.put(key, c + 1)
        else if (counters.size < k) counters.put(key, 1L)
        else {
          val e = counters.entrySet().iterator()
          while (e.hasNext) {
            val kv = e.next()
            if (kv.getValue == 1L) e.remove() else kv.setValue(kv.getValue - 1)
          }
        }
      }
    }
    import scala.jdk.CollectionConverters._
    counters.entrySet().asScala.iterator.map(kv => (kv.getKey, kv.getValue.toLong))
  }

  /** Exact keys with count > fracPpm·n/10⁶ over `keyCol` (cast to
    * string), with their exact counts. `fracPpm` is the threshold in
    * parts-per-million (2000 = 0.2%). `counters` overrides the per-task
    * MG budget; it must satisfy the completeness bound
    * k ≥ ⌈10⁶/fracPpm⌉ (the default is exactly that bound).
    */
  def heavyHitters(df: DataFrame, keyCol: String, fracPpm: Long,
                   counters: Int = 0): DataFrame =
    heavyHittersReleasable(df, keyCol, fracPpm, counters)._1

  /** [[heavyHitters]] plus a release thunk for the internal persisted MG
    * summary — the variant PER-BATCH callers in a long-lived driver (the
    * streaming twin) must use: call the thunk once the result is
    * materialized, or MEMORY_AND_DISK blocks accumulate between GCs.
    * Releasing before evaluation is safe (the summary recomputes
    * deterministically), just slower.
    */
  def heavyHittersReleasable(df: DataFrame, keyCol: String, fracPpm: Long,
                             counters: Int = 0): (DataFrame, () => Unit) = {
    require(fracPpm >= 1 && fracPpm < 1000000L,
      s"fracPpm out of [1, 1e6): $fracPpm")
    val kMin = ((1000000L + fracPpm - 1) / fracPpm).toInt // ceil(1e6/fracPpm)
    val k = if (counters <= 0) kMin else counters
    require(k >= kMin,
      s"counters=$k breaks the completeness bound: need >= ceil(1e6/fracPpm)=$kMin")
    val spark = df.sparkSession
    import spark.implicits._

    val keys: Dataset[String] = df.select(col(keyCol).cast("string")).as[String]
    // one scan: per-partition MG summaries + a per-partition row total
    // (the total row carries a negative tag; real summaries are ≥ 1).
    // Persisted lineage-cut because three plans consume it.
    val (summaries, release) =
      org.apache.spark.sql.graftbridge.Bridge.persistedCopyReleasable(
        keys.mapPartitions { it =>
          var n = 0L
          val counted = it.map { s => if (s != null) n += 1; s }
          val mg = misraGries(counted, k).toArray // drains `counted`, fixing n
          mg.iterator.map { case (key, c) => (key, c) } ++
            Iterator.single((null.asInstanceOf[String], -n - 1))
        }.toDF("key", "mg_cnt"),
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val total = summaries.filter(col("mg_cnt") < 0)
      .agg(sum(-col("mg_cnt") - 1).as("__n"))
    val candidates = summaries.filter(col("mg_cnt") > 0)
      .select(col("key")).distinct()
    keys.toDF("key").filter(col("key").isNotNull)
      .join(broadcast(candidates), Seq("key"), "left_semi")
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      // DECIMAL cross-multiply: cnt·10⁶ overflows a long once n nears
      // Long.MaxValue/10⁶ (~9e12 rows — inside the operator's own target),
      // and under ANSI mode that kills the job AFTER both scans.
      // decimal(21,0)·decimal(7,0) → decimal(29,0), exact and overflow-free.
      .filter(col("cnt").cast("decimal(21,0)") * lit(1000000L).cast("decimal(7,0)") >
        lit(fracPpm).cast("decimal(7,0)") * col("__n").cast("decimal(21,0)"))
      .select(col("key"), col("cnt")) -> release
  }

  /** PER-GROUP exact heavy hitters: keys with count > fracPpm·n_g/10⁶
    * WITHIN each group g ("the hot tokens of each language", "each
    * domain's boilerplate lines") — which the global pass structurally
    * can't answer: a key dominating a small group is invisible against
    * the corpus-wide total. One MG state per group per task (memory =
    * local groups × k, guarded by the loud `maxGroups` require — a
    * corpus-shaped "group" column is a modeling error, not an OOM);
    * per-group totals and candidates stay IN-PLAN (no driver collect at
    * all here — the grouped summary union can be larger than the
    * global one's centroid-contract bound), the recount semi-joins the
    * candidate (group, key) pairs, and each group's strict integer cut
    * joins its own total. Same per-group completeness bound:
    * k ≥ ⌈10⁶/fracPpm⌉ ⇒ every key above frac·n_g survives some
    * partition's summary for g. Null groups are groups; null keys are
    * not counted. Output: (group, key, cnt).
    */
  def heavyHittersByGroup(df: DataFrame, groupCol: String, keyCol: String,
                          fracPpm: Long, counters: Int = 0,
                          maxGroups: Int = 100000): DataFrame = {
    require(fracPpm >= 1 && fracPpm < 1000000L,
      s"fracPpm out of [1, 1e6): $fracPpm")
    val kMin = ((1000000L + fracPpm - 1) / fracPpm).toInt
    val k = if (counters <= 0) kMin else counters
    require(k >= kMin,
      s"counters=$k breaks the completeness bound: need >= ceil(1e6/fracPpm)=$kMin")
    val spark = df.sparkSession
    import spark.implicits._

    val pairs = df.select(col(groupCol).cast("string"), col(keyCol).cast("string"))
      .as[(String, String)]
    val summaries = pairs.mapPartitions { it =>
      val states = new java.util.HashMap[String, java.util.HashMap[String, Long]]()
      val totals = new java.util.HashMap[String, Long]()
      while (it.hasNext) {
        val (g, key) = it.next()
        if (key != null) {
          totals.merge(g, 1L, (a, b) => a + b)
          var counters0 = states.get(g)
          if (counters0 == null) {
            require(states.size < maxGroups,
              s"heavyHittersByGroup: more than $maxGroups groups in one " +
                "task — a corpus-shaped group column; raise maxGroups only " +
                "if group cardinality is genuinely bounded")
            counters0 = new java.util.HashMap[String, Long](k * 2)
            states.put(g, counters0)
          }
          val c = counters0.get(key)
          if (c != 0L) counters0.put(key, c + 1)
          else if (counters0.size < k) counters0.put(key, 1L)
          else {
            val e = counters0.entrySet().iterator()
            while (e.hasNext) {
              val kv = e.next()
              if (kv.getValue == 1L) e.remove() else kv.setValue(kv.getValue - 1)
            }
          }
        }
      }
      import scala.jdk.CollectionConverters._
      states.entrySet().asScala.iterator.flatMap { ge =>
        ge.getValue.entrySet().asScala.iterator
          .map(kv => (ge.getKey, kv.getKey, kv.getValue.toLong))
      } ++ totals.entrySet().asScala.iterator
        .map(te => (te.getKey, null.asInstanceOf[String], -te.getValue - 1))
    }.toDF("g", "key", "mg_cnt")
    // three consumers (totals, candidates, and the returned plan) — one
    // lineage-cut persisted copy keeps the MG pass to a single execution
    val summarized = org.apache.spark.sql.graftbridge.Bridge.persistedCopy(
      summaries, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val totals = summarized.filter(col("mg_cnt") < 0)
      .groupBy("g").agg(sum(-col("mg_cnt") - 1).as("__n"))
      .withColumnRenamed("g", "__tg")
    val candidates = summarized.filter(col("mg_cnt") > 0)
      .select(col("g").as("__cg"), col("key").as("__ck")).distinct()
    // null-safe on the group side: a null group is a group (rollup's
    // convention), and equi-join keys would silently drop it
    df.select(col(groupCol).cast("string").as("g"),
        col(keyCol).cast("string").as("key"))
      .filter(col("key").isNotNull)
      .join(candidates,
        col("g") <=> col("__cg") && col("key") === col("__ck"), "left_semi")
      .groupBy("g", "key").agg(count(lit(1)).as("cnt"))
      .join(totals, col("g") <=> col("__tg"))
      // same DECIMAL cross-multiply as the global pass (long overflow guard)
      .filter(col("cnt").cast("decimal(21,0)") * lit(1000000L).cast("decimal(7,0)") >
        lit(fracPpm).cast("decimal(7,0)") * col("__n").cast("decimal(21,0)"))
      .select(col("g").as(groupCol), col("key").as(keyCol), col("cnt"))
  }
}
