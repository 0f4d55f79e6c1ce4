package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: each fact row pairs with every dim interval
  * containing its value (`lo <= v <= hi`) — the lookup shape behind IP→geo
  * tables, price/score bands, validity windows, and token-count buckets.
  *
  * Why an operator: Spark plans a bare `BETWEEN` join predicate as a
  * BroadcastNestedLoopJoin (small dim) or a cartesian product — O(facts ×
  * dims) comparisons, the classic 100 TB stall. The binned form turns it
  * into an EQUI-join Catalyst can hash: intervals explode to every
  * fixed-width bin they overlap, facts compute their single containing
  * bin, the join keys on the bin, and a residual filter restores exact
  * interval semantics. A qualifying (fact, dim) pair co-occurs in exactly
  * ONE bin — the fact's — so the result needs no dedup; `floor` bins
  * negative values correctly (toward −∞).
  *
  * Scale shape: the shuffle (or dim broadcast — the exploded dim side is
  * still a dim table; Catalyst/AQE broadcast it when under the threshold)
  * carries each dim row `span/binWidth + 1` times, so `binWidth` trades
  * dim replication against per-bin fan-in: set it near the TYPICAL
  * interval width (replication ~2×) and let AQE's skew-join handle a
  * value-hot bin. Empty/inverted intervals (`lo > hi`) match nothing and
  * are dropped before the explode — Spark's `sequence` would otherwise
  * walk them DESCENDING and fabricate bins.
  *
  * Returns facts' columns ++ dims' columns (names must not collide —
  * rename before joining, the standard join hygiene). Inner-join
  * semantics: facts matching no interval vanish.
  */
object RangeJoin {
  def apply(facts: DataFrame, dims: DataFrame, valueCol: String,
            loCol: String, hiCol: String, binWidth: Double): DataFrame = {
    require(binWidth > 0, s"rangeJoin: binWidth=$binWidth")
    require(facts.columns.toSet.intersect(dims.columns.toSet).isEmpty,
      "rangeJoin: facts and dims share column names — rename before joining")
    val dimBins = dims
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__bin", explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    facts
      .withColumn("__bin", floor(col(valueCol) / binWidth).cast("long"))
      .join(dimBins, Seq("__bin"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("__bin")
  }

  /** A reasonable `binWidth` for `dims`: the MEDIAN interval span
    * (approxQuantile at 1% error over the non-inverted intervals) —
    * median-width bins put a typical interval in ~2 bins (replication ~2×)
    * while half the intervals stay in 1-2 bins; a handful of very wide
    * outlier intervals replicate more instead of widening every fact's
    * bin (what a mean or max would do). One aggregate pass over the dim
    * table — cheap next to the join. Falls back to 1.0 when every
    * interval is a point (median span 0).
    */
  def suggestBinWidth(dims: DataFrame, loCol: String, hiCol: String): Double = {
    val spans = dims.filter(col(loCol) <= col(hiCol))
      .select((col(hiCol).cast("double") - col(loCol).cast("double")).as("__s"))
    val med = spans.stat.approxQuantile("__s", Array(0.5), 0.01)
    if (med.isEmpty || med(0) <= 0) 1.0 else med(0)
  }
}
