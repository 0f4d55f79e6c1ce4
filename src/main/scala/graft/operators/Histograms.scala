package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-run DISTRIBUTION registry — dyadic (power-of-two) histograms of
  * a non-negative integer signal, mergeable by plain addition.
  *
  * The observability twin of the cardinality registry (t42): that one
  * answers "how many DISTINCT items has each group ever sent", this one
  * answers "how are each group's VALUES distributed over every run ever
  * appended" (document lengths per source, token counts per crawl day,
  * quality-score drift) without rescanning any previous run. Each append
  * stores one (group, bin, cnt) row per occupied bin — at most 65 bins
  * per group regardless of run size — and the report sums counts per
  * (group, bin): histogram merge is exact integer addition, so the
  * registry is APPEND-ONLY like every cross-run table (no merge-rewrite;
  * [[graft.sources.Warehouse.compact]] may fold rows without changing
  * any report).
  *
  * Binning is the dyadic bit-length rule — bin 0 holds v = 0, bin b ≥ 1
  * holds v ∈ [2^(b−1), 2^b − 1], bin −1 is the negative-value catch-all,
  * nulls are not counted — chosen over equi-width buckets because it
  * needs NO prior knowledge of the value range (a registry must accept
  * next month's outliers without re-binning history) and gives constant
  * RELATIVE resolution (every bin spans a 2× range — the right shape for
  * heavy-tailed pipeline signals like document lengths). It is also pure
  * integer arithmetic both ways: Spark computes the bin as the binary-
  * string length of the value and any SQL engine replays it the same way
  * (`length(format('{:b}', v))` in DuckDB), which is what makes the
  * driver gate a value-exact replay.
  *
  * Quantile reports are bin-resolution by construction: the q-quantile
  * row returns the smallest bin whose cumulative count reaches
  * ⌈q·N⌉ — i.e. hard [lo, hi] bounds within a 2× factor of the exact
  * order statistic. That is the honest contract of a mergeable fixed-
  * size summary (a KLL/t-digest trades the determinism away for tighter
  * bounds); exact percentiles on a single frame stay q15's job.
  */
object Histograms {

  /** Create the empty registry: (group STRING, bin INT, cnt BIGINT),
    * bucketed on group so appends and every report co-locate.
    */
  def createHistRegistry(spark: SparkSession, table: String,
                         buckets: Int = 8): Unit = {
    import spark.implicits._
    graft.sources.Warehouse.writeBucketed(
      Seq.empty[(String, Int, Long)].toDF("group", "bin", "cnt"),
      table, "group", buckets)
  }

  /** Dyadic bin of a BIGINT column: 0 → 0, v > 0 → bit length (binary
    * string carries no leading zeros), v < 0 → −1.
    */
  private[graft] def binOf(v: org.apache.spark.sql.Column) =
    when(v < 0L, lit(-1))
      .when(v === 0L, lit(0))
      .otherwise(length(bin(v)))
      .cast("int")

  /** Histogram this run's values per group and append. `valueCol` must be
    * castable to BIGINT (the integer-bin contract is what keeps the
    * registry engine-agnostic); nulls are not counted. Returns the
    * number of (group, bin) rows appended.
    */
  def appendHistogram(df: DataFrame, groupCol: String, valueCol: String,
                      table: String): Long = {
    val spark = df.sparkSession
    val delta = graft.sources.Warehouse.appendBucketedWithDelta(
      histogramOf(df, groupCol, valueCol), table, "group")
    if (delta.isEmpty) 0L else spark.read.parquet(delta: _*).count()
  }

  /** Inclusive value bounds of a dyadic bin, as columns: bin 0 → [0, 0],
    * bin b ≥ 1 → [2^(b−1), 2^b − 1] (b = 63's hi is Long.MaxValue,
    * special-cased because shiftleft(1, 63) wraps), bin −1 → [null, null]
    * (the negative catch-all has no dyadic bounds).
    */
  private def loOf(b: org.apache.spark.sql.Column) =
    when(b === -1, lit(null).cast("long"))
      .when(b === 0, lit(0L))
      .otherwise(call_function("shiftleft", lit(1L), b.cast("int") - 1))
  private def hiOf(b: org.apache.spark.sql.Column) =
    when(b === -1, lit(null).cast("long"))
      .when(b === 0, lit(0L))
      .when(b === 63, lit(Long.MaxValue))
      .otherwise(call_function("shiftleft", lit(1L), b.cast("int")) - 1)

  /** Merged histogram over every appended run: (group, bin, lo, hi, cnt)
    * ordered by (group, bin). One bucketed scan; the merge group-by rides
    * the bucketing.
    */
  def histogramOverRuns(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
      .groupBy("group", "bin").agg(sum(col("cnt")).as("cnt"))
      .select(col("group"), col("bin"), loOf(col("bin")).as("lo"),
        hiOf(col("bin")).as("hi"), col("cnt"))
      .orderBy("group", "bin")

  /** Distribution DRIFT between two histogram registries, per group — the
    * population-stability-index report a pipeline owner reads to decide
    * whether "this month's crawl" still looks like "everything before it"
    * (compare a current-era registry against a baseline era, or one
    * source's registry against the global one). For each group present in
    * either table: PSI = Σ_bins (pA − pB)·ln(pA/pB) and the L1 distance
    * Σ|pA − pB|, where the probabilities are add-one smoothed over the
    * UNION bin set ((cnt + 1)/(N + |bins|)) so a bin empty on one side is
    * well-defined and both sides remain exact probability distributions.
    * The standard reading: PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25
    * shifted. Rounded to `roundTo` decimals AFTER the sum (the ln-at-
    * ROUND-4 cross-engine parity convention); everything before the ln is
    * integer counts, so the report is engine-replayable at the rounded
    * precision. Skeleton-sized work: ≤ 65 bins per group, one full-outer
    * join of two merged histograms.
    */
  def driftReport(spark: SparkSession, tableA: String, tableB: String,
                  roundTo: Int = 4): DataFrame =
    driftBetween(spark.table(tableA), spark.table(tableB), roundTo)

  /** [[driftReport]]'s core over raw (group, bin, cnt) frames — exposed
    * so the STREAMING drift probe can compare a micro-batch's histogram
    * against the persisted baseline without a table round-trip; PSI is
    * symmetric in its two sides by construction ((pA−pB)·ln(pA/pB) is
    * invariant under swap).
    */
  private[graft] def driftBetween(histA: DataFrame, histB: DataFrame,
                                  roundTo: Int = 4): DataFrame = {
    def merged(df: DataFrame, cn: String) = df
      .groupBy("group", "bin").agg(sum(col("cnt")).as(cn))
    val joined = merged(histA, "__ca")
      .join(merged(histB, "__cb"), Seq("group", "bin"), "full_outer")
      .select(col("group"), col("bin"),
        coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    val totals = joined.groupBy("group").agg(
      sum(col("__ca")).as("__na"), sum(col("__cb")).as("__nb"),
      count(lit(1)).as("__bins"))
    joined.join(totals, "group")
      .select(col("group"),
        ((col("__ca") + 1).cast("double") / (col("__na") + col("__bins")))
          .as("__pa"),
        ((col("__cb") + 1).cast("double") / (col("__nb") + col("__bins")))
          .as("__pb"))
      .groupBy("group").agg(
        round(sum((col("__pa") - col("__pb")) * log(col("__pa") / col("__pb"))),
          roundTo).as("psi"),
        round(sum(abs(col("__pa") - col("__pb"))), roundTo).as("l1"))
      .orderBy("group")
  }

  /** One run's dyadic histogram as a plain (group, bin, cnt) frame — the
    * shared binning of [[appendHistogram]] and the streaming drift probe,
    * factored so the two can never bin differently.
    */
  private[graft] def histogramOf(df: DataFrame, groupCol: String,
                                 valueCol: String): DataFrame = df
    .filter(col(valueCol).isNotNull)
    .select(col(groupCol).cast("string").as("group"),
      binOf(col(valueCol).cast("long")).as("bin"))
    .groupBy("group", "bin").agg(count(lit(1)).as("cnt"))

  /** Bin-resolution quantiles per group over every appended run: for each
    * q (in parts-per-million) the smallest bin whose cumulative count
    * reaches ⌈q·N/10⁶⌉ — output (group, q_ppm, bin, lo, hi) with the
    * hard dyadic bounds the true order statistic lies within. Cumulative
    * counts ride a per-group window over ≤ 65 skeleton rows (bounded by
    * the bin alphabet, not the data); the rank comparison is the DECIMAL
    * cross-multiply (cum·10⁶ ≥ q·N), exact at any N. Groups with no
    * counted value produce no rows.
    */
  def quantilesOverRuns(spark: SparkSession, table: String,
                        qPpm: Seq[Long]): DataFrame = {
    require(qPpm.nonEmpty && qPpm.forall(q => q >= 1 && q <= 1000000L),
      s"quantile ppm out of [1, 1e6]: $qPpm")
    import org.apache.spark.sql.expressions.Window
    val merged = spark.table(table)
      .groupBy("group", "bin").agg(sum(col("cnt")).as("cnt"))
    val w = Window.partitionBy("group").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = merged
      .withColumn("__cum", sum(col("cnt")).over(w))
      .withColumn("__n", sum(col("cnt")).over(Window.partitionBy("group")))
    val qs = explode(array(qPpm.distinct.sorted.map(q => lit(q)): _*)).as("q_ppm")
    cum.select(col("group"), col("bin"), col("__cum"), col("__n"), qs)
      .filter(col("__cum").cast("decimal(21,0)") *
        lit(1000000L).cast("decimal(7,0)") >=
        col("q_ppm").cast("decimal(7,0)") * col("__n").cast("decimal(21,0)"))
      .groupBy("group", "q_ppm").agg(min(col("bin")).as("bin"))
      .select(col("group"), col("q_ppm"), col("bin"),
        loOf(col("bin")).as("lo"), hiOf(col("bin")).as("hi"))
      .orderBy("group", "q_ppm")
  }
}
