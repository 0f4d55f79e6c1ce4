package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** MULTI-TOUCH attribution — the marketing-analytics staple the funnel
  * doesn't answer: not "did the user convert" but "which touch types
  * get CREDIT for the conversion". Each touch event attributes to the
  * user's NEXT conversion (single-attribution semantics: a touch is
  * credited once, to the conversion it most plausibly drove), provided
  * it falls inside the lookback window; per conversion the credit
  * splits by the chosen model:
  *
  *  - `linear`: every touch gets an equal share.
  *  - `position` (default; the U-shaped 40/20/40 industry convention):
  *    first touch 40%, last touch 40%, middles split the 20%;
  *    n = 1 → 100%, n = 2 → 50/50.
  *
  * Cross-engine exactness (the §5 float discipline): credit is INTEGER
  * parts-per-million with floor division, the division remainder
  * assigned to the LAST touch (deterministic, documented) — so every
  * aggregate is an order-free integer sum and a DuckDB oracle replays
  * the report bit-for-bit. A conversion's touches always sum to exactly
  * 1,000,000 ppm.
  *
  * Scale shape: NO interval join — assignment is the as-of traversal
  * (one union-tagged pass per key, descending timestamps, carry the
  * last conversion seen), so each touch meets exactly one candidate
  * conversion; ranks ride a per-conversion window whose group is
  * bounded by one user's lookback activity (the sessionize bound).
  * Two key-implied shuffles total (user, then conversion), then one
  * tiny per-type aggregate.
  *
  * Boundary contract: a touch qualifies iff strictly BEFORE the
  * conversion (same-instant touches don't count — the funnel's
  * strict-after convention, mirrored) and within `lookbackSeconds` of
  * it (inclusive), measured in integer microseconds.
  */
object Attribution {

  /** The per-touch ppm credit as a plain function — the same integer
    * arithmetic the batch column expressions compute (positive longs:
    * Scala `/` truncation ≡ SQL `div` floor), shared with the streaming
    * twin and parity-pinned by spec.
    */
  private[graft] def creditPpm(model: String, rn: Long, n: Long): Long =
    model match {
      case "linear" =>
        if (rn == n) 1000000L - (n - 1) * (1000000L / n) else 1000000L / n
      case _ =>
        if (n == 1) 1000000L
        else if (n == 2) 500000L
        else if (rn == 1) 400000L
        else if (rn == n) 600000L - (n - 2) * (200000L / (n - 2))
        else 200000L / (n - 2)
    }

  /** Per touch-type credit report: (typeCol, n_touches, credit_ppm). */
  def report(df: DataFrame, keyCol: String, tsCol: String, typeCol: String,
             conversionType: String, touchTypes: Seq[String],
             lookbackSeconds: Long, model: String = "position",
             tieCol: String = "event_id"): DataFrame = {
    require(touchTypes.nonEmpty, "attribution: no touch types")
    require(!touchTypes.contains(conversionType),
      s"attribution: conversion type '$conversionType' cannot be a touch")
    require(lookbackSeconds > 0, s"lookbackSeconds=$lookbackSeconds")
    require(model == "position" || model == "linear",
      s"attribution model '$model' (position | linear)")
    val base = df
      .filter(col(typeCol).isin(conversionType +: touchTypes: _*))
      .select(col(keyCol), col(tsCol), col(typeCol), col(tieCol))
      .withColumn("__us", expr(s"unix_micros($tsCol)"))
      .withColumn("__isConv",
        when(col(typeCol) === conversionType, 1).otherwise(0))
    // as-of traversal: descending ts; at equal ts touches sort BEFORE
    // conversions so a same-instant conversion is not yet visible
    // (strictly-before contract); among equal-ts conversions the
    // greatest tie wins (last traversed — deterministic)
    val wAssign = Window.partitionBy(col(keyCol))
      .orderBy(col("__us").desc, col("__isConv").asc, col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val assigned = base
      .withColumn("__conv", last(
        when(col("__isConv") === 1,
          struct(col("__us").as("us"), col(tieCol).as("id"))),
        ignoreNulls = true).over(wAssign))
      .filter(col("__isConv") === 0 && col("__conv").isNotNull &&
        col("__us") < col("__conv.us") &&
        col("__conv.us") - col("__us") <= lit(lookbackSeconds * 1000000L))
    // credit groups partition by (key, conversion tie): the key prefix
    // removes any global-uniqueness assumption on tieCol (per-user event
    // counters are fine — two users sharing a counter value can no
    // longer merge into one credit group), and keeps the shuffle key
    // aligned with the preceding per-key pass
    val wRank = Window.partitionBy(col(keyCol), col("__conv.id"))
      .orderBy(col("__us").asc, col(tieCol).asc)
    val wN = Window.partitionBy(col(keyCol), col("__conv.id"))
    val ranked = assigned
      .withColumn("__rn", row_number().over(wRank))
      .withColumn("__n", count(lit(1)).over(wN))
    val credit = model match {
      case "linear" =>
        // each touch: 1e6 div n; the last additionally takes the
        // remainder, so every conversion sums to exactly 1e6
        when(col("__rn") === col("__n"),
          lit(1000000L) - (col("__n") - 1) * expr("1000000 div __n"))
          .otherwise(expr("1000000 div __n"))
      case _ =>
        when(col("__n") === 1, lit(1000000L))
          .when(col("__n") === 2, lit(500000L))
          .when(col("__rn") === 1, lit(400000L))
          .when(col("__rn") === col("__n"),
            lit(600000L) - (col("__n") - 2) * expr("200000 div (__n - 2)"))
          .otherwise(expr("200000 div (__n - 2)"))
    }
    ranked
      .withColumn("__credit", credit)
      .groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("__credit")).as("credit_ppm"))
  }
}
