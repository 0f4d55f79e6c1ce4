package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal (slowly-changing-dimension) modeling over change-event
  * frames — the warehouse step between raw events and the point-in-time
  * lookups [[AsofJoin]] serves: turn "every observation of a key's
  * attributes" into "one row per VERSION with a validity interval"
  * (SCD type 2), so history is queryable by time range and a snapshot
  * at T is a filter, not a window over raw events.
  */
object Temporal {

  /** SCD2 validity intervals: per key, order observations by
    * (`tsCol`, `tieCol`), COLLAPSE consecutive rows whose `attrCols`
    * are all unchanged (no-op updates are the bulk of real change
    * streams and materializing them as versions poisons every
    * downstream join), and emit one row per surviving version with
    * `valid_from` (its first observation time), `valid_to` (the next
    * version's valid_from — half-open intervals, the standard SCD2
    * contract), `version` (1-based per key), and `is_current`
    * (valid_to null).
    *
    * Change detection is null-safe (`<=>` per attribute), so
    * null→value and value→null transitions version correctly.
    *
    * Scale shape: two windows over the SAME (key × (ts, tie))
    * partitioning — Spark plans one Exchange + one sort, then both the
    * change-mark and the interval windows run in that order (the
    * collapse filter between them is row-local). High-cardinality key,
    * per-key cost linear in that key's observations; never a
    * corpus-wide window.
    */
  def validityIntervals(df: DataFrame, keyCol: String, tsCol: String,
                        attrCols: Seq[String],
                        tieCol: String): DataFrame = {
    require(attrCols.nonEmpty, "validityIntervals: no attribute columns")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val changed = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    // the first row per key has lag = null for every attr: with non-null
    // attrs `!(a <=> null)` is true; an all-null first row is caught by
    // the explicit first-row test
    val isFirst = lag(col(tsCol), 1).over(w).isNull &&
      lag(col(tieCol), 1).over(w).isNull
    val kept = df
      .withColumn("__new_version", isFirst || changed)
      .filter(col("__new_version"))
      .drop("__new_version")
    val wk = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    kept
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(wk))
      .withColumn("version", row_number().over(wk).cast("long"))
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
  }

  /** Point-in-time snapshot of a [[validityIntervals]] frame: the one
    * version per key valid at `at` (valid_from <= at < valid_to, the
    * current version when valid_to is null). A filter — no window, no
    * shuffle; this is WHY the intervals get materialized.
    */
  def snapshotAt(versions: DataFrame, at: Column): DataFrame =
    versions.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))
}
