package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join: for each left row, the latest right row with
  * `rightTs <= leftTs` for the same key — the canonical "state at event
  * time" lookup Spark has no built-in operator for.
  *
  * Implemented by composition (preference (a) of the custom-operator
  * ladder): tag both sides, union, and carry the last non-null right
  * payload forward with a running window — ONE shuffle on the key, no
  * range-condition nested-loop join, no per-key collect. Left rows with no
  * preceding right row get nulls (left-outer as-of semantics).
  *
  * Scale: the single shuffle partitions by key; the within-partition sort
  * is (ts, side), so cost is the same as any windowed analytic over the
  * combined stream. Skewed keys fall under AQE's skew handling.
  */
object AsofJoin {

  /** @param left        probe side
    * @param right       state side
    * @param keys        equality key columns (same names on both sides)
    * @param leftTs      left timestamp column
    * @param rightTs     right timestamp column
    * @param rightCols   right columns to carry (emitted as `asof_<name>`)
    */
  def apply(left: DataFrame, right: DataFrame, keys: Seq[String],
            leftTs: String, rightTs: String, rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadType = right.select(rightCols.map(col): _*).schema
    val lrowType = left.schema

    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__side"),
        lit(null).cast(payloadType).as("__payload"),
        struct(leftCols.map(col): _*).as("__lrow")): _*)

    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"),
        struct(rightCols.map(col): _*).as("__payload"),
        lit(null).cast(lrowType).as("__lrow")): _*)

    // rights sort before lefts at equal ts → "<=" semantics; __payload as the
    // final key makes the order total when several right rows share a
    // (key, ts) — last() then deterministically picks the greatest payload
    // instead of whichever shuffled last (a latent exact-compare flake).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l.unionByName(r)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val out = leftCols.map(c => col(s"__lrow.$c").as(c)) ++
      rightCols.map(c => col(s"__match.$c").as(s"asof_$c"))
    matched.select(out: _*)
  }
}
