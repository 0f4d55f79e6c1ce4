package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join: for each left row, the nearest right row
  * at-or-before (`backward`, default), at-or-after (`forward`), or
  * closest-in-either-direction (`nearest`) the left timestamp for the
  * same key — the canonical "state at event time" lookup Spark has no
  * built-in operator for, with the pandas `merge_asof` surface:
  * direction and an optional match TOLERANCE (a nearest match staler
  * than the tolerance yields nulls, the way a production feature-store
  * lookup refuses stale state).
  *
  * Implemented by composition (preference (a) of the custom-operator
  * ladder): tag both sides, union, and carry the last non-null right
  * payload forward with a running window — ONE shuffle on the key, no
  * range-condition nested-loop join, no per-key collect. `forward` is
  * the same traversal over descending timestamps; `nearest` runs BOTH
  * windows over the one exchange (same partitioning → one shuffle, two
  * within-partition sorts) and picks per left row the match with the
  * smaller |gap|, ties toward backward (tolerance null-outs apply per
  * direction BEFORE the choice, so a stale backward match loses to an
  * in-tolerance forward one). Left rows with no qualifying right row
  * get nulls (left-outer as-of semantics).
  *
  * Scale: the single shuffle partitions by key; the within-partition
  * sort is (ts, side), so cost is the same as any windowed analytic over
  * the combined stream. Skewed keys fall under AQE's skew handling. The
  * tolerance is applied AFTER the window as a row-local null-out — it
  * never becomes a range-join predicate.
  */
object AsofJoin {

  /** @param left        probe side
    * @param right       state side
    * @param keys        equality key columns (same names on both sides)
    * @param leftTs      left timestamp column
    * @param rightTs     right timestamp column
    * @param rightCols   right columns to carry (emitted as `asof_<name>`)
    * @param direction   "backward" (nearest rightTs <= leftTs, default)
    *                    or "forward" (nearest rightTs >= leftTs)
    * @param toleranceSeconds  max |leftTs - rightTs| for a match to
    *                    count; non-positive = unbounded (default)
    */
  def apply(left: DataFrame, right: DataFrame, keys: Seq[String],
            leftTs: String, rightTs: String, rightCols: Seq[String],
            direction: String = "backward",
            toleranceSeconds: Double = 0.0): DataFrame = {
    val dir = direction.toLowerCase
    require(dir == "backward" || dir == "forward" || dir == "nearest",
      s"asof direction '$direction' (backward | forward | nearest)")
    val forward = dir == "forward"
    val leftCols = left.columns.toSeq
    // the matched right timestamp rides INSIDE the payload struct (last
    // field: among rows tying on (key, ts) it equals __ts, so the
    // payload tie-break order is unchanged) — the tolerance check needs
    // it after the window
    val payloadType = right
      .select(rightCols.map(col) :+ col(rightTs).as("__rts"): _*).schema
    val lrowType = left.schema

    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__side"),
        lit(null).cast(payloadType).as("__payload"),
        struct(leftCols.map(col): _*).as("__lrow")): _*)

    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"),
        struct(rightCols.map(col) :+ col(rightTs).as("__rts"): _*)
          .as("__payload"),
        lit(null).cast(lrowType).as("__lrow")): _*)

    // rights sort before lefts at equal ts → inclusive boundary on both
    // directions; __payload as the final key makes the order total when
    // several right rows share a (key, ts) — last() then
    // deterministically picks the greatest payload instead of whichever
    // shuffled last (a latent exact-compare flake). Forward = identical
    // traversal over DESCENDING ts: the last right seen before a left is
    // the nearest rightTs >= leftTs.
    def windowOver(desc: Boolean) = {
      val tsOrder = if (desc) col("__ts").desc else col("__ts").asc
      Window.partitionBy(keys.map(col): _*)
        .orderBy(tsOrder, col("__side"), col("__payload"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    }
    def gapOf(m: Column, fwd: Boolean) =
      if (fwd) m.getField("__rts").cast("double") - col("__ts").cast("double")
      else col("__ts").cast("double") - m.getField("__rts").cast("double")
    def withTolerance(m: Column, fwd: Boolean): Column =
      if (toleranceSeconds > 0)
        when(gapOf(m, fwd) <= lit(toleranceSeconds), m)
      else m

    val matched =
      if (dir == "nearest") {
        // both traversals over the ONE key exchange (same partitioning:
        // the second window adds a sort, not a shuffle); per-direction
        // tolerance null-outs, then the smaller-|gap| match wins, ties
        // toward backward
        l.unionByName(r)
          .withColumn("__mbRaw",
            last(col("__payload"), ignoreNulls = true).over(windowOver(false)))
          .withColumn("__mfRaw",
            last(col("__payload"), ignoreNulls = true).over(windowOver(true)))
          .withColumn("__mb", withTolerance(col("__mbRaw"), fwd = false))
          .withColumn("__mf", withTolerance(col("__mfRaw"), fwd = true))
          .withColumn("__match",
            when(col("__mf").isNull, col("__mb"))
              .when(col("__mb").isNull, col("__mf"))
              .when(gapOf(col("__mf"), fwd = true) <
                gapOf(col("__mb"), fwd = false), col("__mf"))
              .otherwise(col("__mb")))
          .filter(col("__side") === 1)
      } else {
        l.unionByName(r)
          .withColumn("__m",
            last(col("__payload"), ignoreNulls = true).over(windowOver(forward)))
          .withColumn("__match", withTolerance(col("__m"), forward))
          .filter(col("__side") === 1)
      }

    val out = leftCols.map(c => col(s"__lrow.$c").as(c)) ++
      rightCols.map(c => col(s"__match.$c").as(s"asof_$c"))
    matched.select(out: _*)
  }
}
