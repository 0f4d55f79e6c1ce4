package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact WEIGHTED quantiles per group — "the price at which half the
  * QUANTITY has traded", "the latency below which 95% of BYTES were
  * served": the unweighted q15 percentiles answer the wrong question
  * whenever rows carry different mass, and no engine ships a built-in
  * weighted percentile.
  *
  * Definition (the standard left-continuous one): the smallest value v
  * with W(<= v) >= q * W_total. Computed EXACTLY: ties collapse to
  * (group, value) weight sums first (so W(<= v) is well-defined
  * independent of row order), weights ride DECIMAL end to end, and the
  * threshold test is integer-scaled (`cum * 1e6 >= ppm * total` — the
  * retention_ppm convention) so no 0.5 float ever enters the
  * comparison — both engines agree row-for-row by construction.
  *
  * Scale shape: one (group, value) partial-aggregated collapse, one
  * per-group window over DISTINCT values (bounded by value cardinality
  * per group, not row count), one min-aggregate. Never a corpus sort.
  */
object WeightedQuantile {

  /** (groupCol, `wq_<ppm>` value) — the exact weighted quantile at
    * `quantilePpm` parts-per-million (500000 = weighted median).
    */
  def perGroup(df: DataFrame, groupCol: String, valueCol: String,
               weightCol: String, quantilePpm: Long): DataFrame = {
    require(quantilePpm >= 1 && quantilePpm <= 1000000,
      s"quantilePpm=$quantilePpm")
    val byVal = df.groupBy(col(groupCol), col(valueCol))
      .agg(sum(expr(s"CAST($weightCol AS DECIMAL(18,2))")).as("__w"))
    val cum = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col(groupCol))
    byVal
      .withColumn("__cw", sum(col("__w")).over(cum))
      .withColumn("__tw", sum(col("__w")).over(tot))
      .filter(col("__cw") * lit(1000000L) >= lit(quantilePpm) * col("__tw"))
      .groupBy(col(groupCol))
      .agg(min(col(valueCol)).as(s"wq_$quantilePpm"))
  }
}
