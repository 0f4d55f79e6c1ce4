package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting — for the hot-key cases AQE's runtime
  * skew-join can't fix (first-pass aggregations over power-law keys, or
  * joins whose build side must replicate).
  */
object Skew {

  /** Two-phase aggregation over a skewed key: partial-aggregate on
    * (key, salt) so a hot key spreads over `salts` reducers, then combine.
    * `aggs` maps output column name → (partialExpr, combineExpr), e.g.
    * count → (count(*), sum). Convenience wrappers below cover the common
    * cases.
    */
  def saltedCount(df: DataFrame, key: String, salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))

  /** Salted sum of a numeric column (same two-phase shape). */
  def saltedSum(df: DataFrame, key: String, valueCol: String, salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))

  /** Skew join: salt the (large, skewed) left side with a random shard id
    * and replicate every right row across all `salts` shards, turning one
    * hot reducer into `salts` evenly loaded ones. Right side must be the
    * smaller input (it is multiplied by `salts`).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts.toLong)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
