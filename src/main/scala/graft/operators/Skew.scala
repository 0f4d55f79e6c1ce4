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

  /** Salted two-phase per-group TOP-N — the window twin of the salted
    * aggregations: a single `row_number` window routes a hot group's
    * every row through one task; phase 1 ranks within (group, salt lane)
    * and keeps `n` per lane (the global per-group top-N is necessarily
    * contained in the union of per-lane top-Ns), so phase 2's per-group
    * window ranks ≤ saltParts × n rows — bounded regardless of group
    * skew, results identical to the naive window. `saltKey` must be
    * deterministic per row (an id column) so lane assignment is stable.
    * Shared by `TextOps.sourceQuota` (domain caps) and
    * `Similarity.clusterSample` (per-cell diversity quotas) — one
    * implementation, spec-pinned ≡ the naive window from both callers.
    */
  def saltedTopN(df: DataFrame, partitionCols: Seq[Column], saltKey: Column,
                 ordering: Seq[Column], n: Int,
                 saltParts: Int = 32): DataFrame = {
    require(n > 0 && saltParts > 0, s"n=$n saltParts=$saltParts")
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(partitionCols :+ pmod(xxhash64(saltKey), lit(saltParts)): _*)
      .orderBy(ordering: _*)
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(partitionCols: _*).orderBy(ordering: _*)
    df.withColumn("__r1", row_number().over(w1)).filter(col("__r1") <= n)
      .withColumn("__r2", row_number().over(w2)).filter(col("__r2") <= n)
      .drop("__r1", "__r2")
  }

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

  /** TARGETED skew join: detect the hot keys exactly with
    * [[HeavyHitters]] (one shuffle-free Misra–Gries pass + a bounded
    * recount — fixed memory at any key cardinality), then salt ONLY
    * them. [[saltedJoin]] replicates the ENTIRE right side `salts`×,
    * which at a 100 TB join multiplies a possibly-large build side for
    * the benefit of a handful of keys; here cold keys join on a single
    * lane (no replication) and only the detected hot keys fan out, so
    * the extra right-side rows are |hot keys| × salts — constant-ish,
    * not proportional to the table. Result rows are identical to the
    * plain join at any partitioning (spec-pinned): lane assignment only
    * routes, never filters.
    *
    * `fracPpm` is the hotness threshold in parts-per-million of left
    * rows (a key above ~1/shuffle-partitions of the table is the
    * classic straggler; 1000 ppm = 0.1% is a sane default at hundreds
    * of partitions).
    */
  def adaptiveSaltedJoin(left: DataFrame, right: DataFrame, key: String,
                         fracPpm: Long = 1000L, salts: Int = 16): DataFrame = {
    require(salts > 1, s"salts must exceed 1: $salts")
    val hot = HeavyHitters.heavyHitters(left, key, fracPpm)
      .select(col("key").as(key)).withColumn("__hot", lit(true))
    val saltedLeft = left.join(broadcast(hot), Seq(key), "left")
      .withColumn("__salt", when(col("__hot").isNotNull,
        pmod(xxhash64(col(key), monotonically_increasing_id()),
          lit(salts.toLong))).otherwise(lit(0L)))
      .drop("__hot")
    val replicatedRight = right.join(broadcast(hot), Seq(key), "left")
      .withColumn("__salt", explode(when(col("__hot").isNotNull,
        sequence(lit(0L), lit(salts.toLong - 1)))
        .otherwise(array(lit(0L)))))
      .drop("__hot")
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
