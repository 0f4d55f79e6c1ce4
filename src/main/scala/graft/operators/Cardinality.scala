package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-run DISTINCT-cardinality registry — the sketch member of the
  * cross-run family (exact d12, MinHash d13, hamming d15, line d22,
  * chunk d26 all answer "have I SEEN this item"; this answers "how MANY
  * distinct items has each group ever sent" — distinct URLs per source,
  * distinct hosts per crawl, distinct users per day — without
  * rescanning any previous run).
  *
  * Each run appends one (group, HLL sketch) row per group — Spark's
  * native DataSketches HllSketch aggregate (`hll_sketch_agg`), NOT raw
  * values, so the registry grows by O(groups · 2^lgK) bytes per run
  * regardless of how many items the run carried. The report unions the
  * accumulated sketches per group (`hll_union_agg`) and estimates.
  * Union preserves the sketch's error guarantee (a report over two
  * appended runs estimates within the same bound as a one-pass sketch
  * over both runs' rows — spec-pinned; the REGISTERS may differ
  * slightly, so estimates are near- but not bit-equal), and it is
  * order-insensitive, so the registry is APPEND-ONLY like every other
  * cross-run table — no merge-rewrite,
  * crash-safe under the same bucketed-append contract, and
  * [[graft.sources.Warehouse.compact]] may later fold rows per bucket
  * without changing any estimate.
  *
  * Estimates are estimates (~1-2% relative error at the default
  * lgConfigK=12): the USE is trend/ratio observability (is a source's
  * distinct-URL count growing? what duplication factor does a crawl
  * carry?), never an exact gate — exact membership stays the d12-family
  * job. Error bound and determinism (same inputs → same sketch bytes)
  * are spec-pinned.
  */
object Cardinality {

  /** Create the empty registry: (group STRING, sketch BINARY), bucketed
    * on group so appends and the report group-by co-locate.
    */
  def createSketchRegistry(spark: SparkSession, table: String,
                           buckets: Int = 8): Unit = {
    import spark.implicits._
    graft.sources.Warehouse.writeBucketed(
      Seq.empty[(String, Array[Byte])].toDF("group", "sketch"),
      table, "group", buckets)
  }

  /** Sketch this run's values per group and append to the registry.
    * Returns the number of group rows appended.
    */
  def appendSketches(df: DataFrame, groupCol: String, valueCol: String,
                     table: String, lgConfigK: Int = 12): Long = {
    val spark = df.sparkSession
    val perGroup = df
      .select(col(groupCol).cast("string").as("group"),
        col(valueCol).cast("string").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy("group")
      .agg(hll_sketch_agg(col("__v"), lit(lgConfigK)).as("sketch"))
    val delta = graft.sources.Warehouse.appendBucketedWithDelta(
      perGroup, table, "group")
    if (delta.isEmpty) 0L else spark.read.parquet(delta: _*).count()
  }

  /** Estimated distinct values per group over EVERY run ever appended:
    * one bucketed scan, per-group sketch union, estimate. `groups` is
    * bounded (that is what makes a per-group registry sane), so the
    * group-by is skew-free by construction.
    */
  def distinctPerGroup(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
      .groupBy("group")
      .agg(hll_sketch_estimate(
        hll_union_agg(col("sketch"), lit(true))).as("n_distinct_est"))
}
