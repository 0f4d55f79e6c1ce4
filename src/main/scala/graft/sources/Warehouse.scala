package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Warehouse-layout helpers for the 100 TB path: bucketing co-locates both
  * sides of a recurring join on the join key at write time, so every
  * subsequent join/aggregation on that key runs with NO shuffle exchange —
  * the single biggest lever for repeated fact-fact joins at scale.
  *
  * (Time-partitioning for events-style tables composes with this via
  * `partitionBy`; partition pruning then drops whole directories before
  * the scan.)
  */
object Warehouse {

  /** Write as a bucketed, per-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Write bucketed and additionally partitioned by a (low-cardinality)
    * partition column — pruning + co-location together.
    */
  def writeBucketedPartitioned(df: DataFrame, table: String, partitionCol: String,
                               key: String, buckets: Int): Unit =
    df.write
      .partitionBy(partitionCol)
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Join two identically-bucketed tables on their bucket key. With equal
    * bucket counts Spark plans a SortMergeJoin with no Exchange on either
    * side.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Drop a managed table AND its warehouse directory. With a
    * non-persistent (in-memory) catalog, a previous JVM's managed-table
    * directory survives while the catalog forgets it, and the next
    * CREATE TABLE fails with LOCATION_ALREADY_EXISTS — every index
    * (re)build goes through this first.
    */
  def dropTableAndLocation(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val p = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
