package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan-parallelism guard for operators that do HEAVY row-local work
  * (tokenization, shingling, gram extraction, decode) directly on a
  * freshly scanned input (optimization round 18, guide §2.5): a parquet
  * file is splittable only at row-group boundaries, so a small file (or
  * any single-row-group file — every driver testdata table ships as one)
  * scans as ONE task and the per-row work serializes on one core no
  * matter how many are free (measured: d24's whole shingle pass, 6.8 of
  * its 10.2 cpu-s, on a single task while 31 cores idled).
  *
  * `input` round-robin-repartitions to the session's shuffle parallelism
  * ONLY when the scan yields fewer than half that many partitions — at
  * production scale a table arrives as thousands of splits and this is a
  * no-op (no payload shuffle added); on under-split inputs it pays one
  * payload shuffle to unlock every core for the expensive per-row stage.
  * Row placement never affects results (the callers' outputs are
  * aggregations/joins, partitioning-independent by the oracle contract);
  * Spark's sort-before-repartition keeps the assignment deterministic
  * under task retry (SPARK-23207).
  */
object Balance {
  def input(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    // internal-row RDD: partition count without building the Row
    // deserialization layer; no job runs (the RDD is lazy)
    val have = df.queryExecution.toRdd.getNumPartitions
    if (have * 2 < parts) df.repartition(parts) else df
  }
}
