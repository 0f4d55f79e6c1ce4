package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.sources.Warehouse

/** Streaming faces of the warehouse primitives. */
object WarehouseStreams {

  /** Streaming CDC apply — [[Warehouse.applyChanges]]' incremental
    * face: each micro-batch of change rows (full-row upserts + deletes,
    * winner per key by `seqCols`) folds into the LATEST committed
    * snapshot under `root` and publishes the result as the NEXT version
    * through [[Warehouse.publishShards]]' manifest-commit atomicity —
    * downstream readers ([[Warehouse.latestShards]]) always see a
    * complete keyed snapshot, never a half-applied batch, and the
    * version history doubles as a change audit
    * ([[Warehouse.diffVersions]]) with [[Warehouse.vacuumVersions]] as
    * the retention knob.
    *
    * Ordering: within a batch the sequence columns elect winners
    * exactly as the batch operator; across batches, later batches apply
    * on earlier batches' snapshots (stream order). A batch REPLAYED
    * after a crash re-applies onto the already-merged base and
    * publishes an IDENTICAL snapshot as a new version — upsert/delete/
    * insert are idempotent under re-application, so replay costs a
    * redundant version, never corruption (vacuum sweeps it with the
    * rest).
    *
    * The first batch against an empty root applies onto an empty base —
    * an insert-only bootstrap; `shard` is recomputed from the key hash
    * at every publish, so snapshot sharding is stable under any change
    * mix.
    */
  def applyChangesStream(changes: DataFrame, root: String, keyCol: String,
                         seqCols: Seq[String], opCol: String,
                         checkpointDir: String,
                         numShards: Int = 8,
                         deleteOp: String = "D"): StreamingQuery = {
    require(numShards >= 1, s"numShards=$numShards")
    val payloadCols = changes.columns.toSeq
      .filterNot(c => c == opCol || seqCols.contains(c))
    require(payloadCols.contains(keyCol),
      s"applyChangesStream: changes lack key column $keyCol")
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val spark = batch.sparkSession
        val emptyBase = spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row],
          batch.select(payloadCols.map(col): _*).schema)
        val base = Warehouse.latestShards(spark, root) match {
          case Some(dir) => spark.read.parquet(dir)
            .select(payloadCols.map(col): _*) // shard is re-derived below
          case None => emptyBase
        }
        val merged = Warehouse.applyChanges(base, batch.toDF(), keyCol,
            seqCols, opCol, deleteOp)
          .withColumn("shard",
            pmod(xxhash64(col(keyCol)), lit(numShards.toLong)))
        Warehouse.publishShards(merged, root)
        ()
      }
      .start()
  }
}
