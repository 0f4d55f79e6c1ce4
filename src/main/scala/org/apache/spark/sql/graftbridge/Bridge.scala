package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression conversions for custom Catalyst expressions.
  * `ExpressionUtils` is private[sql] in Spark 4, so extension libraries
  * expose it through an org.apache.spark.sql.* bridge package — the only
  * piece of this codebase that reaches into Spark internals.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** A copy of `df` whose internal-row RDD is persisted at `level` —
    * the cluster-safe materialization primitive. Unlike `localCheckpoint`,
    * the RDD's lineage is KEPT: a block lost with its executor is
    * recomputed on access instead of failing the job. Unlike
    * `Dataset.persist`, nothing is registered in the session's
    * CacheManager — the blocks are freed by the ContextCleaner as soon as
    * the returned frame is garbage-collected, so a library call can
    * materialize an intermediate without leaking a session-lifetime cache
    * entry. (Internal-row plumbing mirrors `Dataset.checkpoint`; rows are
    * copied because the scan reuses its row buffer.)
    */
  def persistedCopy(df: org.apache.spark.sql.DataFrame,
                    level: org.apache.spark.storage.StorageLevel): org.apache.spark.sql.DataFrame =
    persistedCopyReleasable(df, level)._1

  /** [[persistedCopy]] plus an EFFECTIVE release thunk. Because the
    * persistence lives on the raw internal-row RDD and is never
    * registered in the CacheManager, `Dataset.unpersist()` on the
    * returned frame is a silent no-op (uncacheQuery finds no cached
    * plan) — the only way to free the blocks before the frame is GC'd
    * is to unpersist the RDD itself, which this thunk holds. Callers
    * that materialize a skeleton per batch in a long-lived driver MUST
    * release through the thunk or dead blocks accumulate between GCs.
    */
  def persistedCopyReleasable(df: org.apache.spark.sql.DataFrame,
                              level: org.apache.spark.storage.StorageLevel):
      (org.apache.spark.sql.DataFrame, () => Unit) = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    rdd.persist(level)
    (ds.sparkSession.internalCreateDataFrame(rdd, ds.schema),
      () => { rdd.unpersist(blocking = false); () })
  }

  /** Block until every queued SparkListener event has been delivered —
    * the listener bus is asynchronous, so metrics accumulated in a
    * custom listener (the bench mains) are complete only after a drain.
    * `listenerBus` is private[spark], hence exposed here.
    */
  def drainListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
