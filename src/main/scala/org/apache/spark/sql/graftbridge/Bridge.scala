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
    graft.plans.PlanTap.record("persistedCopy", df)
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    rdd.persist(level)
    (ds.sparkSession.internalCreateDataFrame(rdd, ds.schema),
      () => { rdd.unpersist(blocking = false); () })
  }

  /** [[persistedCopy]] whose blocks are released AUTOMATICALLY after the
    * first query that consumes the returned frame completes (success or
    * failure): a one-shot [[org.apache.spark.sql.util.QueryExecutionListener]]
    * watches for the frame's `LogicalRDD` leaf in each finished query's
    * optimized plan, unpersists, and unregisters itself. This is the
    * right primitive for lazy library operators whose result the CALLER
    * materializes (the markCorpusFirst dedup family): within that one
    * action every branch shares the persisted skeleton, and the blocks
    * are freed the moment the action finishes — a long-lived driver
    * running the operator per batch accumulates nothing between GCs.
    * Lineage is kept, so a caller that runs a SECOND action on the same
    * result recomputes the skeleton instead of failing — correct, just
    * unshared (callers needing repeated consumption should persist the
    * RESULT themselves). The ContextCleaner remains the backstop when no
    * query ever runs (listener entries are a few fields each).
    */
  def persistedCopyAutoRelease(df: org.apache.spark.sql.DataFrame,
                               level: org.apache.spark.storage.StorageLevel):
      org.apache.spark.sql.DataFrame = {
    graft.plans.PlanTap.record("persistedCopyAutoRelease", df)
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    rdd.persist(level)
    armReleaseOnUse(ds.sparkSession, rdd)
    ds.sparkSession.internalCreateDataFrame(rdd, ds.schema)
  }

  /** [[persistedCopyAutoRelease]] that PRESERVES the input plan's output
    * partitioning (and ordering) on the persisted leaf — `LogicalRDD.
    * fromDataset`, the same attribute-rewriting capture `Dataset
    * .checkpoint` uses — so consumers whose required distribution the
    * layout already satisfies plan NO exchange over the cached frame
    * (a bare `internalCreateDataFrame` leaf reports Unknown partitioning
    * and every downstream join/aggregate re-shuffles it).
    *
    * Caller contract: the input's partitioning must be EXACT at runtime —
    * i.e. the frame should be rooted at a `repartition(n, cols…)` with an
    * explicit partition count, which AQE never re-coalesces. Preserving a
    * partitioning that AQE could still change underneath would let a
    * downstream join against OTHER data skip an exchange it actually
    * needs. (Self-joins/aggregations over this same frame are safe either
    * way — hash co-location within the frame is layout-stable.)
    */
  def persistedCopyPartitionedAutoRelease(df: org.apache.spark.sql.DataFrame,
                                          level: org.apache.spark.storage.StorageLevel):
      org.apache.spark.sql.DataFrame = {
    graft.plans.PlanTap.record("persistedCopyPartitionedAutoRelease", df)
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    rdd.persist(level)
    armReleaseOnUse(ds.sparkSession, rdd)
    // Derive the layout from the ANALYZED plan root rather than
    // `LogicalRDD.fromDataset` (which reads the physical root's
    // outputPartitioning — under lazily-built AQE that is
    // UnknownPartitioning, so the capture silently degrades to the bare
    // leaf). Only an explicit-N hash repartition qualifies: its
    // partition expressions ARE the child's output attributes (the same
    // attrs the new leaf exposes), and AQE never re-coalesces a
    // user-pinned partition count, so declared == actual at runtime.
    // LogicalRDD is a MultiInstanceRelation whose newInstance() rewrites
    // the partitioning onto fresh attrs, so self-joins stay exchange-free.
    val partitioning = ds.queryExecution.analyzed match {
      case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression
          if r.optNumPartitions.isDefined &&
            r.partitionExpressions.nonEmpty =>
        org.apache.spark.sql.catalyst.plans.physical.HashPartitioning(
          r.partitionExpressions, r.optNumPartitions.get)
      case _ =>
        org.apache.spark.sql.catalyst.plans.physical.UnknownPartitioning(0)
    }
    org.apache.spark.sql.classic.Dataset.ofRows(ds.sparkSession,
      org.apache.spark.sql.execution.LogicalRDD(
        ds.queryExecution.analyzed.output, rdd, partitioning)(ds.sparkSession))
  }

  /** [[persistedCopy]] plus a thunk that ARMS the release-on-first-use
    * listener — for operators that must run a PROBE action over the
    * persisted frame before handing it to the caller (the weighted-
    * quantile recursion trigger): probe first (the probe's query finishes
    * with no listener registered, so it FILLS the cache instead of
    * consuming it), then arm; the first CALLER query that references the
    * frame releases the blocks. An unarmed frame falls back to the
    * ContextCleaner on GC, same as [[persistedCopy]].
    */
  def persistedCopyArmable(df: org.apache.spark.sql.DataFrame,
                           level: org.apache.spark.storage.StorageLevel):
      (org.apache.spark.sql.DataFrame, () => Unit) = {
    graft.plans.PlanTap.record("persistedCopyArmable", df)
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    rdd.persist(level)
    val session = ds.sparkSession
    (session.internalCreateDataFrame(rdd, ds.schema),
      () => armReleaseOnUse(session, rdd))
  }

  private def armReleaseOnUse(
      session: org.apache.spark.sql.classic.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow]): Unit = {
    val rddId = rdd.id
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      private val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
      private def maybeRelease(qe: org.apache.spark.sql.execution.QueryExecution): Unit = {
        val hit = qe.optimizedPlan.exists {
          case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id == rddId
          case _ => false
        }
        if (hit && fired.compareAndSet(false, true)) {
          rdd.unpersist(blocking = false)
          session.listenerManager.unregister(this)
        }
      }
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = maybeRelease(qe)
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = maybeRelease(qe)
    }
    session.listenerManager.register(listener)
  }

  /** A clone of `s` sharing its SparkContext, shared state, and catalog
    * but with an independent COPY of the session conf — the primitive
    * for query-local conf overrides (e.g. disabling the
    * autoBucketedScan heuristic around a bucket-pruned probe) that must
    * hold at the caller's ACTION time without mutating the shared
    * session. `SparkSession.cloneSession` is private[sql], hence the
    * bridge.
    */
  def cloneSession(s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()

  /** Block until every queued SparkListener event has been delivered —
    * the listener bus is asynchronous, so metrics accumulated in a
    * custom listener (the bench mains) are complete only after a drain.
    * `listenerBus` is private[spark], hence exposed here.
    */
  def drainListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
