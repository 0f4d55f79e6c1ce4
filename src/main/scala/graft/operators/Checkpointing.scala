package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage-cut strategy for the iterative operators ([[PageRank]],
  * [[Hits]]; the dedup CC rounds thread the same choice through
  * `Dedup.dupClusters`' `checkpointDir`). Iterative plans MUST cut
  * lineage (plan depth otherwise grows per iteration), but HOW matters
  * at cluster scale:
  *
  *  - [[Checkpointing.Local]] (default): `localCheckpoint()` — eager,
  *    fast, no external storage, but the cut blocks live ONLY on their
  *    executors with no lineage behind them: losing one executor mid-run
  *    fails the JOB. Right for local mode, notebooks, and fleets with
  *    stable executors.
  *  - [[Checkpointing.Reliable]]: each cut round-trips through a parquet
  *    file under `dir` (a shared filesystem on a real cluster — the
  *    `dupClusters` round-file discipline, same salt/cleanup contract).
  *    Executor loss costs a task retry that re-reads the file, never the
  *    run. The price is one write+read of the (node, long) vector per
  *    cut — skeleton-sized, not corpus-sized, for every operator that
  *    takes this.
  *
  * One instance per operator invocation (Reliable tracks per-slot round
  * files; sharing an instance across concurrent runs would interleave
  * cleanup). Result rows are IDENTICAL under either strategy
  * (spec-pinned): a cut only materializes, it never reorders or rounds.
  *
  * Files: the per-call salt keeps concurrent runs in one dir disjoint;
  * a SLOT's previous file is deleted as soon as that slot's next cut
  * lands (an operator cutting two live vectors — Hits' hub and authority
  * — uses two slots so one vector's cut never deletes the other's
  * backing file), and each slot's FINAL file stays behind (it lazily
  * backs the returned frame) — the caller owns the directory's
  * lifecycle, exactly as in `Dedup.dupClusters`.
  */
sealed trait Checkpointing {
  private[graft] def cut(df: DataFrame, slot: String = ""): DataFrame

  /** The invocation's LAST cut — the returned file lazily backs the
    * operator's result frame, so it must never be deleted by a later
    * cut. After this, the instance is spent: any further cut throws
    * (under [[Checkpointing.Reliable]]), turning the silently-destructive
    * instance-reuse mistake (a second run's first cut deleting the file
    * behind the first run's returned frame) into a fail-fast error.
    */
  private[graft] def cutFinal(df: DataFrame, slot: String = ""): DataFrame =
    cut(df, slot)
}

object Checkpointing {

  /** Executor-local eager cut — fast, dies with an executor. Stateless,
    * so reuse across invocations is safe and cutFinal == cut. */
  case object Local extends Checkpointing {
    private[graft] def cut(df: DataFrame, slot: String): DataFrame = {
      graft.plans.PlanTap.record(s"ckpt:$slot", df)
      df.localCheckpoint()
    }
  }

  /** Parquet round-trip under `dir` — survives executor loss. One
    * instance per operator invocation; the operator's terminal
    * [[cutFinal]] marks the instance spent and later cuts throw.
    */
  final case class Reliable(dir: String) extends Checkpointing {
    private val salt = java.util.UUID.randomUUID().toString.take(8)
    private val rounds =
      new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    private val spent = new java.util.concurrent.atomic.AtomicBoolean(false)

    private def path(slot: String, i: Int) = {
      val s = if (slot.isEmpty) "v" else slot
      new org.apache.hadoop.fs.Path(dir, s"ckpt-$salt-$s-round-$i")
    }

    private[graft] def cut(df: DataFrame, slot: String): DataFrame = {
      if (spent.get()) throw new IllegalStateException(
        "Checkpointing.Reliable instance reused after its terminal cut: " +
          "construct a fresh Reliable per operator invocation (a reused " +
          "instance's next cut would delete the file backing the previous " +
          "run's returned DataFrame)")
      graft.plans.PlanTap.record(s"ckpt:$slot", df)
      val spark = df.sparkSession
      val i: Int =
        rounds.merge(slot, Integer.valueOf(0), (a, _) => Integer.valueOf(a + 1))
      df.write.mode("overwrite").parquet(path(slot, i).toString)
      val back = spark.read.parquet(path(slot, i).toString)
      if (i > 0) {
        val prev = path(slot, i - 1)
        val fs = prev.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(prev, true)
      }
      back
    }

    override private[graft] def cutFinal(df: DataFrame,
                                         slot: String): DataFrame = {
      val back = cut(df, slot)
      spent.set(true)
      back
    }
  }
}
