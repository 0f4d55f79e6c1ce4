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
}

object Checkpointing {

  /** Executor-local eager cut — fast, dies with an executor. */
  case object Local extends Checkpointing {
    private[graft] def cut(df: DataFrame, slot: String): DataFrame =
      df.localCheckpoint()
  }

  /** Parquet round-trip under `dir` — survives executor loss. */
  final case class Reliable(dir: String) extends Checkpointing {
    private val salt = java.util.UUID.randomUUID().toString.take(8)
    private val rounds =
      new java.util.concurrent.ConcurrentHashMap[String, Integer]()

    private def path(slot: String, i: Int) = {
      val s = if (slot.isEmpty) "v" else slot
      new org.apache.hadoop.fs.Path(dir, s"ckpt-$salt-$s-round-$i")
    }

    private[graft] def cut(df: DataFrame, slot: String): DataFrame = {
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
  }
}
