package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Reliable (parquet round-trip) vs Local lineage cuts must be
  * result-invisible: a cut only materializes. Also pins the file
  * lifecycle — each slot keeps at most its latest round file, so a long
  * run can't fill the checkpoint dir.
  */
class CheckpointingSpec extends SparkSpec {
  import spark.implicits._

  private val edges = {
    val e = for (i <- 0L until 60L; k <- Seq(3L, 11L, 23L))
      yield (i % 40, (i * 7 + k) % 40)
    e.distinct
  }

  private def tmpDir(tag: String): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-ckpt-$tag").toFile
    d.deleteOnExit()
    d
  }

  test("PageRank: Reliable cuts are row-identical to Local") {
    val e = edges.toDF("src", "dst")
    val local = PageRank.run(e, iters = 5, checkpointEvery = 2)
      .orderBy("node").collect().toSeq
    val dir = tmpDir("pr")
    val reliable = PageRank.run(e, iters = 5, checkpointEvery = 2,
        checkpointing = Checkpointing.Reliable(dir.getAbsolutePath))
      .orderBy("node").collect().toSeq
    assert(reliable == local)
    // per-slot cleanup (round-18 layout: the vector is cut EVERY
    // iteration on alternating fp0/fp1 slots, plus the seed r0 and the
    // final out): each slot collapses to its latest round file
    val left = dir.listFiles().map(_.getName).sorted
    assert(left.count(_.contains("-fp0-round-")) == 1, left.mkString(","))
    assert(left.count(_.contains("-fp1-round-")) == 1, left.mkString(","))
    assert(left.count(_.contains("-r0-round-")) == 1, left.mkString(","))
    assert(left.count(_.contains("-out-round-")) == 1, left.mkString(","))
  }

  test("Hits: Reliable cuts are row-identical to Local; slots independent") {
    val e = edges.toDF("src", "dst")
    val local = Hits.run(e, iters = 4)
      .orderBy("node").collect().toSeq
    val dir = tmpDir("hits")
    val reliable = Hits.run(e, iters = 4,
        checkpointing = Checkpointing.Reliable(dir.getAbsolutePath))
      .orderBy("node").collect().toSeq
    assert(reliable == local)
    // 4 per-iteration cuts per slot collapse to one file per slot — the
    // round-18 layout cuts each half-step's RAW aggregate (ar, hr) —
    // plus the final out file
    val left = dir.listFiles().map(_.getName).sorted
    assert(left.count(_.contains("-ar-round-")) == 1, left.mkString(","))
    assert(left.count(_.contains("-hr-round-")) == 1, left.mkString(","))
    assert(left.count(_.contains("-out-round-")) == 1, left.mkString(","))
  }

  test("Reliable: reuse after a terminal cut fails fast, not destructively") {
    val e = edges.toDF("src", "dst")
    val dir = tmpDir("reuse")
    val ckpt = Checkpointing.Reliable(dir.getAbsolutePath)
    val first = PageRank.run(e, iters = 3, checkpointEvery = 2,
      checkpointing = ckpt)
    val firstRows = first.orderBy("node").collect().toSeq
    // the documented one-instance-per-invocation rule is now enforced: a
    // second run's first cut would otherwise delete the round file lazily
    // backing `first`
    val ex = intercept[IllegalStateException] {
      PageRank.run(e, iters = 3, checkpointEvery = 2, checkpointing = ckpt)
    }
    assert(ex.getMessage.contains("reused"))
    // and the first run's returned frame is still fully readable
    assert(first.orderBy("node").collect().toSeq == firstRows)
    // Local is stateless — reuse is fine
    val l = Checkpointing.Local
    PageRank.run(e, iters = 2, checkpointing = l)
    PageRank.run(e, iters = 2, checkpointing = l)
  }
}
