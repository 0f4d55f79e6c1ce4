package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Scale validation for the near-dup pipeline: synthesizes `N` documents
  * (deterministic word salads) with a planted near-duplicate for every
  * tenth document (one word in ten mutated), runs
  * candidates→verify→threshold end to end, and reports recall, precision,
  * and wall time. Usage: `runMain graft.DedupBench [N] [megaBucket]`.
  *
  * The optional second argument plants `megaBucket` IDENTICAL boilerplate
  * documents on top (ids ≥ 10·N) — the templated-page cluster that
  * survives nothing and lands whole in one LSH bucket per band. Uncapped
  * candidate generation would emit megaBucket²/2 pairs from it (50k docs →
  * 1.25 B pairs, a stalled stage); the `maxBucket` chain emits
  * megaBucket−1. The report's `mega_pairs` counts candidate pairs inside
  * the planted cluster, proving the bound held at bench scale.
  */
object DedupBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 100000
    val mega = if (args.length > 1) args(1).toInt else 0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Tables.newSession("graft-dedup-bench", s"local[$cpus]", cpus)
    import spark.implicits._

    val vocabSize = 5000
    val base = spark.range(n).select(col("id").as("doc_id"),
      transform(sequence(lit(0), lit(79)),
        i => concat(lit("w"), pmod(xxhash64(col("id"), i), lit(vocabSize.toLong))))
        .as("words"))
    // every 10th doc gets a near-dup twin (id + n): words mutated where i%10==0
    val twins = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + n).as("doc_id"),
        transform(col("words"), (w, i) =>
          when(i % 10 === 0, concat(lit("m"), w)).otherwise(w)).as("words"))
    val megaBase = 10L * n
    val boiler = spark.range(mega).select((col("id") + megaBase).as("doc_id"),
      lit("identical boilerplate legal footer repeated verbatim across the " +
        "whole crawl by a site template engine every single page").as("text"))
    val docs = base.union(twins)
      .select(col("doc_id"), concat_ws(" ", col("words")).as("text"))
      .union(boiler)
      .repartition(cpus * 2).cache()
    val total = docs.count()

    val t0 = System.nanoTime()
    val pairs = Dedup.nearDuplicates(docs, "text", "doc_id", threshold = 0.5).cache()
    val found = pairs.count()
    val secs = (System.nanoTime() - t0) / 1e9

    val planted = (total - mega) - n // one twin per tenth base doc
    val truePos = pairs.filter(col("b") === col("a") + n && col("a") < megaBase).count()
    val megaPairs =
      if (mega == 0) 0L else pairs.filter(col("a") >= megaBase).count()
    println(f"""{"docs":$total,"planted_pairs":$planted,"found_pairs":$found,"true_pos":$truePos,"recall":${truePos.toDouble / planted}%.4f,"precision":${truePos.toDouble / math.max(found - megaPairs, 1)}%.4f,"mega_docs":$mega,"mega_pairs":$megaPairs,"secs":$secs%.1f}""")
    spark.stop()
  }
}
