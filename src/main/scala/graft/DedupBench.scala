package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Scale validation for the near-dup pipeline: synthesizes `N` documents
  * (deterministic word salads) with a planted near-duplicate for every
  * tenth document (one word in ten mutated), runs
  * candidates→verify→threshold end to end, and reports recall, precision,
  * and wall time. Usage: `runMain graft.DedupBench [N]`.
  */
object DedupBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 100000
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
    val docs = base.union(twins)
      .select(col("doc_id"), concat_ws(" ", col("words")).as("text"))
      .repartition(cpus * 2).cache()
    val total = docs.count()

    val t0 = System.nanoTime()
    val pairs = Dedup.nearDuplicates(docs, "text", "doc_id", threshold = 0.5).cache()
    val found = pairs.count()
    val secs = (System.nanoTime() - t0) / 1e9

    val planted = total - n // one twin per tenth base doc
    val truePos = pairs.filter(col("b") === col("a") + n).count()
    println(f"""{"docs":$total,"planted_pairs":$planted,"found_pairs":$found,"true_pos":$truePos,"recall":${truePos.toDouble / planted}%.4f,"precision":${truePos.toDouble / math.max(found, 1)}%.4f,"secs":$secs%.1f}""")
    spark.stop()
  }
}
