package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad for plan/perf iteration (not part of the library API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = Tables.newSession("graft-scratch", "local[32]", 32)

    def time(name: String)(f: => Long): Unit = {
      f // warmup
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }

    import graft.dedup.Dedup
    val docs = Tables(spark, sfDir, "documents")
    docs.cache().count()

    import org.apache.spark.sql.expressions.Window
    time("docs_scan")(docs.count())
    time("d04_grams_forced")(docs.select(
      sum(size(Dedup.ngramHashSet(col("text"), 2)))).count())
    val w = Window.partitionBy("source").orderBy("doc_id")
    val grams = docs
      .select(col("doc_id"), col("source"), Dedup.ngramHashSet(col("text"), 2).as("grams"))
      .withColumn("rn", row_number().over(w))
    time("d04_ranked")(grams.select(sum(col("rn"))).count())
    val a = grams.select(col("source"), col("rn"), col("doc_id").as("a"), col("grams").as("ga"))
    val b = grams.select(col("source"), (col("rn") - 1).as("rn"),
      col("doc_id").as("b"), col("grams").as("gb"))
    time("d04_join_only")(a.join(b, Seq("source", "rn")).count())
    time("d04_jaccard")(a.join(b, Seq("source", "rn"))
      .select(round(Dedup.jaccardOfSets(col("ga"), col("gb")), 4).as("j"))
      .agg(sum("j")).count())
    time("d04_full")(graft.queries.DedupQ.queries("d04_jaccard_pairs")(spark, sfDir).count())
    spark.stop()
  }
}
