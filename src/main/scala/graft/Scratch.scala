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

    val emb = Tables(spark, sfDir, "embeddings")
    emb.cache().count()

    import graft.similarity.Similarity
    val qv = Tables(spark, sfDir, "embeddings").filter(col("vec_id") === 0)
      .select(col("embedding").as("qvec"))

    time("scan_only")(emb.count())
    time("sigs_forced")(emb.select(explode(
      Similarity.hyperplaneSignatures(col("embedding"), 64, 6, 8))).count())
    time("s01_brute")(Similarity.bruteForceKnn(emb, qv, "vec_id", "embedding", 20).count())
    val q2 = qv.withColumn("__qsigs", Similarity.hyperplaneSignatures(col("qvec"), 64, 6, 8))
      .withColumn("__norm_q", sqrt(Similarity.dot(col("qvec"), col("qvec"))))
    time("s02_join_only")(emb.withColumn("__sigs",
        Similarity.hyperplaneSignatures(col("embedding"), 64, 6, 8))
      .crossJoin(broadcast(q2)).filter(arrays_overlap(col("__sigs"), col("__qsigs"))).count())
    time("s02_lsh")(Similarity.lshKnn(emb, qv, "vec_id", "embedding", 20, 64, 6, 8).count())
    time("s03_ivf")(Similarity.ivfKnn(emb, qv, "vec_id", "embedding", 20).count())
    time("s03_assign_only") {
      val (a, _) = Similarity.ivfAssign(emb, "vec_id", "embedding", 16, 0)
      a.count()
    }
    time("s03_assign_lloyd1") {
      val (a, _) = Similarity.ivfAssign(emb, "vec_id", "embedding", 16, 1)
      a.count()
    }
    spark.stop()
  }
}
