package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.dedup.Dedup

/** Deduplication queries. d01 is exact and oracle-checked; the near-dup
  * family (MinHash/SimHash/Jaccard/embedding) emits deterministic
  * per-document artifacts (signatures, buckets, ranked pairs) with
  * rows-only checks — their pairing semantics are spec-tested on corpora
  * with planted near-duplicates.
  */
object DedupQ {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // L1: exact dedup via content hash (md5 here to stay oracle-comparable).
    "d01_exact_dedup" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .groupBy(md5(col("text").cast("binary")).as("content_hash"))
        .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("dup_count"))
        .orderBy("canonical_id")
    },

    // L2: MinHash LSH band buckets (the shuffle key of near-dedup at scale).
    "d02_minhash_bands" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val sigs = docs.select(col("doc_id"),
        Dedup.shingleHashes(col("text"), 3).as("sh"))
        .select(col("doc_id"), Dedup.minhashSignature(col("sh"), 64).as("sig"))
      Dedup.lshBands(sigs, "sig", bands = 16, idCol = "doc_id")
        .orderBy("doc_id", "band")
    },

    // L3: 64-bit SimHash per document.
    "d03_simhash" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), Dedup.simhash(col("text")).as("simhash64"))
        .orderBy("doc_id")
    },

    // L4: n-gram Jaccard verification over within-source candidate pairs,
    // top-50 most similar (deterministic ordering incl. tie-break).
    "d04_jaccard_pairs" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents").select(
        col("doc_id"), col("source"), col("text"))
      val a = docs.select(col("source"), col("doc_id").as("a"), col("text").as("ta"))
      val b = docs.select(col("source"), col("doc_id").as("b"), col("text").as("tb"))
      a.join(b, "source").filter(col("a") < col("b"))
        .select(col("a"), col("b"),
          round(Dedup.ngramJaccard(col("ta"), col("tb"), 2), 4).as("jaccard"))
        .orderBy(col("jaccard").desc, col("a"), col("b"))
        .limit(50)
    },

    // L5: embedding near-dup — nearest neighbor per vector for the first
    // 100 ids (broadcast side is the 100 probes, scan side stays the table).
    "d05_embed_nn" -> { (s, dir) =>
      import graft.similarity.Similarity
      val emb = Tables(s, dir, "embeddings")
      val probes = emb.filter(col("vec_id") < 100)
        .select(col("vec_id").as("probe_id"), col("embedding").as("qvec"))
      emb.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"),
          round(Similarity.cosine(col("embedding"), col("qvec")), 4).as("sim"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("probe_id"))
            .orderBy(col("sim").desc, col("vec_id"))))
        .filter(col("rn") === 1)
        .select(col("probe_id"), col("vec_id").as("nn_id"), col("sim"))
        .orderBy("probe_id")
    }
  )

  val oracles: Map[String, String] = Map(
    "d01_exact_dedup" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS canonical_id,
        |  COUNT(*) AS dup_count
        |FROM documents
        |GROUP BY 1
        |ORDER BY canonical_id""".stripMargin
  )
}
