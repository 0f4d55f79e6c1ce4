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
        Dedup.minhashSignatureFromText(col("text"), 3, 64).as("sig"))
      Dedup.lshBands(sigs, "sig", bands = 16, idCol = "doc_id")
        .orderBy("doc_id", "band")
    },

    // L3: 64-bit SimHash per document.
    "d03_simhash" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), Dedup.simhash(col("text")).as("simhash64"))
        .orderBy("doc_id")
    },

    // L4: n-gram Jaccard verification join. Candidate pairs are linear in
    // corpus size (consecutive ids within a source — the shape of an LSH
    // candidate list), and crucially each document is tokenized into its
    // distinct bigram set ONCE before the join, so the pair loop only
    // intersects precomputed arrays. Top-50 most similar, deterministic.
    "d04_jaccard_pairs" -> { (s, dir) =>
      val grams = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), Dedup.ngramHashSet(col("text"), 2).as("grams"))
      val a = grams.select(col("source"), col("doc_id").as("a"), col("grams").as("ga"))
      val b = grams.select(col("source"), col("doc_id").as("b"), col("grams").as("gb"))
      a.join(b, "source").filter(col("b") === col("a") + 1)
        .select(col("a"), col("b"),
          round(Dedup.jaccardOfSets(col("ga"), col("gb")), 4).as("jaccard"))
        .orderBy(col("jaccard").desc, col("a"), col("b"))
        .limit(50)
    },

    // L5: embedding near-dup — nearest neighbor per vector for the first
    // 100 ids (broadcast side is the 100 probes, scan side stays the
    // table); norms computed once per side, dot product only per pair.
    "d05_embed_nn" -> { (s, dir) =>
      import graft.similarity.Similarity
      val emb = Tables(s, dir, "embeddings")
        .withColumn("na", sqrt(Similarity.dot(col("embedding"), col("embedding"))))
      val probes = emb.filter(col("vec_id") < 100)
        .select(col("vec_id").as("probe_id"), col("embedding").as("qvec"), col("na").as("nq"))
      emb.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"),
          round(Similarity.dot(col("embedding"), col("qvec")) / (col("na") * col("nq")), 4).as("sim"))
        // argmax via partial-aggregatable max(struct): no window sort, ties
        // broken toward the lower vec_id (negated in the struct ordering)
        .groupBy(col("probe_id"))
        .agg(max(struct(col("sim"), (-col("vec_id")).as("neg_id"))).as("best"))
        .select(col("probe_id"), (-col("best.neg_id")).as("nn_id"), col("best.sim").as("sim"))
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
