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
    // corpus size (adjacent rank within a source — the shape of an LSH
    // candidate list), and crucially each document is tokenized into its
    // distinct bigram set ONCE before the join, so the pair loop only
    // intersects precomputed arrays. Top-50 most similar, deterministic.
    // Oracle-checked: hashed-gram Jaccard ≡ string-gram Jaccard (64-bit
    // collisions aside), so DuckDB verifies the ratio with string bigrams.
    "d04_jaccard_pairs" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      // adjacent pairs via lead() instead of a rank self-join: the self-join
      // recomputes the gram projection + window for both sides and adds two
      // more exchanges; lead() pairs each doc with its successor in the SAME
      // single shuffle that ordered them (one scan, one exchange, no join)
      val w = Window.partitionBy("source").orderBy("doc_id")
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), Dedup.ngramHashSet(col("text"), 2).as("grams"))
        .withColumn("b", lead(col("doc_id"), 1).over(w))
        .withColumn("gb", lead(col("grams"), 1).over(w))
        .filter(col("b").isNotNull)
        .select(col("doc_id").as("a"), col("b"),
          round(Dedup.jaccardOfSets(col("grams"), col("gb")), 4).as("jaccard"))
        .orderBy(col("jaccard").desc, col("a"), col("b"))
        .limit(50)
    },

    // L20: benchmark contamination — corpus docs (id ≥ 20) sharing distinct
    // 5-grams with the "benchmark" slice (id < 20). Hashed grams in Spark ≡
    // string grams in the oracle, same argument as d04.
    "d06_contamination" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      Dedup.contamination(
        docs.filter(col("doc_id") >= 20), docs.filter(col("doc_id") < 20),
        "text", "doc_id", n = 5)
        .orderBy("doc_id")
    },

    // L20b: the same contamination report computed through the Bloom-filter
    // escape hatch (map-side prune + exact verify) — must equal d06 exactly,
    // so it shares d06's oracle and the hash gate proves the equivalence.
    "d07_contamination_bloom" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      Dedup.contaminationBloom(
        docs.filter(col("doc_id") >= 20), docs.filter(col("doc_id") < 20),
        "text", "doc_id", n = 5)
        .orderBy("doc_id")
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
        |ORDER BY canonical_id""".stripMargin,

    // String-bigram Jaccard over the same adjacent-rank candidate pairs:
    // identical ratios to the hashed-gram sets barring 64-bit collisions.
    "d04_jaccard_pairs" ->
      """WITH g AS (
        |  SELECT doc_id, source,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
        |    list_distinct(CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
        |      ELSE list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
        |    END) AS grams
        |  FROM (SELECT doc_id, source, text,
        |          string_split_regex(text, '\s+') AS toks FROM documents)),
        |p AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b,
        |    CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) AS inter,
        |    CAST(len(a.grams) + len(b.grams) AS DOUBLE) AS tot
        |  FROM g a JOIN g b ON a.source = b.source AND b.rn = a.rn + 1)
        |SELECT a, b, ROUND(inter / (tot - inter), 4) AS jaccard
        |FROM p
        |ORDER BY jaccard DESC, a, b
        |LIMIT 50""".stripMargin,

    // Same 5-gram sets as Dedup.contamination, spelled with string grams.
    "d06_contamination" ->
      """WITH g AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
        |    ELSE list_transform(range(1, len(toks) - 3),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
        |                toks[i+3] || ' ' || toks[i+4])
        |    END) AS grams
        |  FROM (SELECT doc_id, text, string_split_regex(text, '\s+') AS toks
        |        FROM documents)),
        |bench AS (SELECT DISTINCT unnest(grams) AS gr FROM g WHERE doc_id < 20),
        |corpus AS (SELECT doc_id, unnest(grams) AS gr FROM g WHERE doc_id >= 20)
        |SELECT doc_id, COUNT(*) AS n_shared
        |FROM corpus JOIN bench USING (gr)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    // d07 computes the identical report through the Bloom path — the gate
    // against the SAME oracle is what certifies the equivalence.
    "d07_contamination_bloom" ->
      """WITH g AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
        |    ELSE list_transform(range(1, len(toks) - 3),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
        |                toks[i+3] || ' ' || toks[i+4])
        |    END) AS grams
        |  FROM (SELECT doc_id, text, string_split_regex(text, '\s+') AS toks
        |        FROM documents)),
        |bench AS (SELECT DISTINCT unnest(grams) AS gr FROM g WHERE doc_id < 20),
        |corpus AS (SELECT doc_id, unnest(grams) AS gr FROM g WHERE doc_id >= 20)
        |SELECT doc_id, COUNT(*) AS n_shared
        |FROM corpus JOIN bench USING (gr)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    // Same arithmetic as the Spark side: double dot products, norms factored
    // out, ROUND(...,4) before the argmax, ties toward the lower vec_id.
    "d05_embed_nn" ->
      """WITH n AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |norms AS (
        |  SELECT vec_id, e, SQRT(list_dot_product(e, e)) AS nrm FROM n),
        |probes AS (
        |  SELECT vec_id AS probe_id, e AS qe, nrm AS qn FROM norms WHERE vec_id < 100),
        |pairs AS (
        |  SELECT probe_id, vec_id,
        |    ROUND(list_dot_product(e, qe) / (nrm * qn), 4) AS sim,
        |    ROW_NUMBER() OVER (PARTITION BY probe_id
        |                       ORDER BY ROUND(list_dot_product(e, qe) / (nrm * qn), 4) DESC,
        |                                vec_id) AS rk
        |  FROM norms CROSS JOIN probes
        |  WHERE vec_id <> probe_id)
        |SELECT probe_id, vec_id AS nn_id, sim
        |FROM pairs WHERE rk = 1
        |ORDER BY probe_id""".stripMargin
  )
}
