package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.similarity.Similarity

/** ANN queries over the embeddings table. s01 (exact brute force) is
  * oracle-checked against DuckDB's list functions; s02 (LSH) is the
  * approximate scale path with a rows-only check + recall spec.
  */
object SimilarityQ {

  private def queryVec(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings").filter(col("vec_id") === 0)
      .select(col("embedding").as("qvec"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // L6: exact top-20 cosine against the vec_id=0 query.
    "s01_knn_brute" -> { (s, dir) =>
      Similarity.bruteForceKnn(Tables(s, dir, "embeddings"), queryVec(s, dir),
        idCol = "vec_id", vecCol = "embedding", k = 20)
    },

    // L7: LSH-bucketed approximate top-20 for the same query.
    "s02_knn_lsh" -> { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      val dim = 64
      Similarity.lshKnn(emb, queryVec(s, dir), "vec_id", "embedding",
        k = 20, dim = dim, bits = 8, tables = 4)
    },

    // L8: IVF probe-based approximate top-20 for the same query.
    "s03_knn_ivf" -> { (s, dir) =>
      Similarity.ivfKnn(Tables(s, dir, "embeddings"), queryVec(s, dir),
        "vec_id", "embedding", k = 20, nCentroids = 16, probes = 4)
    }
  )

  val oracles: Map[String, String] = Map(
    // Same arithmetic as Similarity.cosine: double dot products, sequential
    // accumulation, rounded to 4 decimals; ties broken by vec_id.
    "s01_knn_brute" ->
      """WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
        |s AS (
        |  SELECT vec_id,
        |    ROUND(
        |      list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |                       list_transform(qvec, x -> CAST(x AS DOUBLE)))
        |      / (SQRT(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |                               list_transform(embedding, x -> CAST(x AS DOUBLE))))
        |       * SQRT(list_dot_product(list_transform(qvec, x -> CAST(x AS DOUBLE)),
        |                               list_transform(qvec, x -> CAST(x AS DOUBLE))))) , 4) AS sim
        |  FROM embeddings, q)
        |SELECT vec_id, sim FROM s
        |ORDER BY sim DESC, vec_id
        |LIMIT 20""".stripMargin
  )
}
