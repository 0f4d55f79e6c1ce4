package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.similarity.Similarity
import graft.text.TextOps

/** Semantics tests for the LLM-pipeline operators on corpora with planted
  * duplicates/near-duplicates (things the all-distinct driver tables can't
  * exercise).
  */
class OperatorSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs far away home"),
    (2L, "the quick brown fox jumps over the lazy dog and runs far away home"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog and walks far away home"), // near dup of 1
    (4L, "completely different content about spark query engines and storage"),
    (5L, "yet another unrelated document mentioning databases and vectors")
  ).toDF("doc_id", "text")

  test("exact dedup keeps lowest id per content group") {
    val out = Dedup.exact(docs, "text", "doc_id").select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 3L, 4L, 5L))
  }

  test("minhash LSH finds the exact and near dup pairs, not unrelated ones") {
    val pairs = Dedup.minhashCandidates(docs, "text", "doc_id", k = 3, numHashes = 64, bands = 32)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (a, b) => Set(a, b).intersect(Set(4L, 5L)).size == 1 && Set(a, b).intersect(Set(1L, 2L, 3L)).size == 1 })
  }

  test("nearDuplicates end-to-end finds planted dup pairs above threshold") {
    val pairs = Dedup.nearDuplicates(docs, "text", "doc_id", threshold = 0.5,
      bands = 32).as[(Long, Long, Double)].collect()
    val ids = pairs.map(p => (p._1, p._2)).toSet
    assert(ids.contains((1L, 2L)))
    assert(pairs.find(p => (p._1, p._2) == (1L, 2L)).get._3 == 1.0)
    assert(ids.contains((1L, 3L)))
    assert(!ids.exists { case (a, b) => a >= 4L || b >= 4L })
    val survivors = Dedup.nearDedup(docs, "text", "doc_id", threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(survivors == Seq(1L, 4L, 5L))
  }

  test("dupClusters labels transitive chains with the component minimum") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L), (10L, 11L), (11L, 12L), (12L, 13L))
      .toDF("a", "b")
    val labels = Dedup.dupClusters(pairs).as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L))
  }

  test("simhash: identical texts equal, near-dups within few bits, unrelated far") {
    val h = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(h(1L) == h(2L))
    assert(java.lang.Long.bitCount(h(1L) ^ h(3L)) <= 12)
    assert(java.lang.Long.bitCount(h(1L) ^ h(4L)) > 12)
  }

  test("ngram jaccard: dup=1.0, near-dup high, unrelated low") {
    val a = docs.filter($"doc_id" === 1).select($"text".as("ta"))
    def j(other: Long): Double = {
      val b = docs.filter($"doc_id" === other).select($"text".as("tb"))
      a.crossJoin(b).select(Dedup.ngramJaccard($"ta", $"tb", 2).as("j")).as[Double].head()
    }
    assert(j(2L) == 1.0)
    assert(j(3L) > 0.6)
    assert(j(4L) < 0.1)
  }

  test("cosine + brute-force knn ranks an identical vector first") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(-1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("qvec"))
    val top = Similarity.bruteForceKnn(emb, q, "vec_id", "embedding", k = 3)
      .as[(Long, Double)].collect()
    assert(top.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(top.head._2 == 1.0)
  }

  test("lsh knn achieves high recall vs brute force on random vectors") {
    val rng = new scala.util.Random(1)
    val vecs = (0L until 500L).map(i => (i, Array.fill(16)(rng.nextGaussian().toFloat)))
    val emb = vecs.toDF("vec_id", "embedding")
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("qvec"))
    val exact = Similarity.bruteForceKnn(emb, q, "vec_id", "embedding", k = 10)
      .as[(Long, Double)].collect().map(_._1).toSet
    val approx = Similarity.lshKnn(emb, q, "vec_id", "embedding", k = 10,
      dim = 16, bits = 6, tables = 8).as[(Long, Double)].collect().map(_._1).toSet
    assert(exact.intersect(approx).size >= 6, s"recall too low: ${exact.intersect(approx).size}/10")
  }

  test("ivf knn achieves reasonable recall vs brute force") {
    val rng = new scala.util.Random(3)
    val emb = (0L until 500L).map(i => (i, Array.fill(16)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("qvec"))
    val exact = Similarity.bruteForceKnn(emb, q, "vec_id", "embedding", k = 10)
      .as[(Long, Double)].collect().map(_._1).toSet
    val approx = Similarity.ivfKnn(emb, q, "vec_id", "embedding", k = 10,
      nCentroids = 8, probes = 4).as[(Long, Double)].collect().map(_._1).toSet
    assert(exact.intersect(approx).size >= 5,
      s"recall too low: ${exact.intersect(approx).size}/10")
  }

  test("ivf assigns every vector to a cell and cells partition the data") {
    val rng = new scala.util.Random(2)
    val emb = (0L until 200L).map(i => (i, Array.fill(8)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val (assigned, centroids) = Similarity.ivfAssign(emb, "vec_id", "embedding", nCentroids = 8)
    assert(centroids.length == 8)
    assert(assigned.filter($"cell" < 0).count() == 0)
    assert(assigned.count() == 200)
    assert(assigned.select("cell").distinct().count() > 1)
  }

  test("approx_count_distinct stays within 5% of exact on 100k keys") {
    val df = spark.range(100000).selectExpr("CAST(id % 37777 AS STRING) AS k")
    val exact = df.select(countDistinct(col("k"))).head().getLong(0)
    val approx = df.select(approx_count_distinct(col("k"), 0.01)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("langId detects stopword-heavy languages and CJK") {
    val samples = Seq(
      ("the cat sat on the mat and it was happy", "en"),
      ("le chat est dans la maison et il est content", "fr"),
      ("el gato es un animal y la casa es grande", "es"),
      ("der hund ist in den haus und das ist gut", "de"),
      ("这是一个中文句子没有空格", "zh")
    ).toDF("text", "expected")
    val got = samples.select(TextOps.langId(col("text")).as("got"), col("expected"))
      .as[(String, String)].collect()
    got.foreach { case (g, e) => assert(g == e, s"expected $e got $g") }
  }

  test("quality score rewards long natural text, penalizes fragments") {
    val df = Seq(
      "word " * 100 + "end",
      "x"
    ).toDF("text")
    val scores = df.select(TextOps.qualityScore(col("text"))).as[Double].collect()
    assert(scores(0) == 1.0)
    assert(scores(1) < 0.1)
  }

  test("fingerprint is deterministic and shift-stable for shared windows") {
    val df = Seq(
      (1L, "abcdefghijklmnopqrstuvwxyz0123456789"),
      (2L, "abcdefghijklmnopqrstuvwxyz0123456789"),
      (3L, "PREFIX abcdefghijklmnopqrstuvwxyz0123456789")
    ).toDF("doc_id", "text")
    val fp = df.select(col("doc_id"), TextOps.fingerprint(col("text"), k = 16).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    // min rolling hash over shared 16-gram windows often coincides; at
    // minimum it is deterministic and non-zero here
    assert(fp(3L) != 0L)
  }
}
