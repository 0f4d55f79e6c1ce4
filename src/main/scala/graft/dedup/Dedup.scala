package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for LLM training-data pipelines.
  *
  * Scale design: nothing here ever joins n×n on content. Exact dedup
  * shuffles a 64/128-bit hash (never the text); MinHash LSH shuffles
  * (band, bucket) keys so candidate generation is linear in corpus size plus
  * bucket collisions; Jaccard verification touches only candidate pairs.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per distinct content hash.
    * One shuffle on the hash; the text column itself is never shuffled.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(sha2(col(textCol).cast("binary"), 256)).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Word k-shingles as 64-bit hashes (xxhash64 of each shingle string). */
  def shingleHashes(text: Column, k: Int = 3): Column = {
    val toks = split(text, "\\s+")
    val n = size(toks)
    when(n < k, array(xxhash64(text)))
      .otherwise(transform(sequence(lit(1), n - lit(k - 1)),
        i => xxhash64(concat_ws(" ", slice(toks, i, lit(k))))))
  }

  /** MinHash signature column: permutation i is the keyed hash
    * xxhash64(shingle, i, seed) — overflow-free under ANSI mode and a
    * proper universal family. Expressed with higher-order functions —
    * per-row, no shuffle.
    */
  def minhashSignature(shingles: Column, numHashes: Int = 64, seed: Long = 42L): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingles, h => xxhash64(h, i, lit(seed)))))

  /** LSH banding: explode the signature into (band, bucket) keys. Documents
    * sharing any band bucket are near-dup candidates. `bands` must divide
    * the signature length.
    */
  def lshBands(df: DataFrame, sigCol: String, bands: Int, idCol: String): DataFrame = {
    val rows = size(col(sigCol)) / bands
    df.select(col(idCol),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          xxhash64(b, concat_ws(",", slice(col(sigCol), b * rows + 1, rows))).as("bucket"))))
        .as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))
  }

  /** Candidate near-dup pairs from LSH buckets: self-join on (band, bucket),
    * deduped across bands. The join key cardinality ~ corpus size × bands,
    * so this scales linearly; skewed (hot) buckets are handled by AQE.
    */
  def minhashCandidates(df: DataFrame, textCol: String, idCol: String,
                        k: Int = 3, numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val sigs = df.select(col(idCol), shingleHashes(col(textCol), k).as("sh"))
      .select(col(idCol), minhashSignature(col("sh"), numHashes).as("sig"))
    val bb = lshBands(sigs, "sig", bands, idCol)
    val l = bb.select(col(idCol).as("a"), col("band"), col("bucket"))
    val r = bb.select(col(idCol).as("b"), col("band"), col("bucket"))
    l.join(r, Seq("band", "bucket")).filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** 64-bit SimHash over whitespace tokens: per-token xxhash64, bitwise
    * vote, sign of each bit sum. Near-dups differ in few bits (compare with
    * `bit_count(a ^ b)`).
    */
  def simhash(text: Column): Column = simhashUdf(split(text, "\\s+"))

  private val simhashUdf = udf { (tokens: Seq[String]) =>
    val votes = new Array[Int](64)
    for (t <- tokens) {
      val h = scala.util.hashing.MurmurHash3.stringHash(t).toLong << 32 |
        (scala.util.hashing.MurmurHash3.stringHash(t.reverse).toLong & 0xFFFFFFFFL)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  /** Word n-gram Jaccard similarity between two text columns — used to
    * verify LSH candidates (never applied n×n).
    */
  def ngramJaccard(a: Column, b: Column, n: Int = 2): Column = {
    def grams(c: Column) = {
      val toks = split(c, "\\s+")
      val cnt = size(toks)
      when(cnt < n, array(c))
        .otherwise(array_distinct(transform(sequence(lit(1), cnt - lit(n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n))))))
    }
    val ga = grams(a)
    val gb = grams(b)
    val inter = size(array_intersect(ga, gb)).cast("double")
    inter / (size(ga) + size(gb) - inter).cast("double")
  }
}
