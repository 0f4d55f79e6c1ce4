package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 10k rows of hot key + a tail of cold keys
  private def skewed = (Seq.fill(10000)("hot") ++ (1 to 100).map(i => s"cold$i"))
    .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("key", "v")

  test("saltedCount matches plain groupBy count on skewed keys") {
    val expected = skewed.groupBy("key").count()
      .as[(String, Long)].collect().toMap
    val got = Skew.saltedCount(skewed, "key", salts = 8)
      .as[(String, Long)].collect().toMap
    assert(got == expected)
  }

  test("saltedSum matches plain groupBy sum") {
    val expected = skewed.groupBy("key").agg(sum("v")).as[(String, Long)].collect().toMap
    val got = Skew.saltedSum(skewed, "key", "v", salts = 8).as[(String, Long)].collect().toMap
    assert(got == expected)
  }

  test("saltedJoin matches plain join results") {
    val dim = Seq(("hot", "H"), ("cold1", "C1"), ("cold2", "C2")).toDF("key", "label")
    val expected = skewed.join(dim, "key").groupBy("key", "label").count()
      .as[(String, String, Long)].collect().toSet
    val got = Skew.saltedJoin(skewed, dim, "key", salts = 8).groupBy("key", "label").count()
      .as[(String, String, Long)].collect().toSet
    assert(got == expected)
    // and the salt actually spreads the hot key across shards
    val shards = skewed.withColumn("__salt",
      pmod(xxhash64(col("key"), monotonically_increasing_id()), lit(8L)))
      .filter(col("key") === "hot").select("__salt").distinct().count()
    assert(shards > 4)
  }
}
