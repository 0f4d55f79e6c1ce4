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

  test("adaptiveSaltedJoin matches plain join; only hot keys replicate the dim side") {
    val dim = (Seq("hot") ++ (1 to 100).map(i => s"cold$i"))
      .map(k => (k, s"label_$k")).toDF("key", "label")
    val expected = skewed.join(dim, "key").groupBy("key", "label").count()
      .as[(String, String, Long)].collect().toSet
    for (parts <- Seq(3, 16)) {
      val got = Skew.adaptiveSaltedJoin(
          skewed.repartition(parts), dim, "key", fracPpm = 10000L, salts = 8)
        .groupBy("key", "label").count()
        .as[(String, String, Long)].collect().toSet
      assert(got == expected, s"parts=$parts")
    }
    // replication is targeted: the hot key is the only one above 1% of
    // 10100 rows, so the replicated dim side is 100 cold + 8 hot rows,
    // not 101 * 8
    val hot = HeavyHitters.heavyHitters(skewed, "key", 10000L)
      .collect().map(_.getString(0)).toSeq
    assert(hot === Seq("hot"))
  }

  test("adaptiveSaltedJoin with no hot keys degrades to the plain join") {
    val uniform = (1 to 2000).map(i => (s"k${i % 500}", i.toLong)).toDF("key", "v")
    val dim = (0 until 500).map(i => (s"k$i", i)).toDF("key", "d")
    // threshold 5%: every key sits at 0.2% — no salting should occur
    val got = Skew.adaptiveSaltedJoin(uniform, dim, "key", fracPpm = 50000L)
      .count()
    assert(got === uniform.join(dim, "key").count())
  }
}
