package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue2 column equals the bit-by-bit reference, incl. domain corners") {
    val corners = Seq(0L, 1L, 2L, 3L, 255L, 256L, 65535L, 65536L,
      (1L << 31) - 1)
    val pairs = for (a <- corners; b <- corners) yield (a, b)
    val mixed = (0 until 500).map { i =>
      // deterministic pseudo-random 31-bit values
      def h(x: Long) = {
        var z = x + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        (z ^ (z >>> 27)) & 0x7FFFFFFFL
      }
      (h(i.toLong), h(i + 10000L))
    }
    val df = (pairs ++ mixed).toDF("a", "b")
      .withColumn("z", ZOrder.zvalue2(col("a"), col("b")))
    df.collect().foreach { r =>
      assert(r.getLong(2) === ZOrder.zvalueLocal(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("the generated oracle SQL computes the identical interleave") {
    // the DuckDB-side expression is ANSI bit arithmetic Spark can also
    // evaluate — drift between the two generators would fail here before
    // ever reaching the cross-engine gate
    val df = Seq((5L, 9L), (1023L, 0L), (0L, 1023L), (123456L, 654321L))
      .toDF("a", "b")
      .withColumn("z", ZOrder.zvalue2(col("a"), col("b")))
      .withColumn("zsql", expr(ZOrder.duckZvalue2("a", "b")))
    assert(df.filter(col("z") =!= col("zsql")).count() === 0)
  }

  test("zvalue3 column equals the bit-by-bit reference; generated SQL agrees") {
    val corners = Seq(0L, 1L, 7L, 255L, 65535L, (1L << 21) - 1)
    val triples = for (a <- corners; b <- corners; c <- corners)
      yield (a, b, c)
    val df = triples.toDF("a", "b", "c")
      .withColumn("z", ZOrder.zvalue3(col("a"), col("b"), col("c")))
      .withColumn("zsql", expr(ZOrder.duckZvalue3("a", "b", "c")))
    df.collect().foreach { r =>
      val want = ZOrder.zvalue3Local(r.getLong(0), r.getLong(1), r.getLong(2))
      assert(r.getLong(3) === want, s"(${r.getLong(0)},${r.getLong(1)},${r.getLong(2)})")
      assert(r.getLong(4) === want)
    }
    intercept[Exception] {
      Seq((1L << 21, 0L, 0L)).toDF("a", "b", "c")
        .select(ZOrder.zvalue3(col("a"), col("b"), col("c"))).collect()
    }
  }

  test("nulls propagate; out-of-domain raises") {
    val row = Seq((Option.empty[Long], Option(3L))).toDF("a", "b")
      .select(ZOrder.zvalue2(col("a"), col("b")).as("z")).collect()(0)
    assert(row.isNullAt(0))
    intercept[Exception] {
      Seq((-1L, 3L)).toDF("a", "b")
        .select(ZOrder.zvalue2(col("a"), col("b"))).collect()
    }
    intercept[Exception] {
      Seq((1L << 31, 3L)).toDF("a", "b")
        .select(ZOrder.zvalue2(col("a"), col("b"))).collect()
    }
  }

  test("quadrant order: the curve visits quadrants in z order") {
    // top bits dominate: any point in quadrant (hi-bit a=0, b=0) sorts
    // before any in (1,0)-quadrant of b's hi bit, etc.
    val q00 = ZOrder.zvalueLocal(100, 200)
    val q10 = ZOrder.zvalueLocal((1L << 30) + 100, 200)
    val q01 = ZOrder.zvalueLocal(100, (1L << 30) + 200)
    val q11 = ZOrder.zvalueLocal((1L << 30) + 100, (1L << 30) + 200)
    assert(q00 < q10 && q10 < q01 && q01 < q11)
  }

  test("cluster preserves the row multiset and sorts within partitions") {
    val base = spark.range(5000).select(
      pmod(xxhash64(col("id")), lit(256L)).as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(256L)).as("y"))
    val clustered = ZOrder.cluster(base, "x", "y", partitions = 8)
    // multiset equality via per-key counts
    val a = base.groupBy("x", "y").count().orderBy("x", "y").collect().toSeq
    val b = clustered.groupBy("x", "y").count().orderBy("x", "y").collect().toSeq
    assert(a === b)
    // within every output partition the z-values are nondecreasing
    val bad = clustered
      .withColumn("z", ZOrder.zvalue2(col("x"), col("y")))
      .withColumn("p", spark_partition_id())
      .withColumn("prev", lag("z", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("p")
          .orderBy(monotonically_increasing_id())))
      .filter(col("prev") > col("z"))
    assert(bad.count() === 0)
  }

  test("layout pays off: a y-only predicate touches fewer z-order files than lexical") {
    val base = spark.range(200000).select(
      pmod(xxhash64(col("id")), lit(1024L)).as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(1024L)).as("y"))
    val dir = java.nio.file.Files.createTempDirectory("zorderspec").toString
    base.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$dir/lex")
    ZOrder.cluster(base, "x", "y", 16).write.parquet(s"$dir/z")
    // count files whose rows intersect the band — a proxy for min/max
    // file pruning that is deterministic (no reader internals)
    def filesTouched(p: String): Long =
      spark.read.parquet(p).select(input_file_name().as("f"), col("y"))
        .filter(col("y").between(100, 131)).select("f").distinct().count()
    val lexTouched = filesTouched(s"$dir/lex")
    val zTouched = filesTouched(s"$dir/z")
    assert(lexTouched === 16L, s"lexical layout spreads y everywhere: $lexTouched")
    assert(zTouched < 16L, s"z-order should confine the band: $zTouched files")
  }
}
