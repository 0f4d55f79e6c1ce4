package graft

import org.apache.spark.sql.functions._
import graft.functions.HilbertCurve2

class HilbertSpec extends SparkSpec {
  import spark.implicits._

  test("xy2d is a bijection onto [0, 4^bits) and the curve is CONTINUOUS " +
    "(consecutive positions are Manhattan-distance-1 neighbors)") {
    val bits = 4
    val n = 1 << bits
    val pos = (for (x <- 0 until n; y <- 0 until n)
      yield HilbertCurve2.xy2d(bits, x, y) -> (x.toLong, y.toLong)).toMap
    assert(pos.size === n * n)
    assert(pos.keySet === (0L until (n.toLong * n)).toSet)
    // the property Morton lacks: walk the whole curve, every step is a
    // unit step — this is WHY curve-contiguous row groups cover tighter
    // rectangles at block boundaries
    for (d <- 0L until (n.toLong * n - 1)) {
      val (x0, y0) = pos(d)
      val (x1, y1) = pos(d + 1)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) === 1L, s"jump at d=$d")
    }
    // Morton, on the identical grid, DOES jump (corner-to-corner at
    // power-of-two boundaries) — the comparative claim pinned
    val mortonPos = (for (x <- 0L until n; y <- 0L until n)
      yield graft.operators.ZOrder.zvalueLocal(x, y) -> (x, y)).toMap
    val mortonJumps = (0L until (n.toLong * n - 1)).count { d =>
      val (x0, y0) = mortonPos(d)
      val (x1, y1) = mortonPos(d + 1)
      math.abs(x1 - x0) + math.abs(y1 - y0) > 1
    }
    assert(mortonJumps > 0, "Morton walk should jump where Hilbert does not")
    // d2xy inverts xy2d over the full grid
    for (d <- 0L until (n.toLong * n))
      assert(HilbertCurve2.d2xy(bits, d) === pos(d))
  }

  test("hilbert2 column equals the kernel, incl. domain corners and " +
    "wide-bits values") {
    val bits = 20
    val top = (1L << bits) - 1
    val corners = Seq(0L, 1L, 2L, 3L, 255L, 256L, 65535L, 65536L, top)
    val mixed = (0 until 500).map { i =>
      def h(x: Long) = {
        var z = x + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        (z ^ (z >>> 27)) & top
      }
      (h(i.toLong), h(i + 10000L))
    }
    val pairs = (for (a <- corners; b <- corners) yield (a, b)) ++ mixed
    val df = pairs.toDF("a", "b")
      .withColumn("h", HilbertCurve2(col("a"), col("b"), bits))
    df.collect().foreach { r =>
      assert(r.getLong(2) === HilbertCurve2.xy2d(bits, r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("nulls propagate; out-of-domain raises; bad bits throws") {
    val row = Seq((Option.empty[Long], Option(3L))).toDF("a", "b")
      .select(HilbertCurve2(col("a"), col("b"), 10).as("h")).collect()(0)
    assert(row.isNullAt(0))
    intercept[Exception] {
      Seq((-1L, 3L)).toDF("a", "b")
        .select(HilbertCurve2(col("a"), col("b"), 10)).collect()
    }
    intercept[Exception] {
      Seq((1024L, 3L)).toDF("a", "b")
        .select(HilbertCurve2(col("a"), col("b"), 10)).collect()
    }
    intercept[IllegalArgumentException] {
      Seq((1L, 3L)).toDF("a", "b")
        .select(HilbertCurve2(col("a"), col("b"), 0)).collect()
    }
  }

  test("layout pays off vs lexical AND never jumps worse than Morton: " +
    "a y-band predicate touches a bounded file set") {
    val base = spark.range(200000).select(
      pmod(xxhash64(col("id")), lit(1024L)).as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(1024L)).as("y"))
    val dir = java.nio.file.Files.createTempDirectory("hilbertspec").toString
    base.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$dir/lex")
    base.withColumn("h", HilbertCurve2(col("x"), col("y"), 10))
      .repartitionByRange(16, col("h")).sortWithinPartitions("h")
      .drop("h").write.parquet(s"$dir/hil")
    def filesTouched(p: String): Long =
      spark.read.parquet(p).select(input_file_name().as("f"), col("y"))
        .filter(col("y").between(100, 131)).select("f").distinct().count()
    val lexTouched = filesTouched(s"$dir/lex")
    val hilTouched = filesTouched(s"$dir/hil")
    assert(lexTouched === 16L, s"lexical layout spreads y everywhere: $lexTouched")
    assert(hilTouched < 16L, s"hilbert should confine the band: $hilTouched files")
  }
}
