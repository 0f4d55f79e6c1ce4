package graft

import org.apache.spark.sql.functions._
import graft.operators.Histograms

class HistogramsSpec extends SparkSpec {
  import spark.implicits._

  test("dyadic bin edges: 0, powers of two, Long.MaxValue, negatives") {
    val vals = Seq(0L, 1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L,
      Long.MaxValue, -1L, -500L)
    val got = vals.toDF("v").select(col("v"),
        Histograms.binOf(col("v")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(0L) === 0); assert(got(1L) === 1)
    assert(got(2L) === 2); assert(got(3L) === 2)
    assert(got(4L) === 3); assert(got(7L) === 3); assert(got(8L) === 4)
    assert(got(1023L) === 10); assert(got(1024L) === 11)
    assert(got(Long.MaxValue) === 63)
    assert(got(-1L) === -1); assert(got(-500L) === -1)
  }

  test("two appended runs merge to exactly the one-pass histogram; nulls uncounted") {
    val two = "hist_two_runs"; val one = "hist_one_pass"
    for (t <- Seq(two, one)) {
      graft.sources.Warehouse.dropTableAndLocation(spark, t)
      Histograms.createHistRegistry(spark, t, buckets = 2)
    }
    val run1 = ((0 until 600).map(i => ("A", Some(i.toLong))) ++
      (0 until 100).map(i => ("B", Some(i * 1000L))) :+
      ("A", Option.empty[Long])).toDF("g", "v")
    val run2 = ((300 until 900).map(i => ("A", Some(i.toLong))) ++
      (0 until 50).map(i => ("B", Some(i * 37L)))).toDF("g", "v")
    Histograms.appendHistogram(run1, "g", "v", two)
    Histograms.appendHistogram(run2.repartition(7), "g", "v", two)
    Histograms.appendHistogram(run1.unionByName(run2), "g", "v", one)
    val h = (t: String) => Histograms.histogramOverRuns(spark, t)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(4)).toMap
    assert(h(two) === h(one)) // merge is exact addition
    // total counted values: 600 + 100 + 600 + 50 (null skipped)
    assert(h(two).values.sum === 1350L)
  }

  test("histogram rows carry correct dyadic bounds and bound every member") {
    val reg = "hist_bounds"
    graft.sources.Warehouse.dropTableAndLocation(spark, reg)
    Histograms.createHistRegistry(spark, reg, buckets = 2)
    val vals = Seq(0L, 1L, 5L, 100L, 4096L, Long.MaxValue)
    Histograms.appendHistogram(vals.toDF("v").withColumn("g", lit("s")),
      "g", "v", reg)
    val rows = Histograms.histogramOverRuns(spark, reg).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toList
    rows.foreach { case (b, lo, hi) =>
      assert(lo <= hi)
      if (b >= 1) assert(lo === (1L << (b - 1)))
      if (b >= 1 && b < 63) assert(hi === (1L << b) - 1)
      if (b == 63) assert(hi === Long.MaxValue)
      // every input value in this bin really lies in [lo, hi]
      vals.filter(v => (if (v == 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(v)) == b)
        .foreach(v => assert(v >= lo && v <= hi))
    }
    assert(rows.map(_._1).contains(63)) // Long.MaxValue landed in bin 63
  }

  test("quantile rows bracket the true order statistic and pick the smallest qualifying bin") {
    val reg = "hist_quant"
    graft.sources.Warehouse.dropTableAndLocation(spark, reg)
    Histograms.createHistRegistry(spark, reg, buckets = 2)
    // heavy-tailed: many small values, a few huge — two runs
    val small = (1 to 900).map(_.toLong)
    val big = (1 to 100).map(i => 1000000L + i)
    Histograms.appendHistogram(small.toDF("v").withColumn("g", lit("s")),
      "g", "v", reg)
    Histograms.appendHistogram(big.toDF("v").withColumn("g", lit("s")),
      "g", "v", reg)
    val all = (small ++ big).sorted
    val qs = Seq(250000L, 500000L, 900000L, 990000L)
    val got = Histograms.quantilesOverRuns(spark, reg, qs)
      .collect().map(r => r.getLong(1) -> ((r.getInt(2), r.getLong(3),
        r.getLong(4)))).toMap
    qs.foreach { q =>
      val (bin, lo, hi) = got(q)
      // true order statistic at ceil(q*N/1e6)
      val rank = ((q * all.size + 999999) / 1000000L).toInt
      val stat = all(rank - 1)
      assert(stat >= lo && stat <= hi, s"q=$q stat=$stat not in [$lo,$hi]")
      // smallest-bin property: the bin below holds strictly fewer than rank
      val below = all.count(v => v < lo)
      assert(below < rank, s"q=$q a smaller bin already reached the rank")
      assert(bin >= 0)
    }
    // p99 must have escaped the small-value mass into the big tail
    assert(got(990000L)._2 >= 524288L)
  }

  test("quantiles are partitioning-independent and reject bad ppm") {
    val regA = "hist_det_a"; val regB = "hist_det_b"
    for (t <- Seq(regA, regB)) {
      graft.sources.Warehouse.dropTableAndLocation(spark, t)
      Histograms.createHistRegistry(spark, t, buckets = 2)
    }
    val data = (0 until 5000).map(i => ("g" + (i % 3), (i * 7919L) % 100000))
      .toDF("g", "v")
    Histograms.appendHistogram(data, "g", "v", regA)
    Histograms.appendHistogram(data.repartition(23), "g", "v", regB)
    val rows = (t: String) => Histograms.quantilesOverRuns(spark, t,
        Seq(500000L)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(rows(regA) === rows(regB))
    assert(rows(regA).size === 3)
    intercept[IllegalArgumentException] {
      Histograms.quantilesOverRuns(spark, regA, Seq(0L))
    }
    intercept[IllegalArgumentException] {
      Histograms.quantilesOverRuns(spark, regA, Seq.empty)
    }
  }

  // ---- drift report ------------------------------------------------------

  private def mkReg(name: String, rows: Seq[(String, Long)]): String = {
    graft.sources.Warehouse.dropTableAndLocation(spark, name)
    Histograms.createHistRegistry(spark, name, buckets = 2)
    if (rows.nonEmpty)
      Histograms.appendHistogram(rows.toDF("g", "v"), "g", "v", name)
    name
  }

  test("drift: identical registries score 0; shifted scores high; symmetric") {
    val base = (0 until 1000).map(i => ("s", (i % 500 + 1).toLong))
    val a = mkReg("drift_a", base)
    val b = mkReg("drift_b", base)
    // shifted: the same mass two dyadic decades up
    val c = mkReg("drift_c", base.map { case (g, v) => (g, v * 1024) })
    val report = (x: String, y: String) =>
      Histograms.driftReport(spark, x, y).collect()
        .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val same = report(a, b)("s")
    assert(same._1 === 0.0 && same._2 === 0.0)
    val far = report(a, c)("s")
    assert(far._1 > 0.25, s"psi ${far._1}") // the standard 'shifted' band
    assert(far._2 > 0.5)
    // PSI and L1 are symmetric by construction
    assert(report(c, a)("s") === far)
  }

  test("drift: small perturbation stays in the stable band; one-sided group reported") {
    val base = (0 until 2000).map(i => ("s", (i % 800 + 1).toLong))
    val near = base.map { case (g, v) => (g, math.min(v + 3, 800L)) } ++
      Seq(("only_b", 42L))
    val a = mkReg("drift_sa", base)
    val b = mkReg("drift_sb", near)
    val got = Histograms.driftReport(spark, a, b).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("s") < 0.1, s"psi ${got("s")}") // stable band
    assert(got.contains("only_b")) // group absent from A still reported
  }

  test("streaming drift probe: per-batch reports equal the batch core vs the baseline") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val baseline = mkReg("drift_base_stream",
      (0 until 500).map(i => ("s", (i % 100 + 1).toLong)))
    val b1 = (0 until 200).map(i => ("s", (i % 100 + 1).toLong))     // stable
    val b2 = (0 until 200).map(i => ("s", (i % 100 + 1) * 4096L))    // shifted
    val in = MemoryStream[(String, Long)]
    val got = scala.collection.mutable.ArrayBuffer[(String, Double, Long)]()
    val q = graft.streaming.EventStreams.distributionDriftStream(
        in.toDF().toDF("g", "v"), "g", "v", baseline) { out =>
      got ++= out.collect().map(r =>
        (r.getString(0), r.getDouble(1), r.getLong(3)))
    }
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val byBatch = got.groupBy(_._3)
    // batch 0 is the baseline's own shape; batch 1 is two decades away
    assert(byBatch(0L).head._2 < 0.1, byBatch(0L).toString)
    assert(byBatch(1L).head._2 > 0.25, byBatch(1L).toString)
    // parity with the batch core on the same frames
    val expect0 = Histograms.driftBetween(
      Histograms.histogramOf(b1.toDF("g", "v"), "g", "v"),
      spark.table(baseline)).collect().head.getDouble(1)
    assert(byBatch(0L).head._2 === expect0)
  }
}
