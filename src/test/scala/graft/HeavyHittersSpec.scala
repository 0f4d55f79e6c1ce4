package graft

import org.apache.spark.sql.functions._
import graft.operators.HeavyHitters

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // skewed corpus: key "k<i>" appears i*i times (deterministic), plus a
  // long tail of unique noise keys
  private def corpus(noise: Int) = {
    val heavy = (1 to 20).flatMap(i => Seq.fill(i * i)(s"k$i"))
    val tail = (0 until noise).map(i => s"noise$i")
    (heavy ++ tail).toDF("key")
  }

  private def naive(df: org.apache.spark.sql.DataFrame, fracPpm: Long) = {
    val n = df.filter(col("key").isNotNull).count()
    df.filter(col("key").isNotNull)
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 1000000L > lit(fracPpm) * lit(n))
      .orderBy("key")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  test("misraGries: never misses a key above n/(k+1), counts are lower bounds") {
    val items = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++
      (0 until 35).map(i => s"u$i") // n=100
    val mg = HeavyHitters.misraGries(items.iterator, 4).toMap
    // a (40 > 100/5) and b (25 > 100/5) must survive with positive counts
    assert(mg.contains("a") && mg.contains("b"))
    assert(mg("a") <= 40 && mg("a") >= 40 - 100 / 5)
    assert(mg("b") <= 25 && mg("b") >= 25 - 100 / 5)
    assert(mg.size <= 4)
  }

  test("equals the exact full group-by at several partitionings") {
    val fracPpm = 20000L // 2% of ~5900 rows -> keys with cnt > ~118
    for (parts <- Seq(1, 7, 32)) {
      val df = corpus(3000).repartition(parts)
      val got = HeavyHitters.heavyHitters(df, "key", fracPpm)
        .orderBy("key").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got === naive(df, fracPpm), s"parts=$parts")
      assert(got.nonEmpty)
    }
  }

  test("adversarial spread: a heavy key diluted evenly across partitions is still found") {
    // one heavy key at just over the threshold, spread so every partition
    // sees only a few occurrences among local noise
    val heavy = Seq.fill(300)("hot")
    val noise = (0 until 9000).map(i => s"u$i")
    // interleave so no partition is hot-dominated
    val df = (heavy ++ noise).zipWithIndex
      .sortBy(_._2 % 31) // deterministic shuffle-ish interleave
      .map(_._1).toDF("key").repartition(32)
    val fracPpm = 30000L // 3% of 9300 = 279 < 300
    val got = HeavyHitters.heavyHitters(df, "key", fracPpm)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("hot", 300L)))
  }

  test("strict threshold: a key at exactly frac*n is excluded") {
    // n = 1000, frac = 10% -> cut at cnt > 100; "edge" has exactly 100
    val df = (Seq.fill(100)("edge") ++ Seq.fill(150)("over") ++
      (0 until 750).map(i => s"u$i")).toDF("key")
    val got = HeavyHitters.heavyHitters(df, "key", 100000L)
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("over"))
  }

  test("null keys are not counted and never returned") {
    val df = (Seq.fill(50)(Some("a")) ++ Seq.fill(50)(Option.empty[String]))
      .toDF("key")
    // n counts only the 50 non-null rows: a is 100% of them
    val got = HeavyHitters.heavyHitters(df, "key", 500000L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("a", 50L)))
  }

  test("grouped: equals the per-group exact plan; small-group hitters found") {
    // "hot" dominates tiny group B (30 of 50) but is invisible globally
    // (30 of ~6000); group A has its own k1..k20 skew; a null group rides
    val a = (1 to 20).flatMap(i => Seq.fill(i * i)(("A", s"k$i")))
    val b = Seq.fill(30)(("B", "hot")) ++ (0 until 20).map(i => ("B", s"u$i"))
    val ng = Seq.fill(10)((null.asInstanceOf[String], "nullgrouphot")) ++
      Seq((null.asInstanceOf[String], "one"))
    val df = (a ++ b ++ ng).toDF("g", "key")
    val naive = df.filter(col("key").isNotNull)
      .groupBy("g", "key").agg(count(lit(1)).as("cnt"))
      .withColumn("n", sum("cnt").over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")))
      .filter(col("cnt") * 1000000L > lit(100000L) * col("n"))
      .select("g", "key", "cnt")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    for (parts <- Seq(1, 7)) {
      val got = HeavyHitters.heavyHittersByGroup(
          df.repartition(parts), "g", "key", fracPpm = 100000L)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(got === naive, s"parts=$parts")
    }
    // the small-group hitter and the null-group hitter are both present
    assert(naive.exists(r => r._1 == "B" && r._2 == "hot" && r._3 == 30L))
    assert(naive.exists(r => r._1 == null && r._2 == "nullgrouphot"))
  }

  test("grouped: a corpus-shaped group column fails loudly") {
    val df = (0 until 5000).map(i => (s"g$i", "k")).toDF("g", "key")
      .repartition(1)
    val e = intercept[org.apache.spark.SparkException] {
      HeavyHitters.heavyHittersByGroup(df, "g", "key", fracPpm = 500000L,
        maxGroups = 1000).count()
    }
    val msg = e.getMessage +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("maxGroups"), s"unexpected: $msg")
  }

  test("streaming per-batch heavy hitters equal the batch operator per batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq.fill(60)("hot1") ++ (0 until 40).map(i => s"u$i")
    val b2 = Seq.fill(80)("hot2") ++ (0 until 60).map(i => s"v$i")
    val in = MemoryStream[String]
    val got = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
    val q = graft.streaming.EventStreams.heavyHittersStream(
        in.toDF().toDF("key"), "key", fracPpm = 300000L) { out =>
      got ++= out.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2)))
    }
    try {
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
      // each batch reports its own hitters: 60/100 and 80/140, both > 30%
      assert(got.toSet === Set(("hot1", 60L, 0L), ("hot2", 80L, 1L)),
        got.toString)
    } finally q.stop()
  }

  test("grouped streaming per-batch heavy hitters equal the grouped batch operator") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq.fill(30)(("en", "hot")) ++ (0 until 20).map(i => ("en", s"u$i")) ++
      Seq.fill(8)(("fr", "chaud")) ++ (0 until 2).map(i => ("fr", s"v$i"))
    val in = MemoryStream[(String, String)]
    val got = scala.collection.mutable.ArrayBuffer[(String, String, Long, Long)]()
    val q = graft.streaming.EventStreams.heavyHittersByGroupStream(
        in.toDF().toDF("g", "key"), "g", "key", fracPpm = 400000L) { out =>
      got ++= out.collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    }
    try {
      in.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()
    // en: hot 30/50 = 60% > 40%; fr: chaud 8/10 = 80% > 40%
    assert(got.toSet === Set(("en", "hot", 30L, 0L), ("fr", "chaud", 8L, 0L)),
      got.toString)
  }

  test("empty input yields an empty frame; counters below the bound throw") {
    assert(HeavyHitters.heavyHitters(
      Seq.empty[String].toDF("key"), "key", 1000L).count() === 0)
    intercept[IllegalArgumentException] {
      HeavyHitters.heavyHitters(corpus(10), "key", 1000L, counters = 5)
    }
  }

  // ---- cross-run frequency registry -------------------------------------

  private def reportMap(table: String, fracPpm: Long) =
    HeavyHitters.heavyHittersOverRuns(spark, table, fracPpm)
      .collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap

  test("registry: complete (no true hitter missing) and sound (guaranteed rows are true hitters)") {
    val reg = "freq_reg_spec"
    graft.sources.Warehouse.dropTableAndLocation(spark, reg)
    HeavyHitters.createFreqRegistry(spark, reg, buckets = 4)
    // run 1: "hot" 400/4000; run 2: "hot" 100/4000 and "warm" 350/4000 —
    // "hot" is heavy overall (500/8000 = 6.25%), "warm" is 4.4%
    val run1 = (Seq.fill(400)("hot") ++ (0 until 3600).map(i => s"a$i")).toDF("key")
    val run2 = (Seq.fill(100)("hot") ++ Seq.fill(350)("warm") ++
      (0 until 3550).map(i => s"b$i")).toDF("key")
    HeavyHitters.appendRunCounts(run1, "key", reg, k = 99)
    HeavyHitters.appendRunCounts(run2.repartition(13), "key", reg, k = 99)

    val all = run1.unionByName(run2)
    for (fracPpm <- Seq(50000L, 40000L, 20000L)) {
      val exact = naive(all, fracPpm).toMap
      val got = reportMap(reg, fracPpm)
      // completeness: every exact hitter is reported
      exact.keys.foreach(k => assert(got.contains(k), s"missing $k @ $fracPpm"))
      // soundness of the flag + lower bound never exceeds the true count
      got.foreach { case (k, (cntMin, guar)) =>
        if (guar) assert(exact.contains(k), s"false guarantee $k @ $fracPpm")
        assert(cntMin <= all.filter(col("key") === k).count())
      }
    }
    // "hot"'s run counts both cleared the per-run cutoff → stored sum exact
    assert(reportMap(reg, 50000L)("hot") === ((500L, true)))
  }

  test("registry: appended rows are partitioning-independent and <= k+1 per run") {
    val regA = "freq_det_a"; val regB = "freq_det_b"
    for (r <- Seq(regA, regB)) {
      graft.sources.Warehouse.dropTableAndLocation(spark, r)
      HeavyHitters.createFreqRegistry(spark, r, buckets = 2)
    }
    val run = (Seq.fill(120)("x") ++ Seq.fill(45)("y") ++
      (0 until 800).map(i => s"n$i") :+ null).toDF("key")
    val n1 = HeavyHitters.appendRunCounts(run, "key", regA, k = 19)
    val n2 = HeavyHitters.appendRunCounts(run.repartition(17), "key", regB, k = 19)
    assert(n1 === n2)
    assert(n1 <= 19L)
    val rows = (t: String) => spark.table(t)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows(regA) === rows(regB)) // exact counts, not MG residues
    // the null key was not counted: total row carries 965, not 966
    assert(spark.table(regA).filter(col("kb").isNotNull)
      .select("cnt").collect()(0).getLong(0) === 965L)
  }

  test("registry: report merges runs with DIFFERENT k via each run's own forfeit bound") {
    val reg = "freq_mixed_k"
    graft.sources.Warehouse.dropTableAndLocation(spark, reg)
    HeavyHitters.createFreqRegistry(spark, reg, buckets = 2)
    // run 1 at k=9 (coarse: forfeit floor(1000/10)=100), run 2 at k=99
    val run1 = (Seq.fill(150)("h") ++ (0 until 850).map(i => s"a$i")).toDF("key")
    val run2 = (Seq.fill(90)("h") ++ (0 until 910).map(i => s"b$i")).toDF("key")
    HeavyHitters.appendRunCounts(run1, "key", reg, k = 9)
    HeavyHitters.appendRunCounts(run2, "key", reg, k = 99)
    // run 2's 90 < 1000/100? no: cutoff is cnt*100 > 1000 → 90 stored too.
    // total B = 1000/10 + 1000/100 = 110; h stored sum = 240 (exact)
    val got = reportMap(reg, 100000L) // 10% of 2000 = 200 < 240
    assert(got("h") === ((240L, true)))
    // a key needing the bound: threshold 17.5% (350) — 240+110 = 350 NOT >
    // 350, so h is admitted just below that cut (unguaranteed) and dropped
    // at it; admission strictness pinned both ways
    assert(reportMap(reg, 174999L)("h") === ((240L, false)))
    assert(!reportMap(reg, 175000L).contains("h"))
  }

  test("grouped registry: a small-group hitter invisible globally is found per group") {
    val reg = "freq_grp_reg"
    graft.sources.Warehouse.dropTableAndLocation(spark, reg)
    HeavyHitters.createFreqRegistryByGroup(spark, reg, buckets = 4)
    // "rare" dominates the tiny group (60% of it) but is 0.6% of the corpus
    val run1 = ((0 until 3000).map(i => ("big", s"a$i")) ++
      Seq.fill(12)(("tiny", "rare")) ++ (0 until 8).map(i => ("tiny", s"t$i")))
      .toDF("g", "key")
    val run2 = ((0 until 3000).map(i => ("big", s"b$i")) ++
      Seq.fill(18)(("tiny", "rare")) ++ (0 until 2).map(i => ("tiny", s"u$i")))
      .toDF("g", "key")
    HeavyHitters.appendRunCountsByGroup(run1, "g", "key", reg, k = 9)
    HeavyHitters.appendRunCountsByGroup(run2.repartition(7), "g", "key", reg,
      k = 9)
    val got = HeavyHitters.heavyHittersOverRunsByGroup(spark, reg, 300000L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    // 30/40 of tiny = 75% > 30%; stored counts exact (12 > 20/10, 18 > 20/10)
    assert(got(("tiny", "rare")) === ((30L, true)))
    // nothing in big clears 30% of its group
    assert(got.keys.forall(_._1 == "tiny"), got.toString)
    // and the GLOBAL registry at the same k cannot see it: 30/6040 ≈ 0.5%
    val greg = "freq_grp_global"
    graft.sources.Warehouse.dropTableAndLocation(spark, greg)
    HeavyHitters.createFreqRegistry(spark, greg, buckets = 4)
    HeavyHitters.appendRunCounts(run1.select("key"), "key", greg, k = 9)
    HeavyHitters.appendRunCounts(run2.select("key"), "key", greg, k = 9)
    assert(!reportMap(greg, 300000L).contains("rare"))
  }

  test("grouped registry: complete and sound vs the per-group exact plan; appends partitioning-independent") {
    val reg = "freq_grp_cs"
    graft.sources.Warehouse.dropTableAndLocation(spark, reg)
    HeavyHitters.createFreqRegistryByGroup(spark, reg, buckets = 2)
    def mk(seed: Int) = (0 until 2000).map { i =>
      val g = "g" + (i % 3)
      val key = if (i % 5 == 0) s"hot$g" else s"k$seed-$i"
      (g, key)
    }.toDF("g", "key")
    HeavyHitters.appendRunCountsByGroup(mk(1), "g", "key", reg, k = 49)
    HeavyHitters.appendRunCountsByGroup(mk(2).repartition(11), "g", "key",
      reg, k = 49)
    val all = mk(1).unionByName(mk(2))
    val fracPpm = 100000L
    val exact = all.groupBy("g", "key").agg(count(lit(1)).as("cnt"))
      .withColumn("__n", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")))
      .filter(col("cnt") * 1000000L > lit(fracPpm) * col("__n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = HeavyHitters.heavyHittersOverRunsByGroup(spark, reg, fracPpm)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    exact.keys.foreach(kk => assert(got.contains(kk), s"missing $kk"))
    got.foreach { case (kk, (cntMin, guar)) =>
      if (guar) assert(exact.contains(kk), s"false guarantee $kk")
      assert(cntMin <= exact.getOrElse(kk, Long.MaxValue))
    }
    // partitioning independence of the stored rows
    val regB = "freq_grp_cs_b"
    graft.sources.Warehouse.dropTableAndLocation(spark, regB)
    HeavyHitters.createFreqRegistryByGroup(spark, regB, buckets = 2)
    HeavyHitters.appendRunCountsByGroup(mk(1).repartition(17), "g", "key",
      regB, k = 49)
    val rowsOf = (t: String) => spark.table(t)
      .filter(col("key").isNotNull)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    HeavyHitters.appendRunCountsByGroup(mk(2), "g", "key", regB, k = 49)
    assert(rowsOf(reg) === rowsOf(regB))
  }
}
