package graft

import org.apache.spark.sql.functions._
import graft.operators.Cardinality

class CardinalitySpec extends SparkSpec {
  import spark.implicits._

  test("two appended runs report like one pass; estimates within 5% of exact") {
    val reg = "card_reg_spec"
    graft.sources.Warehouse.dropTableAndLocation(spark, reg)
    Cardinality.createSketchRegistry(spark, reg, buckets = 4)
    // run 1: source A sends urls 0..999, B sends 0..199 (overlapping ids
    // are distinct per group — groups are independent universes)
    val run1 = ((0 until 1000).map(i => ("A", s"u$i")) ++
      (0 until 200).map(i => ("B", s"u$i"))).toDF("src", "url")
    // run 2: A re-sends 500..1499 (500 new), B sends nothing new
    val run2 = ((500 until 1500).map(i => ("A", s"u$i")) ++
      (0 until 200).map(i => ("B", s"u$i"))).toDF("src", "url")
    assert(Cardinality.appendSketches(run1, "src", "url", reg) === 2L)
    assert(Cardinality.appendSketches(run2, "src", "url", reg) === 2L)
    val est = Cardinality.distinctPerGroup(spark, reg)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact: A=1500, B=200
    assert(math.abs(est("A") - 1500L) <= 75, s"A est ${est("A")}")
    assert(math.abs(est("B") - 200L) <= 10, s"B est ${est("B")}")

    // the same data sketched in ONE pass estimates within 2% — HLL
    // union keeps the error bound (registers may differ slightly, so
    // estimates are near- but not bit-equal)
    val onePass = "card_reg_onepass"
    graft.sources.Warehouse.dropTableAndLocation(spark, onePass)
    Cardinality.createSketchRegistry(spark, onePass, buckets = 4)
    Cardinality.appendSketches(run1.unionByName(run2), "src", "url", onePass)
    val est1 = Cardinality.distinctPerGroup(spark, onePass)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est1.foreach { case (g, e) =>
      assert(math.abs(e - est(g)) <= math.max(2, e / 50),
        s"$g: union $e vs one-pass ${est(g)}") }

    // registry growth is sketch-sized: 2 rows per run, not per item
    assert(spark.table(reg).count() === 4L)
  }

  test("sketching is deterministic and null values are uncounted") {
    val reg1 = "card_det_1"; val reg2 = "card_det_2"
    for (r <- Seq(reg1, reg2)) {
      graft.sources.Warehouse.dropTableAndLocation(spark, r)
      Cardinality.createSketchRegistry(spark, r, buckets = 2)
    }
    val data = ((0 until 500).map(i => ("s", Some(s"v${i % 300}"))) :+
      ("s", Option.empty[String])).toDF("src", "url")
    Cardinality.appendSketches(data, "src", "url", reg1)
    Cardinality.appendSketches(data.repartition(7), "src", "url", reg2)
    val e1 = Cardinality.distinctPerGroup(spark, reg1).collect()(0).getLong(1)
    val e2 = Cardinality.distinctPerGroup(spark, reg2).collect()(0).getLong(1)
    assert(e1 === e2) // same inputs → same estimate at any partitioning
    assert(math.abs(e1 - 300L) <= 15, s"est $e1")
  }

  // ---- portable (engine-agnostic) register sketch ----

  test("spark xxhash64(long) matches the from-spec one-block xxh64") {
    // the portable sketch's whole cross-engine story rests on this: the
    // value 11570577783400690398 (signed -6876166290308861218) was
    // derived from the published xxHash64 spec independently of Spark
    // (and triple-checked against OracleHashLib.g_xxh64long in DuckDB)
    val h = Seq(42L).toDF("v").select(xxhash64(col("v"))).collect()(0).getLong(0)
    assert(h === -6876166290308861218L)
    assert(Cardinality.PortableAlphaQ === 771239324L)
  }

  test("portable: exact below the sparse cap, including across runs") {
    val reg = "card_port_exact"
    graft.sources.Warehouse.dropTableAndLocation(spark, reg)
    Cardinality.createPortableRegistry(spark, reg, buckets = 2)
    val run1 = (0 until 400).map(i => ("A", i.toLong)) ++
      (0 until 50).map(i => ("B", i.toLong))
    val run2 = (300 until 600).map(i => ("A", i.toLong)) ++ // 200 new
      (0 until 50).map(i => ("B", i.toLong))                // nothing new
    Cardinality.appendPortableSketches(run1.toDF("src", "id"), "src", "id", reg)
    Cardinality.appendPortableSketches(run2.toDF("src", "id"), "src", "id", reg)
    val est = Cardinality.distinctPerGroupPortable(spark, reg)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // each RUN is sparse (≤640/group) and the union stays sparse for B
    // (50) but crosses nothing for A either (600 ≤ 640): both EXACT
    assert(est === Map("A" -> 600L, "B" -> 50L))
  }

  test("portable: dense estimate within raw-HLL bounds; union == one-pass") {
    val reg = "card_port_dense"; val one = "card_port_one"
    for (r <- Seq(reg, one)) {
      graft.sources.Warehouse.dropTableAndLocation(spark, r)
      Cardinality.createPortableRegistry(spark, r, buckets = 2)
    }
    // A: 5000 distinct split across two overlapping runs (run1 sparse?
    // no — 3000 > 640 → dense; run2 dense too); B stays sparse-exact,
    // pinning the mixed sparse/dense report path
    val run1 = (0 until 3000).map(i => ("A", i.toLong)) ++
      (0 until 30).map(i => ("B", i.toLong))
    val run2 = (2000 until 5000).map(i => ("A", i.toLong))
    Cardinality.appendPortableSketches(run1.toDF("src", "id"), "src", "id", reg)
    Cardinality.appendPortableSketches(run2.toDF("src", "id"), "src", "id", reg)
    val est = Cardinality.distinctPerGroupPortable(spark, reg)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("B") === 30L)
    // m=256 → ~6.5% relative error at 1 sigma; allow 3 sigma
    assert(math.abs(est("A") - 5000L) <= 1000, s"A est ${est("A")}")
    // union of run sketches is BIT-identical to a one-pass sketch (max
    // of registers commutes) — unlike the DataSketches tier, estimates
    // are exactly equal, not merely near
    Cardinality.appendPortableSketches(
      (run1 ++ run2).toDF("src", "id"), "src", "id", one)
    val est1 = Cardinality.distinctPerGroupPortable(spark, one)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est1 === est)
  }

  test("portable: sparse runs promote exactly when the union densifies") {
    val reg = "card_port_promote"; val one = "card_port_promote_one"
    for (r <- Seq(reg, one)) {
      graft.sources.Warehouse.dropTableAndLocation(spark, r)
      Cardinality.createPortableRegistry(spark, r, buckets = 2)
    }
    // three runs of 400 disjoint ids: each run sparse (400 ≤ 640), the
    // union (1200) dense — the report must promote stored hash lists to
    // registers and land on the same estimate as a one-pass dense sketch
    val runs = (0 until 3).map(k =>
      (k * 400 until (k + 1) * 400).map(i => ("A", i.toLong)))
    runs.foreach(r => Cardinality.appendPortableSketches(
      r.toDF("src", "id"), "src", "id", reg))
    Cardinality.appendPortableSketches(
      runs.flatten.toDF("src", "id"), "src", "id", one)
    val a = Cardinality.distinctPerGroupPortable(spark, reg)
      .collect()(0).getLong(1)
    val b = Cardinality.distinctPerGroupPortable(spark, one)
      .collect()(0).getLong(1)
    assert(a === b, s"promoted $a vs one-pass $b")
    assert(math.abs(a - 1200L) <= 250, s"est $a")
  }

  test("portable with-batch probe: estimate equals append-then-report; registry untouched") {
    val reg = "card_probe_reg"; val mirror = "card_probe_mirror"
    for (r <- Seq(reg, mirror)) {
      graft.sources.Warehouse.dropTableAndLocation(spark, r)
      Cardinality.createPortableRegistry(spark, r, buckets = 2)
    }
    val day1 = (0 until 300).map(i => ("A", i.toLong))
    val day2 = (150 until 450).map(i => ("A", i.toLong)) :+ ("B", 1L)
    Cardinality.appendPortableSketches(day1.toDF("src", "id"), "src", "id", reg)
    Cardinality.appendPortableSketches(day1.toDF("src", "id"), "src", "id", mirror)
    val before = spark.table(reg).count()
    val probed = Cardinality.distinctPerGroupPortableWithBatch(
        day2.toDF("src", "id"), "src", "id", reg)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(spark.table(reg).count() === before) // probe never mutates
    // the mirror REALLY appends day 2: the probe must have predicted it
    Cardinality.appendPortableSketches(day2.toDF("src", "id"), "src", "id", mirror)
    val real = Cardinality.distinctPerGroupPortable(spark, mirror)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(probed === real)
    assert(probed("A") === 450L) // still in the exact (sparse) regime
    assert(probed("B") === 1L)   // batch-only group reported
  }

  test("streaming cardinality probe: per-batch novelty vs the registry baseline") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val reg = "card_probe_stream"
    graft.sources.Warehouse.dropTableAndLocation(spark, reg)
    Cardinality.createPortableRegistry(spark, reg, buckets = 2)
    Cardinality.appendPortableSketches(
      (0 until 200).map(i => ("A", i.toLong)).toDF("src", "id"),
      "src", "id", reg)
    val in = MemoryStream[(String, Long)]
    val got = scala.collection.mutable.ArrayBuffer[(String, Long, Long, Long)]()
    val q = graft.streaming.EventStreams.cardinalityProbeStream(
        in.toDF().toDF("src", "id"), "src", "id", reg) { out =>
      got ++= out.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    }
    try {
      in.addData((0 until 200).map(i => ("A", i.toLong)): _*)   // all seen
      q.processAllAvailable()
      in.addData((200 until 300).map(i => ("A", i.toLong)): _*) // all new
      q.processAllAvailable()
    } finally q.stop()
    val byBatch = got.groupBy(_._4)
    assert(byBatch(0L).head === (("A", 200L, 0L, 0L)))   // zero novelty
    assert(byBatch(1L).head === (("A", 300L, 100L, 1L))) // 100 new distincts
    // the probe registered nothing: the registry still reports 200
    assert(Cardinality.distinctPerGroupPortable(spark, reg)
      .collect()(0).getLong(1) === 200L)
  }
}
