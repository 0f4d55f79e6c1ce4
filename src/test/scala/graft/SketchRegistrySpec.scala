package graft

import org.apache.spark.sql.functions._
import graft.operators.{BloomReg, CountMin}

class SketchRegistrySpec extends SparkSpec {
  import spark.implicits._

  private def freshCms(name: String): Unit = {
    graft.sources.Warehouse.dropTableAndLocation(spark, name)
    CountMin.createCmsRegistry(spark, name, buckets = 2)
  }
  private def freshBloom(name: String): Unit = {
    graft.sources.Warehouse.dropTableAndLocation(spark, name)
    BloomReg.createBloomRegistry(spark, name, buckets = 2)
  }

  // a small two-group key stream with known exact counts
  private def run1 = (Seq.fill(30)(("en", "the")) ++ Seq.fill(5)(("en", "cat")) ++
    Seq.fill(9)(("de", "der")) ++ (0 until 40).map(i => ("en", s"u$i")))
    .toDF("g", "k")
  private def run2 = (Seq.fill(12)(("en", "the")) ++ Seq.fill(7)(("de", "der")) ++
    (0 until 25).map(i => ("de", s"v$i"))).toDF("g", "k")

  test("CMS estimate >= exact always; exact at wide width; absent keys 0") {
    val reg = "cms_exactish"
    freshCms(reg)
    // width 4096 >> vocab (~77 distinct): collisions vanishingly unlikely
    CountMin.appendCms(run1, "g", "k", reg, depth = 4, width = 4096)
    CountMin.appendCms(run2, "g", "k", reg, depth = 4, width = 4096)
    val exact = run1.unionByName(run2).groupBy("g", "k").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val probes = exact.keys.toSeq.toDF("g", "k")
      .unionByName(Seq(("en", "absent1"), ("de", "absent2")).toDF("g", "k"))
    val est = CountMin.cmsEstimates(probes, "g", "k", reg,
        depth = 4, width = 4096)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    for ((gk, c) <- exact) {
      assert(est(gk) >= c, s"CMS undercounted $gk")
      assert(est(gk) === c, s"CMS inexact at collision-free width for $gk")
    }
    assert(est(("en", "absent1")) === 0L)
    assert(est(("de", "absent2")) === 0L)
  }

  test("CMS narrow width still never undercounts") {
    val reg = "cms_narrow"
    freshCms(reg)
    CountMin.appendCms(run1, "g", "k", reg, depth = 2, width = 8)
    CountMin.appendCms(run2, "g", "k", reg, depth = 2, width = 8)
    val exact = run1.unionByName(run2).groupBy("g", "k").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val est = CountMin.cmsEstimates(exact.keys.toSeq.toDF("g", "k"), "g", "k",
        reg, depth = 2, width = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    for ((gk, c) <- exact) assert(est(gk) >= c, s"CMS undercounted $gk")
  }

  test("CMS merge of two appends is bit-equal to a one-pass sketch; " +
    "partitioning-independent; nulls uncounted") {
    val two = "cms_two"; val one = "cms_one"
    freshCms(two); freshCms(one)
    CountMin.appendCms(run1, "g", "k", two)
    CountMin.appendCms(run2.repartition(7), "g", "k", two)
    CountMin.appendCms(
      run1.unionByName(run2)
        .unionByName(Seq(("en", null: String)).toDF("g", "k")),
      "g", "k", one)
    def cells(t: String) = spark.table(t).filter(col("row") >= 0)
      .groupBy("group", "row", "slot").agg(sum("cnt").as("cnt"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)) -> r.getLong(3))
      .toMap
    assert(cells(two) === cells(one))
    // registry is skeleton-sized: cells bounded by depth*width + meta
    val rows = spark.table(two).count()
    assert(rows <= 2 * (2 * 4 * 1024 + 2))
  }

  test("CMS geometry mismatch fails fast on append-merge and on report") {
    val reg = "cms_geom"
    freshCms(reg)
    CountMin.appendCms(run1, "g", "k", reg, depth = 4, width = 1024)
    val e = intercept[IllegalArgumentException] {
      CountMin.cmsEstimates(Seq(("en", "the")).toDF("g", "k"), "g", "k", reg,
        depth = 4, width = 512)
    }
    assert(e.getMessage.contains("geometry"))
    intercept[IllegalArgumentException] {
      CountMin.appendCms(run1, "g", "k", reg, depth = 4, width = 1000)
    }
  }

  test("Bloom: no false negatives ever; disjoint keys at ample bits probe 0") {
    val reg = "bloom_basic"
    freshBloom(reg)
    BloomReg.appendBloom(run1, "g", "k", reg)
    BloomReg.appendBloom(run2, "g", "k", reg)
    val present = run1.unionByName(run2).distinct()
    val absent = (0 until 50).map(i => ("en", s"never$i")).toDF("g", "k")
    val got = BloomReg.mightContain(present.unionByName(absent), "g", "k", reg)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    for (r <- present.collect())
      assert(got((r.getString(0), r.getString(1))) === 1,
        s"false negative for ${r.getString(1)}")
    // 65536 bits vs ~100 keys: FP ~ 2e-10 per probe — all absents must miss
    for (i <- 0 until 50) assert(got(("en", s"never$i")) === 0)
    // a key present in group en but not de is group-scoped
    val cross = BloomReg.mightContain(Seq(("de", "cat")).toDF("g", "k"),
      "g", "k", reg).collect()
    assert(cross.head.getInt(2) === 0)
  }

  test("Bloom union is bit-equal to one-pass AND idempotent on re-append; " +
    "partitioning-independent; nulls uncounted") {
    val two = "bloom_two"; val one = "bloom_one"
    freshBloom(two); freshBloom(one)
    BloomReg.appendBloom(run1, "g", "k", two)
    BloomReg.appendBloom(run2.repartition(5), "g", "k", two)
    BloomReg.appendBloom(run2, "g", "k", two) // re-append: OR is idempotent
    BloomReg.appendBloom(
      run1.unionByName(run2)
        .unionByName(Seq(("en", null: String)).toDF("g", "k")),
      "g", "k", one)
    def words(t: String) = spark.table(t).filter(col("word") >= 0)
      .groupBy("group", "word").agg(bit_or(col("bits")).as("bits"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(words(two) === words(one))
  }

  test("streaming CMS probe: per-batch estimates vs the registry, " +
    "registering nothing") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val reg = "cms_probe_stream"
    freshCms(reg)
    CountMin.appendCms(run1, "g", "k", reg)
    val before = spark.table(reg).count()
    val in = MemoryStream[(String, String)]
    val got = scala.collection.mutable.ArrayBuffer[(String, String, Long, Long)]()
    val q = graft.streaming.EventStreams.cmsProbeStream(
        in.toDF().toDF("g", "k"), "g", "k", reg) { out =>
      got ++= out.collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    }
    try {
      in.addData(("en", "the"), ("en", "the"), ("en", "fresh1"))
      q.processAllAvailable()
    } finally q.stop()
    val m = got.map(t => (t._1, t._2) -> t._3).toMap
    assert(got.size === 2) // batch distinct: "the" probed once
    assert(m(("en", "the")) === 30L)   // run1's exact count at this width
    assert(m(("en", "fresh1")) === 0L) // never appended
    assert(spark.table(reg).count() === before) // probe registered nothing
  }

  test("streaming Bloom probe: definitive zeros admit new items, " +
    "registering nothing") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val reg = "bloom_probe_stream"
    freshBloom(reg)
    BloomReg.appendBloom(run1, "g", "k", reg)
    val before = spark.table(reg).count()
    val in = MemoryStream[(String, String)]
    val got = scala.collection.mutable.ArrayBuffer[(String, String, Int, Long)]()
    val q = graft.streaming.EventStreams.bloomProbeStream(
        in.toDF().toDF("g", "k"), "g", "k", reg) { out =>
      got ++= out.collect().map(r =>
        (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
    }
    try {
      in.addData(("en", "cat"), ("en", "brandnew"), ("de", "der"))
      q.processAllAvailable()
    } finally q.stop()
    val m = got.map(t => (t._1, t._2) -> t._3).toMap
    assert(m(("en", "cat")) === 1)
    assert(m(("de", "der")) === 1)
    assert(m(("en", "brandnew")) === 0) // definitely new → admit
    assert(spark.table(reg).count() === before)
  }

  test("Warehouse.compact folds sketch registries without changing reports") {
    val creg = "cms_compact"; freshCms(creg)
    CountMin.appendCms(run1, "g", "k", creg)
    CountMin.appendCms(run2, "g", "k", creg)
    val probes = run1.unionByName(run2).distinct()
    def est() = CountMin.cmsEstimates(probes, "g", "k", creg).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val before = est()
    graft.sources.Warehouse.compact(spark, creg)
    assert(est() === before) // cells and meta rows survive the fold
    val breg = "bloom_compact"; freshBloom(breg)
    BloomReg.appendBloom(run1, "g", "k", breg)
    BloomReg.appendBloom(run2, "g", "k", breg)
    def probe() = BloomReg.mightContain(probes, "g", "k", breg).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    val b0 = probe()
    graft.sources.Warehouse.compact(spark, breg)
    assert(probe() === b0)
  }

  test("Bloom geometry mismatch fails fast") {
    val reg = "bloom_geom"
    freshBloom(reg)
    BloomReg.appendBloom(run1, "g", "k", reg, mBits = 65536, kProbes = 4)
    val e = intercept[IllegalArgumentException] {
      BloomReg.mightContain(Seq(("en", "the")).toDF("g", "k"), "g", "k", reg,
        mBits = 32768, kProbes = 4)
    }
    assert(e.getMessage.contains("geometry"))
    intercept[IllegalArgumentException] {
      BloomReg.appendBloom(run1, "g", "k", reg, mBits = 100, kProbes = 4)
    }
  }
}
