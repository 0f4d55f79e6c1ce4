package graft

import org.apache.spark.sql.functions._
import graft.dedup.Cdc

class CdcSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random bytes (splitmix64 stream — no RNG)
  private def bytes(seed: Long, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var z = seed
    var i = 0
    while (i < n) {
      z += 0x9e3779b97f4a7c15L
      var x = z
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^= (x >>> 31)
      out(i) = x.toByte
      i += 1
    }
    out
  }

  test("fnv1a matches the published test vector") {
    assert(Cdc.fnv1a("a".getBytes("UTF-8"), 0, 1) === 0xaf63dc4c8601ec8cL)
    assert(Cdc.fnv1a("foobar".getBytes("UTF-8"), 0, 6) === 0x85944171f73967e8L)
  }

  test("boundaries: ascending, cover the blob, respect min/max") {
    val b = bytes(7L, 50000)
    val ends = Cdc.boundaries(b, minSize = 256, avgBits = 9, maxSize = 4096)
    assert(ends.last === b.length)
    assert(ends.toSeq === ends.toSeq.sorted)
    val sizes = ends.zip(0 +: ends.init).map { case (e, s) => e - s }
    // every chunk but the tail within [minSize, maxSize]; tail >= 1
    sizes.init.foreach { s => assert(s >= 256 && s <= 4096, s"size $s") }
    assert(sizes.last >= 1 && sizes.last <= 4096)
    // avg in a sane band around minSize + 2^avgBits = 768
    assert(sizes.length > 20, s"only ${sizes.length} chunks")
    // determinism
    assert(Cdc.boundaries(b, 256, 9, 4096).toSeq === ends.toSeq)
  }

  test("degenerate content (all zeros) is cut by maxSize, not unbounded") {
    val ends = Cdc.boundaries(Array.fill[Byte](20000)(0), 256, 9, 4096)
    assert(ends.last === 20000)
    val sizes = ends.zip(0 +: ends.init).map { case (e, s) => e - s }
    sizes.foreach(s => assert(s <= 4096))
  }

  test("shift invariance: a prepended banner disturbs at most the first chunks") {
    val base = bytes(42L, 60000)
    val banner = "HTTP/1.1 200 OK mirror-added header".getBytes("UTF-8")
    val shifted = banner ++ base
    def hashes(b: Array[Byte]) =
      Cdc.chunkBlob(b, 256, 9, 4096).map(_._3)
    val h0 = hashes(base)
    val h1 = hashes(shifted)
    val shared = h0.toSet.intersect(h1.toSet).size
    // boundary re-synchronizes within ~1 chunk of the insertion: all but
    // a couple of leading chunks survive byte-identical
    assert(shared >= h0.length - 3,
      s"shared $shared of ${h0.length} (fixed-size blocking would share 0)")
    // whole-blob identity sees nothing
    assert(Cdc.fnv1a(base, 0, base.length) !==
      Cdc.fnv1a(shifted, 0, shifted.length))
  }

  test("chunkTable: contiguous cover, empty/null blobs drop, idx ordered") {
    val a = bytes(1L, 10000)
    val df = Seq((1L, a), (2L, Array.empty[Byte]), (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "content")
    val rows = Cdc.chunkTable(df, "content", "media_id", 256, 9, 4096)
      .orderBy("id", "chunk_idx").collect()
    assert(rows.forall(_.getLong(0) == 1L))
    var expectOff = 0
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(1) === i)
      assert(r.getInt(2) === expectOff)
      expectOff += r.getInt(3)
    }
    assert(expectOff === a.length)
    // chunk hashes agree with the local chunker
    val local = Cdc.chunkBlob(a, 256, 9, 4096)
    assert(rows.map(_.getLong(4)).toSeq === local.map(_._3).toSeq)
  }

  test("dedupReport: two identical blobs halve to one unique copy") {
    val a = bytes(9L, 30000)
    val df = Seq((1L, a), (2L, a)).toDF("media_id", "content")
    val r = Cdc.dedupReport(df, "content", "media_id", 256, 9, 4096).collect()(0)
    assert(r.getAs[Long]("n_blobs") === 2L)
    assert(r.getAs[Long]("total_bytes") === 60000L)
    assert(r.getAs[Long]("unique_bytes") === 30000L)
    assert(r.getAs[Long]("n_chunks") === 2 * r.getAs[Long]("n_unique_chunks"))
    assert(r.getAs[Long]("saved_pct") === 50L)
  }

  test("chunk registry: cross-run growth, mirror near-zero delta, report-only mode") {
    val reg = "cdc_reg_spec"
    graft.sources.Warehouse.dropTableAndLocation(spark, reg)
    Cdc.createChunkRegistry(spark, reg, buckets = 4)
    val a = bytes(11L, 40000)
    val day1 = Seq((1L, a)).toDF("media_id", "content")
    val r1 = Cdc.newChunksAgainstRegistry(day1, "content", "media_id", reg,
      minSize = 256, avgBits = 9, maxSize = 4096)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(r1.length === 1)
    val (_, nChunks1, nNew1, newBytes1) = r1(0)
    // day 1 against an empty registry: every distinct chunk is new
    assert(nNew1 === nChunks1 && newBytes1 > 0)

    // day 2: a banner mirror of A (≤3 disturbed chunks), an identical
    // copy of A (zero new), and a fresh blob (all new)
    val mirror = "X-Mirror: cdn-7\r\n".getBytes("UTF-8") ++ a
    val fresh = bytes(12L, 40000)
    val day2 = Seq((10L, mirror), (11L, a), (12L, fresh))
      .toDF("media_id", "content")
    val r2 = Cdc.newChunksAgainstRegistry(day2, "content", "media_id", reg,
      minSize = 256, avgBits = 9, maxSize = 4096)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(r2(10L)._2 <= 3, s"mirror registered ${r2(10L)._2} new chunks")
    assert(r2(11L)._2 === 0L && r2(11L)._3 === 0L)
    assert(r2(12L)._2 === r2(12L)._1 && r2(12L)._3 === 40000L)

    // day 3 in report-only mode: nothing registers, so a repeat call
    // returns the identical report
    val day3 = Seq((20L, bytes(13L, 20000))).toDF("media_id", "content")
    def run() = Cdc.newChunksAgainstRegistry(day3, "content", "media_id",
      reg, update = false, minSize = 256, avgBits = 9, maxSize = 4096)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(run() === run())
  }

  test("chunk registry: within-batch winner is min id — one blob wins, twin registers nothing") {
    val reg = "cdc_reg_twin_spec"
    graft.sources.Warehouse.dropTableAndLocation(spark, reg)
    Cdc.createChunkRegistry(spark, reg, buckets = 4)
    val a = bytes(21L, 30000)
    val batch = Seq((7L, a), (3L, a)).toDF("media_id", "content")
    val r = Cdc.newChunksAgainstRegistry(batch, "content", "media_id", reg,
      minSize = 256, avgBits = 9, maxSize = 4096)
      .collect().map(x => (x.getLong(0),
        (x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(3L)._2 === r(3L)._1 && r(3L)._3 > 0) // min id wins every chunk
    assert(r(7L)._2 === 0L && r(7L)._3 === 0L)
  }

  test("streaming chunk-registry probe row-equals the batch report-only pass") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    val reg = "cdc_stream_reg"
    graft.sources.Warehouse.dropTableAndLocation(spark, reg)
    Cdc.createChunkRegistry(spark, reg, buckets = 4)
    val a = bytes(31L, 40000)
    Cdc.newChunksAgainstRegistry(
      Seq((1L, a)).toDF("media_id", "content"), "content", "media_id", reg,
      minSize = 256, avgBits = 9, maxSize = 4096).count()

    // mirror (≤3 new), identical copy (0 new — still reported), fresh
    // blob (all new); their only SHARED chunks are registered ones, so
    // stream ≡ batch update=false
    val mirror = "X-Mirror: cdn-7\r\n".getBytes("UTF-8") ++ a
    val day2 = Seq((10L, mirror), (11L, a), (12L, bytes(32L, 40000)))
    val in = MemoryStream[(Timestamp, Long, Array[Byte])]
    val q = graft.streaming.EventStreams.newChunksAgainstRegistryStream(
        in.toDF().toDF("ts", "media_id", "content"), "content", "media_id",
        "ts", reg, minSize = 256, avgBits = 9, maxSize = 4096)
      .writeStream.format("memory").queryName("cdc_stream_out")
      .outputMode("append").start()
    try {
      in.addData(day2.map { case (id, b) => (ts(0), id, b) })
      q.processAllAvailable()
      in.addData((ts(30), 99L, bytes(33L, 5000))) // closes the 00:00 window
      q.processAllAvailable()
      val got = spark.table("cdc_stream_out").filter(col("id") < 99)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq.sortBy(_._1)
      val want = Cdc.newChunksAgainstRegistry(
          day2.toDF("media_id", "content"), "content", "media_id", reg,
          update = false, minSize = 256, avgBits = 9, maxSize = 4096)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq.sortBy(_._1)
      assert(got === want, s"$got vs $want")
      assert(got.map(_._1) === Seq(10L, 11L, 12L)) // all-seen blob reported
      assert(got(1)._3 === 0L) // ...at zero new
      // probe-only: the registry did not grow
      assert(spark.table(reg).count() ===
        Cdc.chunkBlob(a, 256, 9, 4096).map(_._3).distinct.length)
    } finally q.stop()
  }

  test("containmentPairs: banner-prepended mirror found; unrelated not") {
    val a = bytes(5L, 60000)
    val mirror = "X-Mirror: cdn-7\r\n".getBytes("UTF-8") ++ a
    val other = bytes(6L, 60000)
    val df = Seq((1L, a), (2L, mirror), (3L, other)).toDF("media_id", "content")
    val got = Cdc.containmentPairs(df, "content", "media_id",
        minSize = 256, avgBits = 9, maxSize = 4096, tauPct = 80, minChunks = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // a ⊂ mirror (all a-chunks except possibly the first appear) and the
    // mirror's chunks are ≥80% a's — both directions qualify
    assert(got.contains((1L, 2L)) && got.contains((2L, 1L)))
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
  }
}
