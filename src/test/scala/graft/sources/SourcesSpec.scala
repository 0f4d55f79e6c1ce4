package graft.sources

import java.nio.file.{Files, Paths}
import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

class SourcesSpec extends SparkSpec {

  private def writeCompressed(suffix: String, codec: java.io.OutputStream => java.io.OutputStream): String = {
    val dump = getClass.getResourceAsStream("/wiki_e2e_dump.xml").readAllBytes()
    val dir = Files.createDirectories(Paths.get("target/tmp"))
    val p = dir.resolve(s"wiki_dump$suffix")
    val out = codec(Files.newOutputStream(p))
    out.write(dump); out.close()
    p.toString
  }

  test("jsonl read quarantines malformed lines, keeps schema-sparse ones") {
    import org.apache.spark.sql.types._
    val dir = Files.createDirectories(Paths.get("target/tmp/jsonl_src"))
    dir.toFile.listFiles().foreach(_.delete())
    def writeGz(name: String, lines: Seq[String]): Unit = {
      val out = new java.util.zip.GZIPOutputStream(
        Files.newOutputStream(dir.resolve(name)))
      out.write(lines.mkString("\n").getBytes("UTF-8")); out.close()
    }
    writeGz("a.jsonl.gz", Seq(
      """{"id": 1, "text": "alpha", "lang": "en"}""",
      """{"id": 2, "text": "beta"}""", // missing field → good with null
      """{"id": 3, "text": "gamma", "lang": "de", "extra": 9}""", // ignored
      """{"id": 4 "text": "broken}""")) // malformed → quarantine
    writeGz("b.jsonl.gz", Seq(
      """{"id": 5, "text": "delta", "lang": "fr"}""",
      """not json at all"""))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("text", StringType), StructField("lang", StringType)))
    val (good, bad) = JsonlSource.read(spark, dir.toString, schema)
    assert(good.schema.fieldNames.toSeq == Seq("id", "text", "lang"))
    val g = good.collect().map(r =>
      (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(g == Set((1L, "alpha", Some("en")), (2L, "beta", None),
      (3L, "gamma", Some("de")), (5L, "delta", Some("fr"))), g.toString)
    // quarantine carries the raw line + its source file for re-parse
    val q = bad.collect().map(r => (r.getString(0), r.getString(1)))
    assert(q.length == 2, q.mkString("; "))
    assert(q.exists(x => x._1.endsWith("a.jsonl.gz") && x._2.contains("broken")))
    assert(q.exists(x => x._1.endsWith("b.jsonl.gz") && x._2 == "not json at all"))
    // the reserved column collides loudly
    intercept[IllegalArgumentException] {
      JsonlSource.read(spark, dir.toString,
        StructType(Seq(StructField("_graft_corrupt", StringType))))
    }
  }

  test("csv read quarantines type-failing rows, keeps short-but-typed ones") {
    import org.apache.spark.sql.types._
    val dir = Files.createDirectories(Paths.get("target/tmp/csv_src"))
    dir.toFile.listFiles().foreach(_.delete())
    def writeGz(name: String, lines: Seq[String]): Unit = {
      val out = new java.util.zip.GZIPOutputStream(
        Files.newOutputStream(dir.resolve(name)))
      out.write(lines.mkString("\n").getBytes("UTF-8")); out.close()
    }
    writeGz("a.csv.gz", Seq(
      """1,alpha,en""",
      """2,beta,""", // empty trailing field → good with null
      """3,"gamma, with comma",de""", // quoted delimiter per RFC 4180
      """4,shortrow""", // fewer tokens: positionally ambiguous → quarantine
      """oops,notanint,xx""")) // id fails LongType → quarantine
    writeGz("b.csv.gz", Seq(
      """5,delta,fr"""))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("text", StringType), StructField("lang", StringType)))
    val (good, bad) = CsvSource.read(spark, dir.toString, schema)
    assert(good.schema.fieldNames.toSeq == Seq("id", "text", "lang"))
    val g = good.collect().map(r =>
      (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(g == Set((1L, "alpha", Some("en")), (2L, "beta", None),
      (3L, "gamma, with comma", Some("de")), (5L, "delta", Some("fr"))),
      g.toString)
    val q = bad.collect().map(r => (r.getString(0), r.getString(1)))
    assert(q.length == 2, q.mkString("; "))
    assert(q.exists(x => x._1.endsWith("a.csv.gz") && x._2.contains("notanint")))
    assert(q.exists(x => x._1.endsWith("a.csv.gz") && x._2 == "4,shortrow"))
    intercept[IllegalArgumentException] {
      CsvSource.read(spark, dir.toString,
        StructType(Seq(StructField("_graft_corrupt", StringType))))
    }
  }

  test("reads gzip-compressed dumps (reference --infn *.gz path)") {
    val p = writeCompressed(".xml.gz", os => new java.util.zip.GZIPOutputStream(os))
    val pages = WikiXmlSource.pages(spark, p).collect()
    assert(pages.length == 5)
    assert(pages.map(_.id).sorted.toSeq == Seq("1", "2", "3", "4", "5"))
  }

  test("reads bzip2-compressed dumps via Hadoop codec (splittable at scale)") {
    val codec = new org.apache.hadoop.io.compress.BZip2Codec()
    codec.setConf(spark.sparkContext.hadoopConfiguration)
    val dump = getClass.getResourceAsStream("/wiki_e2e_dump.xml").readAllBytes()
    val dir = Files.createDirectories(Paths.get("target/tmp"))
    val p = dir.resolve("wiki_dump.xml.bz2")
    val out = codec.createOutputStream(Files.newOutputStream(p))
    out.write(dump); out.close()
    val pages = WikiXmlSource.pages(spark, p.toString).collect()
    assert(pages.length == 5)
  }

  /** Managed-table locations survive the (in-memory) catalog across JVMs —
    * clear both the catalog entry and the orphan dir before re-creating.
    */
  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = Paths.get(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"), name)
    if (Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      Files.walk(loc).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
  }

  test("bucketed tables join with no shuffle exchange") {
    val sf = "/root/testdata/sf0.001"
    dropTable("orders_b"); dropTable("lineitem_b")
    Warehouse.writeBucketed(Tables(spark, sf, "orders"), "orders_b", "o_orderkey", 4)
    Warehouse.writeBucketed(
      Tables(spark, sf, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", "o_orderkey", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = Warehouse.colocatedJoin(spark, "orders_b", "lineitem_b", "o_orderkey")
      assert(joined.count() > 0)
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty, s"expected bucket-co-located join, got shuffles:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("agg registry: appended deltas merge to the full recompute; " +
    "all-null keys drop; snapshot group-by rides the bucketing") {
    dropTable("aggreg_t")
    Warehouse.createAggRegistry(spark, "aggreg_t", buckets = 4)
    import spark.implicits._
    val d1 = Seq(("a", Option(1.5)), ("a", Option(2.25)),
      ("b", Option(-3.0))).toDF("k", "v")
    val d2 = Seq(("a", Option(-0.75)), ("c", Option.empty[Double]))
      .toDF("k", "v")
    assert(Warehouse.appendAggDelta(d1, "k", "v", "aggreg_t") == 2)
    assert(Warehouse.appendAggDelta(d2, "k", "v", "aggreg_t") == 1)
    val snap = Warehouse.aggSnapshot(spark, "aggreg_t")
    val got = snap.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got == Map(
      "a" -> ((3L, 3.0, -0.75, 2.25)),
      "b" -> ((1L, -3.0, -3.0, -3.0))), got.toString)
    val plan = snap.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty,
      s"snapshot must ride the bucketing, got shuffles:\n$plan")
  }

  test("partitioned+bucketed write prunes partitions on read") {
    val sf = "/root/testdata/sf0.001"
    dropTable("orders_pb")
    Warehouse.writeBucketedPartitioned(Tables(spark, sf, "orders"),
      "orders_pb", "o_orderstatus", "o_orderkey", 4)
    val scan = spark.table("orders_pb").filter(org.apache.spark.sql.functions.col("o_orderstatus") === "F")
    assert(scan.count() > 0)
    val explained = scan.queryExecution.executedPlan.toString
    assert(explained.contains("PartitionFilters") || explained.contains("o_orderstatus"))
  }

  test("publishShards promotes atomic versioned snapshots with verifiable manifests") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.text.TextOps
    val root = Files.createTempDirectory("graft_publish").toString
    val docs = (1L to 40L).map(i =>
      (i, Seq.fill(1 + (i % 5).toInt)("w").mkString(" "))).toDF("doc_id", "text")
    val sharded = TextOps.shardByTokenBudget(docs, "text", "doc_id", 20)
    // an orphaned staging dir from a "crashed" publish must not block
    Files.createDirectory(Paths.get(root, "_staging-dead"))
    val v1 = Warehouse.publishShards(sharded, root)
    assert(v1.endsWith("/v1"))
    val v2 = Warehouse.publishShards(sharded.filter(col("doc_id") <= 20), root)
    assert(v2.endsWith("/v2"))
    assert(Warehouse.latestShards(spark, root).get.endsWith("/v2"))
    // the manifest counts what landed, and the snapshot reads back whole
    val m = ujsonLite(Files.readString(Paths.get(v1.stripPrefix("file:"), "_MANIFEST.json")))
    val back = spark.read.parquet(v1)
    assert(back.count() == 40)
    val rowsByShard = back.groupBy("shard").count()
      .collect().map(r => (r.get(0).toString, r.getLong(1))).toMap
    val tokTotal = back.agg(sum("n_tokens")).head().getLong(0)
    assert(m._1 == rowsByShard, s"manifest rows ${m._1} vs $rowsByShard")
    assert(m._2 == tokTotal, s"manifest tokens ${m._2} vs $tokTotal")
    // the orphan is untouched, and no staging dir leaked from the publishes
    val names = new java.io.File(root).list().toSeq
    assert(names.contains("_staging-dead"))
    assert(names.count(_.startsWith("_staging")) == 1, s"leaked staging: $names")
    assert(names.filter(_.matches("v\\d+")).sorted == Seq("v1", "v2"))
  }

  test("diffVersions: hand-planted add/remove/change matrix, null vs empty " +
    "distinct, uncommitted snapshots rejected") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = Files.createTempDirectory("graft_diff").toString
    val v1 = Seq(
      (1L, "same", 0L), (2L, "old", 0L), (3L, "gone", 0L),
      (4L, null.asInstanceOf[String], 0L), (5L, "", 0L))
      .toDF("doc_id", "text", "shard")
    val v2 = Seq(
      (1L, "same", 0L), (2L, "new", 0L), (6L, "fresh", 0L),
      (4L, "", 0L), (5L, null.asInstanceOf[String], 0L))
      .toDF("doc_id", "text", "shard")
    Warehouse.publishShards(v1, root)
    Warehouse.publishShards(v2, root)
    val got = Warehouse.diffVersions(spark, root, 1, 2, "doc_id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1 unchanged (suppressed), 2 changed, 3 removed, 6 added, and the
    // null↔empty swaps on 4/5 MUST read as changed (JSON omits a null
    // field but keeps an empty string, so the fingerprints differ)
    assert(got == Map(2L -> "changed", 3L -> "removed", 6L -> "added",
      4L -> "changed", 5L -> "changed"), s"$got")
    val all = Warehouse.diffVersions(spark, root, 1, 2, "doc_id",
        Seq("text"), includeUnchanged = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(all(1L) == "unchanged" && all.size == 6, s"$all")
    // direction flips with argument order
    val rev = Warehouse.diffVersions(spark, root, 2, 1, "doc_id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rev(3L) == "added" && rev(6L) == "removed", s"$rev")
    // an uncommitted (manifest-less) version dir is not diffable
    Files.createDirectory(Paths.get(root, "v3"))
    val e = intercept[IllegalArgumentException] {
      Warehouse.diffVersions(spark, root, 1, 3, "doc_id", Seq("text")).collect()
    }
    assert(e.getMessage.contains("committed"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Warehouse.diffVersions(spark, root, 1, 1, "doc_id", Seq("text"))
    }
    assert(e2.getMessage.contains("vA == vB"), e2.getMessage)
  }

  test("publishShards webdataset: tar shards round-trip and manifest counts landed samples") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = Files.createTempDirectory("graft_wds").toString
    // media-schema rows: content+mime become <key>.<ext>, the metadata
    // columns a deterministic <key>.json; one row carries NULL content
    // (metadata-only sample — json entry only)
    val media = (1L to 23L).map { i =>
      (i % 4, i,
        if (i == 7L) null
        else Array.tabulate[Byte](8 + i.toInt)(j => ((i * 31 + j) & 0xFF).toByte),
        if (i == 7L) null else if (i % 2 == 0) "image/png" else "audio/wav",
        640 + i.toInt, i * 100L)
    }.toDF("shard", "media_id", "content", "mime", "width", "duration_ms")
    val v1 = Warehouse.publishShards(media, root, format = "webdataset")
    assert(v1.endsWith("/v1"))
    val dir = v1.stripPrefix("file:")
    // landed archives: plain shard-<v>.tar files, no temp leftovers
    val names = new java.io.File(dir).list().toSeq.sorted
    assert(names.filter(_.endsWith(".tar")) ==
      Seq("shard-0.tar", "shard-1.tar", "shard-2.tar", "shard-3.tar"), names)
    assert(!names.exists(_.startsWith("_tmp-")), names)
    // manifest rows == landed SAMPLES per tar
    val m = ujsonLite(Files.readString(Paths.get(dir, "_MANIFEST.json")))
    val expectShardCounts = media.groupBy("shard").count()
      .collect().map(r => (r.get(0).toString, r.getLong(1))).toMap
    assert(m._1 == expectShardCounts, s"manifest ${m._1} vs $expectShardCounts")
    // round-trip: every sample reassembles with identical bytes and a
    // byte-stable metadata json
    val samples = WebDataset.readSamples(spark, v1)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getMap[String, Array[Byte]](2))).toMap
    assert(samples.size == 23)
    media.collect().foreach { r =>
      val key = (r.getLong(0).toString, r.getLong(1).toString)
      val files = samples(key)
      val meta = new String(files("json"), "UTF-8")
      assert(meta == s"""{"duration_ms":${r.getLong(5)},"width":${r.getInt(4)}}""",
        meta)
      if (r.isNullAt(2)) assert(files.size == 1, s"$key: ${files.keys}")
      else {
        val ext = if (r.getString(3) == "image/png") "png" else "wav"
        assert(files(ext).toSeq == r.getAs[Array[Byte]](2).toSeq, s"$key bytes")
      }
    }
    // entries within a shard are key-grouped (WebDataset's sample
    // contract: a sample's files are CONSECUTIVE) — verify with a bare
    // commons-compress read of one archive, no graft reader involved
    locally {
      import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
      val in = new TarArchiveInputStream(
        new java.io.FileInputStream(s"$dir/shard-1.tar"))
      val entryNames = Iterator.continually(in.getNextEntry)
        .takeWhile(_ != null).map(_.getName).toSeq
      in.close()
      val keys = entryNames.map(_.split('.').head)
      keys.zipWithIndex.groupBy(_._1).foreach { case (k, occ) =>
        val idx = occ.map(_._2)
        assert(idx.max - idx.min + 1 == idx.size,
          s"sample $k interleaved: $entryNames")
      }
      assert(keys.distinct == keys.distinct.sortBy(_.toLong), entryNames)
    }
  }

  test("vacuumVersions keeps the newest snapshots, sweeps stale and crashed dirs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.text.TextOps
    val root = Files.createTempDirectory("graft_vacuum").toString
    val docs = (1L to 20L).map(i => (i, "w w w")).toDF("doc_id", "text")
    val sharded = TextOps.shardByTokenBudget(docs, "text", "doc_id", 20)
    val v1 = Warehouse.publishShards(sharded, root)
    val v2 = Warehouse.publishShards(sharded.filter(col("doc_id") <= 10), root)
    val v3 = Warehouse.publishShards(sharded.filter(col("doc_id") <= 5), root)
    // a crashed manifest-less publish below the highest version, and a
    // manifest-less HIGHEST dir that may be a publish in flight
    Files.createDirectory(Paths.get(root, "v4"))
    Files.createDirectory(Paths.get(root, "v9"))
    val deleted = Warehouse.vacuumVersions(spark, root, keep = 2)
    assert(deleted.map(_.split('/').last).sorted === Seq("v1", "v4"))
    assert(!Files.exists(Paths.get(root, "v1")))
    assert(Files.exists(Paths.get(root, "v2")) && Files.exists(Paths.get(root, "v3")))
    assert(Files.exists(Paths.get(root, "v9")), "in-flight publish must be spared")
    // readers are unaffected: latest still resolves to v3, and it reads whole
    assert(Warehouse.latestShards(spark, root).get.endsWith("/v3"))
    assert(spark.read.parquet(v3).count() === 5)
    // keep clamps at the latest snapshot; v9 (still manifest-less) spared
    val deleted2 = Warehouse.vacuumVersions(spark, root, keep = 1)
    assert(deleted2.map(_.split('/').last) === Seq("v2"))
    intercept[IllegalArgumentException] {
      Warehouse.vacuumVersions(spark, root, keep = 0)
    }
    // idempotent on an already-clean root; empty/missing roots are no-ops
    assert(Warehouse.vacuumVersions(spark, root, keep = 1) === Nil)
    assert(Warehouse.vacuumVersions(spark, root + "_nope") === Nil)
    assert(v1.nonEmpty && v2.nonEmpty) // silence unused warnings
  }

  test("publishShards commit detects a concurrent publish instead of nesting into it") {
    // HDFS-style rename moves a source INTO an existing destination dir
    // and returns true — the losing publisher must detect that, clean its
    // nested copy out, and fail, leaving the winner's snapshot intact
    val root = Files.createTempDirectory("graft_publish_race").toString
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the winner's already-published snapshot
    Files.createDirectory(Paths.get(root, "v1"))
    Files.writeString(Paths.get(root, "v1", "_MANIFEST.json"), """{"version":1,"shards":[]}""")
    Files.writeString(Paths.get(root, "v1", "part-0.parquet"), "winner-data")
    // the loser's fully-written staging
    Files.createDirectory(Paths.get(root, "_staging-loser"))
    Files.writeString(Paths.get(root, "_staging-loser", "_MANIFEST.json"), """{"version":1,"shards":[]}""")
    val e = intercept[IllegalStateException] {
      Warehouse.promoteStaging(fs,
        new org.apache.hadoop.fs.Path(root, "_staging-loser"),
        new org.apache.hadoop.fs.Path(root, "v1"))
    }
    assert(e.getMessage.contains("concurrent publish"), e.getMessage)
    // winner untouched, loser's nested copy removed
    assert(Files.readString(Paths.get(root, "v1", "part-0.parquet")) == "winner-data")
    assert(new java.io.File(root, "v1").list().toSeq.sorted ==
      Seq("_MANIFEST.json", "part-0.parquet"),
      new java.io.File(root, "v1").list().toSeq.toString)
    // the normal (uncontended) path still verifies and promotes
    Files.createDirectory(Paths.get(root, "_staging-clean"))
    Files.writeString(Paths.get(root, "_staging-clean", "_MANIFEST.json"), """{"version":2,"shards":[]}""")
    Warehouse.promoteStaging(fs,
      new org.apache.hadoop.fs.Path(root, "_staging-clean"),
      new org.apache.hadoop.fs.Path(root, "v2"))
    assert(Files.exists(Paths.get(root, "v2", "_MANIFEST.json")))
  }

  test("publishShards manifest commit mode: rename-free, crash-invisible, reserve-skipping") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.text.TextOps
    val root = Files.createTempDirectory("graft_publish_manifest").toString
    val docs = (1L to 40L).map(i =>
      (i, Seq.fill(1 + (i % 5).toInt)("w").mkString(" "))).toDF("doc_id", "text")
    val sharded = TextOps.shardByTokenBudget(docs, "text", "doc_id", 20)
    val v1 = Warehouse.publishShards(sharded, root, commitMode = "manifest")
    assert(v1.endsWith("/v1"))
    assert(Warehouse.latestShards(spark, root).get.endsWith("/v1"))
    // the protocol wrote IN PLACE: no staging dir ever existed, the
    // reservation marker and the manifest live under the version dir
    val names = new java.io.File(root).list().toSeq
    assert(!names.exists(_.startsWith("_staging")), s"staging leaked: $names")
    assert(Files.exists(Paths.get(root, "v1", "_STARTED")))
    assert(Files.exists(Paths.get(root, "v1", "_MANIFEST.json")))
    // snapshot reads back whole with a counts-what-landed manifest
    val back = spark.read.parquet(v1)
    assert(back.count() == 40)
    val m = ujsonLite(Files.readString(Paths.get(v1.stripPrefix("file:"), "_MANIFEST.json")))
    assert(m._1.values.sum == 40)
    // a crash BEFORE the manifest: reserved dir with partial data, no
    // manifest — invisible to readers, never blocks the next publish
    Files.createDirectory(Paths.get(root, "v2"))
    Files.writeString(Paths.get(root, "v2", "_STARTED"), "")
    Files.writeString(Paths.get(root, "v2", "part-0.parquet"), "partial garbage")
    assert(Warehouse.latestShards(spark, root).get.endsWith("/v1"),
      "reader listed a manifest-less (uncommitted) version")
    val v3 = Warehouse.publishShards(sharded.filter(col("doc_id") <= 20), root,
      commitMode = "manifest")
    assert(v3.endsWith("/v3"), s"expected the crashed v2 to be skipped, got $v3")
    assert(Warehouse.latestShards(spark, root).get.endsWith("/v3"))
    // the crashed dir is untouched (janitor's job, not the publisher's)
    assert(Files.readString(Paths.get(root, "v2", "part-0.parquet")) ==
      "partial garbage")
  }

  test("publishShards manifest mode detects a lost reservation on a HEAD-then-PUT store") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.text.TextOps
    // a store whose create(overwrite=false) is NOT a conditional create:
    // creating an existing file "succeeds" but the earlier object wins
    // (the losing PUT vanishes) — the S3A-without-conditional-writes shape
    spark.sparkContext.hadoopConfiguration.setClass("fs.headput.impl",
      classOf[HeadThenPutFileSystem], classOf[org.apache.hadoop.fs.FileSystem])
    spark.sparkContext.hadoopConfiguration.setBoolean(
      "fs.headput.impl.disable.cache", true)
    val dir = Files.createTempDirectory("graft_publish_headput")
    // a concurrent publisher already holds the v1 reservation
    Files.createDirectory(dir.resolve("v1"))
    Files.writeString(dir.resolve("v1").resolve("_STARTED"), "someone-else")
    val root = new org.apache.hadoop.fs.Path(new java.net.URI(
      "headput", null, dir.toAbsolutePath.toString, null)).toString
    val docs = (1L to 12L).map(i => (i, s"w $i")).toDF("doc_id", "text")
    val sharded = TextOps.shardByTokenBudget(docs, "text", "doc_id", 10)
    val out = Warehouse.publishShards(sharded, root, commitMode = "manifest")
    // the silent create "success" must NOT be trusted: the UUID re-read
    // detects the loss and the publisher moves on to v2 — v1 stays the
    // winner's, unpolluted by our data
    assert(out.endsWith("/v2"), s"expected the lost v1 reservation skipped: $out")
    assert(Files.readString(dir.resolve("v1").resolve("_STARTED")) == "someone-else")
    assert(new java.io.File(dir.toFile, "v1").list().toSeq == Seq("_STARTED"),
      "loser wrote data into the winner's reserved version dir")
    assert(Files.exists(dir.resolve("v2").resolve("_MANIFEST.json")))
    assert(spark.read.parquet(out).count() == 12)
  }

  test("publishShards format=json writes gzipped JSONL that round-trips") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.text.TextOps
    val root = Files.createTempDirectory("graft_publish_json").toString
    val docs = (1L to 30L).map(i =>
      (i, s"""text "with quotes" and
newline $i""")).toDF("doc_id", "text")
    val sharded = TextOps.shardByTokenBudget(docs, "text", "doc_id", 25)
    val v1 = Warehouse.publishShards(sharded, root, format = "json",
      maxRecordsPerFile = 7)
    assert(v1.endsWith("/v1"))
    // data files are gzipped JSONL under shard dirs, bounded per file
    val files = Files.walk(Paths.get(v1.stripPrefix("file:")))
      .iterator()
    val dataFiles = {
      import scala.jdk.CollectionConverters._
      files.asScala.filter(_.getFileName.toString.endsWith(".json.gz")).toSeq
    }
    assert(dataFiles.nonEmpty)
    assert(dataFiles.forall(_.getParent.getFileName.toString.startsWith("shard=")))
    // JSON escaping round-trips quotes and newlines exactly
    val back = spark.read.schema(sharded.schema).json(v1)
    assert(back.count() == 30)
    val t5 = back.filter(col("doc_id") === 5L).select("text").head().getString(0)
    assert(t5 == "text \"with quotes\" and\nnewline 5")
    // manifest counts the landed JSONL rows
    val m = ujsonLite(Files.readString(Paths.get(v1.stripPrefix("file:"), "_MANIFEST.json")))
    assert(m._1.values.sum == 30)
    intercept[IllegalArgumentException] {
      Warehouse.publishShards(sharded, root, format = "bogus")
    }
  }

  // minimal manifest parser for the spec: (rows per shard, token total)
  private def ujsonLite(s: String): (Map[String, Long], Long) = {
    val shard = """\{"shard":"([^"]+)","rows":(\d+),"tokens":(-?\d+)\}""".r
    val entries = shard.findAllMatchIn(s).map(m =>
      (m.group(1), m.group(2).toLong, m.group(3).toLong)).toSeq
    (entries.map(e => (e._1, e._2)).toMap, entries.map(_._3).sum)
  }
}

/** Test-only FileSystem modeling a store whose create(overwrite=false) is
  * a non-atomic HEAD-then-PUT: creating an EXISTING file succeeds but the
  * pre-existing object wins (the new writes are discarded) — the classic
  * S3-without-conditional-writes hazard publishShards' UUID handshake
  * exists to detect. Top-level: Hadoop instantiates it reflectively.
  */
class HeadThenPutFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "headput"
  override def getUri: java.net.URI = java.net.URI.create("headput:///")
  override def create(f: org.apache.hadoop.fs.Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    if (!overwrite && exists(f))
      new org.apache.hadoop.fs.FSDataOutputStream(
        java.io.OutputStream.nullOutputStream(), null)
    else super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)
  }
}
