package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, sum}

/** Warehouse-layout helpers for the 100 TB path: bucketing co-locates both
  * sides of a recurring join on the join key at write time, so every
  * subsequent join/aggregation on that key runs with NO shuffle exchange —
  * the single biggest lever for repeated fact-fact joins at scale.
  *
  * (Time-partitioning for events-style tables composes with this via
  * `partitionBy`; partition pruning then drops whole directories before
  * the scan.)
  */
object Warehouse {

  // The bucket-id expression Spark's bucketed writer uses: pmod of the
  // same Murmur3 hash `hash()` exposes (over ALL bucket columns, in spec
  // order). Repartitioning on it co-locates each bucket's rows in ONE
  // task, so a bucketed write emits exactly one file per bucket (per
  // partition directory) instead of one per bucket×task — without it, a
  // 32-task build of a 256-cell × 8-bucket index writes ~65k ~KB files
  // whose parquet footers outweigh the data and whose open cost
  // dominates every probe.
  private def bucketIdExpr(keys: Seq[String], buckets: Int) =
    org.apache.spark.sql.functions.pmod(
      org.apache.spark.sql.functions.hash(
        keys.map(org.apache.spark.sql.functions.col): _*),
      org.apache.spark.sql.functions.lit(buckets))

  /** Repartition so each (partition dir, bucket) lands in exactly one
    * task — the one-file-per-bucket alignment every bucketed write and
    * append here applies. Distinct (partition, bucket) pairs spread
    * across the full shuffle parallelism.
    */
  def alignBuckets(df: DataFrame, key: String, buckets: Int,
                   partitionCols: String*): DataFrame =
    alignBucketsMulti(df, Seq(key), buckets, partitionCols: _*)

  /** [[alignBuckets]] for a COMPOSITE bucket key (Spark buckets on the
    * Murmur3 hash of all bucket columns together).
    */
  def alignBucketsMulti(df: DataFrame, keys: Seq[String], buckets: Int,
                        partitionCols: String*): DataFrame =
    df.repartition(partitionCols.map(org.apache.spark.sql.functions.col) :+
      bucketIdExpr(keys, buckets): _*)

  /** Write as a bucketed, per-bucket-sorted managed table — one file per
    * bucket ([[alignBuckets]]; size `buckets` for the cluster's
    * parallelism, as any bucketed layout already requires). Any existing
    * table AND its directory are dropped first ([[dropTableAndLocation]]):
    * the in-memory catalog does not survive a JVM restart but the managed
    * directory does, so a rebuild from a fresh session would otherwise
    * fail with LOCATION_ALREADY_EXISTS on the stale directory.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    writeBucketedMulti(df, table, Seq(key), buckets)

  /** [[writeBucketed]] with a COMPOSITE bucket key: the scan then
    * advertises HashPartitioning over ALL the key columns, so a join
    * keyed on exactly that column set co-locates with NO exchange on the
    * table side — the layout for band-style indexes probed on
    * (band, bucket), where bucketing on one column alone would leave the
    * scan's partitioning incompatible with the join and force a full
    * re-shuffle of the ever-growing index every probe.
    */
  def writeBucketedMulti(df: DataFrame, table: String, keys: Seq[String],
                         buckets: Int): Unit = {
    dropTableAndLocation(df.sparkSession, table)
    alignBucketsMulti(df, keys, buckets)
      .write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Write bucketed and additionally partitioned by a (low-cardinality)
    * partition column — pruning + co-location together, one file per
    * (partition dir, bucket). Drops any stale table/directory first
    * ([[writeBucketed]]'s fresh-JVM rebuild contract).
    */
  def writeBucketedPartitioned(df: DataFrame, table: String, partitionCol: String,
                               key: String, buckets: Int): Unit = {
    dropTableAndLocation(df.sparkSession, table)
    alignBuckets(df, key, buckets, partitionCol)
      .write
      .partitionBy(partitionCol)
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Append rows to a bucketed table under its own catalog spec and
    * return the append's OWN delta files (snapshot-diff of the table
    * directory's part files) — the idiom behind the delta-derived failure
    * contracts of the cross-run dedup ops: the input plan executes
    * exactly once, inside this append, and callers derive any returned
    * frame from the fixed delta file list instead of re-running a join
    * against state the append itself just changed. Single writer per
    * table at a time (concurrent appends would interleave snapshots).
    */
  def appendBucketedWithDelta(df: DataFrame, table: String,
                              key: String): Seq[String] =
    appendBucketedWithDeltaMulti(df, table, Seq(key))

  /** [[appendBucketedWithDelta]] for a COMPOSITE bucket key
    * ([[writeBucketedMulti]] tables).
    */
  def appendBucketedWithDeltaMulti(df: DataFrame, table: String,
                                   keys: Seq[String]): Seq[String] = {
    val spark = df.sparkSession
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    // the snapshot diff below lists the table directory NON-recursively;
    // a partitioned table's part files live under partition subdirs, so
    // the delta would silently come back empty and delta-derived callers
    // (dedupAgainstRegistry, nearDedupAgainstIndex) would report zero
    // registered rows despite a successful append — fail loudly instead
    require(meta.partitionColumnNames.isEmpty,
      s"appendBucketedWithDelta($table): partitioned tables are not " +
        "supported (delta snapshot is non-recursive)")
    val buckets = meta.bucketSpec.map(_.numBuckets).getOrElse(32)
    val loc = new org.apache.hadoop.fs.Path(meta.location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def partFiles(): Set[String] =
      fs.listStatus(loc).map(_.getPath.toString).filter(_.contains("part-")).toSet
    val before = partFiles()
    alignBucketsMulti(df, keys, buckets)
      .write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("append")
      .format("parquet")
      .saveAsTable(table)
    (partFiles() -- before).toSeq
  }

  /** Join two identically-bucketed tables on their bucket key. With equal
    * bucket counts Spark plans a SortMergeJoin with no Exchange on either
    * side.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Compact an append-grown bucketed table: rewrite its accumulated
    * files under the SAME partition/bucket spec (read from the catalog, so
    * a compaction can never change the layout contract), collapsing each
    * bucket — per partition directory, if partitioned — to ONE file.
    *
    * Why it exists: every append ([[graft.dedup.Dedup.dedupAgainstRegistry]]
    * with `update = true`, [[graft.similarity.Similarity.appendToIvfIndex]],
    * `appendToLshIndex`) adds at least one file per bucket it touches, so a
    * daily-run registry reads ~N files per bucket after N batches and the
    * anti-join/probe cost creeps up with file count even though the data
    * volume didn't. Compaction restores the post-build file layout without
    * changing a single row; bucket pruning, co-located joins, and partition
    * pruning behave exactly as before (spec-guarded).
    *
    * How: the rows are repartitioned by the bucket key into `numBuckets`
    * tasks — HashPartitioning and bucket-id assignment use the same hash,
    * so each task holds exactly one bucket's rows and writes exactly one
    * file (per partition directory it sees) — and STAGED as a sibling
    * table; only after the staged write fully materializes is the original
    * dropped and the staging table renamed over it. A crash mid-compact
    * leaves either the original or a complete staging copy, never a
    * half-written table. Same single-writer contract as the appends: no
    * concurrent append during compaction.
    *
    * Crash recovery: a crash INSIDE the drop→rename window leaves the data
    * complete but only under the staging name `<table>__compacting` —
    * readers of the original name fail until it is renamed back. The next
    * `compact(table)` call detects exactly that state (original absent,
    * staging present — the staging copy is complete by construction there,
    * because the original is only ever dropped after the staged write
    * finishes) and promotes the staging table before proceeding; manual
    * recovery is `ALTER TABLE <table>__compacting RENAME TO <table>`.
    */
  def compact(spark: SparkSession, table: String): Unit = {
    recoverStagingIfCrashed(spark, table, table + "__compacting")
    val cat = spark.sessionState.catalog
    val meta = cat.getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"compact($table): not a bucketed table — nothing to co-locate"))
    val keys = spec.bucketColumnNames
    val parts = meta.partitionColumnNames
    val staging = table + "__compacting"
    dropTableAndLocation(spark, staging)
    // Read the FILES, not the catalog table: a bucketed `spark.table` scan
    // advertises the bucket partitioning, which lets the planner elide the
    // repartition exchange — and then DisableUnnecessaryBucketedScan
    // (seeing no operator that needs bucketing) falls back to arbitrary
    // file-split tasks, so each task spans buckets and writes one file per
    // bucket it touches: MORE files, not fewer. A plain parquet read
    // carries no bucket metadata, so the repartition below is a real
    // shuffle and each task holds exactly one bucket's rows.
    val raw = spark.read.schema(spark.table(table).schema)
      .parquet(meta.location.toString)
    val w0 = raw
      .repartition(spec.numBuckets,
        keys.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("overwrite").format("parquet")
    val w1 = if (parts.nonEmpty) w0.partitionBy(parts: _*) else w0
    val w2 = w1.bucketBy(spec.numBuckets, keys.head, keys.tail: _*)
    (spec.sortColumnNames match {
      case Seq() => w2
      case s => w2.sortBy(s.head, s.tail: _*)
    }).saveAsTable(staging)
    dropTableAndLocation(spark, table)
    promoteStaging(spark, staging, table)
  }

  /** Rewrite a NON-PARTITIONED bucketed table curve-clustered on `zCols`
    * (2 or 3 columns, domains per [[graft.operators.ZOrder]]'s zvalue
    * contract) under its EXACT catalog bucket spec: same bucket keys,
    * same bucket count, each bucket collapsed to one file ([[compact]]'s
    * staging/promote machinery, same crash contract), but rows WITHIN
    * each bucket file laid in Morton order with `rowGroupBytes`-sized
    * parquet row groups — so a scan filtered on the z columns prunes row
    * groups on tight min/max stats while every bucket-keyed join still
    * co-locates with no exchange. Any catalog `sortBy` gives way to the
    * curve order (the sort spec was only ever a file-internal layout
    * hint; bucket pruning and co-location key off the bucket spec, which
    * is preserved — spec-guarded, rows identical).
    *
    * Ordering note: the bucketed writer plans its own
    * Sort(bucketIdExpression); the curve sort hides below an identity
    * barrier so the optimizer can't eliminate it, and the writer's sort
    * — stable over a per-task-constant bucket id — preserves the curve
    * (the row-group pruning spec gates exactly this end to end).
    */
  def optimizeZorder(spark: SparkSession, table: String, zCols: Seq[String],
                     rowGroupBytes: Long = 8L * 1024 * 1024,
                     curve: String = "morton"): Unit = {
    require(zCols.size == 2 || zCols.size == 3,
      s"optimizeZorder($table): need 2 or 3 curve columns, got $zCols")
    require(curve == "morton" || curve == "hilbert",
      s"optimizeZorder($table): curve '$curve' (morton | hilbert)")
    require(curve == "morton" || zCols.size == 2,
      s"optimizeZorder($table): the hilbert curve supports 2 columns " +
        s"(got ${zCols.size}); use morton for 3")
    recoverStagingIfCrashed(spark, table, table + "__compacting")
    val cat = spark.sessionState.catalog
    val meta = cat.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"optimizeZorder($table): not a bucketed table"))
    require(meta.partitionColumnNames.isEmpty,
      s"optimizeZorder($table): partitioned tables are not supported")
    val keys = spec.bucketColumnNames
    val staging = table + "__compacting"
    dropTableAndLocation(spark, staging)
    import org.apache.spark.sql.functions.col
    // hilbert shares morton's [0, 2^31) input contract (bits = 31), so
    // switching curves never changes a caller's domain prep — only the
    // visit order (hilbert's unit-step continuity → tighter row-group
    // rectangles at power-of-two boundaries, see HilbertCurve2)
    val z =
      if (curve == "hilbert")
        graft.functions.HilbertCurve2(col(zCols(0)), col(zCols(1)), 31)
      else if (zCols.size == 2)
        graft.operators.ZOrder.zvalue2(col(zCols(0)), col(zCols(1)))
      else
        graft.operators.ZOrder.zvalue3(col(zCols(0)), col(zCols(1)),
          col(zCols(2)))
    // files-not-catalog read: same rationale as compact(). The curve sort
    // sits BELOW a mapPartitions identity barrier: V1Writes plans its own
    // Sort(bucketIdExpression) above the query, and EliminateSorts then
    // removes any adjacent user sort as redundant — the barrier hides
    // ours. The writer's sort runs over a key that is CONSTANT within
    // each task (one bucket per task via the repartition), and Spark's
    // in-memory sorts are stable, so the curve order laid down below the
    // barrier survives into the file (gated end-to-end by the row-group
    // pruning spec). The barrier's row (de)serialization pass is noise
    // inside a whole-table rewrite.
    val sorted = spark.read.schema(spark.table(table).schema)
      .parquet(meta.location.toString)
      .repartition(spec.numBuckets, keys.map(col): _*)
      .withColumn("__zorder", z)
      .sortWithinPartitions(col("__zorder"))
      .drop("__zorder")
    sorted.mapPartitions(identity(_))(
        org.apache.spark.sql.Encoders.row(sorted.schema))
      .write.mode("overwrite").format("parquet")
      .option("parquet.block.size", rowGroupBytes)
      .bucketBy(spec.numBuckets, keys.head, keys.tail: _*)
      .saveAsTable(staging)
    dropTableAndLocation(spark, table)
    promoteStaging(spark, staging, table)
  }

  // Crash recovery shared by the staged rewrites (compact, optimizeZorder):
  // promote a complete staging copy left by a crash inside the drop→rename
  // window, clearing any stale data directory the drop left behind.
  private def recoverStagingIfCrashed(spark: SparkSession, table: String,
                                      stagingName: String): Unit = {
    val cat = spark.sessionState.catalog
    val ti = org.apache.spark.sql.catalyst.TableIdentifier(table)
    val si = org.apache.spark.sql.catalyst.TableIdentifier(stagingName)
    if (!cat.tableExists(ti) && cat.tableExists(si)) {
      // a crash BETWEEN the drop and its directory delete can also leave a
      // stale warehouse/<table> dir with no catalog entry — clear it first
      // or the promote rename lands on (or nests under) the leftover. The
      // stale path is derived from the STAGING table's catalog location
      // (its sibling), never from the session's warehouse.dir + name: a
      // session pointed at a different warehouse, or a table living in a
      // <db>.db/ subtree, must not delete an unrelated same-named dir.
      val sLoc = new org.apache.hadoop.fs.Path(
        cat.getTableMetadata(si).location)
      val p = new org.apache.hadoop.fs.Path(sLoc.getParent, table)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) {
        // delete only what a managed-table write leaves behind; anything
        // else means the path is NOT our leftover — stop and let a human
        // look rather than destroy it
        val entries = fs.listStatus(p)
        val tableLike = entries.forall { st =>
          val n = st.getPath.getName
          n.startsWith("part-") || n == "_SUCCESS" || n.startsWith("_temporary") ||
            n.startsWith(".") || (st.isDirectory && n.contains("="))
        }
        require(tableLike, s"recoverStaging($table): stale directory $p " +
          "contains non-table files; refusing to delete it — remove it " +
          s"manually and rename $stagingName back")
        fs.delete(p, true)
      }
      promoteStaging(spark, stagingName, table)
    }
  }

  // Rename the (complete) staging table over the target name and, for
  // partitioned tables, re-point the catalog partition entries: the rename
  // moves the data directory, but partition entries still carry absolute
  // locations under the staging path — purge them (keeping the just-moved
  // data) and re-discover from the directory layout, which is exactly the
  // partition-spec source of truth here. Shared by the normal compact tail
  // and the crash-recovery path, so the two can never fix up differently.
  private def promoteStaging(spark: SparkSession, staging: String,
                             table: String): Unit = {
    val cat = spark.sessionState.catalog
    val parts = cat.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(staging)).partitionColumnNames
    spark.sql(s"ALTER TABLE $staging RENAME TO $table")
    if (parts.nonEmpty) {
      val db = org.apache.spark.sql.catalyst.TableIdentifier(table)
        .database.getOrElse(cat.getCurrentDatabase)
      val ext = spark.sharedState.externalCatalog
      val specs = ext.listPartitions(db, table).map(_.spec)
      if (specs.nonEmpty)
        ext.dropPartitions(db, table, specs, ignoreIfNotExists = true,
          purge = false, retainData = true)
      spark.sql(s"ALTER TABLE $table RECOVER PARTITIONS")
    }
  }

  /** Largest per-(partition dir, bucket) part-file count of a bucketed
    * table — the fragmentation signal appends accumulate and [[compact]]
    * resets to 1. Bucket ids parse from the writer's file naming
    * (`part-…_NNNNN.` bucket suffix); cost is one recursive listing, no
    * data read — cheap enough to run before every incremental batch.
    */
  def maxFilesPerBucket(spark: SparkSession, table: String): Int = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    require(meta.bucketSpec.isDefined, s"maxFilesPerBucket($table): not bucketed")
    val loc = new org.apache.hadoop.fs.Path(meta.location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bucketRe = ".*_(\\d{5})\\.".r
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Int]
    val it = fs.listFiles(loc, true)
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (name.startsWith("part-")) {
        val bucket = bucketRe.findFirstMatchIn(name).map(_.group(1)).getOrElse("")
        val key = (st.getPath.getParent.toString, bucket)
        counts(key) = counts.getOrElse(key, 0) + 1
      }
    }
    if (counts.isEmpty) 0 else counts.values.max
  }

  /** [[compact]] the table iff its worst bucket has accumulated at least
    * `maxFiles` part files; returns whether a compaction ran. The ops
    * hook that closes the append→fragment→compact loop for daily
    * incremental pipelines (curate()'s `compactEveryNFiles`).
    */
  def compactIfFragmented(spark: SparkSession, table: String,
                          maxFiles: Int): Boolean = {
    require(maxFiles >= 2, s"compactIfFragmented($table): maxFiles=$maxFiles")
    val fragmented = maxFilesPerBucket(spark, table) >= maxFiles
    if (fragmented) compact(spark, table)
    fragmented
  }

  /** Atomically PUBLISH a versioned training-corpus snapshot: write `df`
    * partitioned by `shardCol` (the [[graft.text.TextOps.shardByTokenBudget]]
    * layout) into a staging directory, write a `_MANIFEST.json` with
    * per-shard row counts and token totals (the consumer's integrity
    * contract — a trainer can verify a shard before streaming it), then
    * promote staging to `<root>/v<N>` with ONE directory rename. Readers
    * listing versions never observe a half-written snapshot; a crashed
    * publish leaves only an orphaned `_staging-*` directory that the next
    * publish ignores (and a janitor can sweep by prefix). Returns the
    * published version path.
    *
    * Commit protocols (`commitMode`):
    *  - `"rename"` (default): stage → ONE directory rename — atomic on
    *    HDFS and local filesystems, the classic warehouse promote.
    *  - `"manifest"`: the object-store protocol for rename-less stores —
    *    the version number is RESERVED by an exclusive create of
    *    `v<N>/_STARTED` carrying this publisher's UUID (a reservation
    *    loser bumps N and retries), data is written directly under
    *    `v<N>`, and the `_MANIFEST.json` write LAST is the commit point.
    *    MULTI-WRITER contract: reservation is only exclusive where
    *    `create(overwrite=false)` is a true conditional create (HDFS,
    *    local FS, S3 conditional writes on Hadoop 3.4+ S3A). On stores
    *    where it degrades to HEAD-then-PUT, two publishers can both
    *    "win" the create — so the UUID is re-read after reservation AND
    *    re-verified immediately before the manifest write: a detected
    *    loser retries (pre-data) or aborts loudly (pre-commit) instead
    *    of committing a mixed snapshot. The handshake narrows but cannot
    *    fully close a non-atomic create's race window — run a SINGLE
    *    concurrent publisher per root on such stores.
    *    The commit point itself:
    *    [[latestShards]] ignores manifest-less version dirs, so a crash
    *    mid-write leaves an invisible, janitor-sweepable `v<N>` and the
    *    next publish simply claims `v<N+1>`. No dir rename anywhere in
    *    the protocol. (Task-level output commit inside the Spark write
    *    is the store CONNECTOR's concern — on S3 use an S3A-style
    *    committer; this protocol only removes the publish layer's own
    *    rename dependency.)
    *
    * `format`: `parquet` (default), `json` — gzipped JSONL, the text
    * training-data interchange most loaders stream natively (the
    * manifest read-back then uses the caller's schema, no inference
    * pass) — or `webdataset` — id-grouped POSIX tar shards, the
    * MULTIMODAL loader interchange: each sample's `content`/`mime`
    * columns become `<key>.<ext>` and the remaining columns a
    * deterministic `<key>.json`, keyed by `keyCol` (see [[WebDataset]];
    * manifest rows count landed SAMPLES per archive, tokens read -1).
    * `maxRecordsPerFile` > 0 bounds file size within a shard so a
    * loader can parallelize inside one shard too (parquet/json only).
    */
  def publishShards(df: DataFrame, root: String,
                    shardCol: String = "shard",
                    tokensCol: String = "n_tokens",
                    format: String = "parquet",
                    maxRecordsPerFile: Long = 0L,
                    commitMode: String = "rename",
                    keyCol: String = "media_id"): String = {
    require(format == "parquet" || format == "json" ||
      format == "webdataset",
      s"publishShards: unsupported format '$format' " +
        "(parquet|json|webdataset)")
    require(commitMode == "rename" || commitMode == "manifest",
      s"publishShards: unsupported commitMode '$commitMode' (rename|manifest)")
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(hconf)
    fs.mkdirs(rootPath)
    def nextVersion(from: Int): Int = math.max(from,
      1 + fs.listStatus(rootPath)
        .map(_.getPath.getName)
        .collect { case n if n.matches("v\\d+") => n.drop(1).toInt }
        .foldLeft(0)(math.max))

    // (dataDir, version): rename mode stages; manifest mode reserves the
    // final dir itself via exclusive _STARTED create carrying this
    // publisher's UUID — re-read after creation so a store whose
    // create(overwrite=false) is a non-atomic HEAD-then-PUT still
    // detects a lost race BEFORE any data is written
    val publisherId = java.util.UUID.randomUUID().toString
    def readStarted(dir: org.apache.hadoop.fs.Path): Option[String] =
      try {
        val in = fs.open(new org.apache.hadoop.fs.Path(dir, "_STARTED"))
        try Some(new String(in.readAllBytes(), "UTF-8"))
        finally in.close()
      } catch { case _: java.io.IOException => None }
    val (dataDir, version) =
      if (commitMode == "rename") {
        (new org.apache.hadoop.fs.Path(rootPath,
          s"_staging-${publisherId.take(8)}"),
          nextVersion(1))
      } else {
        var v = nextVersion(1)
        var reserved: Option[org.apache.hadoop.fs.Path] = None
        while (reserved.isEmpty) {
          val cand = new org.apache.hadoop.fs.Path(rootPath, s"v$v")
          val won =
            try {
              val out = fs.create(
                new org.apache.hadoop.fs.Path(cand, "_STARTED"), false)
              out.write(publisherId.getBytes("UTF-8"))
              out.close()
              // on a true conditional create this re-read is a no-op; on
              // HEAD-then-PUT it catches the common lost interleaving
              readStarted(cand).contains(publisherId)
            } catch { case _: java.io.IOException => false }
          if (won) reserved = Some(cand) else v = nextVersion(v + 1)
        }
        (reserved.get, v)
      }

    if (format == "webdataset") {
      // id-grouped POSIX tar shards (the multimodal loader interchange)
      // — same staging/reserved dir, same landed-count manifest, same
      // commit point below
      WebDataset.writeShardTars(df, dataDir.toString, shardCol, keyCol)
    } else {
      val writer0 = df.write.partitionBy(shardCol)
        // manifest mode writes into the reserved dir (which holds _STARTED)
        .mode(if (commitMode == "manifest")
          org.apache.spark.sql.SaveMode.Append
        else org.apache.spark.sql.SaveMode.ErrorIfExists)
      val writer =
        if (maxRecordsPerFile > 0)
          writer0.option("maxRecordsPerFile", maxRecordsPerFile)
        else writer0
      if (format == "json")
        writer.option("compression", "gzip").json(dataDir.toString)
      else writer.parquet(dataDir.toString)
    }
    // manifest from one pass over the written files — counting what
    // LANDED, not what was planned (webdataset: samples per tar archive)
    val perShard: Seq[(String, Long, Long)] =
      if (format == "webdataset")
        WebDataset.landedCounts(spark, dataDir.toString)
          .map { case (s, n) => (s, n, -1L) }.sortBy(_._1)
      else {
        val written =
          if (format == "json")
            spark.read.schema(df.schema).json(dataDir.toString)
          else spark.read.parquet(dataDir.toString)
        val hasTokens = written.columns.contains(tokensCol)
        written.groupBy(shardCol).agg(
            count(lit(1)).as("rows"),
            (if (hasTokens) sum(col(tokensCol)) else lit(null).cast("long"))
              .as("tokens"))
          .collect()
          .map(r => (r.get(0).toString,
            r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
          .sortBy(_._1).toSeq
      }
    val manifest = perShard.map { case (s, rows, toks) =>
      s"""{"shard":"$s","rows":$rows,"tokens":$toks}"""
    }.mkString(s"""{"version":$version,"shards":[""", ",", "]}")
    // the manifest write is the LAST write in both modes — rename mode
    // then promotes, manifest mode is hereby COMMITTED. Re-verify
    // reservation ownership at the commit point: a race lost AFTER the
    // post-create re-read (possible only on non-atomic-create stores)
    // must abort loudly, never commit a mixed snapshot as ours.
    if (commitMode == "manifest" && !readStarted(dataDir).contains(publisherId))
      throw new IllegalStateException(
        s"publishShards: lost the v$version reservation to a concurrent " +
          "publisher after writing data — manifest mode needs a true " +
          "conditional create or a single concurrent publisher; NOT " +
          "committing (the reservation winner owns this version)")
    val out = fs.create(new org.apache.hadoop.fs.Path(dataDir, "_MANIFEST.json"))
    out.write(manifest.getBytes("UTF-8"))
    out.close()
    if (commitMode == "rename") {
      val target = new org.apache.hadoop.fs.Path(rootPath, s"v$version")
      promoteStaging(fs, dataDir, target)
      target.toString
    } else dataDir.toString
  }

  /** Promote a fully-written staging snapshot to its versioned target —
    * the commit point of [[publishShards]]. fs.rename has POSIX mv
    * semantics on HDFS and several Hadoop FileSystems: when the
    * destination is an EXISTING directory it moves the source INTO it
    * (returning true) instead of failing, so a concurrent publish that
    * created v<N> first would silently receive this staging dir nested
    * inside the already-published snapshot readers are promised never to
    * see half-formed. Rename, then verify the commit landed AS v<N>
    * (manifest directly under it, no nested staging child); on the race,
    * remove the nested copy (our own files — the winner's snapshot is
    * left untouched) and fail loudly so the caller retries as a fresh
    * version.
    */
  private[sources] def promoteStaging(fs: org.apache.hadoop.fs.FileSystem,
                                      staging: org.apache.hadoop.fs.Path,
                                      target: org.apache.hadoop.fs.Path): Unit = {
    require(fs.rename(staging, target),
      s"publishShards: rename $staging -> $target failed (concurrent publish?)")
    val nested = new org.apache.hadoop.fs.Path(target, staging.getName)
    if (fs.exists(nested)) {
      fs.delete(nested, true)
      throw new IllegalStateException(
        s"publishShards: $target already existed (concurrent publish won the " +
          "rename) — nested staging removed, existing snapshot untouched; " +
          "retry to publish as a new version")
    }
    require(fs.exists(new org.apache.hadoop.fs.Path(target, "_MANIFEST.json")),
      s"publishShards: $target has no _MANIFEST.json after rename — " +
        "staging landed somewhere unexpected")
  }

  /** Highest published (COMMITTED) version under `root`, if any. A
    * version dir without `_MANIFEST.json` is not a snapshot — it is a
    * manifest-commit publish still in flight or crashed mid-write
    * (invisible by contract, janitor-sweepable) — so readers skip it in
    * BOTH commit modes (a rename-promoted dir always carries its
    * manifest, verified at promote).
    */
  def latestShards(spark: SparkSession, root: String): Option[String] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) None
    else fs.listStatus(rootPath)
      .map(_.getPath)
      .filter(_.getName.matches("v\\d+"))
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p, "_MANIFEST.json")))
      .sortBy(_.getName.drop(1).toInt)
      .lastOption.map(_.toString)
  }

  /** Retention sweep for a [[publishShards]] root: delete committed
    * versions older than the newest `keep`, plus every UNCOMMITTED
    * version dir (no `_MANIFEST.json`) that is not the highest-numbered
    * dir — the janitor half of the manifest-commit contract (a crashed
    * publish leaves an invisible manifest-less dir forever otherwise;
    * the HIGHEST manifest-less dir is spared because it may be a
    * publish in flight RIGHT NOW, about to write its manifest).
    *
    * Never deletes the latest committed snapshot (`keep` is clamped to
    * ≥ 1), so [[latestShards]] readers are unaffected. Readers of
    * OLDER pinned versions must finish inside the retention window —
    * the standard lakehouse vacuum contract, documented rather than
    * solved (solving it needs reader leases, which no shared-nothing
    * store provides). Returns the deleted directory paths.
    */
  def vacuumVersions(spark: SparkSession, root: String,
                     keep: Int = 2): Seq[String] = {
    require(keep >= 1, s"keep must be >= 1: $keep")
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return Nil
    val versioned = fs.listStatus(rootPath).map(_.getPath)
      .filter(_.getName.matches("v\\d+"))
      .sortBy(_.getName.drop(1).toInt)
    if (versioned.isEmpty) return Nil
    val highest = versioned.last
    val (committed, uncommitted) = versioned.partition(p =>
      fs.exists(new org.apache.hadoop.fs.Path(p, "_MANIFEST.json")))
    val staleCommitted = committed.dropRight(keep)
    val crashed = uncommitted.filter(_ != highest)
    val doomed = (staleCommitted ++ crashed).toSeq
    doomed.foreach(p => fs.delete(p, true))
    doomed.map(_.toString)
  }

  /** Diff two COMMITTED snapshot versions of a [[publishShards]] root —
    * the corpus-iteration observability op: "what changed between corpus
    * vA and vB" answered per id as `added` / `removed` / `changed`
    * (plus `unchanged` when `includeUnchanged`), so a publisher can
    * audit a re-curation before trainers consume it and a trainer can
    * invalidate caches for exactly the touched samples.
    *
    * Scale shape: each snapshot is scanned ONCE with columns pruned to
    * the id plus a ROW-LOCAL 64-bit content fingerprint
    * ([[graft.operators.KeyHash.key64]] over the JSON serialization of
    * the content columns — struct field order fixes the byte layout, and
    * a NULL column is omitted from the JSON while an empty string is
    * kept, so the two never collide), and the full-outer join on id
    * ships 16 bytes per row — never the content. At 100 TB the diff
    * costs two pruned scans plus one skeleton shuffle. Fingerprint
    * collision odds are ~2⁻⁶⁴ per pair; a publisher needing certainty
    * re-verifies the `changed` rows against content (a bounded set).
    * Parquet snapshots only — the default publish format; json/tar
    * consumers diff the parquet source they published from.
    */
  def diffVersions(spark: SparkSession, root: String, vA: Int, vB: Int,
                   idCol: String, contentCols: Seq[String],
                   includeUnchanged: Boolean = false): DataFrame = {
    require(contentCols.nonEmpty, "diffVersions: contentCols is empty")
    require(vA != vB, s"diffVersions: vA == vB == $vA")
    import org.apache.spark.sql.functions._
    def snap(v: Int): DataFrame = {
      val dir = new org.apache.hadoop.fs.Path(root, s"v$v")
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      require(fs.exists(new org.apache.hadoop.fs.Path(dir, "_MANIFEST.json")),
        s"diffVersions: $dir is not a committed snapshot")
      spark.read.parquet(dir.toString)
        .select(col(idCol), graft.operators.KeyHash.key64(
          to_json(struct(contentCols.map(col): _*))).as("fp"))
    }
    val out = snap(vA).withColumnRenamed("fp", "fp_a")
      .join(snap(vB).withColumnRenamed("fp", "fp_b"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("fp_a").isNull, lit("added"))
          .when(col("fp_b").isNull, lit("removed"))
          .when(col("fp_a") =!= col("fp_b"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
    if (includeUnchanged) out else out.filter(col("status") =!= "unchanged")
  }

  /** CDC MERGE apply (the lakehouse `MERGE INTO` primitive, batch
    * form): fold a change batch — full-row upserts and deletes — into a
    * keyed base snapshot. Per key, the WINNING change is the greatest
    * by `seqCols` (lexicographic, e.g. (commit_ts, change_seq)), with a
    * deterministic final tie-break on the change's full payload struct
    * (the AsofJoin convention — a tied sequence must not pick whichever
    * row shuffled last). `opCol == deleteOp` drops the key; any other
    * op replaces the base row with the change's payload; keys without
    * changes pass through; change keys absent from the base insert.
    *
    * `changes` must carry every base column plus `opCol` and `seqCols`;
    * the result has exactly the base schema.
    *
    * Scale shape: the winner election is a per-key window over the
    * CHANGE BATCH only (a day's changes, not the corpus); the base
    * contributes one key-partitioned anti-join — on a Warehouse
    * bucketed table that join rides the bucketing, so the base never
    * reshuffles and only the batch moves (the d12 registry discipline).
    */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCol: String,
                   seqCols: Seq[String], opCol: String,
                   deleteOp: String = "D"): DataFrame = {
    require(seqCols.nonEmpty, "applyChanges: no sequence columns")
    val baseCols = base.columns.toSeq
    val missing = (baseCols :+ opCol) ++ seqCols diff changes.columns.toSeq
    require(missing.isEmpty, s"applyChanges: changes lack columns $missing")
    import org.apache.spark.sql.expressions.Window
    val payload = org.apache.spark.sql.functions.struct(
      baseCols.filterNot(_ == keyCol).map(col): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy((seqCols.map(col(_).desc) :+ payload.desc :+
        col(opCol).desc): _*)
    val latest = changes
      .withColumn("__rn",
        org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("__rn") === 1)
    val survivors = base.join(
      latest.select(col(keyCol)), Seq(keyCol), "left_anti")
    val upserts = latest.filter(col(opCol) =!= lit(deleteOp))
      .select(baseCols.map(col): _*)
    survivors.unionByName(upserts)
  }

  /** Incremental MATERIALIZED-AGGREGATE maintenance — the metrics view
    * kept current without rescanning history (per-source token totals,
    * per-customer lifetime value, per-type event extents): a bucketed
    * registry stores one MERGEABLE partial state per (run, key) —
    * (n, sum, min, max), the closed-under-merge algebra that also
    * yields avg — and each day appends ONLY the day's partial
    * aggregation (key-cardinality rows, never the corpus). The
    * snapshot merges states with a bucket-colocated group-by: the scan
    * provides the key hash-partitioning, so the report NEVER shuffles
    * regardless of how many runs accumulated. Append-only like every
    * cross-run table; [[compactIfFragmented]] collapses run files when
    * the read-side merge grows (the L29 hook — merging partial states
    * via compaction is sound because the algebra is associative).
    *
    * Sums ride DECIMAL(38,6) from a DECIMAL(18,6) value cast — exact,
    * order-free merge (double sums would drift with run boundaries and
    * break both the oracle hash and run-order independence).
    */
  def createAggRegistry(spark: SparkSession, table: String,
                        buckets: Int = 8): Unit = {
    import spark.implicits._
    writeBucketed(
      Seq.empty[(String, Long, BigDecimal, BigDecimal, BigDecimal)]
        .toDF("key", "n", "sum", "mn", "mx")
        .select(col("key"), col("n"),
          col("sum").cast("decimal(38,6)").as("sum"),
          col("mn").cast("decimal(18,6)").as("mn"),
          col("mx").cast("decimal(18,6)").as("mx")),
      table, "key", buckets)
  }

  /** Partially aggregate a delta batch and append its states — one row
    * per key present in the batch. Null values are ignored (the SQL
    * aggregate convention); a key whose batch values are ALL null does
    * not appear in the appended states. Returns the number of state
    * rows appended, counted from the append's own delta files (one
    * bounded read — never a rescan of the accumulated table).
    */
  def appendAggDelta(delta: DataFrame, keyCol: String, valueCol: String,
                     table: String): Long = {
    val states = delta
      .select(col(keyCol).cast("string").as("key"),
        col(valueCol).cast("decimal(18,6)").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col("key"))
      .agg(org.apache.spark.sql.functions.count(col("__v")).as("n"),
        org.apache.spark.sql.functions.sum(col("__v"))
          .cast("decimal(38,6)").as("sum"),
        org.apache.spark.sql.functions.min(col("__v")).as("mn"),
        org.apache.spark.sql.functions.max(col("__v")).as("mx"))
    val files = appendBucketedWithDelta(states, table, "key")
    if (files.isEmpty) 0L
    else delta.sparkSession.read.parquet(files: _*).count()
  }

  /** The current view: all runs' states merged per key — n/sum add,
    * min/max fold; avg = sum/n is the caller's division. The group-by
    * rides the table's bucketing (no exchange — plan-guarded in spec).
    * Returns (key, n_rows, sum_value, min_value, max_value) with the
    * decimals surfaced as DOUBLE (the q01 reporting convention).
    */
  def aggSnapshot(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
      .groupBy(col("key"))
      .agg(org.apache.spark.sql.functions.sum(col("n")).as("n_rows"),
        org.apache.spark.sql.functions.sum(col("sum"))
          .cast("double").as("sum_value"),
        org.apache.spark.sql.functions.min(col("mn"))
          .cast("double").as("min_value"),
        org.apache.spark.sql.functions.max(col("mx"))
          .cast("double").as("max_value"))

  /** Drop a managed table AND its warehouse directory. With a
    * non-persistent (in-memory) catalog, a previous JVM's managed-table
    * directory survives while the catalog forgets it, and the next
    * CREATE TABLE fails with LOCATION_ALREADY_EXISTS — every index
    * (re)build goes through this first.
    */
  def dropTableAndLocation(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val p = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
