package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared 64-bit key derivation for the portable sketch registries
  * (Count–Min, Bloom): the same two-murmur convention the MinHash tier
  * uses for token hashes — high word `MurmurHash3.stringHash(s)` (Scala's
  * char-pair murmur3, seed 0xf7ca7fd2), low word `stringHash(s,
  * 0x9747b28c)` — so every engine replays it with the one string-hash
  * macro the oracle library already carries
  * ([[graft.queries.OracleHashLib]].g_scala_stringhash). Cell/bit
  * derivation then stays in native column algebra: `xxhash64(key, i)`
  * chains Spark's one-block xxh64 (`g_xxh64long` SQL-side), so only the
  * per-DISTINCT-key hash pays the O(len) scalar function — the per-cell
  * fan-out is codegen'd.
  */
object KeyHash {
  /** 64-bit key of a string, null-safe (null → null, uncounted). */
  val key64 = udf { (s: String) =>
    if (s == null) Option.empty[Long]
    else Some(
      (scala.util.hashing.MurmurHash3.stringHash(s).toLong << 32) |
        (scala.util.hashing.MurmurHash3.stringHash(s, 0x9747b28c).toLong
          & 0xFFFFFFFFL))
  }

  /** i-th derived 64-bit hash of a key column: `xxhash64(k, i)` — Spark's
    * seed-42 xxh64 folded over (key, i) as two LONGs, replayable as
    * `g_xxh64long(i, g_xxh64long(k, 42))`.
    */
  def derived(k64: Column, i: Int): Column = xxhash64(k64, lit(i.toLong))
}

/** Cross-run FREQUENCY-ESTIMATE registry (Count–Min sketch) — the
  * point-query member of the cross-run family. The heavy-hitter registry
  * (t43/t46) stores only the keys that cleared a heaviness cutoff: ask it
  * about anything else and it honestly answers "not stored". This answers
  * "ABOUT how often has key X appeared across every run ever appended" for
  * ANY key — token frequencies over months of crawls, URL hit counts, PII
  * pattern rates — at O(depth·width) integers per run regardless of how
  * many distinct keys the runs carried.
  *
  * Shape per group: a depth×width counter matrix. Every occurrence of a
  * key increments one counter per row (row r's column is
  * `xxhash64(key64, r) & (width−1)`); the estimate is the MIN over the
  * depth counters, which can only OVERcount (collisions add, never
  * subtract): estimate ≥ true count always, and
  * P(estimate > true + 2eN/width) < e^−depth — the classic CM guarantee.
  * Plain (non-conservative) update is deliberate: it is what makes merge
  * EXACT ADDITION, so a report over N appended runs is bit-identical to a
  * one-pass sketch over all their rows and the registry stays APPEND-ONLY
  * like every cross-run table (conservative update would estimate tighter
  * per run but merges would no longer equal one-pass). Integer end to end
  * — the same registry yields the same estimate in any SQL engine, which
  * is what lets the driver oracle replay append and report value-exact.
  *
  * Geometry (depth, width) is a REGISTRY constant: every append stamps one
  * meta row per group (row = −1, slot = depth, cnt = width) and the report
  * fails fast on a mismatch — two sketches of different width would merge
  * to silent UNDERcounts, the one error class a CM sketch must never
  * produce. Registry bucketed on group: the merge group-by rides the
  * bucketing (plan-guarded), the probe side takes the merged skeleton as a
  * depth-way broadcast — probes are never shuffled at all.
  */
object CountMin {

  /** Create the empty registry: (group STRING, row INT, slot INT,
    * cnt BIGINT), bucketed on group so appends and every report co-locate.
    */
  def createCmsRegistry(spark: SparkSession, table: String,
                        buckets: Int = 8): Unit = {
    import spark.implicits._
    graft.sources.Warehouse.writeBucketed(
      Seq.empty[(String, Int, Int, Long)].toDF("group", "row", "slot", "cnt"),
      table, "group", buckets)
  }

  private def requireGeometry(depth: Int, width: Int): Unit = {
    require(depth >= 1 && depth <= 16, s"depth out of [1,16]: $depth")
    require(width >= 2 && (width & (width - 1)) == 0,
      s"width must be a power of two: $width")
  }

  /** One run's sketch rows (counter cells + the geometry meta row per
    * group) — the shared build of [[appendCms]] and the streaming probe,
    * factored so a probe can never hash into different cells than an
    * append would. Distinct keys are hashed once (the scalar key64 UDF
    * runs per vocabulary entry); occurrence counts fan out to depth cells
    * in codegen'd column algebra.
    */
  private[graft] def cmsOf(df: DataFrame, groupCol: String, keyCol: String,
                           depth: Int, width: Int): DataFrame = {
    requireGeometry(depth, width)
    val byKey = df
      .filter(col(keyCol).isNotNull)
      .select(col(groupCol).cast("string").as("group"),
        col(keyCol).cast("string").as("__key"))
      .groupBy("group", "__key").agg(count(lit(1)).as("__c"))
      .select(col("group"), KeyHash.key64(col("__key")).as("__k"), col("__c"))
    val cells = byKey
      .select(col("group"), col("__c"),
        explode(array((0 until depth).map { r =>
          struct(lit(r).as("row"),
            KeyHash.derived(col("__k"), r).bitwiseAND(lit((width - 1).toLong))
              .cast("int").as("slot"))
        }: _*)).as("__cell"))
      .groupBy(col("group"), col("__cell.row").as("row"),
        col("__cell.slot").as("slot"))
      .agg(sum(col("__c")).as("cnt"))
    val meta = byKey.select("group").distinct()
      .select(col("group"), lit(-1).as("row"), lit(depth).as("slot"),
        lit(width.toLong).as("cnt"))
    cells.unionByName(meta)
  }

  /** Sketch this run's key occurrences per group and append. Returns the
    * number of (group, row, slot) cell rows appended (meta rows excluded).
    */
  def appendCms(df: DataFrame, groupCol: String, keyCol: String,
                table: String, depth: Int = 4, width: Int = 1024): Long = {
    val spark = df.sparkSession
    val delta = graft.sources.Warehouse.appendBucketedWithDelta(
      cmsOf(df, groupCol, keyCol, depth, width), table, "group")
    if (delta.isEmpty) 0L
    else spark.read.parquet(delta: _*).filter(col("row") >= 0).count()
  }

  /** Estimated occurrence count over EVERY appended run for each probe
    * (group, key) row: min over the depth merged counters, 0 when every
    * counter row is empty. Estimates can only overcount — est ≥ true
    * count, exactly true when none of the key's depth cells collided.
    * The merged skeleton (≤ groups·depth·width rows) broadcasts; probes
    * are never shuffled (depth single-column broadcast joins, no explode
    * / regroup on the unbounded side). Fails fast if any appended run's
    * geometry differs from (depth, width).
    */
  def cmsEstimates(probes: DataFrame, groupCol: String, keyCol: String,
                   table: String, depth: Int = 4,
                   width: Int = 1024): DataFrame = {
    requireGeometry(depth, width)
    val spark = probes.sparkSession
    val reg = spark.table(table)
    val badMeta = reg.filter(col("row") === -1)
      .filter(col("slot") =!= depth || col("cnt") =!= width.toLong)
    require(badMeta.isEmpty,
      s"CountMin registry $table holds appends with geometry != " +
        s"($depth, $width); merging mixed-width sketches would undercount")
    val merged = reg.filter(col("row") >= 0)
      .groupBy("group", "row", "slot").agg(sum(col("cnt")).as("cnt"))
    // no distinct here: the probe side must stay shuffle-free (plan-
    // guarded) — callers own probe uniqueness, duplicates echo through
    val probed = probes
      .filter(col(keyCol).isNotNull)
      .select(col(groupCol).cast("string").as("group"),
        col(keyCol).cast("string").as("key"))
      .withColumn("__k", KeyHash.key64(col("key")))
    val withCells = (0 until depth).foldLeft(
      probed.withColumn("__est", lit(Long.MaxValue))) { (acc, r) =>
      val cell = merged.filter(col("row") === r)
        .select(col("group").as("__g"), col("slot").as("__s"),
          col("cnt").as(s"__c$r"))
      acc
        .withColumn("__slot",
          KeyHash.derived(col("__k"), r).bitwiseAND(lit((width - 1).toLong))
            .cast("int"))
        .join(broadcast(cell),
          col("group") === col("__g") && col("__slot") === col("__s"), "left")
        .withColumn("__est",
          least(col("__est"), coalesce(col(s"__c$r"), lit(0L))))
        .drop("__g", "__s", s"__c$r", "__slot")
    }
    withCells.select(col("group"), col("key"), col("__est").as("cnt_est"))
  }
}
