package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-run MEMBERSHIP-SKETCH registry (Bloom filter) — the fixed-bits
  * member of the cross-run family. The exact registries (d12 content
  * hashes, d22 lines, d26 chunks) answer "have I seen X" perfectly but
  * grow by one row per distinct item and store the item keys themselves;
  * this answers the same question in O(mBits) PER RUN regardless of item
  * count, stores NO keys (a registry that can be shared without leaking
  * its contents — the property that matters when the items are URLs or
  * user identifiers), and can only err in the safe direction: "no" is
  * always true, "maybe" is wrong with probability ≈ (1 − e^(−kn/m))^k.
  * The pipeline use is the cheap FIRST gate in front of an exact
  * registry — "definitely new" items skip the exact probe entirely.
  *
  * Shape per group: mBits bits chunked into 32-bit words stored in
  * BIGINTs (never sign-touched — both engines' `<<`, `&`, `bit_or` agree
  * exactly below 2^32). A key sets kProbes bits, bit i at position
  * `xxhash64(key64, i) & (mBits−1)`. Merge is `bit_or` per (group, word):
  * associative, commutative and IDEMPOTENT — union over N appended runs
  * is bit-identical to a one-pass filter over all their rows, and
  * re-appending the same run is a no-op on every report (unique in the
  * family: counters and histograms double on re-append, OR'd bits
  * cannot). Append-only like every cross-run table;
  * [[graft.sources.Warehouse.compact]] may fold rows per bucket without
  * changing any probe. Integer end to end → the driver oracle replays
  * append and probe value-exact.
  *
  * Geometry (mBits, kProbes) is a REGISTRY constant, stamped per append
  * as meta rows (word −1 → mBits, word −2 → kProbes); the probe fails
  * fast on a mismatch — bits set under a different geometry would turn
  * "definitely not seen" into a lie, the one error a Bloom filter must
  * never produce. Registry bucketed on group: the word merge rides the
  * bucketing (plan-guarded), probes take the merged words as kProbes
  * broadcast joins — the unbounded probe side is never shuffled.
  */
object BloomReg {

  /** Create the empty registry: (group STRING, word INT, bits BIGINT),
    * bucketed on group so appends and every probe co-locate.
    */
  def createBloomRegistry(spark: SparkSession, table: String,
                          buckets: Int = 8): Unit = {
    import spark.implicits._
    graft.sources.Warehouse.writeBucketed(
      Seq.empty[(String, Int, Long)].toDF("group", "word", "bits"),
      table, "group", buckets)
  }

  private def requireGeometry(mBits: Int, kProbes: Int): Unit = {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      s"mBits must be a power of two >= 64: $mBits")
    require(kProbes >= 1 && kProbes <= 16, s"kProbes out of [1,16]: $kProbes")
  }

  /** One run's filter rows (OR'd 32-bit words + the geometry meta rows per
    * group) — the shared build of [[appendBloom]] and the streaming probe,
    * factored so a probe can never address different bits than an append
    * set. Distinct keys hash once; the kProbes bit fan-out is codegen'd
    * column algebra.
    */
  private[graft] def bloomOf(df: DataFrame, groupCol: String, keyCol: String,
                             mBits: Int, kProbes: Int): DataFrame = {
    requireGeometry(mBits, kProbes)
    val keyed = df
      .filter(col(keyCol).isNotNull)
      .select(col(groupCol).cast("string").as("group"),
        col(keyCol).cast("string").as("__key"))
      .distinct()
      .select(col("group"), KeyHash.key64(col("__key")).as("__k"))
    val words = keyed
      .select(col("group"),
        explode(array((0 until kProbes).map { i =>
          val pos = KeyHash.derived(col("__k"), i)
            .bitwiseAND(lit((mBits - 1).toLong))
          struct(shiftright(pos, 5).cast("int").as("word"),
            call_function("shiftleft", lit(1L),
              pos.bitwiseAND(lit(31L)).cast("int")).as("bits"))
        }: _*)).as("__wb"))
      .groupBy(col("group"), col("__wb.word").as("word"))
      .agg(bit_or(col("__wb.bits")).as("bits"))
    val meta = keyed.select("group").distinct()
      .select(col("group"), explode(array(
        struct(lit(-1).as("word"), lit(mBits.toLong).as("bits")),
        struct(lit(-2).as("word"), lit(kProbes.toLong).as("bits")))).as("__m"))
      .select(col("group"), col("__m.word").as("word"),
        col("__m.bits").as("bits"))
    words.unionByName(meta)
  }

  /** Fold this run's keys into the filter per group and append. Returns
    * the number of (group, word) rows appended (meta rows excluded).
    */
  def appendBloom(df: DataFrame, groupCol: String, keyCol: String,
                  table: String, mBits: Int = 65536,
                  kProbes: Int = 4): Long = {
    val spark = df.sparkSession
    val delta = graft.sources.Warehouse.appendBucketedWithDelta(
      bloomOf(df, groupCol, keyCol, mBits, kProbes), table, "group")
    if (delta.isEmpty) 0L
    else spark.read.parquet(delta: _*).filter(col("word") >= 0).count()
  }

  /** Probe each (group, key) row against EVERY run ever appended:
    * might_contain = 1 iff all kProbes bits are set in the merged filter.
    * 0 is definitive (no false negatives — spec-pinned); 1 is "maybe" at
    * the geometry's false-positive rate. The merged word skeleton
    * (≤ groups·mBits/32 rows) broadcasts; the unbounded probe side is
    * never shuffled (kProbes single-column broadcast joins). Fails fast
    * if any appended run's geometry differs from (mBits, kProbes).
    */
  def mightContain(probes: DataFrame, groupCol: String, keyCol: String,
                   table: String, mBits: Int = 65536,
                   kProbes: Int = 4): DataFrame = {
    requireGeometry(mBits, kProbes)
    val spark = probes.sparkSession
    val reg = spark.table(table)
    val badMeta = reg.filter(col("word") < 0)
      .filter((col("word") === -1 && col("bits") =!= mBits.toLong) ||
        (col("word") === -2 && col("bits") =!= kProbes.toLong))
    require(badMeta.isEmpty,
      s"Bloom registry $table holds appends with geometry != " +
        s"($mBits, $kProbes); probing across geometries would fabricate " +
        "false negatives")
    val merged = reg.filter(col("word") >= 0)
      .groupBy("group", "word").agg(bit_or(col("bits")).as("bits"))
    // no distinct here: the probe side must stay shuffle-free (plan-
    // guarded) — callers own probe uniqueness, duplicates echo through
    val probed = probes
      .filter(col(keyCol).isNotNull)
      .select(col(groupCol).cast("string").as("group"),
        col(keyCol).cast("string").as("key"))
      .withColumn("__k", KeyHash.key64(col("key")))
    val withBits = (0 until kProbes).foldLeft(
      probed.withColumn("__hit", lit(true))) { (acc, i) =>
      val w = merged.select(col("group").as("__g"), col("word").as("__w"),
        col("bits").as(s"__b$i"))
      val pos = KeyHash.derived(col("__k"), i)
        .bitwiseAND(lit((mBits - 1).toLong))
      acc
        .withColumn("__word", shiftright(pos, 5).cast("int"))
        .withColumn("__mask",
          call_function("shiftleft", lit(1L),
            pos.bitwiseAND(lit(31L)).cast("int")))
        .join(broadcast(w),
          col("group") === col("__g") && col("__word") === col("__w"), "left")
        .withColumn("__hit",
          col("__hit") &&
            coalesce(col(s"__b$i"), lit(0L)).bitwiseAND(col("__mask")) =!= 0L)
        .drop("__g", "__w", s"__b$i", "__word", "__mask")
    }
    withBits.select(col("group"), col("key"),
      col("__hit").cast("int").as("might_contain"))
  }
}
