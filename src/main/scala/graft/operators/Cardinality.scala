package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-run DISTINCT-cardinality registry — the sketch member of the
  * cross-run family (exact d12, MinHash d13, hamming d15, line d22,
  * chunk d26 all answer "have I SEEN this item"; this answers "how MANY
  * distinct items has each group ever sent" — distinct URLs per source,
  * distinct hosts per crawl, distinct users per day — without
  * rescanning any previous run).
  *
  * Each run appends one (group, HLL sketch) row per group — Spark's
  * native DataSketches HllSketch aggregate (`hll_sketch_agg`), NOT raw
  * values, so the registry grows by O(groups · 2^lgK) bytes per run
  * regardless of how many items the run carried. The report unions the
  * accumulated sketches per group (`hll_union_agg`) and estimates.
  * Union preserves the sketch's error guarantee (a report over two
  * appended runs estimates within the same bound as a one-pass sketch
  * over both runs' rows — spec-pinned; the REGISTERS may differ
  * slightly, so estimates are near- but not bit-equal), and it is
  * order-insensitive, so the registry is APPEND-ONLY like every other
  * cross-run table — no merge-rewrite,
  * crash-safe under the same bucketed-append contract, and
  * [[graft.sources.Warehouse.compact]] may later fold rows per bucket
  * without changing any estimate.
  *
  * Estimates are estimates (~1-2% relative error at the default
  * lgConfigK=12): the USE is trend/ratio observability (is a source's
  * distinct-URL count growing? what duplication factor does a crawl
  * carry?), never an exact gate — exact membership stays the d12-family
  * job. Error bound and determinism (same inputs → same sketch bytes)
  * are spec-pinned.
  */
object Cardinality {

  /** Create the empty registry: (group STRING, sketch BINARY), bucketed
    * on group so appends and the report group-by co-locate.
    */
  def createSketchRegistry(spark: SparkSession, table: String,
                           buckets: Int = 8): Unit = {
    import spark.implicits._
    graft.sources.Warehouse.writeBucketed(
      Seq.empty[(String, Array[Byte])].toDF("group", "sketch"),
      table, "group", buckets)
  }

  /** Sketch this run's values per group and append to the registry.
    * Returns the number of group rows appended.
    */
  def appendSketches(df: DataFrame, groupCol: String, valueCol: String,
                     table: String, lgConfigK: Int = 12): Long = {
    val spark = df.sparkSession
    val perGroup = df
      .select(col(groupCol).cast("string").as("group"),
        col(valueCol).cast("string").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy("group")
      .agg(hll_sketch_agg(col("__v"), lit(lgConfigK)).as("sketch"))
    val delta = graft.sources.Warehouse.appendBucketedWithDelta(
      perGroup, table, "group")
    if (delta.isEmpty) 0L else spark.read.parquet(delta: _*).count()
  }

  /** Estimated distinct values per group over EVERY run ever appended:
    * one bucketed scan, per-group sketch union, estimate. `groups` is
    * bounded (that is what makes a per-group registry sane), so the
    * group-by is skew-free by construction.
    */
  def distinctPerGroup(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
      .groupBy("group")
      .agg(hll_sketch_estimate(
        hll_union_agg(col("sketch"), lit(true))).as("n_distinct_est"))

  // ----------------------------------------------------------------------
  // Portable (engine-agnostic) sketch registry
  // ----------------------------------------------------------------------
  //
  // The DataSketches registry above is the high-accuracy production tier,
  // but its sketch bytes only mean something to an engine with DataSketches
  // bindings, and its estimator (HIP/composite interpolation) is not
  // reproducible outside the library. The PORTABLE registry trades a little
  // accuracy for a sketch any SQL engine can union and estimate with plain
  // integer arithmetic:
  //
  //  - values enter by 64-bit key, hashed with xxhash64 (seed 42 — the
  //    same one-block xxh64 Spark exposes natively and any engine can
  //    replay; OracleHashLib.g_xxh64long is the DuckDB macro);
  //  - a group's run-sketch is SPARSE (the sorted distinct hash list)
  //    until it exceeds `PortableSparseCap` distinct hashes, then DENSE
  //    (classic HLL registers: bucket = top PortableLgK hash bits,
  //    register = max over values of 1 + leading-zeros of the remaining
  //    bits). Sparse/dense promotion at union time is exact: a hash
  //    contributes the same register bit whether it arrives as a stored
  //    hash or was folded into a register at append time, so the unioned
  //    registers equal a one-pass sketch over all runs' rows — union is
  //    max, order-insensitive, append-only like every cross-run table;
  //  - the estimate is EXACT-INTEGER arithmetic end to end: below the cap
  //    the count of distinct hashes (exact), above it
  //    floor(alphaQ·m²·2^K / (Snum·2^30)) where Snum = Σ 2^(K−M[j]) is an
  //    integer (fits DECIMAL(38,0) here, HUGEINT in DuckDB) and alphaQ =
  //    round(α_m·2^30). No floating point anywhere → the same registry
  //    yields the same estimate in every engine, which is what makes the
  //    t42 driver gate a value-exact replay instead of a tolerance check.
  //
  // Accuracy: exact below the cap (2.5·m distinct); ~1.04/√m relative
  // error above it (m=256 → ~6.5%) — the classic raw-HLL bound, valid
  // precisely because the sparse cap keeps the raw estimator out of its
  // small-range bias regime. The production DataSketches tier stays the
  // choice when 1-2% error matters more than portability.

  /** Portable sketch geometry: m = 2^8 = 256 registers. */
  val PortableLgK = 8
  private val MReg = 1 << PortableLgK          // 256
  private val KBits = 64 - PortableLgK + 1     // 57: register values 0..57

  /** Distinct-hash count at which a sparse run-sketch densifies (2.5·m —
    * the classic regime boundary below which raw HLL needs linear
    * counting; below it we are simply exact instead).
    */
  val PortableSparseCap = 5 * MReg / 2         // 640

  /** α_256 · 2^30, rounded — the estimator's only real constant, kept as
    * an integer so every engine computes the identical estimate.
    */
  val PortableAlphaQ: Long =
    math.round(0.7213 / (1 + 1.079 / MReg) * (1L << 30))

  /** Numerator of the dense estimate: alphaQ · m² · 2^K (exact BigInt;
    * ~2^103, well inside DECIMAL(38,0)/HUGEINT).
    */
  val PortableNum: BigInt =
    BigInt(PortableAlphaQ) * MReg * MReg * (BigInt(1) << KBits)

  private val VrMask = (1L << (64 - PortableLgK)) - 1  // low 56 bits
  private val Pow57 = 1L << KBits                       // 2^57 fits long

  /** bucket (top lgK bits) and register value for a signed 64-bit hash
    * column: rho = 1 + leading zeros of the low 56 bits within their
    * window, computed via the binary-string length (bin() emits no
    * leading zeros, so 57 − length == 56 − bitlen + 1) — pure integer,
    * replayable as `length(format('{:b}', …))` in DuckDB.
    */
  private def bucketOf(h: org.apache.spark.sql.Column) =
    shiftrightunsigned(h, 64 - PortableLgK).cast("int")
  private def rhoOf(h: org.apache.spark.sql.Column) = {
    val vr = h.bitwiseAND(lit(VrMask))
    when(vr === 0L, lit(KBits)).otherwise(lit(KBits) - length(bin(vr)))
      .cast("int")
  }

  /** Create the empty portable registry:
    * (group STRING, hashes ARRAY&lt;BIGINT&gt;, regs ARRAY&lt;INT&gt;) —
    * exactly one of hashes/regs is non-null per row — bucketed on group.
    */
  def createPortableRegistry(spark: SparkSession, table: String,
                             buckets: Int = 8): Unit = {
    import spark.implicits._
    graft.sources.Warehouse.writeBucketed(
      Seq.empty[(String, Array[Long], Array[Int])]
        .toDF("group", "hashes", "regs"),
      table, "group", buckets)
  }

  /** Sketch this run's values per group (sparse hash list below the cap,
    * dense registers above) and append. `valueCol` must be castable to
    * BIGINT — the 64-bit key contract is what keeps the sketch portable.
    * Returns the number of group rows appended.
    */
  def appendPortableSketches(df: DataFrame, groupCol: String,
                             valueCol: String, table: String): Long = {
    val spark = df.sparkSession
    val delta = graft.sources.Warehouse.appendBucketedWithDelta(
      portableSketchOf(df, groupCol, valueCol), table, "group")
    if (delta.isEmpty) 0L else spark.read.parquet(delta: _*).count()
  }

  /** One run's portable sketch rows (group, hashes, regs) — the shared
    * build of [[appendPortableSketches]] and the streaming probe, factored
    * so a probe can never sketch differently than an append would.
    */
  private[graft] def portableSketchOf(df: DataFrame, groupCol: String,
                                      valueCol: String): DataFrame = {
    val hv = df
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("group"),
        xxhash64(col(valueCol).cast("long")).as("h"))
      .distinct()
    val cnt = hv.groupBy("group").agg(count(lit(1)).as("__n"))
    val sparse = hv
      .join(broadcast(cnt.filter(col("__n") <= PortableSparseCap)), "group")
      .groupBy("group")
      .agg(sort_array(collect_list(col("h"))).as("hashes"))
      .withColumn("regs", lit(null).cast("array<int>"))
      .select("group", "hashes", "regs")
    val dense = hv
      .join(broadcast(cnt.filter(col("__n") > PortableSparseCap)), "group")
      .select(col("group"), bucketOf(col("h")).as("b"), rhoOf(col("h")).as("mx"))
      .groupBy("group", "b").agg(max(col("mx")).as("mx"))
      .groupBy("group")
      .agg(map_from_entries(collect_list(struct(col("b"), col("mx"))))
        .as("__bm"))
      .select(col("group"), lit(null).cast("array<bigint>").as("hashes"),
        expr(s"transform(sequence(0, ${MReg - 1}), " +
          "i -> coalesce(element_at(__bm, i), 0))").as("regs"))
    sparse.unionByName(dense)
  }

  /** Estimated distinct values per group over every appended run: exact
    * distinct-hash count while the union stays under the sparse cap,
    * integer raw-HLL estimate once it (or any run) densified. One
    * bucketed scan; register fan-out is groups·m rows — skeleton-sized.
    */
  def distinctPerGroupPortable(spark: SparkSession,
                               table: String): DataFrame =
    portableEstimate(spark.table(table))

  /** Per-group distinct estimate of the registry AS IF `batch` had been
    * appended — the union rides in-plan (register max / hash-set union
    * commute, the sketch's defining property), the registry is NOT
    * touched. The novelty face of the cardinality family: estimate-with-
    * batch minus the registry's own estimate says how many NEW distincts
    * an ingest window brings, before committing its append. Probe-only
    * by construction; the batch sketch is built by the SAME factored
    * [[portableSketchOf]] as a real append, so probe-then-append can
    * never disagree with what the append will register.
    */
  def distinctPerGroupPortableWithBatch(batch: DataFrame, groupCol: String,
                                        valueCol: String,
                                        table: String): DataFrame =
    portableEstimate(batch.sparkSession.table(table)
      .unionByName(portableSketchOf(batch, groupCol, valueCol)))

  /** The estimate core over raw (group, hashes, regs) sketch rows. */
  private def portableEstimate(rows: DataFrame): DataFrame = {
    val hx = rows.filter(col("hashes").isNotNull)
      .select(col("group"), explode(col("hashes")).as("h")).distinct()
    val dcnt = hx.groupBy("group").agg(count(lit(1)).as("__d"))
    val runDense = rows.filter(col("regs").isNotNull)
      .select(col("group"), posexplode(col("regs")))
      .toDF("group", "b", "mx")
      .filter(col("mx") > 0)
    val denseG = runDense.select("group").distinct()
      .union(dcnt.filter(col("__d") > PortableSparseCap).select("group"))
      .distinct()
    val promoted = hx.join(broadcast(denseG), "group")
      .select(col("group"), bucketOf(col("h")).as("b"), rhoOf(col("h")).as("mx"))
    val regsAll = runDense.select("group", "b", "mx").unionByName(promoted)
      .groupBy("group", "b").agg(max(col("mx")).as("mx"))
    // Snum = (m − present)·2^57 + Σ 2^(57−M[j]) exactly, in DECIMAL(38,0);
    // estimate = floor(Num / (Snum·2^30)) via the pmod identity so the
    // decimal division is exact (the dividend is made divisible first).
    val s = regsAll.groupBy("group").agg(
      count(lit(1)).as("__present"),
      sum(expr(s"CAST(shiftleft(CAST(1 AS BIGINT), $KBits - mx) " +
        "AS DECIMAL(38,0))")).as("__sp"))
    val snum = (lit(MReg).cast("decimal(38,0)") - col("__present")) *
      lit(Pow57).cast("decimal(38,0)") + col("__sp")
    val den = (snum * lit(BigInt(2).pow(30).toLong).cast("decimal(38,0)"))
      .cast("decimal(38,0)")
    val num = lit(new java.math.BigDecimal(PortableNum.bigInteger))
      .cast("decimal(38,0)")
    val estDense = s.select(col("group"),
      ((num - pmod(num, den)) / den).cast("long").as("n_distinct_est"))
    val exact = dcnt.join(denseG, Seq("group"), "left_anti")
      .select(col("group"), col("__d").cast("long").as("n_distinct_est"))
    exact.unionByName(estDense)
  }
}
