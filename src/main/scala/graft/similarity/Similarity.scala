package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector similarity search over an `array<float>` embedding column.
  *
  * Three tiers:
  *  - [[cosine]]: exact pairwise scoring expression (higher-order functions,
  *    computed in double);
  *  - [[bruteForceKnn]]: exact top-k — one scan, broadcast query, a global
  *    TakeOrdered; the correctness baseline;
  *  - [[lshKnn]]: random-hyperplane LSH — prunes the scan to matching
  *    sign-buckets, the path that survives 100 TB (bucket pruning becomes a
  *    partition-pruning predicate when the table is written bucketed/
  *    partitioned by signature).
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated left-to-right in
    * double (deterministic, matches a sequential loop). Backed by the
    * codegen'd [[graft.functions.FloatDot]] Catalyst expression.
    */
  def dot(x: Column, y: Column): Column = graft.functions.FloatDot(x, y)

  /** Cosine similarity of two float-array columns. For joins, prefer
    * precomputing each side's norm once (see [[bruteForceKnn]]) — factoring
    * the norms out of the pair loop cuts the work by 2/3 without changing a
    * single double operation (so results stay bit-identical).
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Scaled-floor half-away-from-zero ROUND of a double column — DuckDB's
    * DOUBLE ROUND semantics (`round(v·10^s)/10^s`, the SCALED binary
    * value decides) mirrored in native column algebra: floor/ceil, fully
    * codegen'd, no UDF. Spark's `round()` renders through BigDecimal
    * HALF_UP on the decimal string, which diverges at scaled-boundary
    * values (0.7·0.3245 scales to exactly 2271.5 → DuckDB says 0.2272,
    * BigDecimal says 0.2271) — so every rounded quantity that feeds BOTH
    * a hash gate and downstream arithmetic (mmrRerank's rel/sim/score)
    * must round HERE, one semantics for all three. Long-range safe for
    * |v| ≤ 2^63/10^s — cosine-scale inputs by construction.
    */
  def duckRound(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    when(c >= 0, floor(c * p + lit(0.5)).cast("double") / p)
      .otherwise(ceil(c * p - lit(0.5)).cast("double") / p)
  }

  /** Exact top-k by cosine against one query vector (as a 1-row broadcast
    * DataFrame with column `qvec`). Ties broken by id for determinism.
    * Norms are computed once per side before the join — per pair only the
    * dot product remains.
    */
  def bruteForceKnn(emb: DataFrame, query: DataFrame, idCol: String, vecCol: String,
                    k: Int, roundTo: Int = 4): DataFrame =
    emb.withColumn("__norm_a", sqrt(dot(col(vecCol), col(vecCol))))
      .crossJoin(broadcast(query.withColumn("__norm_q", sqrt(dot(col("qvec"), col("qvec"))))))
      .select(col(idCol),
        round(dot(col(vecCol), col("qvec")) / (col("__norm_a") * col("__norm_q")), roundTo).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)

  /** HARD-NEGATIVE mining for embedding-model training — per anchor, the
    * top-k candidates whose cosine lands in [loSim, hiSim): similar
    * enough to be informative negatives, strictly below the near-
    * duplicate band so positives/copies are excluded (the standard
    * contrastive-training recipe: negatives that the current embedding
    * space already confuses are the ones worth training on). Anchors are
    * a bounded probe frame (the batched-serving contract) broadcast to a
    * single corpus scan; scoring is row-local with norms factored per
    * side, the band filter prunes BEFORE the only shuffle (band
    * survivors to per-anchor windows), and sims round to `roundTo`
    * before the band/rank cuts so both boundaries are engine-
    * deterministic (s01's convention; ties break by id).
    */
  def hardNegatives(emb: DataFrame, anchors: DataFrame, idCol: String,
                    vecCol: String, k: Int, loSim: Double, hiSim: Double,
                    roundTo: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(loSim < hiSim, s"empty band: [$loSim, $hiSim)")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("anchor_id")
      .orderBy(col("sim").desc, col(idCol))
    val a = broadcast(anchors
      .select(col(idCol).as("anchor_id"), col(vecCol).as("__avec"))
      .withColumn("__na", sqrt(dot(col("__avec"), col("__avec")))))
    emb.withColumn("__nb", sqrt(dot(col(vecCol), col(vecCol))))
      .crossJoin(a)
      .filter(col(idCol) =!= col("anchor_id"))
      .withColumn("sim",
        round(dot(col(vecCol), col("__avec")) / (col("__nb") * col("__na")),
          roundTo))
      .filter(col("sim") >= loSim && col("sim") < hiSim)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("anchor_id"), col("rank"), col(idCol).as("negative_id"),
        col("sim"))
  }

  /** One MMR selection: rank within the query's rerank, the chosen id,
    * its relevance, and the marginal score at selection time. Public so
    * whole-stage codegen can read the accessors (the Unigram.UniEnc
    * lesson: a private result case class silently drops the projection
    * to interpreter mode).
    */
  final case class MmrPick(mmr_rank: Int, cand_id: Long, rel: Double,
                           mmr_score: Double)

  /** MMR (maximal marginal relevance, Carbonell & Goldstein 1998)
    * diversified top-k reranking — the search-serving op that fixes
    * "my top 10 are ten near-copies of the same document": greedily pick
    * k of the topN relevance candidates, each pick maximizing
    * λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s) — relevance traded
    * against redundancy with what's already shown. In a dedup'd training
    * pipeline the same op diversifies retrieval-augmented context
    * selection.
    *
    * Determinism (the hash-gate contract): relevance and every pairwise
    * sim are ROUND(roundTo) before any comparison; the marginal score is
    * recomputed from those rounded inputs and rounded again before the
    * argmax; ties break by smallest id. The first pick's score is
    * λ·rel − (1−λ)·0 — one uniform formula, no special case for the
    * oracle to mirror.
    *
    * Scale shape: the batched-serving contract — queries broadcast to
    * ONE corpus scan, per-query topN via a rank≤N filter (map-side
    * WindowGroupLimit), and the O(topN²·k) greedy runs ROW-LOCAL per
    * query on its collected candidate slice (topN is require-bounded).
    * At 100 TB the corpus scan dominates; the rerank never touches more
    * than topN rows per query.
    */
  def mmrRerank(emb: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int, topN: Int, lambdaRel: Double,
                roundTo: Int = 4): DataFrame = {
    require(k >= 1, s"k=$k")
    require(topN >= k && topN <= 4096, s"topN=$topN (need k <= topN <= 4096)")
    require(lambdaRel > 0.0 && lambdaRel <= 1.0, s"lambdaRel=$lambdaRel")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(col("rel").desc, col(idCol))
    val q = broadcast(queries
      .select(col(idCol).as("query_id"), col(vecCol).as("__qvec"))
      .withColumn("__nq", sqrt(dot(col("__qvec"), col("__qvec")))))
    val cands = emb
      .withColumn("__nb", sqrt(dot(col(vecCol), col(vecCol))))
      .crossJoin(q)
      .filter(col(idCol) =!= col("query_id"))
      // duckRound, NOT Spark round: rel is both hash-gated output AND an
      // input to the greedy's λ·rel − (1−λ)·maxSim — it must share the
      // scaled-floor semantics sim and mmr_score already use, or a
      // boundary rel fails the gate and can flip a pick
      .withColumn("rel",
        duckRound(dot(col(vecCol), col("__qvec")) / (col("__nb") * col("__nq")),
          roundTo))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= topN)
      .select(col("query_id"), col(idCol).as("cand_id"), col("rel"),
        col(vecCol).as("__cvec"))
    val lam = lambdaRel
    val oneMinus = 1.0 - lambdaRel
    val kk = k
    val rt = roundTo
    val greedy = udf {
      (ids: Seq[Long], rels: Seq[Double], vecs: Seq[Seq[Float]]) =>
        // DuckDB's DOUBLE ROUND is round(v·10^s)/10^s with half away from
        // zero — the SCALED value decides (0.7·0.3245 scales to exactly
        // 2271.5 → 0.2272 even though the unscaled binary is below the
        // boundary; 0.7·0.3985 scales to 2789.4999… → 0.2789). Neither
        // BigDecimal path (valueOf decimal-string OR exact-binary)
        // reproduces both; the scaled-floor form does, verified against
        // the engine at the gate's own boundary cases.
        val pow = math.pow(10, rt)
        def rnd(v: Double): Double =
          (if (v >= 0) math.floor(v * pow + 0.5)
           else math.ceil(v * pow - 0.5)) / pow
        val n = ids.length
        val va = vecs.map(_.toArray).toArray
        val norms = va.map { v =>
          var s = 0.0; var i = 0
          while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
          math.sqrt(s)
        }
        def sim(a: Int, b: Int): Double = {
          val x = va(a); val y = va(b)
          var s = 0.0; var i = 0
          while (i < x.length) { s += x(i).toDouble * y(i).toDouble; i += 1 }
          rnd(s / (norms(a) * norms(b)))
        }
        val picked = new Array[Boolean](n)
        // TRUE max rounded sim to the selected set — may be negative, so
        // it only becomes defined after the first pick (the first pick's
        // redundancy term is exactly 0, one uniform formula)
        val maxSim = new Array[Double](n)
        var anySelected = false
        val out = scala.collection.mutable.ArrayBuffer.empty[MmrPick]
        var r = 1
        while (r <= math.min(kk, n)) {
          var bi = -1
          var bs = Double.NegativeInfinity
          var i = 0
          while (i < n) {
            if (!picked(i)) {
              val ms = if (anySelected) maxSim(i) else 0.0
              val s = rnd(lam * rels(i) - oneMinus * ms)
              if (s > bs || (s == bs && (bi < 0 || ids(i) < ids(bi)))) {
                bs = s; bi = i
              }
            }
            i += 1
          }
          picked(bi) = true
          out += MmrPick(r, ids(bi), rels(bi), bs)
          var j = 0
          while (j < n) {
            if (!picked(j)) {
              val sj = sim(j, bi)
              if (!anySelected || sj > maxSim(j)) maxSim(j) = sj
            }
            j += 1
          }
          anySelected = true
          r += 1
        }
        out.toSeq
    }
    cands.groupBy("query_id")
      .agg(collect_list("cand_id").as("__ids"),
        collect_list("rel").as("__rels"),
        collect_list("__cvec").as("__vecs"))
      .select(col("query_id"),
        explode(greedy(col("__ids"), col("__rels"), col("__vecs"))).as("p"))
      .select(col("query_id"), col("p.mmr_rank"), col("p.cand_id"),
        col("p.rel"), col("p.mmr_score"))
  }

  /** Johnson–Lindenstrauss projection of an embedding column to
    * `outDim` dims (codegen'd [[graft.functions.ProjectVec]] kernel) —
    * the build-time materialization for [[bruteForceKnnProjected]]: at
    * corpus scale the projected column is WRITTEN once next to the
    * original, and candidate scans then touch outDim/dim of the
    * multiply budget.
    */
  def projectEmbeddings(df: DataFrame, vecCol: String, outCol: String,
                        dim: Int, outDim: Int, seed: Long = 42L): DataFrame =
    df.withColumn(outCol,
      graft.functions.ProjectVec(col(vecCol), dim, outDim, seed))

  /** Brute-force kNN with a JL-projected candidate stage: rank ALL
    * vectors by projected cosine (outDim/dim of the full multiply
    * cost), overfetch `k·overfetch` candidates, then rerank EXACTLY on
    * the original vectors with [[bruteForceKnn]]'s arithmetic — the
    * returned top-k matches the exact scan whenever the true k-th
    * neighbor survives the projected overfetch (JL keeps relative
    * distances within (1±ε) whp; recall is spec-gated, and `overfetch`
    * is the recall knob). Deterministic at any partitioning: the
    * projection matrix is seed-derived, both rankings break ties by id.
    */
  def bruteForceKnnProjected(emb: DataFrame, query: DataFrame, idCol: String,
                             vecCol: String, k: Int, dim: Int,
                             projDim: Int = 16, overfetch: Int = 4,
                             seed: Long = 42L, roundTo: Int = 4): DataFrame = {
    require(projDim >= 1 && projDim <= dim, s"projDim out of [1, $dim]: $projDim")
    require(overfetch >= 1, s"overfetch must be >= 1: $overfetch")
    val pv = graft.functions.ProjectVec(col(vecCol), dim, projDim, seed)
    val pq = graft.functions.ProjectVec(col("qvec"), dim, projDim, seed)
    val q = broadcast(query.select(pq.as("__qp"), col("qvec"))
      .withColumn("__norm_qp", sqrt(dot(col("__qp"), col("__qp")))))
    // the candidate score rounds to 4 decimals before the cut (the s01
    // float discipline): the overfetch BOUNDARY is then deterministic
    // under the (psim, id) total order on any engine
    val cands = emb.withColumn("__p", pv)
      .withColumn("__norm_p", sqrt(dot(col("__p"), col("__p"))))
      .crossJoin(q)
      .select(col(idCol), round(dot(col("__p"), col("__qp")) /
        (col("__norm_p") * col("__norm_qp")), roundTo).as("__psim"))
      .orderBy(col("__psim").desc, col(idCol))
      .limit(k * overfetch)
    bruteForceKnn(emb.join(broadcast(cands.select(idCol)), Seq(idCol), "left_semi"),
      query, idCol, vecCol, k, roundTo)
  }

  /** Random-hyperplane signature: `bits` sign bits of projections onto
    * deterministic pseudo-random directions, packed into a long.
    * (Single-table form, kept for specs; the scan path uses
    * [[hyperplaneSignatures]], which computes every table in one pass.)
    */
  def hyperplaneSignature(vec: Column, dim: Int, bits: Int = 16, seed: Long = 7L): Column = {
    val dirs = directions(dim, bits, seed)
    val projections = dirs.zipWithIndex.map { case (dir, i) =>
      val d = aggregate(zip_with(vec, lit(dir), (p, q) => p.cast("double") * q),
        lit(0.0), (acc, v) => acc + v)
      when(d >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    projections.reduce(_ + _)
  }

  private[graft] def directions(dim: Int, bits: Int, seed: Long): Seq[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(bits)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** All `tables` hyperplane signatures in ONE pass over the vector,
    * evaluated by the codegen'd [[graft.functions.HyperplaneSigs]]
    * expression (primitive loop over a flat direction matrix — no UDF
    * boxing). Element t carries the table index in its high bits, so
    * "matches the query in ANY table" is a single native (codegen'd)
    * `arrays_overlap` — and the exploded form of this column is the bucket
    * key for [[graft.sources.Warehouse.writeBucketed]]. Table t's low
    * `bits` equal [[hyperplaneSignature]] with seed 7+t (spec-checked).
    */
  def hyperplaneSignatures(vec: Column, dim: Int, bits: Int = 12, tables: Int = 4,
                           seed: Long = 7L): Column =
    graft.functions.HyperplaneSigs(vec, dim, bits, tables, seed)

  /** Approximate top-k: candidates share the query's signature bucket in at
    * least one of `tables` independent hyperplane tables, then exact cosine
    * rerank.
    *
    * Scale shape: ONE scan of `emb` computes all table signatures
    * ([[hyperplaneSignatures]]); the any-table-matches rule is one native
    * `arrays_overlap` against the broadcast query's signatures — no
    * per-table rescan, no union, no dropDuplicates. At warehouse scale,
    * materialize the exploded signature column once and bucket by it
    * ([[lshProbeBucketed]]) so a probe prunes buckets instead of scanning.
    */
  def lshKnn(emb: DataFrame, query: DataFrame, idCol: String, vecCol: String,
             k: Int, dim: Int, bits: Int = 12, tables: Int = 4): DataFrame = {
    val q = query
      .withColumn("__qsigs", hyperplaneSignatures(col("qvec"), dim, bits, tables))
      .withColumn("__norm_q", sqrt(dot(col("qvec"), col("qvec"))))
    emb.withColumn("__sigs", hyperplaneSignatures(col(vecCol), dim, bits, tables))
      .crossJoin(broadcast(q))
      .filter(arrays_overlap(col("__sigs"), col("__qsigs")))
      .withColumn("__norm_a", sqrt(dot(col(vecCol), col(vecCol))))
      .select(col(idCol),
        round(dot(col(vecCol), col("qvec")) / (col("__norm_a") * col("__norm_q")), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Materialize the LSH index as a bucketed table: one row per (vector,
    * table-signature), bucketed by signature. A probe then filters on
    * `sig IN (query signatures)` — with bucketed parquet that is bucket
    * pruning (the scan reads only `tables` of the `buckets` buckets, no
    * Exchange, no full scan), which is the 100 TB probe path.
    */
  def writeLshIndex(emb: DataFrame, idCol: String, vecCol: String, table: String,
                    dim: Int, bits: Int = 12, tables: Int = 4, buckets: Int = 64,
                    seed: Long = 7L): Unit = {
    val exploded = emb
      .withColumn("sig", explode(hyperplaneSignatures(col(vecCol), dim, bits, tables, seed)))
    graft.sources.Warehouse.writeBucketed(exploded, table, "sig", buckets)
    // tiny sibling holding the signature parameters, so appends can never
    // hash with a different geometry than the build (the LSH twin of the
    // IVF index's persisted centroid matrix); drop location first — a
    // previous JVM's managed dir survives the in-memory catalog
    val spark = emb.sparkSession
    import spark.implicits._
    graft.sources.Warehouse.dropTableAndLocation(spark, s"${table}_lshspec")
    Seq((dim, bits, tables, seed)).toDF("dim", "bits", "tables", "seed")
      .coalesce(1)
      .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_lshspec")
  }

  /** Append new vectors to a [[writeLshIndex]] table WITHOUT rebuilding:
    * hyperplane signatures are data-INDEPENDENT (fixed pseudo-random
    * directions derived from the persisted seed), so an append is exactly
    * signature computation over the new batch plus a bucketed append —
    * nothing about the existing rows changes, and a probe over the grown
    * index returns exactly what a fresh full build with the same
    * parameters would. Signature geometry (dim/bits/tables/seed) is read
    * from the `<table>_lshspec` sibling and the bucket count from the
    * table's own catalog spec, so an append can never mismatch the build.
    * Unlike [[appendToIvfIndex]] there is no drift contract at all: no
    * centroids exist to go stale. Same single-writer-at-a-time rule as
    * the other appends; compact accumulated append files with
    * [[graft.sources.Warehouse.compact]].
    */
  def appendToLshIndex(newRows: DataFrame, idCol: String, vecCol: String,
                       table: String): Unit = {
    val spark = newRows.sparkSession
    val s = spark.table(s"${table}_lshspec").head()
    val (dim, bits, tables, seed) = (s.getInt(0), s.getInt(1), s.getInt(2), s.getLong(3))
    val buckets = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec.map(_.numBuckets).getOrElse(64)
    graft.sources.Warehouse.alignBuckets(
        newRows.withColumn("sig",
          explode(hyperplaneSignatures(col(vecCol), dim, bits, tables, seed))),
        "sig", buckets)
      .write
      .bucketBy(buckets, "sig")
      .sortBy("sig")
      .mode("append")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Probe a [[writeLshIndex]] table: candidates via bucket-pruned signature
    * lookup, then exact cosine rerank.
    *
    * Signature geometry comes from the index's own `<table>_lshspec`
    * sibling when it exists — so a probe can never hash its query with a
    * different seed (or dim/bits/tables) than the build did, the exact
    * mismatch that would silently return near-zero-recall results. The
    * explicit parameters apply only to pre-spec indexes without the
    * sibling.
    *
    * For the pruning to reach the scan (SelectedBucketsCount < buckets in
    * the plan), set `spark.sql.sources.bucketing.autoBucketedScan.enabled=
    * false` for probe sessions: Spark's DisableUnnecessaryBucketedScan
    * heuristic only credits bucketing toward joins/aggregations and would
    * silently fall back to a full scan for a pure filter probe.
    */
  /** MULTI-PROBE serving over a [[writeLshIndex]] table (Lv et al., VLDB
    * 2007): probe the query's own bucket per table PLUS the `nProbes − 1`
    * next-most-likely buckets — the signatures reached by flipping the
    * lowest-|margin| sign bits (a near neighbor that disagrees with the
    * query in some bit almost always disagrees where the query's
    * projection was nearly zero). Recall rises WITHOUT building more
    * tables: the index, its storage, and its write path are unchanged;
    * only the probe's `IN` list grows from `tables` to
    * `tables × nProbes` signatures, still a bucket-pruned read.
    *
    * Perturbation sets are ranked by the sum of flipped margins over the
    * `min(bits, 10)` weakest bits (≤ 1024 subsets enumerated driver-side
    * per table — the query is one row; this is probe-time math, not a
    * scan). `nProbes = 1` is exactly [[lshProbeBucketed]]'s candidate
    * set, and the candidate set GROWS monotonically in `nProbes` — the
    * spec pins the superset property and the recall order.
    *
    * Requires the index's `<table>_lshspec` sibling (any index written by
    * [[writeLshIndex]] has one): multi-probe margins must use exactly the
    * build's directions or the flips are meaningless.
    */
  def lshProbeBucketedMulti(spark: org.apache.spark.sql.SparkSession,
                            table: String, query: DataFrame, idCol: String,
                            vecCol: String, k: Int,
                            nProbes: Int = 8): DataFrame = {
    require(nProbes >= 1, s"lshProbeBucketedMulti: nProbes=$nProbes")
    require(spark.catalog.tableExists(s"${table}_lshspec"),
      s"lshProbeBucketedMulti: ${table}_lshspec missing — multi-probe " +
        "needs the build's signature geometry")
    val sp = spark.table(s"${table}_lshspec").head()
    val (d, b, t, s) = (sp.getInt(0), sp.getInt(1), sp.getInt(2), sp.getLong(3))
    val qvec = query.select(col("qvec")).head().getSeq[Float](0).toArray
    val probeSigs = (0 until t).flatMap { ti =>
      val dirs = directions(d, b, s + ti)
      val proj = dirs.map { dir =>
        var acc = 0.0
        var i = 0
        val n = math.min(qvec.length, d)
        while (i < n) { acc += qvec(i).toDouble * dir(i); i += 1 }
        acc
      }.toArray
      val base = proj.zipWithIndex.foldLeft(0L) { case (sig, (p, j)) =>
        if (p >= 0) sig | (1L << j) else sig
      }
      val weakest = proj.zipWithIndex.map { case (p, j) => (math.abs(p), j) }
        .sortBy(_._1).take(math.min(b, 10))
      val subsets = (0 until (1 << weakest.length)).map { mask =>
        var score = 0.0
        var flip = 0L
        var j = 0
        while (j < weakest.length) {
          if ((mask & (1 << j)) != 0) { score += weakest(j)._1; flip |= 1L << weakest(j)._2 }
          j += 1
        }
        (score, flip)
      }
      subsets.sortBy(_._1).take(nProbes)
        .map { case (_, flip) => (ti.toLong << b) | (base ^ flip) }
    }
    val q = broadcast(query.withColumn("__norm_q", sqrt(dot(col("qvec"), col("qvec")))))
    spark.table(table)
      .filter(col("sig").isin(probeSigs: _*))
      .dropDuplicates(idCol)
      .crossJoin(q)
      .withColumn("__norm_a", sqrt(dot(col(vecCol), col(vecCol))))
      .select(col(idCol),
        round(dot(col(vecCol), col("qvec")) / (col("__norm_a") * col("__norm_q")), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  def lshProbeBucketed(spark: org.apache.spark.sql.SparkSession, table: String,
                       query: DataFrame, idCol: String, vecCol: String,
                       k: Int, dim: Int, bits: Int = 12, tables: Int = 4,
                       seed: Long = 7L): DataFrame = {
    val (d, b, t, s) =
      if (spark.catalog.tableExists(s"${table}_lshspec")) {
        val r = spark.table(s"${table}_lshspec").head()
        (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3))
      } else (dim, bits, tables, seed)
    val qsigs = query
      .select(explode(hyperplaneSignatures(col("qvec"), d, b, t, s)).as("sig"))
      .collect().map(_.getLong(0))
    val q = broadcast(query.withColumn("__norm_q", sqrt(dot(col("qvec"), col("qvec")))))
    spark.table(table)
      .filter(col("sig").isin(qsigs.toIndexedSeq: _*))
      .dropDuplicates(idCol)
      .crossJoin(q)
      .withColumn("__norm_a", sqrt(dot(col(vecCol), col(vecCol))))
      .select(col(idCol),
        round(dot(col(vecCol), col("qvec")) / (col("__norm_a") * col("__norm_q")), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** IVF-style ANN: partition vectors by nearest of `k` centroids (sampled
    * deterministically, then refined with `lloydIters` Lloyd iterations),
    * and search only the `probes` nearest centroid cells. The centroid
    * tables are the deliberate driver-side collects (≤ nCentroids×dim
    * values each, a few KB).
    *
    * Each Lloyd iteration is one distributed assign (tight-loop argmin UDF)
    * plus one per-cell mean. The mean goes through posexplode →
    * groupBy(cell, pos).avg, which partial-aggregates map-side, so the
    * shuffle carries only ~(partitions × cells × dim) pre-aggregated rows —
    * constant-size at any corpus scale. Cells that lose all members keep
    * their previous centroid.
    */
  def ivfAssign(emb: DataFrame, idCol: String, vecCol: String,
                nCentroids: Int = 16, lloydIters: Int = 1): (DataFrame, Array[(Int, Array[Double])]) = {
    // the dimension rides the seed collect (one fewer driver action —
    // every semantic-dedup/IVF path pays this per call)
    val seedRows = emb.orderBy(xxhash64(col(idCol))).limit(nCentroids)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(seedRows.nonEmpty, "ivfAssign: empty embedding input")
    val dim = seedRows(0).length
    var centroids = seedRows.zipWithIndex.map { case (v, i) => (i, v) }
    for (_ <- 0 until lloydIters) {
      val assigned = assignToCentroids(emb, vecCol, centroids, dim)
      val means = assigned
        .select(col("cell"), posexplode(col(vecCol)))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("col").cast("double")).as("m"))
        .collect()
      val updated = centroids.map { case (i, v) => (i, v.clone()) }
      for (r <- means)
        updated(r.getInt(0))._2(r.getInt(1)) = r.getDouble(2)
      centroids = updated
    }
    val assigned = assignToCentroids(emb, vecCol, centroids, dim)
    (assigned, centroids)
  }

  /** Cluster-balanced DIVERSITY SAMPLING (the SSL-prototypes /
    * SemDeDup-family corpus pruning step, Sorscher et al. 2022): k-means
    * the embedding space ([[ivfAssign]]), score every vector by cosine
    * distance to its own cluster centroid — its "prototypicality" — and
    * keep a per-cluster quota. `keep = "diverse"` retains the LEAST
    * prototypical members (prune the easy near-redundant core each
    * cluster accumulates — the published result is that this beats random
    * pruning at scale); `keep = "prototypical"` retains the cluster cores
    * (the curriculum/easy-subset variant). Deterministic: rounded distance
    * with the id as tie-break, no RNG.
    *
    * Scale shape: the centroid join is a broadcast of ≤ nCentroids rows;
    * the distance is one codegen'd [[graft.functions.FloatDot]] pass; the
    * per-cluster top-N runs [[graft.text.TextOps.sourceQuota]]'s salted
    * two-phase windows keyed on the cell, so a mega-cluster (and one
    * always emerges — embedding mass is never uniform) ranks
    * saltParts × perCluster rows in its final window instead of routing
    * every member through one task. Output keeps all input columns plus
    * `cell` and `dist`.
    */
  def clusterSample(emb: DataFrame, idCol: String, vecCol: String,
                    perCluster: Int, nCentroids: Int = 16,
                    lloydIters: Int = 2, keep: String = "diverse",
                    saltParts: Int = 32): DataFrame = {
    require(perCluster > 0 && saltParts > 0,
      s"perCluster=$perCluster saltParts=$saltParts")
    require(keep == "diverse" || keep == "prototypical", s"keep=$keep")
    val (assigned, centroids) = ivfAssign(emb, idCol, vecCol, nCentroids, lloydIters)
    clusterSampleFromAssigned(assigned, centroids, idCol, vecCol,
      perCluster, keep, saltParts)
  }

  /** [[clusterSample]]'s scoring half over a pre-computed assignment (the
    * [[ivfKnnFromAssigned]] split).
    */
  def clusterSampleFromAssigned(assigned: DataFrame,
                                centroids: Array[(Int, Array[Double])],
                                idCol: String, vecCol: String,
                                perCluster: Int, keep: String = "diverse",
                                saltParts: Int = 32): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val cdf = centroids.toSeq.map { case (i, v) => (i, v.map(_.toFloat).toSeq) }
      .toDF("cell", "__c")
    val scored = assigned.join(broadcast(cdf), "cell")
      .withColumn("dist",
        round(lit(1.0) - dot(col(vecCol), col("__c")) /
          (sqrt(dot(col(vecCol), col(vecCol))) * sqrt(dot(col("__c"), col("__c")))), 6))
      .drop("__c")
    val ord =
      if (keep == "diverse") Seq(col("dist").desc, col(idCol))
      else Seq(col("dist").asc, col(idCol))
    graft.operators.Skew.saltedTopN(scored, Seq(col("cell")), col(idCol),
      ord, perCluster, saltParts)
  }

  /** IVF top-k: assign every vector to its nearest centroid cell, find the
    * `probes` cells nearest the query, and run exact cosine only inside
    * those cells. At warehouse scale the `cell` column is a partition
    * column, so probing prunes partitions instead of filtering a scan.
    */
  def ivfKnn(emb: DataFrame, query: DataFrame, idCol: String, vecCol: String,
             k: Int, nCentroids: Int = 16, probes: Int = 4,
             lloydIters: Int = 1): DataFrame = {
    val (assigned, centroids) = ivfAssign(emb, idCol, vecCol, nCentroids, lloydIters)
    ivfKnnFromAssigned(assigned, centroids, query, idCol, vecCol, k, probes)
  }

  /** [[ivfKnn]]'s serve half over a PRE-COMPUTED assignment — exposed so
    * callers that need the trained centroids (exports, diagnostics) can
    * run ivfAssign themselves without the serve path drifting.
    */
  def ivfKnnFromAssigned(assigned: DataFrame,
                         centroids: Array[(Int, Array[Double])],
                         query: DataFrame, idCol: String, vecCol: String,
                         k: Int, probes: Int = 4): DataFrame = {
    val dim = centroids.head._2.length
    // cells nearest the query, ranked by squared distance
    val qAssigned = assignToCentroidsRanked(query, "qvec", centroids, dim, probes)
    val candidates = assigned.join(broadcast(qAssigned),
      array_contains(col("probe_cells"), col("cell")))
    candidates
      .withColumn("__norm_a", sqrt(dot(col(vecCol), col(vecCol))))
      .withColumn("__norm_q", sqrt(dot(col("qvec"), col("qvec"))))
      .select(col(idCol),
        round(dot(col(vecCol), col("qvec")) / (col("__norm_a") * col("__norm_q")), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Materialize the IVF index as a cell-PARTITIONED (and id-bucketed)
    * table, plus a tiny sibling `<table>_centroids` table holding the
    * trained centroid matrix. This is the warehouse form of [[ivfKnn]]'s
    * claim that "the cell column is a partition column": the one-time build
    * pays the Lloyd training and the full-corpus assignment ONCE, and every
    * subsequent probe is a partition-pruned read of `probes` of the
    * `nCentroids` cell directories — no per-query corpus scan, no per-query
    * seeding/means collect. Mirrors [[writeLshIndex]]/[[lshProbeBucketed]].
    */
  def writeIvfIndex(emb: DataFrame, idCol: String, vecCol: String, table: String,
                    nCentroids: Int = 16, lloydIters: Int = 1,
                    buckets: Int = 8): Unit = {
    val (assigned, centroids) = ivfAssign(emb, idCol, vecCol, nCentroids, lloydIters)
    graft.sources.Warehouse.writeBucketedPartitioned(assigned, table, "cell", idCol, buckets)
    val spark = emb.sparkSession
    import spark.implicits._
    centroids.toSeq.toDF("cell", "centroid")
      .coalesce(1)
      .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_centroids")
  }

  /** Trained centroids of a [[writeIvfIndex]] table (≤ nCentroids rows). */
  def readIvfCentroids(spark: org.apache.spark.sql.SparkSession,
                       table: String): Array[(Int, Array[Double])] =
    spark.table(s"${table}_centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).sortBy(_._1)

  /** Append new vectors to a [[writeIvfIndex]] table WITHOUT retraining:
    * rows are assigned against the persisted centroids — one codegen'd
    * [[graft.functions.NearestCentroid]] pass over the new batch only, no
    * Lloyd iterations, no touch of the existing index rows — and appended
    * into the cell-partitioned layout (bucket count read from the table's
    * own catalog spec, so an append can never mismatch the build). This is
    * what lets a daily-growing corpus keep serving [[ivfProbePartitioned]]
    * probes from a warm index instead of paying a full retrain+rewrite or
    * serving a stale one.
    *
    * Drift contract: appends never move centroids, so a shifting embedding
    * distribution degrades recall by inflating a few cells rather than by
    * returning wrong results (probes stay exact within the cells they
    * read). Monitor [[ivfCellSizes]] and re-train ([[writeIvfIndex]]) when
    * the max/mean cell ratio exceeds ~4× the post-build value — until
    * then, probe results over appended generations are exactly what a
    * fresh assignment against the same centroids would produce.
    */
  def appendToIvfIndex(newRows: DataFrame, idCol: String, vecCol: String,
                       table: String): Unit = {
    val spark = newRows.sparkSession
    val centroids = readIvfCentroids(spark, table)
    val buckets = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec.map(_.numBuckets).getOrElse(8)
    val assigned = assignToCentroids(newRows, vecCol, centroids,
      centroids.head._2.length)
    graft.sources.Warehouse.alignBuckets(assigned, idCol, buckets, "cell")
      .write
      .partitionBy("cell")
      .bucketBy(buckets, idCol)
      .sortBy(idCol)
      .mode("append")
      .format("parquet")
      .saveAsTable(table)
  }

  // Per-vector scalar quantization for the int8 IVF index: 256 levels
  // between the vector's own min and max. A one-time build-pass UDF (the
  // byte-array construction has no functions-API equivalent); the PROBE
  // side never runs it — scoring is the codegen'd Int8Dot kernel.
  private val quantizeUdf = udf { (v: Seq[Float]) =>
    var mn = Float.MaxValue
    var mx = Float.MinValue
    var i = 0
    val n = v.length
    while (i < n) { val x = v(i); if (x < mn) mn = x; if (x > mx) mx = x; i += 1 }
    val scale = math.max((mx - mn) / 255f, java.lang.Float.MIN_VALUE)
    val code = new Array[Byte](n)
    i = 0
    while (i < n) {
      val q = math.round((v(i) - mn) / scale)
      code(i) = (if (q < 0) 0 else if (q > 255) 255 else q).toByte
      i += 1
    }
    (code, scale, mn)
  }

  /** [[writeIvfIndex]] with int8-QUANTIZED cells: the cell-partitioned
    * index table stores, per vector, a one-byte-per-dimension scalar code
    * plus its (scale, offset) dequantization pair and the EXACT float
    * norm — 4× less data read per probed cell than raw float32 — while
    * the raw vectors live in a sibling `<table>_raw` table bucketed by id
    * that only the top-`shortlist` rerank touches. Standard
    * quantize-probe/exact-rerank split: the approximate scores order a
    * shortlist, the shortlist is re-scored from raw floats, so the final
    * top-k arithmetic is EXACTLY the uncompressed probe's (identical
    * rounding, identical ties) whenever the shortlist contains the true
    * top-k. Probe with [[ivfProbeQuantized]].
    */
  def writeIvfIndexQuantized(emb: DataFrame, idCol: String, vecCol: String,
                             table: String, nCentroids: Int = 16,
                             lloydIters: Int = 1, buckets: Int = 8): Unit = {
    val (assigned, centroids) = ivfAssign(emb, idCol, vecCol, nCentroids, lloydIters)
    val quantized = quantizedMain(assigned, idCol, vecCol)
    graft.sources.Warehouse.writeBucketedPartitioned(quantized, table, "cell", idCol, buckets)
    graft.sources.Warehouse.writeBucketed(
      emb.select(col(idCol), col(vecCol)), s"${table}_raw", idCol, buckets)
    val spark = emb.sparkSession
    import spark.implicits._
    // tiny metadata sibling (never an input): safe to self-guard against a
    // previous JVM's stale managed location, like the _pq/_lshspec twins;
    // main/_raw stay caller-owned because a REBUILD may read them as input
    graft.sources.Warehouse.dropTableAndLocation(spark, s"${table}_centroids")
    centroids.toSeq.toDF("cell", "centroid")
      .coalesce(1)
      .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_centroids")
  }

  // (id, cell, code, scale, offset, norm) rows of the int8 index — the one
  // construction both the build and the append run, so the two can never
  // store different layouts.
  private def quantizedMain(assigned: DataFrame, idCol: String,
                            vecCol: String): DataFrame =
    assigned
      .withColumn("__q", quantizeUdf(col(vecCol)))
      .withColumn("__norm", sqrt(dot(col(vecCol), col(vecCol))))
      .select(col(idCol), col("cell"), col("__q._1").as("code"),
        col("__q._2").as("scale"), col("__q._3").as("offset"),
        col("__norm").cast("float").as("norm"))

  // Bucket count of a persisted index, from the table's own catalog spec —
  // an append can never mismatch the build.
  private def catalogBuckets(spark: org.apache.spark.sql.SparkSession,
                             table: String): Int =
    spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec.map(_.numBuckets).getOrElse(8)

  // Shared append tail of the quantized tiers: cell-partitioned code rows
  // into the main table, raw vectors into the rerank sibling, both under
  // the catalog's bucket spec.
  private def appendCodesAndRaw(main: DataFrame, rawRows: DataFrame,
                                idCol: String, table: String,
                                buckets: Int): Unit = {
    graft.sources.Warehouse.alignBuckets(main, idCol, buckets, "cell")
      .write
      .partitionBy("cell")
      .bucketBy(buckets, idCol)
      .sortBy(idCol)
      .mode("append")
      .format("parquet")
      .saveAsTable(table)
    graft.sources.Warehouse.alignBuckets(rawRows, idCol, buckets)
      .write
      .bucketBy(buckets, idCol)
      .sortBy(idCol)
      .mode("append")
      .format("parquet")
      .saveAsTable(s"${table}_raw")
  }

  /** Append new vectors to a [[writeIvfIndexQuantized]] table WITHOUT
    * retraining — the int8 twin of [[appendToIvfIndexPq]]: rows are
    * assigned against the persisted centroids and scalar-quantized
    * per-vector (the int8 code carries its own (scale, offset) pair, so
    * unlike PQ there is no trained codebook to go stale), then appended
    * into both the cell-partitioned code table and the raw-vector rerank
    * sibling under the catalog's bucket spec. Probe results over appended
    * generations are exactly what a fresh build against the same
    * centroids would produce — same drift contract as
    * [[appendToIvfIndex]].
    */
  def appendToIvfIndexQuantized(newRows: DataFrame, idCol: String,
                                vecCol: String, table: String): Unit = {
    val spark = newRows.sparkSession
    val centroids = readIvfCentroids(spark, table)
    val buckets = catalogBuckets(spark, table)
    val assigned = assignToCentroids(newRows, vecCol, centroids,
      centroids.head._2.length)
    appendCodesAndRaw(quantizedMain(assigned, idCol, vecCol),
      newRows.select(col(idCol), col(vecCol)), idCol, table, buckets)
  }

  /** Probe a [[writeIvfIndexQuantized]] table: partition-pruned scan of
    * the `probes` nearest cells reads CODES (1 byte/dim + 12 bytes of
    * scalars), scores them with the codegen'd [[graft.functions.Int8Dot]]
    * kernel (approx dot = scale·Σcode·q + offset·Σq — exact for the
    * dequantized vector), keeps the top `shortlist` (default 4k)
    * candidates, and re-scores ONLY those from the raw-vector sibling
    * (an id-IN pruned read of `shortlist` rows) with the uncompressed
    * probe's exact arithmetic. Recall loss is confined to true-top-k
    * members the approximate order pushed below the shortlist boundary —
    * widen `shortlist` to trade read volume for recall.
    */
  def ivfProbeQuantized(spark: org.apache.spark.sql.SparkSession, table: String,
                        query: DataFrame, idCol: String, vecCol: String,
                        k: Int, probes: Int = 4, shortlist: Int = 0): DataFrame = {
    val centroids = readIvfCentroids(spark, table)
    val qvecs = query.select(col("qvec")).collect()
      .map(_.getSeq[Float](0).toArray)
    require(qvecs.length == 1, "ivfProbeQuantized serves one query vector " +
      "per call; use ivfProbeQuantizedBatch for batches")
    val cells = qvecs.flatMap(v => nearestCells(v, centroids, probes))
      .distinct.toIndexedSeq
    val sl = if (shortlist > 0) shortlist else 4 * k
    val q = broadcast(query
      .withColumn("__norm_q", sqrt(dot(col("qvec"), col("qvec"))))
      .withColumn("__sum_q", aggregate(col("qvec"), lit(0.0d), (acc, x) => acc + x)))
    val shortIds = spark.table(table)
      .filter(col("cell").isin(cells: _*))
      .crossJoin(q)
      .select(col(idCol),
        ((graft.functions.Int8Dot(col("code"), col("qvec")) * col("scale") +
          col("offset") * col("__sum_q")) / (col("norm") * col("__norm_q"))).as("__asim"))
      .orderBy(col("__asim").desc, col(idCol))
      .limit(sl)
      .select(col(idCol)).collect().map(_.get(0)).toIndexedSeq
    rerankShortlist(spark, table, query, idCol, vecCol, k, shortIds)
  }

  /** Per-subspace k-means codebooks for product quantization: `m`
    * subspaces of `dim/m` dimensions, up to `ksub` (≤256, byte-addressable)
    * centroids each, Lloyd-refined over a driver-side training sample (the
    * deliberate small collect, same tier as the IVF centroid matrix —
    * `trainRows × dim` floats). Deterministic: seeded shuffle picks the
    * initial centroids, empty clusters keep their previous centroid.
    */
  private[graft] def trainPqCodebooks(sample: Array[Array[Float]], m: Int,
                                      ksub: Int = 256, iters: Int = 8,
                                      seed: Long = 13L): Array[Array[Array[Float]]] = {
    val dim = sample.head.length
    val sub = dim / m
    Array.tabulate(m) { s =>
      val xs = sample.map(v => java.util.Arrays.copyOfRange(v, s * sub, (s + 1) * sub))
      val rng = new scala.util.Random(seed + s)
      var cents = rng.shuffle(xs.indices.toVector).take(ksub)
        .map(i => xs(i).clone).toArray
      for (_ <- 0 until iters) {
        val sums = Array.fill(cents.length)(new Array[Double](sub))
        val cnt = new Array[Int](cents.length)
        for (x <- xs) {
          var best = 0; var bd = Double.MaxValue
          var c = 0
          while (c < cents.length) {
            var d = 0.0; var j = 0
            while (j < sub) { val t = x(j) - cents(c)(j); d += t * t; j += 1 }
            if (d < bd) { bd = d; best = c }
            c += 1
          }
          cnt(best) += 1
          var j = 0
          while (j < sub) { sums(best)(j) += x(j); j += 1 }
        }
        cents = Array.tabulate(cents.length) { c =>
          if (cnt(c) == 0) cents(c)
          else Array.tabulate(sub)(j => (sums(c)(j) / cnt(c)).toFloat)
        }
      }
      cents
    }
  }

  /** [[writeIvfIndex]] with PRODUCT-QUANTIZED cells: each vector is stored
    * as `m` one-byte codebook indices (one per `dim/m`-dimensional
    * subspace; codebooks trained on a `trainRows` sample) plus its exact
    * float norm — `~4·dim/m×` less data read per probed cell than raw
    * float32, the tier past int8's 4× ceiling — while raw vectors live in
    * the id-bucketed `<table>_raw` sibling that only the shortlist rerank
    * touches. Siblings: `<table>_centroids` (IVF) and `<table>_pq`
    * (codebooks). Probe with [[ivfProbePq]].
    */
  def writeIvfIndexPq(emb: DataFrame, idCol: String, vecCol: String,
                      table: String, nCentroids: Int = 16, lloydIters: Int = 1,
                      buckets: Int = 8, m: Int = 16,
                      trainRows: Int = 20000): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val (assigned, centroids) = ivfAssign(emb, idCol, vecCol, nCentroids, lloydIters)
    val dim = centroids.head._2.length
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val sample = emb.orderBy(xxhash64(col(idCol))).limit(trainRows)
      .select(col(vecCol)).collect().map(_.getSeq[Float](0).toArray)
    val books = trainPqCodebooks(sample, m)
    val encode = pqEncodeUdf(spark, books)
    val main = assigned
      .withColumn("code", encode(col(vecCol)))
      .withColumn("norm", sqrt(dot(col(vecCol), col(vecCol))).cast("float"))
      .select(col(idCol), col("cell"), col("code"), col("norm"))
    graft.sources.Warehouse.writeBucketedPartitioned(main, table, "cell", idCol, buckets)
    graft.sources.Warehouse.writeBucketed(
      emb.select(col(idCol), col(vecCol)), s"${table}_raw", idCol, buckets)
    graft.sources.Warehouse.dropTableAndLocation(spark, s"${table}_centroids")
    centroids.toSeq.toDF("cell", "centroid")
      .coalesce(1)
      .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_centroids")
    graft.sources.Warehouse.dropTableAndLocation(spark, s"${table}_pq")
    books.zipWithIndex.flatMap { case (cents, s) =>
      cents.zipWithIndex.map { case (cent, c) => (s, c, cent.toSeq) }
    }.toSeq.toDF("sub", "cid", "centroid")
      .coalesce(1)
      .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_pq")
  }

  // PQ encode (argmin per subspace) over broadcast codebooks — a
  // build/append-pass UDF, mirroring the int8 tier's quantizeUdf: probes
  // never run it.
  private def pqEncodeUdf(spark: org.apache.spark.sql.SparkSession,
                          books: Array[Array[Array[Float]]]) = {
    val bc = spark.sparkContext.broadcast(books)
    udf { (v: Seq[Float]) =>
      val bs = bc.value
      val sub = v.length / bs.length
      val out = new Array[Byte](bs.length)
      var s = 0
      while (s < bs.length) {
        val cents = bs(s)
        var best = 0; var bd = Double.MaxValue
        var c = 0
        while (c < cents.length) {
          var d = 0.0; var j = 0
          while (j < sub) { val t = v(s * sub + j) - cents(c)(j); d += t * t; j += 1 }
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        out(s) = best.toByte
        s += 1
      }
      out
    }
  }

  // Codebooks of a writeIvfIndexPq table, re-assembled [m][ksub][subDim].
  private def readPqCodebooks(spark: org.apache.spark.sql.SparkSession,
                              table: String): Array[Array[Array[Float]]] = {
    val rows = spark.table(s"${table}_pq").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val m = rows.iterator.map(_._1).max + 1
    Array.tabulate(m) { s =>
      rows.filter(_._1 == s).sortBy(_._2).map(_._3)
    }
  }

  // Per-query PQ lookup table: lut[s·256 + c] = dot(q_sub[s], codebook[s][c]).
  // Shared by the single and batched PQ probes so the scoring arithmetic
  // can never diverge between them. Rejects a query whose dimension does
  // not match the index's (m × subDim) — a wrong-embedding-model probe
  // must fail loudly, not silently score garbage subvector boundaries.
  private def pqLut(q: Array[Float], books: Array[Array[Array[Float]]]): Array[Float] = {
    val m = books.length
    val sub = books.head.head.length
    require(q.length == m * sub,
      s"query dim ${q.length} does not match the index's ${m}×$sub = ${m * sub}")
    val lut = new Array[Float](m * 256)
    for (s <- books.indices; c <- books(s).indices) {
      var d = 0.0; var j = 0
      while (j < sub) { d += q(s * sub + j).toDouble * books(s)(c)(j); j += 1 }
      lut((s << 8) | c) = d.toFloat
    }
    lut
  }

  // Exact top-k rerank of a driver-small shortlist from the raw-vector
  // sibling — the shared tail of every quantized probe (int8 and PQ), so
  // the returned rows' arithmetic (rounding, ties) is one code path.
  private def rerankShortlist(spark: org.apache.spark.sql.SparkSession,
                              table: String, query: DataFrame, idCol: String,
                              vecCol: String, k: Int,
                              shortIds: IndexedSeq[Any]): DataFrame =
    spark.table(s"${table}_raw")
      .filter(col(idCol).isin(shortIds: _*))
      .crossJoin(broadcast(query.withColumn("__norm_q", sqrt(dot(col("qvec"), col("qvec"))))))
      .withColumn("__norm_a", sqrt(dot(col(vecCol), col(vecCol))))
      .select(col(idCol),
        round(dot(col(vecCol), col("qvec")) / (col("__norm_a") * col("__norm_q")), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)

  /** Append new vectors to a [[writeIvfIndexPq]] table WITHOUT
    * retraining: rows are assigned against the persisted IVF centroids
    * and ENCODED against the persisted codebooks — neither moves on
    * append, the same grow-don't-retrain contract as
    * [[appendToIvfIndex]] — then appended into both the cell-partitioned
    * code table and the raw-vector rerank sibling under the catalog's
    * bucket spec. Drift: a shifting distribution degrades the APPROXIMATE
    * order (larger quantization error against stale codebooks), never
    * the returned rows' arithmetic (the rerank reads raw floats); widen
    * `shortlist` or retrain on the [[ivfCellSizes]] signal as with the
    * uncompressed index.
    */
  def appendToIvfIndexPq(newRows: DataFrame, idCol: String, vecCol: String,
                         table: String): Unit = {
    val spark = newRows.sparkSession
    val centroids = readIvfCentroids(spark, table)
    val books = readPqCodebooks(spark, table)
    val buckets = catalogBuckets(spark, table)
    val encode = pqEncodeUdf(spark, books)
    val assigned = assignToCentroids(newRows, vecCol, centroids,
      centroids.head._2.length)
    val main = assigned
      .withColumn("code", encode(col(vecCol)))
      .withColumn("norm", sqrt(dot(col(vecCol), col(vecCol))).cast("float"))
      .select(col(idCol), col("cell"), col("code"), col("norm"))
    appendCodesAndRaw(main, newRows.select(col(idCol), col(vecCol)),
      idCol, table, buckets)
  }

  /** Probe a [[writeIvfIndexPq]] table: the query's per-subspace
    * dot-product lookup table (m×256 floats) is computed driver-side
    * against the persisted codebooks, the partition-pruned cell scan
    * scores each m-byte code with the codegen'd
    * [[graft.functions.PqDot]] kernel (approx dot = Σ lut[s·256+code_s]),
    * and the top `shortlist` (default 4k) candidates are exact-reranked
    * from the raw-vector sibling with the uncompressed probe's exact
    * arithmetic — identical recall mechanics to [[ivfProbeQuantized]] at
    * a fraction of its read. One query vector per call (the LUT is
    * per-query by construction; batch probes loop).
    */
  def ivfProbePq(spark: org.apache.spark.sql.SparkSession, table: String,
                 query: DataFrame, idCol: String, vecCol: String,
                 k: Int, probes: Int = 4, shortlist: Int = 0): DataFrame = {
    import spark.implicits._
    val centroids = readIvfCentroids(spark, table)
    val qv = query.select(col("qvec")).collect().map(_.getSeq[Float](0).toArray)
    require(qv.length == 1, "ivfProbePq serves one query vector per call")
    val q = qv.head
    val cells = nearestCells(q, centroids, probes).toIndexedSeq
    val sl = if (shortlist > 0) shortlist else 4 * k
    val books = readPqCodebooks(spark, table)
    val lut = pqLut(q, books)
    val qNorm = math.sqrt(q.foldLeft(0.0)((acc, x) => acc + x.toDouble * x))
    val qDf = broadcast(Seq((q.toSeq, lut.toSeq)).toDF("qvec", "__lut"))
    val shortIds = spark.table(table)
      .filter(col("cell").isin(cells: _*))
      .crossJoin(qDf)
      .select(col(idCol),
        (graft.functions.PqDot(col("code"), col("__lut")) / (col("norm") * lit(qNorm))).as("__asim"))
      .orderBy(col("__asim").desc, col(idCol))
      .limit(sl)
      .select(col(idCol)).collect().map(_.get(0)).toIndexedSeq
    rerankShortlist(spark, table, query, idCol, vecCol, k, shortIds)
  }

  /** Batched probe of a [[writeIvfIndexPq]] table — the serving shape of
    * [[ivfProbePq]], mirroring [[ivfProbePartitionedBatch]]: per-query
    * LUTs and probe cells are computed driver-side from the persisted
    * codebooks/centroids (the query side is small by definition), the
    * union of probe cells is ONE static partition filter over the code
    * table, candidates score via `PqDot` against each query's broadcast
    * LUT, and the per-query top-`shortlist` union reranks exactly from
    * the raw sibling in one id-pruned read. Returns (probeIdCol, idCol,
    * sim), ≤ k rows per probe, with [[ivfProbePq]]'s exact arithmetic.
    *
    * Driver-bound contract: the batch's queries AND each CHUNK's
    * `queries × shortlist` candidate pairs are driver-resident (LUTs are
    * per-query by construction; the shortlist union backs the final
    * id-pruned read) — the same "query side is small by definition" tier
    * as the other batch probes. The scoring loop chunks itself so no
    * single collect exceeds `maxPairs` (query, shortlist) pairs: a batch
    * past the bound WORKS, in ⌈pairs/maxPairs⌉ sequential probe rounds,
    * instead of OOMing the driver silently.
    */
  def ivfProbePqBatch(spark: org.apache.spark.sql.SparkSession, table: String,
                      queries: DataFrame, idCol: String, vecCol: String,
                      probeIdCol: String, queryVecCol: String = "qvec",
                      k: Int = 10, probes: Int = 4, shortlist: Int = 0,
                      maxPairs: Int = 1 << 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centroids = readIvfCentroids(spark, table)
    val books = readPqCodebooks(spark, table)
    val sl = if (shortlist > 0) shortlist else 4 * k
    val qRows = queries.select(col(probeIdCol), col(queryVecCol)).collect()
      .map(r => (r.get(0), r.getSeq[Float](1).toArray))
    require(qRows.nonEmpty, "ivfProbePqBatch: empty query batch")
    val qMeta = qRows.map { case (pid, q) =>
      val qn = math.sqrt(q.foldLeft(0.0)((acc, x) => acc + x.toDouble * x))
      (pid, pqLut(q, books).toSeq, qn, nearestCells(q, centroids, probes).toSeq)
    }
    qMeta.grouped(math.max(1, maxPairs / sl)).map { chunk =>
      val allCells = chunk.flatMap(_._4).distinct.toIndexedSeq
      val qDf = broadcast(spark.createDataFrame(
        spark.sparkContext.parallelize(chunk.toIndexedSeq.map { case (pid, lut, qn, cs) =>
          org.apache.spark.sql.Row(pid, lut, qn, cs) }, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(probeIdCol, queries.schema(probeIdCol).dataType),
          org.apache.spark.sql.types.StructField("__lut",
            org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
          org.apache.spark.sql.types.StructField("__qn", org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("__cells",
            org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType))))))
      val wShort = Window.partitionBy(probeIdCol)
        .orderBy(col("__asim").desc, col(idCol))
      val shortRows = spark.table(table)
        .filter(col("cell").isin(allCells: _*))
        .join(qDf, array_contains(col("__cells"), col("cell")))
        .select(col(probeIdCol), col(idCol),
          (graft.functions.PqDot(col("code"), col("__lut")) / (col("norm") * col("__qn"))).as("__asim"))
        .withColumn("__rk", row_number().over(wShort))
        .filter(col("__rk") <= sl)
        .select(col(probeIdCol), col(idCol)).collect().toIndexedSeq
      rerankShortlistBatch(spark, table,
        queries.filter(col(probeIdCol).isin(chunk.map(_._1): _*)),
        idCol, vecCol, probeIdCol, queryVecCol, k, shortRows)
    }.reduce(_ unionByName _)
  }

  /** Batched probe of a [[writeIvfIndexQuantized]] table — the int8 twin
    * of [[ivfProbePqBatch]], completing the serving surface a user who
    * picked int8 (no codebook training, simpler ops) gets: per-query norm,
    * Σq, and probe cells are computed driver-side, the union of probe
    * cells is ONE static partition filter over the code table, candidates
    * score via the codegen'd [[graft.functions.Int8Dot]] kernel against
    * each query's broadcast vector, and the per-query top-`shortlist`
    * reranks exactly from the raw sibling through the same tail as every
    * other quantized probe. Returns (probeIdCol, idCol, sim), ≤ k rows per
    * probe, with [[ivfProbeQuantized]]'s exact arithmetic. Same `maxPairs`
    * chunking contract as the PQ batch probe.
    */
  def ivfProbeQuantizedBatch(spark: org.apache.spark.sql.SparkSession, table: String,
                             queries: DataFrame, idCol: String, vecCol: String,
                             probeIdCol: String, queryVecCol: String = "qvec",
                             k: Int = 10, probes: Int = 4, shortlist: Int = 0,
                             maxPairs: Int = 1 << 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centroids = readIvfCentroids(spark, table)
    val sl = if (shortlist > 0) shortlist else 4 * k
    val qRows = queries.select(col(probeIdCol), col(queryVecCol)).collect()
      .map(r => (r.get(0), r.getSeq[Float](1).toArray))
    require(qRows.nonEmpty, "ivfProbeQuantizedBatch: empty query batch")
    val qMeta = qRows.map { case (pid, q) =>
      val qn = math.sqrt(q.foldLeft(0.0)((acc, x) => acc + x.toDouble * x))
      val sq = q.foldLeft(0.0)((acc, x) => acc + x.toDouble)
      (pid, q.toSeq, qn, sq, nearestCells(q, centroids, probes).toSeq)
    }
    qMeta.grouped(math.max(1, maxPairs / sl)).map { chunk =>
      val allCells = chunk.flatMap(_._5).distinct.toIndexedSeq
      val qDf = broadcast(spark.createDataFrame(
        spark.sparkContext.parallelize(chunk.toIndexedSeq.map { case (pid, qv, qn, sq, cs) =>
          org.apache.spark.sql.Row(pid, qv, qn, sq, cs) }, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(probeIdCol, queries.schema(probeIdCol).dataType),
          org.apache.spark.sql.types.StructField("__qv",
            org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
          org.apache.spark.sql.types.StructField("__qn", org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("__sq", org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("__cells",
            org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType))))))
      val wShort = Window.partitionBy(probeIdCol)
        .orderBy(col("__asim").desc, col(idCol))
      val shortRows = spark.table(table)
        .filter(col("cell").isin(allCells: _*))
        .join(qDf, array_contains(col("__cells"), col("cell")))
        .select(col(probeIdCol), col(idCol),
          ((graft.functions.Int8Dot(col("code"), col("__qv")) * col("scale") +
            col("offset") * col("__sq")) / (col("norm") * col("__qn"))).as("__asim"))
        .withColumn("__rk", row_number().over(wShort))
        .filter(col("__rk") <= sl)
        .select(col(probeIdCol), col(idCol)).collect().toIndexedSeq
      rerankShortlistBatch(spark, table,
        queries.filter(col(probeIdCol).isin(chunk.map(_._1): _*)),
        idCol, vecCol, probeIdCol, queryVecCol, k, shortRows)
    }.reduce(_ unionByName _)
  }

  // Exact per-probe top-k rerank of a chunk's (probe, candidate) shortlist
  // from the raw-vector sibling — the BATCH twin of [[rerankShortlist]] and
  // the shared tail of both quantized batch probes, so the returned rows'
  // arithmetic (rounding, ties) is one code path. The (probe, candidate)
  // membership rides a broadcast semi-join — no per-row membership UDF.
  private def rerankShortlistBatch(spark: org.apache.spark.sql.SparkSession,
                                   table: String, queries: DataFrame,
                                   idCol: String, vecCol: String,
                                   probeIdCol: String, queryVecCol: String,
                                   k: Int,
                                   shortRows: IndexedSeq[org.apache.spark.sql.Row]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shortIds = shortRows.map(_.get(1)).distinct
    val shortDf = broadcast(spark.createDataFrame(
      spark.sparkContext.parallelize(shortRows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(probeIdCol, queries.schema(probeIdCol).dataType),
        org.apache.spark.sql.types.StructField(idCol,
          spark.table(s"${table}_raw").schema(idCol).dataType)))))
    val wK = Window.partitionBy(probeIdCol).orderBy(col("sim").desc, col(idCol))
    spark.table(s"${table}_raw")
      .filter(col(idCol).isin(shortIds: _*))
      .crossJoin(broadcast(queries
        .withColumn("__norm_q", sqrt(dot(col(queryVecCol), col(queryVecCol))))))
      .join(shortDf, Seq(probeIdCol, idCol), "left_semi")
      .withColumn("__norm_a", sqrt(dot(col(vecCol), col(vecCol))))
      .select(col(probeIdCol), col(idCol),
        round(dot(col(vecCol), col(queryVecCol)) / (col("__norm_a") * col("__norm_q")), 4).as("sim"))
      .withColumn("__rk", row_number().over(wK))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** Per-cell row counts of a persisted IVF index — the drift signal for
    * the [[appendToIvfIndex]] retrain contract. Partition-count metadata
    * plus one pruned columnar count per cell; never reads vectors.
    */
  def ivfCellSizes(spark: org.apache.spark.sql.SparkSession,
                   table: String): DataFrame =
    spark.table(table).groupBy(col("cell")).agg(count(lit(1)).as("n"))

  /** Probe a [[writeIvfIndex]] table: the query's `probes` nearest cells are
    * computed driver-side against the persisted centroid matrix (the query
    * side is tiny by definition), and the literal `cell IN (...)` predicate
    * is a static partition filter — the scan lists and reads ONLY the probe
    * cells' directories (`PartitionFilters` in the plan; spec-guarded).
    * Exact cosine rerank inside the candidates, identical arithmetic to
    * [[ivfKnn]] — with the same build parameters the two return the same
    * rows (spec-checked).
    */
  def ivfProbePartitioned(spark: org.apache.spark.sql.SparkSession, table: String,
                          query: DataFrame, idCol: String, vecCol: String,
                          k: Int, probes: Int = 4): DataFrame = {
    val centroids = readIvfCentroids(spark, table)
    val qvecs = query.select(col("qvec")).collect()
      .map(_.getSeq[Float](0).toArray)
    val cells = qvecs.flatMap(v => nearestCells(v, centroids, probes))
      .distinct.toIndexedSeq
    val q = broadcast(query.withColumn("__norm_q", sqrt(dot(col("qvec"), col("qvec")))))
    spark.table(table)
      .filter(col("cell").isin(cells: _*))
      .crossJoin(q)
      .withColumn("__norm_a", sqrt(dot(col(vecCol), col(vecCol))))
      .select(col(idCol),
        round(dot(col(vecCol), col("qvec")) / (col("__norm_a") * col("__norm_q")), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Batched probe of a [[writeIvfIndex]] table: many query vectors served
    * from the persisted index in one read. The union of all probe cells
    * (collected driver-side — the query side is small by definition)
    * becomes ONE static partition filter, so the scan reads only the cell
    * directories any probe needs; per-query candidate membership is then
    * an `array_contains` broadcast join and the top-k a per-probe window —
    * the index-backed twin of [[ivfKnnBatch]] (which still pays training +
    * a full assignment pass per call). Returns (probeIdCol, idCol, sim),
    * ≤ k rows per probe, row-identical to [[ivfKnnBatch]] under the same
    * build parameters (spec-checked).
    */
  def ivfProbePartitionedBatch(spark: org.apache.spark.sql.SparkSession, table: String,
                               queries: DataFrame, idCol: String, vecCol: String,
                               probeIdCol: String, queryVecCol: String = "qvec",
                               k: Int = 10, probes: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centroids = readIvfCentroids(spark, table)
    val qAssigned = queries.withColumn("probe_cells",
      probeCellsUdf(centroids, probes)(col(queryVecCol)))
      .withColumn("__norm_q", sqrt(dot(col(queryVecCol), col(queryVecCol))))
    val allCells = qAssigned.select(explode(col("probe_cells")).as("cell"))
      .distinct().collect().map(_.getInt(0)).toIndexedSeq
    val w = Window.partitionBy(probeIdCol)
      .orderBy(col("sim").desc, col(idCol))
    spark.table(table)
      .filter(col("cell").isin(allCells: _*))
      .join(broadcast(qAssigned), array_contains(col("probe_cells"), col("cell")))
      .withColumn("__norm_a", sqrt(dot(col(vecCol), col(vecCol))))
      .select(col(probeIdCol), col(idCol),
        round(dot(col(vecCol), col(queryVecCol)) / (col("__norm_a") * col("__norm_q")), 4).as("sim"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** Batched IVF top-k: many probe vectors at once — the shape a serving
    * or training-data join actually runs. One shared assignment pass over
    * the corpus, probe cells per query via a tight-loop UDF (the query side
    * is small relative to the corpus), candidates from one
    * `array_contains` broadcast join, per-probe top-k via window rank.
    * Returns (probeIdCol, idCol, sim) rows, ≤ k per probe.
    */
  def ivfKnnBatch(emb: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
                  probeIdCol: String, queryVecCol: String = "qvec",
                  k: Int = 10, nCentroids: Int = 16, probes: Int = 4,
                  lloydIters: Int = 1): DataFrame = {
    val (assigned, centroids) = ivfAssign(emb, idCol, vecCol, nCentroids, lloydIters)
    ivfKnnBatchFromAssigned(assigned, centroids, queries, idCol, vecCol,
      probeIdCol, queryVecCol, k, probes)
  }

  /** [[ivfKnnBatch]]'s serve half over a pre-computed assignment (the
    * [[ivfKnnFromAssigned]] split, batched).
    */
  def ivfKnnBatchFromAssigned(assigned: DataFrame,
                              centroids: Array[(Int, Array[Double])],
                              queries: DataFrame, idCol: String, vecCol: String,
                              probeIdCol: String, queryVecCol: String = "qvec",
                              k: Int = 10, probes: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qAssigned = queries.withColumn("probe_cells",
      probeCellsUdf(centroids, probes)(col(queryVecCol)))
      .withColumn("__norm_q", sqrt(dot(col(queryVecCol), col(queryVecCol))))
    val w = Window.partitionBy(probeIdCol)
      .orderBy(col("sim").desc, col(idCol))
    assigned.join(broadcast(qAssigned), array_contains(col("probe_cells"), col("cell")))
      .withColumn("__norm_a", sqrt(dot(col(vecCol), col(vecCol))))
      .select(col(probeIdCol), col(idCol),
        round(dot(col(vecCol), col(queryVecCol)) / (col("__norm_a") * col("__norm_q")), 4).as("sim"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** Top-`probes` nearest cells for a vector, one tight loop over the
    * centroid matrix (selection by repeated argmin — probes ≪ k). Same
    * strict-less-than first-wins tiebreak as the codegen'd
    * [[graft.functions.NearestCentroid]] assignment kernel.
    */
  private[graft] def nearestCells(x: Array[Float],
                                  centroids: Array[(Int, Array[Double])],
                                  probes: Int): Array[Int] = {
    val mat = centroids.map(_._2)
    val d = new Array[Double](mat.length)
    var c = 0
    while (c < mat.length) {
      val cv = mat(c)
      val n = math.min(cv.length, x.length)
      var s = 0.0
      var i = 0
      while (i < n) { val diff = x(i) - cv(i); s += diff * diff; i += 1 }
      d(c) = s
      c += 1
    }
    val out = new Array[Int](math.min(probes, mat.length))
    var p = 0
    while (p < out.length) {
      var best = -1
      var bestD = Double.MaxValue
      c = 0
      while (c < d.length) {
        if (d(c) < bestD) { bestD = d(c); best = c }
        c += 1
      }
      out(p) = centroids(best)._1
      d(best) = Double.MaxValue
      p += 1
    }
    out
  }

  private def probeCellsUdf(centroids: Array[(Int, Array[Double])], probes: Int) =
    udf { (v: Seq[Float]) => nearestCells(v.toArray, centroids, probes) }

  private def assignToCentroidsRanked(query: DataFrame, vecCol: String,
                                      centroids: Array[(Int, Array[Double])],
                                      dim: Int, probes: Int): DataFrame =
    query.withColumn("probe_cells", probeCellsUdf(centroids, probes)(col(vecCol)))

  private[graft] def assignToCentroids(emb: DataFrame, vecCol: String,
                                       centroids: Array[(Int, Array[Double])], dim: Int): DataFrame =
    // argmin over the centroid matrix via the codegen'd NearestCentroid
    // kernel — k×dim primitive ops per row, no UDF boxing
    emb.withColumn("cell",
      graft.functions.NearestCentroid(col(vecCol), centroids.map(_._2)))
}
