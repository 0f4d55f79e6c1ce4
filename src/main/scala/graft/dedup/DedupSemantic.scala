package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Semantic (embedding) seam of [[Dedup]] — exact cosine pairs, SemDeDup
  * within-run dedup, and the cross-run IVF-index probes (float + int8).
  * Split from the single Dedup.scala (round 15); no public-API change.
  */
private[graft] trait DedupSemantic { this: Dedup.type =>

  /** Batch ids with a SEMANTIC near-dup anywhere in a persisted IVF index
    * ([[graft.similarity.Similarity.writeIvfIndex]]) — the embedding
    * complement of [[nearDupsAgainstIndex]]: each batch vector is
    * assigned to its nearest PERSISTED centroid (one codegen'd
    * NearestCentroid pass — no training, the index's build-once
    * contract), joined against that cell's indexed vectors, and dropped
    * when any cosine meets `threshold`. Same-cell-only matching is the
    * SemDeDup recall trade verbatim ([[semanticDedup]]'s scaladoc): a
    * near-pair straddling a Voronoi boundary is missed, exact-copy
    * replays never are (identical vectors assign identically).
    *
    * Scale shape: the per-cell comparison volume is batch_c × index_c —
    * bounded by the CELL, not the corpus, exactly like the within-run
    * pairing. Be honest about the join's exchanges: the index table is
    * cell-PARTITIONED (directories) but bucketed on id, so unless the
    * batch side broadcasts (AQE does this for small days), the cell-keyed
    * join SHUFFLES BOTH sides — one full pass over the index per run,
    * with parallelism bounded by the number of distinct cells. That is
    * why `nCentroids` must follow the SemDeDup recipe (≈ √N, NOT the
    * test-scale default 16): at 10⁸ indexed vectors and 10⁴ centroids
    * the shuffle runs at 10⁴-way parallelism with ~10⁴-row cells, and
    * the per-run index pass is the operator's intrinsic cost (every
    * indexed vector in a probed cell must be compared — this is not a
    * top-k probe with a shortlist). Monitor
    * [[graft.similarity.Similarity.ivfCellSizes]] and retrain when cells
    * skew.
    */
  def semanticDupIdsAgainstIndex(batch: DataFrame, idCol: String, vecCol: String,
                                 table: String, threshold: Double = 0.9): DataFrame = {
    import graft.similarity.Similarity
    val spark = batch.sparkSession
    val centroids = Similarity.readIvfCentroids(spark, table)
    val assigned = Similarity.assignToCentroids(
      batch.select(col(idCol), col(vecCol)), vecCol, centroids,
      centroids.head._2.length)
    val b = assigned.select(col("cell"), col(idCol).as("__bid"),
      col(vecCol).as("__bv"),
      sqrt(Similarity.dot(col(vecCol), col(vecCol))).as("__bn"))
    val ix = spark.table(table).select(col("cell"), col(vecCol).as("__iv"),
      sqrt(Similarity.dot(col(vecCol), col(vecCol))).as("__in"))
    b.join(ix, "cell")
      .filter(Similarity.dot(col("__bv"), col("__iv")) /
        (col("__bn") * col("__in")) >= threshold)
      .select(col("__bid").as(idCol)).distinct()
  }

  /** Batch ids with a semantic near-dup in a persisted INT8-QUANTIZED IVF
    * index ([[graft.similarity.Similarity.writeIvfIndexQuantized]]) — the
    * serving-cost variant of [[semanticDupIdsAgainstIndex]]: the per-cell
    * comparison volume is identical, but the probed rows are 1-byte/dim
    * codes plus 12 bytes of scalars instead of 4-byte floats — a ~3.7×
    * cut of the operator's dominant read at serving dims — and only a
    * COVERING candidate set touches the raw-vector rerank sibling.
    *
    * The drop set is EXACTLY the float path's, not approximately:
    * scalar int8 rounds each coordinate within scale/2, so the
    * reconstructed dot `scale·Σcode·q + offset·Σq` differs from the true
    * dot by at most `(scale/2)·Σ|q|` — the probe admits every code row
    * within that margin of `threshold` (complete by the bound) and
    * verifies the admitted pairs against the raw sibling with the exact
    * arithmetic (sound by the rerank). No shortlist to size, no recall
    * knob: the margin IS the covering shortlist.
    */
  def semanticDupIdsAgainstIndexQuantized(batch: DataFrame, idCol: String,
                                          vecCol: String, table: String,
                                          threshold: Double = 0.9): DataFrame = {
    import graft.similarity.Similarity
    val spark = batch.sparkSession
    val centroids = Similarity.readIvfCentroids(spark, table)
    val assigned = Similarity.assignToCentroids(
      batch.select(col(idCol), col(vecCol)), vecCol, centroids,
      centroids.head._2.length)
    val b = assigned.select(col("cell"), col(idCol).as("__bid"),
      col(vecCol).as("__bv"),
      sqrt(Similarity.dot(col(vecCol), col(vecCol))).as("__bn"),
      aggregate(col(vecCol), lit(0.0d), (acc, x) => acc + x).as("__bsum"),
      aggregate(col(vecCol), lit(0.0d), (acc, x) => acc + abs(x)).as("__babs"))
    // admit on the reconstructed dot + rigorous rounding margin; the
    // stored `norm` is the EXACT float norm (computed at build/append
    // from the raw vector), so the denominator needs no correction
    val codes = spark.table(table).select(col("cell"), col(idCol).as("__iid"),
      col("code"), col("scale"), col("offset"), col("norm"))
    val cand = codes.join(b, "cell")
      .filter((graft.functions.Int8Dot(col("code"), col("__bv")) * col("scale") +
        col("offset") * col("__bsum") +
        col("scale") / 2 * col("__babs")) / (col("norm") * col("__bn"))
        >= threshold)
      .select(col("__iid"), col("__bid"), col("__bv"), col("__bn"))
    // exact rerank of the covering candidates only: an id-keyed (unskewed)
    // join against the raw sibling's bucketed layout
    cand.join(spark.table(s"${table}_raw")
        .select(col(idCol).as("__iid"), col(vecCol).as("__iv"),
          sqrt(Similarity.dot(col(vecCol), col(vecCol))).as("__in")),
      Seq("__iid"))
      .filter(Similarity.dot(col("__bv"), col("__iv")) /
        (col("__bn") * col("__in")) >= threshold)
      .select(col("__bid").as(idCol)).distinct()
  }

  /** Incremental semantic dedup across runs served from the QUANTIZED
    * index — [[semanticDedupAgainstIndex]] with
    * [[semanticDupIdsAgainstIndexQuantized]]'s probe and the int8 append
    * ([[graft.similarity.Similarity.appendToIvfIndexQuantized]]: codes
    * into the cell-partitioned main, raw vectors into the rerank
    * sibling). Same failure contract: drop set checkpointed BEFORE the
    * append, survivors checkpointed, single writer per index.
    */
  def semanticDedupAgainstIndexQuantized(batch: DataFrame, idCol: String,
                                         vecCol: String, table: String,
                                         threshold: Double = 0.9,
                                         update: Boolean = true): DataFrame = {
    val dupIds = semanticDupIdsAgainstIndexQuantized(batch, idCol, vecCol,
      table, threshold).localCheckpoint()
    val fresh = batch.join(dupIds, Seq(idCol), "left_anti").localCheckpoint()
    if (update) graft.similarity.Similarity.appendToIvfIndexQuantized(
      fresh.select(col(idCol), col(vecCol)), idCol, vecCol, table)
    fresh
  }

  /** Incremental SEMANTIC dedup across pipeline RUNS — the embedding
    * member of the cross-run family (exact: [[dedupAgainstRegistry]];
    * MinHash text: [[nearDedupAgainstIndex]]; this: embedding-cosine
    * against [[graft.similarity.Similarity.writeIvfIndex]]'s persisted
    * cells): drop every batch row whose embedding near-matches the
    * indexed corpus ([[semanticDupIdsAgainstIndex]]) and — unless
    * `update = false` — append the survivors' vectors so the NEXT run
    * sees them ([[graft.similarity.Similarity.appendToIvfIndex]]: assign
    * against the same persisted centroids, no retrain). An exact replay
    * matches itself at cosine 1, so this subsumes an exact embedding
    * registry.
    *
    * Within-batch near-dups are the CALLER's composition ([[semanticDedup]]
    * first — exactly [[nearDedupAgainstIndex]]'s contract): two mutually
    * near rows neither of which matches the index BOTH survive here and
    * BOTH register. curate()'s wiring runs the within-run semantic stage
    * first for this reason.
    *
    * Failure contract: the drop set is eagerly materialized with
    * truncated lineage BEFORE any append — the probe can never observe
    * its own append — and the SURVIVOR set is then checkpointed too, so
    * the batch plan executes exactly once: the rows whose vectors are
    * appended ARE the rows the returned frame holds (a non-deterministic
    * batch cannot register a vector it never emits), and a late re-read
    * after later batches have grown the index cannot lose rows. A crash
    * between the (side-effect-free) probe and the append leaves the
    * index untouched: rerun the batch. Single writer per index at a
    * time; `batch` must carry `idCol` and `vecCol` (extra columns pass
    * through the result but only (id, vec) is appended).
    */
  def semanticDedupAgainstIndex(batch: DataFrame, idCol: String, vecCol: String,
                                table: String, threshold: Double = 0.9,
                                update: Boolean = true): DataFrame = {
    val dupIds = semanticDupIdsAgainstIndex(batch, idCol, vecCol, table,
      threshold).localCheckpoint()
    val fresh = batch.join(dupIds, Seq(idCol), "left_anti").localCheckpoint()
    if (update) graft.similarity.Similarity.appendToIvfIndex(
      fresh.select(col(idCol), col(vecCol)), idCol, vecCol, table)
    fresh
  }

  /** Exact embedding-cosine duplicate pairs: every (a < b) pair whose
    * cosine similarity meets `threshold`. The quadratic VERIFICATION tier —
    * norms are precomputed per side and the per-pair work is one codegen'd
    * [[graft.similarity.Similarity.dot]] — run it on a corpus slice, a
    * candidate set, or as the oracle anchor for [[semanticDedup]]'s
    * clustered path; at full-corpus scale use [[semanticDedup]], which
    * restricts pairing to centroid cells.
    */
  def cosineDupPairsExact(emb: DataFrame, idCol: String, vecCol: String,
                          threshold: Double, roundTo: Int = 4): DataFrame = {
    import graft.similarity.Similarity.dot
    val sides = emb.select(col(idCol), col(vecCol),
      sqrt(dot(col(vecCol), col(vecCol))).as("__n"))
    val l = sides.select(col(idCol).as("a"), col(vecCol).as("__va"), col("__n").as("__na"))
    val r = sides.select(col(idCol).as("b"), col(vecCol).as("__vb"), col("__n").as("__nb"))
    l.crossJoin(r).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        round(dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")), roundTo).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Cosine-duplicate edges from within-cell pairing — the candidate stage
    * of [[semanticDedup]], exposed so its bounds are testable. Pairs are
    * generated only inside each k-means cell; cells larger than `maxCell`
    * emit a fingerprint-ordered successor CHAIN instead of the m²/2
    * self-join — the same mega-bucket bound [[minhashCandidates]] applies,
    * for the same reason: a crawl's million identical embeddings (default
    * thumbnails, empty-document vectors) all land in ONE cell, and m² pair
    * emission there stalls the stage no matter how it is partitioned.
    * Chain order is a fingerprint of the vector bytes, so identical
    * embeddings are contiguous and stay connected through chain links that
    * certainly pass the cosine threshold; what the bound gives up is only
    * cross-fingerprint pairs inside an oversized cell, whose similarity
    * the threshold filter would have had to certify pair by pair anyway.
    * Every emitted edge — chained or exhaustive — still passes the exact
    * cosine-threshold check before it becomes a dup edge.
    */
  def semanticDupEdges(emb: DataFrame, idCol: String, vecCol: String,
                       threshold: Double = 0.9, nCentroids: Int = 16,
                       lloydIters: Int = 1, maxCell: Int = 10000): DataFrame =
    semanticDupEdgesReleasable(emb, idCol, vecCol, threshold, nCentroids,
      lloydIters, maxCell)._1

  // The returned edges are LAZY, so the persisted cell assignment backing
  // both pairing branches must outlive this call: the caller invokes the
  // release thunk once the edges have been materialized (blocks are
  // LRU-evictable and lineage is kept, so a caller that never releases
  // only leaves evictable cache behind, never a wrong result).
  private def semanticDupEdgesReleasable(
      emb: DataFrame, idCol: String, vecCol: String, threshold: Double,
      nCentroids: Int, lloydIters: Int,
      maxCell: Int): (DataFrame, () => Unit) = {
    val (assigned, _) = graft.similarity.Similarity.ivfAssign(
      emb, idCol, vecCol, nCentroids, lloydIters)
    edgesFromAssigned(assigned, idCol, vecCol, threshold, maxCell)
  }

  // The pairing core over a frame that already carries its `cell` column —
  // shared by the per-call path (fresh ivfAssign) and the indexed path (a
  // persisted cell-partitioned IVF table), so the two can never diverge.
  private def edgesFromAssigned(
      assigned: DataFrame, idCol: String, vecCol: String, threshold: Double,
      maxCell: Int): (DataFrame, () => Unit) = {
    import graft.similarity.Similarity.dot
    val wCell = Window.partitionBy(col("cell"))
    // One persisted pass over the corpus computes norm + a 64-bit vector
    // fingerprint per row; the cache is columnar, so the vector-FREE
    // projections below never rehydrate vecCol.
    val sides = assigned.select(col("cell"), col(idCol), col(vecCol),
        sqrt(dot(col(vecCol), col(vecCol))).as("__n"),
        xxhash64(col(vecCol)).as("__fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Every cell-keyed WINDOW — the cell-size count and the mega-cell
    // successor chain — runs over (cell, id, fingerprint) rows of ~24
    // bytes, the same discipline minhashCandidates applies to its bucket
    // windows: a degenerate mega-cell (a crawl's million identical
    // thumbnails) funnels one window task, so the rows that funnel must be
    // skeleton rows, never the embedding payload. Vectors rejoin strictly
    // by id — a hash join on the UNSKEWED unique key — only where the
    // per-pair cosine check actually needs them.
    val slim = sides.select(col("cell"), col(idCol), col("__fp"))
      .withColumn("__csz", count(lit(1)).over(wCell))
    val vecs = sides.select(col(idCol), col(vecCol), col("__n"))
    val small = slim.filter(col("__csz") <= maxCell)
      .select(col("cell"), col(idCol)).join(vecs, idCol)
    val l = small.select(col("cell"), col(idCol).as("a"), col(vecCol).as("__va"), col("__n").as("__na"))
    val r = small.select(col("cell"), col(idCol).as("b"), col(vecCol).as("__vb"), col("__n").as("__nb"))
    val exhaustive = l.join(r, "cell").filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("__va"), col("__na"), col("__vb"), col("__nb"))
    // mega-cells: successor chain in (vector-fingerprint, id) order —
    // identical embeddings share a fingerprint and stay contiguous. Only
    // the successor's ID is led through the window.
    val wChain = wCell.orderBy(col("__fp"), col(idCol))
    val chainPairs = slim.filter(col("__csz") > maxCell)
      .withColumn("__bid", lead(col(idCol), 1).over(wChain))
      .filter(col("__bid").isNotNull)
      .select(least(col(idCol), col("__bid")).as("a"),
        greatest(col(idCol), col("__bid")).as("b"))
    val chained = chainPairs
      .join(vecs.select(col(idCol).as("a"), col(vecCol).as("__va"), col("__n").as("__na")), "a")
      .join(vecs.select(col(idCol).as("b"), col(vecCol).as("__vb"), col("__n").as("__nb")), "b")
      .select(col("a"), col("b"), col("__va"), col("__na"), col("__vb"), col("__nb"))
    val edges = exhaustive.union(chained)
      .filter(dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")) >= threshold)
      .select(col("a"), col("b"))
    (edges, () => { sides.unpersist(); () })
  }

  /** SemDeDup-style semantic dedup: cluster embeddings into `nCentroids`
    * k-means cells ([[graft.similarity.Similarity.ivfAssign]] — the same
    * training the IVF ANN tier uses), generate candidate pairs only WITHIN
    * each cell ([[semanticDupEdges]], mega-cells bounded by `maxCell`),
    * keep pairs whose cosine meets `threshold`, resolve transitive
    * clusters with [[dupClusters]], and keep the minimum-id representative
    * of each cluster. Returns the surviving rows of `emb`.
    *
    * Scale shape: pairing is per-cell, so the quadratic term is bounded by
    * the largest cell — and hard-bounded by `maxCell` — not the corpus.
    * Size `nCentroids` so cells hold roughly the within-cell pair budget
    * (the SemDeDup recipe: k grows with corpus size; monitor cell sizes
    * exactly like [[graft.similarity.Similarity.ivfCellSizes]]). What
    * clustering gives up is CROSS-cell pairs: a near-dup pair straddling a
    * Voronoi boundary is silently missed — the approximation the SemDeDup
    * recipe accepts (Voronoi assignment bounds point-to-CENTROID
    * distances, not point-to-point, so this is a recall trade, not a
    * guarantee). Exact-copy duplicates always share a cell and can never
    * be missed. The assigned frame is persisted (lineage kept,
    * LRU-evictable) because the pairing's two branches would otherwise
    * re-run assignment over the corpus.
    */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
                    threshold: Double = 0.9, nCentroids: Int = 16,
                    lloydIters: Int = 1, maxCell: Int = 10000): DataFrame = {
    val (edges, release) = semanticDupEdgesReleasable(emb, idCol, vecCol,
      threshold, nCentroids, lloydIters, maxCell)
    emb.join(dropSet(edges, release, idCol), Seq(idCol), "left_anti")
  }

  /** [[semanticDedup]] served from a persisted IVF index
    * ([[graft.similarity.Similarity.writeIvfIndex]]): the cell assignment —
    * the training-plus-full-corpus-pass half of the per-call path — is READ
    * from the cell-partitioned table instead of retrained per run, the same
    * build-once/serve-many split the ANN tier makes (s03 vs s05). Pairing,
    * the `maxCell` chain bound, thresholding, and cluster resolution are
    * the shared code path, so the two flavors cannot diverge; with the
    * same training parameters and corpus they return the same survivors
    * (spec-checked). Returns the surviving INDEX rows (including `cell`).
    *
    * This is how a recurring corpus-curation run amortizes semantic dedup:
    * the index is maintained incrementally
    * ([[graft.similarity.Similarity.appendToIvfIndex]]) and each dedup
    * pass pays only pairing over cells, never training.
    */
  def semanticDedupIndexed(spark: org.apache.spark.sql.SparkSession, table: String,
                           idCol: String, vecCol: String,
                           threshold: Double = 0.9, maxCell: Int = 10000): DataFrame = {
    val assigned = spark.table(table)
    val (edges, release) = edgesFromAssigned(assigned, idCol, vecCol, threshold, maxCell)
    assigned.join(dropSet(edges, release, idCol), Seq(idCol), "left_anti")
  }

  // Resolve dup edges to the ids to drop (everything but each cluster's
  // min-id representative). dupClusters materializes the edges eagerly
  // (its rounds are actions), so the pairing's persisted assignment is
  // released as soon as the labels exist.
  private def dropSet(edges: DataFrame, release: () => Unit,
                      idCol: String): DataFrame = {
    val labels = dupClusters(edges)
    release()
    labels.filter(col("id") =!= col("label")).select(col("id").as(idCol))
  }
}
