package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for LLM training-data pipelines.
  *
  * Scale design: nothing here ever joins n×n on content. Exact dedup
  * collapses duplicates map-side, so only one surviving candidate per
  * distinct content per partition crosses the wire; MinHash LSH shuffles
  * (band, bucket) keys so candidate generation is linear in corpus size plus
  * bucket collisions; Jaccard verification touches only candidate pairs.
  */
object Dedup {

  // Precompiled: String.split(regex) recompiles the pattern per call,
  // which dominates in per-row UDF loops.
  private val WS = java.util.regex.Pattern.compile("\\s+")

  /** Exact dedup: keep the lowest-id row per distinct content hash.
    * A `min_by` hash aggregation, not a window: the partial (map-side)
    * aggregate collapses duplicates before the exchange, so at most one
    * candidate row per distinct content per partition is shuffled — a
    * window over the hash would sort-shuffle EVERY row, duplicates
    * included, which is exactly the waste a 100 TB dedup pass can't afford.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val cols = df.columns.toSeq
    df.groupBy(sha2(col(textCol).cast("binary"), 256).as("__h"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("__r"))
      .select(cols.map(c => col(s"__r.$c").as(c)): _*)
  }

  /** Exact dedup keeping the BEST replica per content group instead of the
    * smallest id — the retention policy a crawl actually wants when
    * replicas differ in metadata (fetch recency, source reputation, decode
    * health): keep the row maximizing `scoreCol` (numeric), ties broken by
    * smallest `idCol`, so the choice is total and deterministic. Same
    * map-side-collapsing aggregation contract as [[exact]]: min_by over a
    * (−score, id) ordering struct (planned as a SortAggregate with a
    * partial phase, spec-pinned), NOT a window — at most one candidate
    * row per distinct content per partition crosses the wire. A NULL
    * score ranks LAST (it coalesces to the ordering's positive
    * infinity) — without the coalesce, null sorts first in the struct
    * ordering and an unscored replica would beat every real-scored one,
    * the opposite of any sensible retention policy.
    */
  def exactKeepBest(df: DataFrame, textCol: String, idCol: String,
                    scoreCol: Column): DataFrame = {
    val cols = df.columns.toSeq
    df.groupBy(sha2(col(textCol).cast("binary"), 256).as("__h"))
      .agg(min_by(struct(cols.map(col): _*),
        struct(coalesce(negate(scoreCol.cast("double")),
          lit(Double.PositiveInfinity)), col(idCol))).as("__r"))
      .select(cols.map(c => col(s"__r.$c").as(c)): _*)
  }

  /** Word k-shingles as 64-bit hashes (xxhash64 of each shingle string).
    * Sub-`k`-token documents degenerate to one hash of the space-joined
    * TOKEN SEQUENCE (not the raw text), so whitespace-only differences in
    * short docs collide here exactly as they do in the fused
    * [[minhashSignatureFromText]] path.
    */
  def shingleHashes(text: Column, k: Int = 3): Column = {
    val toks = split(text, "\\s+")
    val n = size(toks)
    when(n < k, array(xxhash64(concat_ws(" ", toks))))
      .otherwise(transform(sequence(lit(1), n - lit(k - 1)),
        i => xxhash64(concat_ws(" ", slice(toks, i, lit(k))))))
  }

  // Deterministic a_i/b_i permutation parameters (splitmix64-expanded).
  private def permParams(numHashes: Int, seed: Long): (Array[Long], Array[Long]) = {
    var x = seed
    def next(): Long = {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    (Array.fill(numHashes)(next() | 1L), Array.fill(numHashes)(next()))
  }

  /** MinHash signature column over precomputed shingle hashes: permutation
    * i is h_i(x) = a_i*x + b_i (wrapping 64-bit — a near-universal family),
    * minimized per permutation in one tight loop.
    *
    * A UDF on purpose: the numHashes × shingles double loop is pure long
    * arithmetic; the higher-order-function formulation evaluates an
    * interpreted lambda per cell (~7 µs each — 30+× slower end to end),
    * which is exactly the "custom expression beats composition" case.
    */
  def minhashSignature(shingles: Column, numHashes: Int = 64, seed: Long = 42L): Column = {
    val (as, bs) = permParams(numHashes, seed)
    val f = udf { (hs: Seq[Long]) => signatureOf(hs.iterator, numHashes, as, bs) }
    f(shingles)
  }

  /** Fused text → MinHash signature: tokenize, rolling k-gram shingle
    * hashes, and the permutation minima all in one allocation-lean loop —
    * the form the 100 TB dedup pass uses (one UDF call per document, no
    * intermediate shingle arrays materialized into the row).
    */
  def minhashSignatureFromText(text: Column, k: Int = 3,
                               numHashes: Int = 64, seed: Long = 42L): Column = {
    val (as, bs) = permParams(numHashes, seed)
    val f = udf { (s: String) =>
      if (s == null) signatureOf(Iterator.empty, numHashes, as, bs)
      else {
        // limit -1: trailing empty tokens kept, matching Spark's split()
        // and DuckDB's string_split_regex — the three tokenizations must
        // agree or hashed grams diverge from their string-gram oracles
        val toks = WS.split(s, -1)
        val th = new Array[Long](toks.length)
        var i = 0
        while (i < toks.length) {
          val t = toks(i)
          th(i) = (scala.util.hashing.MurmurHash3.stringHash(t).toLong << 32) |
            (scala.util.hashing.MurmurHash3.stringHash(t, 0x9747b28c).toLong & 0xFFFFFFFFL)
          i += 1
        }
        val grams =
          if (toks.length < k) Iterator.single(th.foldLeft(1125899906842597L)(_ * 31 + _))
          else (0 to toks.length - k).iterator.map { i0 =>
            var h = 1125899906842597L
            var j = 0
            while (j < k) { h = h * 0x100000001B3L + th(i0 + j); j += 1 }
            h
          }
        signatureOf(grams, numHashes, as, bs)
      }
    }
    f(text)
  }

  private def signatureOf(hs: Iterator[Long], numHashes: Int,
                          as: Array[Long], bs: Array[Long]): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    while (hs.hasNext) {
      val h = hs.next()
      var i = 0
      while (i < numHashes) {
        val v = as(i) * h + bs(i)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  /** LSH banding: explode the signature into (band, bucket) keys. Documents
    * sharing any band bucket are near-dup candidates. `bands` must divide
    * the signature length.
    *
    * Bucket hashes are an FNV fold over each band's signature rows plus the
    * band index, computed in one tight loop per document — the composed
    * form (slice + concat_ws + xxhash64 per band) pays ~11 µs of
    * interpreted-lambda dispatch per band, which dominated the whole
    * minhash pass at corpus scale.
    */
  def lshBands(df: DataFrame, sigCol: String, bands: Int, idCol: String): DataFrame = {
    val f = bandBucketsUdf(bands)
    df.select(col(idCol), posexplode(f(col(sigCol))).as(Seq("band", "bucket")))
  }

  // package-visible: the streaming banded near-dedup reuses the exact
  // batch band-key fold so its collision semantics mirror L2's
  private[graft] def bandBucketsUdf(bands: Int) = udf { (sig: Seq[Long]) =>
    val rows = sig.length / bands
    val out = new Array[Long](bands)
    var b = 0
    var i = 0
    while (b < bands) {
      var h = 0xCBF29CE484222325L ^ b
      var r = 0
      while (r < rows) { h = (h ^ sig(i)) * 0x100000001B3L; r += 1; i += 1 }
      out(b) = h
      b += 1
    }
    out
  }

  /** Candidate near-dup pairs from LSH buckets: self-join on (band, bucket),
    * deduped across bands. The join key cardinality ~ corpus size × bands,
    * so this scales linearly; skewed (hot) buckets are handled by AQE.
    *
    * `maxBucket` bounds the one remaining quadratic edge: a bucket of m
    * documents emits m·(m−1)/2 pairs from the self-join, and real crawls
    * have near-identical-boilerplate clusters (templated pages, legal
    * footers) that survive exact dedup and land m ≫ 10⁴ documents in one
    * bucket — m² pair emission there stalls the stage no matter how AQE
    * splits the partition. Buckets larger than `maxBucket` instead emit a
    * CHAIN (each member paired with its successor — m−1 pairs), keeping
    * the bucket one connected component for [[dupClusters]] while
    * [[nearDedup]]'s greedy rule still drops all but one member. Cost per
    * oversized bucket falls from O(m²) pairs to an O(m log m) sort + O(m)
    * pairs; buckets at or under the bound are exhaustively paired exactly
    * as before, so results on a corpus with no mega-bucket are unchanged.
    *
    * Chain ORDER is a full-signature fingerprint, not the id: a mega-
    * bucket is a band collision, so it can mix several true near-dup
    * clusters with moderately-similar outliers, and an id-ordered chain
    * routed through an outlier would lose whole clusters when its links
    * fail Jaccard verification. Sorting by signature fingerprint makes
    * identical-signature members contiguous, so every identical-signature
    * subgroup (the boilerplate clusters the cap exists for) stays
    * internally chained through links that certainly pass verification;
    * what sampling gives up is only cross-subgroup pairs whose similarity
    * was moderate to begin with.
    *
    * EAGER: the returned pair list is materialized (localCheckpoint,
    * ids-only — the hammingDropIds discipline) so the banded skeleton's
    * persist is released before return and the mega-key broadcast
    * decision can be made from the actual key count at runtime.
    */
  def minhashCandidates(df: DataFrame, textCol: String, idCol: String,
                        k: Int = 3, numHashes: Int = 64, bands: Int = 16,
                        maxBucket: Int = 1000,
                        materialize: graft.pipeline.Materialize =
                          graft.pipeline.Materialize.Local): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.storage.StorageLevel
    val sigs = df.select(col(idCol),
      minhashSignatureFromText(col(textCol), k, numHashes).as("sig"))
    // __sg: 64-bit fingerprint of the FULL signature — the chain's sort
    // key (identical docs share it, see the chain-order note above).
    // The banded skeleton is persisted ONCE (released before return —
    // the operator is eager, see the checkpoint below), so the dominant
    // signature-UDF pass runs exactly once no matter how many branches
    // read it — which frees the bucket-size and successor derivations
    // from the former count/lead-over-Window.partitionBy(band, bucket)
    // coupling that routed a mega-bucket's whole membership through ONE
    // window-sort task (the last corpus-scaling window in the dedup
    // family).
    val (bb, releaseBb) = Bridge.persistedCopyReleasable(
      sigs.select(col(idCol), xxhash64(col("sig")).as("__sg"),
        posexplode(bandBucketsUdf(bands)(col("sig"))).as(Seq("band", "bucket"))),
      StorageLevel.MEMORY_AND_DISK) // skeleton rows are 32 B — the
    // hammingDropIds level; released before return either way
    // bucket sizes by PARTIAL-AGG (the count exchange carries at most one
    // row per (band, bucket) per map partition regardless of skew), then
    // the small/mega SPLIT routes through the MEGA-KEY LIST, not a
    // per-row size join-back. Mega keys are rare by construction (each
    // holds > maxBucket members), so the list is materialized eagerly
    // (localCheckpoint — this makes the whole operator EAGER, the
    // hammingDropIds discipline) and BROADCAST explicitly: both split
    // joins become map-side filters over the persisted skeleton, which
    // is never hash-partitioned by the (skewed) bucket key at all. AQE's
    // skew split cannot cover this join — its pattern needs bare shuffle
    // stages on both sides, and the key list is an aggregate — hence the
    // driver-side runtime decision. Degenerate guard: a corpus whose
    // mega-key list itself is huge (> rows/maxBucket ≈ 4M keys needs a
    // >4-billion-row single bucket domain) falls back to the shuffled
    // join rather than OOM the driver.
    val megaKeys = bb.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("__bsz"))
      .filter(col("__bsz") > maxBucket)
      .select(col("band"), col("bucket"))
      .localCheckpoint()
    val mk =
      if (megaKeys.count() <= 4000000L) broadcast(megaKeys) else megaKeys
    val small = bb.join(mk, Seq("band", "bucket"), "left_anti")
    val l = small.select(col(idCol).as("a"), col("band"), col("bucket"))
    val r = small.select(col(idCol).as("b"), col("band"), col("bucket"))
    val exhaustive = l.join(r, Seq("band", "bucket")).filter(col("a") < col("b"))
      .select("a", "b")
    // mega-buckets: signature-ordered successor chain per (band, bucket),
    // WITHOUT a bucket-partitioned window — range-partition by the full
    // chain sort key spreads one mega-bucket over many partitions (ties
    // split by id, so even a single identical-signature flood divides
    // uniformly), per-partition successors come from a lead over the
    // PARTITION-ID window (task size = range-partition size, independent
    // of any key's membership), and the cross-partition links are
    // stitched from a first/last-row boundary frame of ≤ one row per
    // partition. least/greatest keeps the (a < b) pair convention
    // nearDedup's drop-the-b-side rule depends on.
    val (mega, releaseMega) = Bridge.persistedCopyReleasable(
      bb.join(mk, Seq("band", "bucket"), "left_semi")
        .select(col("band"), col("bucket"), col("__sg"), col(idCol))
        .repartitionByRange(col("band"), col("bucket"), col("__sg"), col(idCol))
        .withColumn("__pid", spark_partition_id()),
      StorageLevel.DISK_ONLY)
    val wPid = Window.partitionBy(col("__pid"))
      .orderBy(col("band"), col("bucket"), col("__sg"), col(idCol))
    val inner = mega
      .withColumn("__nb", lead(col("band"), 1).over(wPid))
      .withColumn("__nk", lead(col("bucket"), 1).over(wPid))
      .withColumn("__nxt", lead(col(idCol), 1).over(wPid))
      .filter(col("__nxt").isNotNull &&
        col("__nb") === col("band") && col("__nk") === col("bucket"))
      .select(least(col(idCol), col("__nxt")).as("a"),
        greatest(col(idCol), col("__nxt")).as("b"))
    // boundary stitching: first/last row per non-empty partition (struct
    // order ≡ the chain sort order), densely re-ranked so an empty range
    // partition cannot break adjacency. The rank window is global but its
    // input is ≤ one row per partition — bounded by partition count, the
    // documented prefix-sum-totals class.
    val bounds = mega.groupBy(col("__pid"))
      .agg(min(struct(col("band"), col("bucket"), col("__sg"), col(idCol)))
          .as("__f"),
        max(struct(col("band"), col("bucket"), col("__sg"), col(idCol)))
          .as("__l"))
      .withColumn("__rn", row_number().over(Window.orderBy(col("__pid"))))
    val stitch = bounds.select(col("__rn"), col("__l"))
      .join(bounds.select((col("__rn") - 1).as("__rn"), col("__f")), "__rn")
      .filter(col("__l.band") === col("__f.band") &&
        col("__l.bucket") === col("__f.bucket"))
      .select(least(col(s"__l.$idCol"), col(s"__f.$idCol")).as("a"),
        greatest(col(s"__l.$idCol"), col(s"__f.$idCol")).as("b"))
    // eager so the skeleton persists can be released NOW; the strategy
    // is the caller's (default Local — the former bare localCheckpoint's
    // hammingDropIds fault-tolerance trade; Reliable round-trips the
    // ids-only pair list through parquet so the RETURNED frame survives
    // executor loss on preemptible fleets)
    val result = materialize.cutEager(
      exhaustive.union(inner).union(stitch).distinct(), "minhash-pairs")
    releaseMega(); releaseBb()
    result
  }

  /** The full near-dup pipeline: MinHash-LSH candidate generation →
    * n-gram Jaccard verification → thresholded pairs (a, b, jaccard).
    * This is the 100 TB-shaped composition: candidates are linear in
    * corpus size, gram sets are computed once per involved document, and
    * the verify join touches only candidates.
    */
  def nearDuplicates(df: DataFrame, textCol: String, idCol: String,
                     threshold: Double = 0.7, shingleK: Int = 3,
                     numHashes: Int = 64, bands: Int = 16,
                     jaccardN: Int = 2, maxBucket: Int = 1000): DataFrame = {
    val candidates = minhashCandidates(df, textCol, idCol, shingleK, numHashes, bands,
      maxBucket)
    val grams = df.select(col(idCol), ngramHashSet(col(textCol), jaccardN).as("__grams"))
    candidates
      .join(grams.withColumnRenamed(idCol, "a").withColumnRenamed("__grams", "__ga"), "a")
      .join(grams.withColumnRenamed(idCol, "b").withColumnRenamed("__grams", "__gb"), "b")
      .select(col("a"), col("b"), jaccardOfSets(col("__ga"), col("__gb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Survivors after near-dup removal: keep the lowest id of each dup pair
    * cluster edge (greedy per-pair: drop the higher id of every pair).
    */
  def nearDedup(df: DataFrame, textCol: String, idCol: String,
                threshold: Double = 0.7): DataFrame = {
    val drop = nearDuplicates(df, textCol, idCol, threshold)
      .select(col("b").as(idCol)).distinct()
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** Connected components over dup pairs (a, b): every node labeled with
    * its component's minimum id — the canonical "keep one per cluster"
    * semantics, transitive across chains (a~b, b~c ⇒ one cluster).
    *
    * Each round does (1) one-hop min-label propagation across edges and
    * (2) a pointer-jump (label(id) := label(label(id))), which doubles the
    * propagation reach per round → O(log diameter) rounds even on long
    * chains, the property that makes iterative CC viable on real dup
    * graphs (a pure 1-hop loop needs diameter rounds and never finishes a
    * 10k-node chain). All driver-side state is the loop counter; labels
    * stay distributed.
    *
    * Iteration hygiene for scale: each round's labels are eagerly
    * checkpointed — the plan stays constant-depth instead of accreting
    * every prior join (unbounded lineage = quadratic planning time and
    * stack overflows at real iteration counts), and because the new round
    * is materialized with truncated lineage before the old one is
    * unpersisted, executors never hold more than two label sets and no
    * unpersist can strand an unrecomputable descendant. Spec-checked on a
    * 10k-node chain and a random graph vs a driver union-find.
    *
    * Fault-tolerance: lineage truncation is the point of the per-round
    * checkpoint, so the two modes trade speed for recoverability. The
    * default `localCheckpoint` stores blocks unreplicated on executors —
    * fastest, but one executor lost mid-iteration (spot preemption,
    * dynamic allocation) fails the job. Pass `checkpointDir` (an HDFS path
    * at cluster scale) to spill each round's labels as parquet under that
    * directory instead: rounds survive any executor loss, the requested
    * directory is honored regardless of SparkContext checkpoint state, and
    * each round's files are DELETED as soon as the next round supersedes
    * them — only THIS run's final round files remain (they back the
    * returned DataFrame; the caller owns deleting the directory once done
    * with the result). Round paths carry a per-call unique prefix, so runs
    * sharing a directory — sequential or concurrent — never touch each
    * other's files; leftovers from an aborted run are likewise never
    * reused or deleted. Long CC runs on preemptible clusters should
    * always set it.
    *
    * Small-graph fast path: a dup-edge set at or under `driverBound`
    * edges (default 2¹⁸ ≈ 262k — sized for the COLLECTED form, boxed Rows
    * plus the union-find map, ~50-100 MB of driver heap worst-case with
    * string ids, not just the 4 MB of raw id pairs) is resolved by a
    * driver union-find with identical min-label semantics instead of
    * paying ~15 Spark jobs of iteration overhead; the distributed
    * rounds — the 100 TB path — engage above the bound (or always, with
    * `driverBound = 0`, which is how the iteration specs pin them). The
    * fast path writes no checkpoint files and its result is a plain
    * local DataFrame.
    */
  def dupClusters(pairs: DataFrame, maxIter: Int = 32,
                  checkpointDir: Option[String] = None,
                  driverBound: Long = 1L << 18): DataFrame = {
    val spark = pairs.sparkSession
    // per-call salt: two runs sharing a dir (sequential or concurrent)
    // write disjoint round paths, so one run's cleanup can never delete
    // files still lazily backing another run's returned frame; files left
    // by an ABORTED run are deliberately not touched (they might be a
    // live run's) — the caller owns the directory's lifecycle
    val salt = java.util.UUID.randomUUID().toString.take(8)
    def roundPath(dir: String, i: Int) =
      new org.apache.hadoop.fs.Path(dir, s"cc-$salt-round-$i")
    val edges = pairs.select(col("a"), col("b"))
      .union(pairs.select(col("b").as("a"), col("a").as("b")))
      .distinct().cache()
    val edgeCnt = edges.count()
    if (edgeCnt <= driverBound) {
      // driver union-find with the SAME min-label semantics (Spark's
      // min(): numeric for numbers, lexicographic for strings)
      def lt(x: Any, y: Any): Boolean = (x, y) match {
        case (a: Long, b: Long) => a < b
        case (a: Int, b: Int) => a < b
        case (a: String, b: String) => a < b
        case (a: java.lang.Number, b: java.lang.Number) => a.doubleValue < b.doubleValue
        case _ => x.toString < y.toString
      }
      val parent = scala.collection.mutable.HashMap.empty[Any, Any]
      def find(x: Any): Any = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      val rows = edges.collect()
      edges.unpersist()
      for (r <- rows) {
        val (ra, rb) = (find(r.get(0)), find(r.get(1)))
        if (ra != rb) { if (lt(ra, rb)) parent(rb) = ra else parent(ra) = rb }
        parent.getOrElseUpdate(r.get(0), find(r.get(0)))
        parent.getOrElseUpdate(r.get(1), find(r.get(1)))
      }
      val nodes = rows.iterator.flatMap(r => Iterator(r.get(0), r.get(1))).toSet
      val idType = pairs.schema("a").dataType
      val out = nodes.toSeq.map(n => org.apache.spark.sql.Row(n, find(n)))
      return spark.createDataFrame(
        spark.sparkContext.parallelize(out, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", idType),
          org.apache.spark.sql.types.StructField("label", idType))))
    }
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("label", col("id")).cache()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val viaEdges = edges.join(labels, edges("b") === labels("id"))
        .select(edges("a").as("id"), col("label"))
      val hop = labels.select(col("id"), col("label")).union(viaEdges)
        .groupBy("id").agg(min("label").as("label")).cache()
      val jumped = hop.alias("l")
        .join(hop.select(col("id").as("lid"), col("label").as("plabel")).alias("p"),
          col("l.label") === col("p.lid"), "left")
        .select(col("l.id").as("id"),
          least(col("l.label"), coalesce(col("p.plabel"), col("l.label"))).as("label"))
      // eager, truncates lineage either way; reliable mode survives
      // executor loss (see scaladoc)
      val next = checkpointDir match {
        case Some(dir) =>
          jumped.write.mode("overwrite").parquet(roundPath(dir, iter).toString)
          spark.read.parquet(roundPath(dir, iter).toString)
        case None => jumped.localCheckpoint()
      }
      val changed = next.alias("n").join(labels.alias("l"), "id")
        .filter(col("n.label") =!= col("l.label")).limit(1).count()
      // the previous round's spill is unreferenced once `changed` is
      // computed — delete it so the dir never holds more than two rounds
      checkpointDir.foreach { dir =>
        if (iter > 0) {
          val prev = roundPath(dir, iter - 1)
          val fs = prev.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (fs.exists(prev)) fs.delete(prev, true)
        }
      }
      hop.unpersist()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    labels
  }

  /** Dup-cluster AUDIT — "what did dedup actually find": the cluster-size
    * histogram over the connected components of a dup-pair set, the
    * observability report a pipeline owner reads after a dedup run (a
    * sudden mega-cluster = a boilerplate flood or a broken shingle
    * config; a wall of pairs = replica mirrors). Labels come from
    * [[dupClusters]] (same knobs); sizes partial-aggregate on the label,
    * the histogram on the size — both unskewed group-bys. Only docs that
    * appear in a pair are counted: singletons have no cluster.
    *
    * Returns (cluster_size, n_clusters, n_docs = size × clusters).
    */
  def dupClusterProfile(pairs: DataFrame, maxIter: Int = 32,
                        checkpointDir: Option[String] = None,
                        driverBound: Long = 1L << 18): DataFrame =
    dupClusters(pairs, maxIter, checkpointDir, driverBound)
      .groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"))

  /** 64-bit SimHash over whitespace tokens: per-token xxhash64, bitwise
    * vote, sign of each bit sum. Near-dups differ in few bits (compare with
    * `bit_count(a ^ b)`).
    */
  def simhash(text: Column): Column = simhashUdf(split(text, "\\s+"))

  private val simhashUdf = udf { (tokens: Seq[String]) =>
    val votes = new Array[Int](64)
    for (t <- tokens) {
      val h = scala.util.hashing.MurmurHash3.stringHash(t).toLong << 32 |
        (scala.util.hashing.MurmurHash3.stringHash(t.reverse).toLong & 0xFFFFFFFFL)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  /** Drop set for HAMMING-RADIUS near-dedup over any 64-bit fingerprint
    * skeleton `(id, h)` — the shared engine of the SimHash text tier
    * ([[simhashNearDedup]]) and the perceptual image tier
    * ([[graft.multimodal.Multimodal.dedupePerceptual]]):
    *
    *  1. EXACT tier: identical fingerprints collapse map-side to their
    *     min-id representative, so a flood of one re-posted fingerprint
    *     contributes ONE row to the quadratic stage.
    *  2. CANDIDATES: distinct fingerprints band-join on Manku-Jain-Sarma
    *     WIDE-PREFIX tables ([[hammingBandPairs]] — pigeonhole over block
    *     combinations, never-saturating ~2^32 bucket domains), verified
    *     with `bit_count(a ^ b)`.
    *  3. CLUSTERS: verified pairs resolve transitively through
    *     [[dupClusters]] keep-min.
    *
    * The input skeleton fans out into every stage, so it is persisted
    * once while the drop set is computed, then RELEASED: the returned
    * frame is eagerly materialized with truncated lineage
    * (`localCheckpoint`), so a long-lived driver running this daily
    * accumulates no cache entries. The trade — the same one
    * [[dupClusters]]' default rounds make — is fault-tolerance, not
    * recoverability: the checkpointed blocks are unreplicated and have
    * no lineage, so losing an executor that holds part of the (small,
    * ids-only) drop set before the caller's anti-join finishes fails
    * that JOB; rerun the operator. Returns one `id` column: every id
    * that is NOT its cluster's minimum; callers anti-join it. Rows with
    * null `h` must be filtered by the caller (no evidence, no drop).
    *
    * Scale: with ~32-bit bucket domains, `maxBucket` (a safety cap on
    * adversarially clustered DISTINCT fingerprints — identical ones
    * collapsed in tier 1) engages only past ~maxBucket × 2^32 ≈ 4×10¹³
    * distinct fingerprints at defaults, orders of magnitude beyond a
    * 100 TB corpus; see [[hammingBandPairs]] for the table design.
    */
  def hammingDropIds(skeleton: DataFrame, maxHamming: Int,
                     maxBucket: Int = 10000): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, s"maxHamming=$maxHamming")
    val (sk, release) = org.apache.spark.sql.graftbridge.Bridge.persistedCopyReleasable(
      skeleton.select(col("id"), col("h")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val reps = sk.groupBy(col("h")).agg(min(col("id")).as("id"))
    val pairs = hammingBandPairs(reps, Nil, maxHamming, maxBucket)
    // exact-tier drops (same fingerprint, not the min id) plus near-tier
    // drops (cluster label is the min rep, and every member's id >= its
    // rep, so the kept label is the cluster's global min)
    val exactDrop = sk.join(reps.withColumnRenamed("id", "__rep"), Seq("h"))
      .filter(col("id") =!= col("__rep"))
      .select(col("id"))
    val nearDrop = dupClusters(pairs)
      .filter(col("id") =!= col("label"))
      .select(col("id"))
    // eager + lineage-truncated so the skeleton cache can be dropped NOW
    // (fault-tolerance trade documented in the scaladoc above)
    val drop = exactDrop.union(nearDrop).distinct().localCheckpoint()
    release()
    drop
  }

  // Cap on the Manku table count C(d, maxHamming): at the defaults in use
  // (maxHamming ≤ 4) the widest 32-bit-prefix design fits exactly; larger
  // radii trade prefix width down to keep the explode factor bounded.
  private val HammingMaxTables = 70

  // C(d, k) with early bail once past `cap` (exact — the multiplicative
  // form stays integral at every step).
  private def binomialCapped(d: Int, k: Int, cap: Int): Long = {
    val kk = math.min(k, d - k)
    var r = 1L
    var i = 0
    while (i < kk) {
      r = r * (d - i) / (i + 1)
      if (r > cap) return r
      i += 1
    }
    r
  }

  /** Table design for Hamming-radius candidate generation — the
    * Manku-Jain-Sarma (WWW'07 near-duplicate detection) layout: split the
    * 64-bit code into `d` blocks; any two codes within Hamming distance
    * `k` differ in at most `k` blocks, so they agree EXACTLY on all
    * blocks of at least one (d−k)-block combination — each combination is
    * one probe table whose bucket key is the concatenation of its blocks
    * (a WIDE prefix, 64·(d−k)/d bits). The search is deliberately capped
    * at d = 2k — a 32-bit prefix (domain 4×10⁹: buckets hold O(1)
    * members even at 10¹⁰ distinct fingerprints, where the narrow
    * maxHamming+1-slice design saturates at ~10⁸ and silently loses
    * recall) — because wider prefixes past that buy nothing a real
    * corpus can measure while the explode factor C(d, k) grows
    * combinatorially; within the cap it picks the largest d whose
    * C(d, k) fits [[HammingMaxTables]], falling back toward narrower
    * prefixes (smaller d) only for large radii. The pigeonhole guarantee
    * is EXACT at any d > k; prefix width only governs bucket collision
    * cost.
    */
  private[graft] def hammingTableDesign(maxHamming: Int): (Int, Seq[Seq[Int]]) = {
    val k = maxHamming
    if (k == 0) return (1, Seq(Seq(0)))
    val d = (math.min(2 * k, 64) to (k + 1) by -1)
      .find(d => binomialCapped(d, k, HammingMaxTables) <= HammingMaxTables)
      .getOrElse(k + 1)
    (d, (0 until d).combinations(d - k).map(_.toSeq).toSeq)
  }

  // Concatenation of the chosen blocks of `h` (block i = bits
  // [i*64/d, (i+1)*64/d)) into one ≤63-bit prefix value.
  private def hammingPrefix(h: Column, combo: Seq[Int], d: Int): Column =
    combo.foldLeft(lit(0L)) { (acc, i) =>
      val lo = (i * 64) / d
      val width = ((i + 1) * 64) / d - lo
      val mask = if (width == 64) -1L else (1L << width) - 1
      shiftleft(acc, width)
        .bitwiseOR(shiftrightunsigned(h, lo).bitwiseAND(lit(mask)))
    }

  /** Width in bits of the bucket key [[hammingTableDesign]] yields for a
    * radius — the number that governs saturation: bucket membership grows
    * ~ distinct_codes / 2^width, so the quadratic verify cost inside
    * buckets stays O(1)-per-code only while the corpus is far below
    * 2^width. The defaults (radius ≤ 4 → 32 bits) hold past 10¹⁰ codes;
    * radius 5 → 24 bits (~1.7×10⁷ domain); radius ≥ 6 → 16 bits, the
    * saturation profile of the narrow pre-Manku design. Exposed so
    * callers can size a radius BEFORE building a billion-code index.
    */
  def hammingPrefixBits(maxHamming: Int): Int = {
    val (d, combos) = hammingTableDesign(maxHamming)
    // block widths differ by ≤1 bit when 64 % d != 0 — report the
    // narrowest combo, the one that saturates first
    combos.map(_.map(i => (i + 1) * 64 / d - i * 64 / d).sum).min
  }

  // Narrow-prefix advisory — the runtime face of [[hammingPrefixBits]]:
  // radii whose design falls below ~24 bits of bucket key silently revert
  // to the saturation profile the wide-prefix rebuild exists to avoid, so
  // every banding pass surfaces it (once per JVM per radius — band rows
  // are built per batch on streaming paths; a per-call warning would spam
  // every micro-batch). Returns the message so specs can pin exactly when
  // the signal fires without scraping logs.
  private val NarrowPrefixFloor = 24
  private val warnedRadii = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
  private[graft] def narrowPrefixWarning(maxHamming: Int): Option[String] = {
    val bits = hammingPrefixBits(maxHamming)
    if (bits >= NarrowPrefixFloor) None
    else {
      val msg = s"hamming radius $maxHamming yields $bits-bit bucket keys " +
        s"(domain ~${1L << bits}): bucket membership grows linearly past " +
        s"~10^${(bits * 0.301).toInt} distinct fingerprints and recall decays " +
        "once the write-time cap engages. Prefer radius <= 4 (32-bit keys), " +
        "or monitor hammingIndexMaxBucket / rebuild on cap engagement."
      if (warnedRadii.add(maxHamming))
        org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
      Some(msg)
    }
  }

  /** Capped wide-prefix band rows (grpCols..., id, h, band, bucket) of a
    * fingerprint skeleton — the shared explode of the within-run pair
    * generator ([[hammingBandPairs]]) and the persisted cross-run index
    * ([[writeHammingIndex]]). Each (grp, band, bucket) is capped to its
    * `maxBucket` min-id members; the cap window sees ~40 B skeletons
    * only. With ~32-bit prefixes the cap is a guard against adversarial
    * clustering of DISTINCT fingerprints, not a cardinality ceiling:
    * uniform corpora stay at O(1) members per bucket past 10¹⁰ codes —
    * but identical fingerprints all land in the same buckets in EVERY
    * band, so callers must collapse to distinct fingerprints first or
    * over-cap duplicates silently lose their band rows.
    */
  /** Array of (band, bucket) structs for a fingerprint column under the
    * radius's Manku table design — the pure-arithmetic core of
    * [[hammingBandRows]], exposed package-wide so STREAMING index probes
    * can band micro-batches under the index's persisted geometry: the cap
    * window (`row_number`) is unsupported over streaming frames, and a
    * probe side needs no cap — the index side was capped at write.
    */
  private[graft] def hammingBandStructs(h: Column, maxHamming: Int): Column = {
    narrowPrefixWarning(maxHamming)
    val (d, combos) = hammingTableDesign(maxHamming)
    array(combos.zipWithIndex.map { case (combo, t) =>
      struct(lit(t).as("band"), hammingPrefix(h, combo, d).as("bucket"))
    }: _*)
  }

  private[graft] def hammingBandRows(sk: DataFrame, grpCols: Seq[String],
                                     maxHamming: Int, maxBucket: Int): DataFrame = {
    val g = grpCols.map(col)
    val rows = sk.select(g ++ Seq(col("id"), col("h"),
        explode(hammingBandStructs(col("h"), maxHamming)).as("bb")): _*)
      .select(g ++ Seq(col("id"), col("h"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket")): _*)
    // min-id cap via the salted two-phase top-N (t15's discipline): the
    // final per-bucket rank sees ≤ saltParts × maxBucket rows however
    // adversarially clustered the bucket is — the former single
    // row_number window sorted the whole membership in one task
    graft.operators.Skew.saltedTopN(rows,
      g ++ Seq(col("band"), col("bucket")), col("id"), Seq(col("id")),
      maxBucket)
  }

  /** Verified Hamming-radius pairs over a fingerprint skeleton
    * `(grpCols..., id, h)`: explode each row into [[hammingTableDesign]]'s
    * wide-prefix tables ([[hammingBandRows]]), self-join on
    * (grpCols, table, prefix), verify `bit_count(a ^ b) <= maxHamming`.
    * Returns distinct (grpCols..., a, b) with a < b — dist-0 pairs
    * included, so callers that pre-collapse identical fingerprints (the
    * drop-set engine) see only near pairs, while per-group callers (the
    * video frame tier, which must count exact frame matches too) see
    * both.
    */
  private[graft] def hammingBandPairs(sk: DataFrame, grpCols: Seq[String],
                                      maxHamming: Int, maxBucket: Int): DataFrame = {
    val g = grpCols.map(col)
    val bands = hammingBandRows(sk, grpCols, maxHamming, maxBucket)
    val left = bands.withColumnRenamed("id", "a").withColumnRenamed("h", "__ha")
    val right = bands.withColumnRenamed("id", "b").withColumnRenamed("h", "__hb")
    left.join(right, grpCols ++ Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .filter(expr("bit_count(__ha ^ __hb)") <= maxHamming)
      .select(g ++ Seq(col("a"), col("b")): _*)
      .distinct()
  }

  /** SimHash near-dedup with a HAMMING RADIUS — what the 64-bit SimHash
    * ([[simhash]]) is actually for: where exact-signature dedup
    * (the d03 surface / the streaming [[graft.streaming.EventStreams
    * .dedupeNear]]) only collapses identical signatures, this drops every
    * document within `maxHamming` bits of a cluster representative,
    * transitively, via [[hammingDropIds]] — small text mutations flip few
    * signature bits, so near-identical documents collapse to their min-id
    * representative without any candidate text join.
    */
  def simhashNearDedup(df: DataFrame, textCol: String, idCol: String,
                       maxHamming: Int = 3): DataFrame = {
    // null text carries no signature evidence: such rows never enter the
    // skeleton (the simhash UDF would NPE) and always survive — the same
    // null-fingerprint contract as the image tier
    val drop = hammingDropIds(
      df.filter(col(textCol).isNotNull)
        .select(col(idCol).as("id"), simhash(col(textCol)).as("h")), maxHamming)
    df.join(drop.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
  }

  /** Distinct word n-gram set of a text column. Compute this ONCE per
    * document (projection before any join) — tokenizing inside a pair loop
    * multiplies the regex work by the candidate count.
    *
    * Sub-`n`-token documents contribute one degenerate gram built from the
    * TOKEN SEQUENCE (space-joined), not the raw text: two short docs that
    * differ only in whitespace ("a  b" vs "a b") share a gram, exactly as
    * the hashed twin [[ngramHashSet]] folds the token-hash sequence. Raw
    * text here would silently diverge from the hashed path.
    */
  def ngramSet(c: Column, n: Int = 2): Column = {
    val toks = split(c, "\\s+")
    val cnt = size(toks)
    when(cnt < n, array(concat_ws(" ", toks)))
      .otherwise(array_distinct(transform(sequence(lit(1), cnt - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
  }

  /** Distinct word n-gram set as 64-bit hashes, built in one tight loop
    * (token murmur hashes combined per gram). The join-side representation
    * for Jaccard verification at scale: 8-byte elements instead of strings
    * make the per-pair `array_intersect` both smaller to shuffle and far
    * faster to evaluate.
    */
  def ngramHashSet(c: Column, n: Int = 2): Column = ngramHashUdf(n)(c)

  private def ngramHashUdf(n: Int) = udf { (s: String) => ngramHashSetOf(s, n) }

  /** The per-row kernel behind [[ngramHashSet]], exposed for map-side
    * consumers (the streaming decontamination filter) that need the gram
    * set inside their own UDF without a second tokenization pass.
    */
  private[graft] def ngramHashSetOf(s: String, n: Int): Array[Long] = {
    if (s == null) Array.empty[Long]
    else {
      // limit -1: same tokenization as Spark's split()/DuckDB's
      // string_split_regex (trailing empty tokens kept) — see ngramSet
      val toks = WS.split(s, -1)
      val th = new Array[Long](toks.length)
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        th(i) = (scala.util.hashing.MurmurHash3.stringHash(t).toLong << 32) |
          (scala.util.hashing.MurmurHash3.stringHash(t, 0x9747b28c).toLong & 0xFFFFFFFFL)
        i += 1
      }
      val set = new java.util.HashSet[Long]()
      if (toks.length < n) set.add(th.foldLeft(1125899906842597L)(_ * 31 + _))
      else {
        i = 0
        while (i <= toks.length - n) {
          var h = 1125899906842597L
          var j = 0
          while (j < n) { h = h * 0x100000001B3L + th(i + j); j += 1 }
          set.add(h)
          i += 1
        }
      }
      val out = new Array[Long](set.size)
      val it = set.iterator()
      i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }
  }

  /** Benchmark-contamination report: for each corpus document, the number
    * of distinct word n-grams it shares with ANY benchmark document (docs
    * absent from the output are clean). Benchmark eval sets are tiny and
    * curated, so their distinct gram set broadcasts; the corpus is touched
    * once — grams hashed to 8 bytes per doc, exploded, broadcast-joined,
    * counted. No shuffle of text, no corpus×corpus pairing.
    */
  def contamination(corpus: DataFrame, benchmark: DataFrame, textCol: String,
                    idCol: String, n: Int = 8): DataFrame =
    corpus.select(col(idCol), explode(ngramHashSet(col(textCol), n)).as("__g"))
      .join(broadcast(benchGrams(benchmark, textCol, n)), "__g")
      .groupBy(idCol).agg(count(lit(1)).as("n_shared"))

  /** A benchmark's distinct gram-hash set — the shared ingredient of every
    * contamination flavor (exact broadcast join, Bloom build, Bloom-path
    * exact verify), factored so sizing/tokenization fixes can never drift
    * between them.
    */
  private def benchGrams(benchmark: DataFrame, textCol: String, n: Int): DataFrame =
    benchmark.select(explode(ngramHashSet(col(textCol), n)).as("__g")).distinct()

  // Bloom build needs TWO actions over the gram set (size it, then fill
  // it); `sized` persists across them so the tokenize+explode+distinct
  // work — multi-minute for the benchmarks this path exists for — runs
  // once. `retain` keeps the persisted copy alive for a caller that joins
  // against the grams afterwards (blocks are LRU-evictable and lineage is
  // kept, so retaining is safe at any benchmark size).
  private def bloomOf(grams: DataFrame, fpp: Double,
                      retain: Boolean): (org.apache.spark.util.sketch.BloomFilter, DataFrame) = {
    val sized = grams.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bf = sized.stat.bloomFilter("__g", math.max(sized.count(), 1L), fpp)
    if (!retain) sized.unpersist()
    (bf, sized)
  }

  /** Bloom filter of a benchmark's distinct gram hashes — the broadcastable
    * artifact behind [[contaminationBloom]] and the streaming
    * decontamination stage
    * ([[graft.streaming.EventStreams.curateDocs]]). Stateless once built:
    * membership tests run map-side wherever the filter is shipped. Sized
    * from the measured distinct-gram count at the given false-positive
    * rate; a consumer with no exact-verify join (the streaming path)
    * over-drops a clean g-gram document with probability ≲ g·fpp, so the
    * default fpp is tight.
    */
  def benchmarkBloom(benchmark: DataFrame, textCol: String, n: Int = 8,
                     fpp: Double = 1e-4): org.apache.spark.util.sketch.BloomFilter =
    bloomOf(benchGrams(benchmark, textCol, n), fpp, retain = false)._1

  /** Bloom-filter contamination — the documented escape hatch of
    * [[contamination]] for benchmarks too large to broadcast as an exact
    * gram set. A Bloom filter of the benchmark grams (`fpp` false-positive
    * rate, sized from the measured distinct-gram count) is broadcast
    * instead; corpus grams are pruned MAP-SIDE by `mightContain` — no
    * shuffle, no join for the overwhelmingly-clean majority — and only the
    * survivors meet the exact gram set in a join that kills the false
    * positives. Same results as [[contamination]] by construction (the
    * driver hash-gates d07 against d06's oracle); the broadcast shrinks
    * from O(grams × 8 bytes) to O(−n·ln(fpp)/ln²2 bits).
    */
  def contaminationBloom(corpus: DataFrame, benchmark: DataFrame, textCol: String,
                         idCol: String, n: Int = 8, fpp: Double = 0.01): DataFrame = {
    val (bf, bench) = bloomOf(benchGrams(benchmark, textCol, n), fpp, retain = true)
    val bcBf = corpus.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf { (g: Long) => bcBf.value.mightContainLong(g) }
    corpus.select(col(idCol), explode(ngramHashSet(col(textCol), n)).as("__g"))
      .filter(mightContain(col("__g")))
      .join(bench, "__g")
      .groupBy(idCol).agg(count(lit(1)).as("n_shared"))
  }

  /** POSITIONAL word n-gram hashes over the EMPTY-FILTERED tokenization:
    * element i is the hash of the gram starting at (filtered) token i —
    * the same token murmur pass and rolling combine as [[ngramHashSetOf]],
    * but over the span cut's token convention and keeping positions
    * instead of collapsing to a set, so a gram hit can be mapped back to
    * the spans it covers. Sub-`n`-token documents yield one degenerate
    * whole-sequence gram at position 0 (the [[ngramSet]] convention).
    */
  private[graft] def ngramHashesPosOf(s: String, n: Int): Array[Long] = {
    if (s == null) Array.empty[Long]
    else {
      val toks = WS.split(s, -1).filter(_.nonEmpty)
      val th = new Array[Long](toks.length)
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        th(i) = (scala.util.hashing.MurmurHash3.stringHash(t).toLong << 32) |
          (scala.util.hashing.MurmurHash3.stringHash(t, 0x9747b28c).toLong & 0xFFFFFFFFL)
        i += 1
      }
      if (toks.length < n) Array(th.foldLeft(1125899906842597L)(_ * 31 + _))
      else {
        val out = new Array[Long](toks.length - n + 1)
        i = 0
        while (i <= toks.length - n) {
          var h = 1125899906842597L
          var j = 0
          while (j < n) { h = h * 0x100000001B3L + th(i + j); j += 1 }
          out(i) = h
          i += 1
        }
        out
      }
    }
  }

  private def ngramHashesPosUdf(n: Int) = udf { (s: String) => ngramHashesPosOf(s, n) }

  /** SPAN-SURGICAL benchmark decontamination: instead of dropping a whole
    * document that shares n-grams with the benchmark ([[contamination]]'s
    * report feeding a doc-level gate), cut it into `spanTokens`-token
    * spans ([[dedupSpans]]'s cutting, verbatim), remove exactly the spans
    * any matching benchmark gram OVERLAPS (starts in or crosses into —
    * the gram starting at token p covers spans ⌊p/st⌋..⌊(p+n-1)/st⌋), and
    * reassemble the clean remainder in order. This is the standard
    * open-pipeline middle ground: a 10k-token article quoting one
    * benchmark question loses ~one span, not the article. Documents whose
    * every span is contaminated disappear entirely.
    *
    * Unlike [[contamination]] (whose unfiltered-edge-token convention is
    * shared with its oracle), grams here are computed over the SAME
    * empty-filtered tokenization as the span cut, so gram token positions
    * and span boundaries can never misalign on leading-whitespace
    * documents — both sides of the match use [[ngramHashesPosOf]].
    *
    * Returns (idCol, n_spans, n_kept, clean_text) — [[dedupSpans]]'s
    * shape. Scale: the benchmark gram set broadcasts (tiny, curated); the
    * corpus is scanned once for gram hits (map-side broadcast join — no
    * shuffle for the overwhelmingly-clean majority) and once for spans;
    * contaminated span indices aggregate per doc (bounded by the doc's
    * own span count) and span text shuffles exactly once, on the unskewed
    * id, reused by the reassembly group.
    */
  def decontaminateSpans(corpus: DataFrame, benchmark: DataFrame,
                         textCol: String, idCol: String,
                         spanTokens: Int = 3, n: Int = 8): DataFrame = {
    val bench = benchmark
      .select(explode(ngramHashesPosUdf(n)(col(textCol))).as("__g")).distinct()
    val hits = corpus
      .select(col(idCol), posexplode(ngramHashesPosUdf(n)(col(textCol)))
        .as(Seq("__p", "__g")))
      .join(broadcast(bench), "__g")
    val badPerDoc = hits
      .select(col(idCol), explode(sequence(
        floor(col("__p") / lit(spanTokens)).cast("int"),
        floor((col("__p") + lit(n - 1)) / lit(spanTokens)).cast("int"))).as("__bad"))
      .groupBy(col(idCol)).agg(collect_set(col("__bad")).as("__badset"))
    val tokenized = corpus.select(col(idCol),
      filter(split(col(textCol), "\\s+"), t => t =!= "").as("__toks"))
    val nSpans = ceil(size(col("__toks")) / lit(spanTokens.toDouble)).cast("long")
    val spans = tokenized.select(col(idCol), nSpans.as("n_spans"),
      posexplode(when(nSpans >= 1,
        transform(sequence(lit(0), (nSpans - 1).cast("int")),
          i => concat_ws(" ", slice(col("__toks"), i * spanTokens + 1, lit(spanTokens)))))
        .otherwise(array()))
        .as(Seq("pos", "span")))
    spans.join(badPerDoc, Seq(idCol), "left")
      .filter(col("__badset").isNull || !array_contains(col("__badset"), col("pos")))
      .groupBy(col(idCol), col("n_spans"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("span")))),
          x => x.getField("span")), " ").as("clean_text"))
  }

  /** Corpus-first-WINNER marking shared by the span/line/window dedup
    * tiers (d08/d18/d19): given one row per (document, distinct key)
    * carrying the document's first position in `pos`, mark each row with
    * whether it is the corpus-first occurrence of its key — the
    * lexicographic minimum (id, pos).
    *
    * Scale shape (replacing the former
    * `min(struct(id, pos)).over(Window.partitionBy(key))`): a corpus-hot
    * key — "Privacy Policy"-class boilerplate contained in nearly EVERY
    * document — would route its one-row-per-containing-doc set (~corpus
    * cardinality) through ONE window-sort task, the classic skew
    * straggler at 10^10 documents. Instead: (1) the skeleton is persisted
    * once (DISK_ONLY, lineage kept — `Bridge.persistedCopy`, the pipeline
    * Materialize precedent) because it now feeds two consumers, so the
    * dominant explode+collapse stage still runs exactly once; (2) winners
    * derive from `groupBy(key).agg(min(struct(id, pos)))`, whose PARTIAL
    * phase combines map-side — the key-hashed exchange carries at most
    * one candidate per key per map partition regardless of skew, the
    * exact e-phase discipline of [[graft.operators.Skew.saltedTopN]]
    * applied to an associative min; (3) the winner joins back on the
    * COMPOSITE (key, id, pos) — a hot key's rows carry distinct ids, so
    * the join's hash partitioning spreads them uniformly. No partition
    * anywhere scales with a key's document count (LineDedupBench pins
    * the per-task bound with a line planted in every document). Join
    * keys are null-SAFE (`<=>`) so d18's per-occurrence blank-line key
    * (null on content lines) matches itself.
    *
    * Returns the skeleton's rows plus a boolean `markCol`; the persisted
    * blocks are freed as soon as the first query consuming the result
    * completes (`Bridge.persistedCopyAutoRelease` — a repeated-batch
    * driver accumulates no disk blocks between GCs; a caller re-running
    * an action on the same result recomputes the skeleton, correctly).
    */
  private def markCorpusFirst(perDoc: DataFrame, keyCols: Seq[String],
                              idCol: String, markCol: String,
                              extraAgg: Seq[(String, Column)] = Nil): DataFrame = {
    val pd = org.apache.spark.sql.graftbridge.Bridge.persistedCopyAutoRelease(
      perDoc, org.apache.spark.storage.StorageLevel.DISK_ONLY)
    // optional extra PER-KEY aggregates (e.g. total occurrence count for
    // the repeat-mining tier) ride the same partial-agg exchange and reach
    // only the WINNER row through the composite join-back — no second
    // key-only join that would re-concentrate a hot key's rows
    val winners = pd.groupBy(keyCols.map(col): _*)
      .agg(min(struct(col(idCol), col("pos"))).as("__w"),
        extraAgg.map { case (n, c) => c.as(n) }: _*)
      .select(keyCols.zipWithIndex.map { case (k, i) => col(k).as(s"__k$i") } ++
        Seq(col(s"__w.$idCol").as("__wid"), col("__w.pos").as("__wpos"),
          lit(true).as(markCol)) ++ extraAgg.map { case (n, _) => col(n) }: _*)
    val cond = keyCols.zipWithIndex
      .map { case (k, i) => pd(k) <=> winners(s"__k$i") }
      .reduce(_ && _) &&
      pd(idCol) === winners("__wid") && pd("pos") === winners("__wpos")
    pd.join(winners, cond, "left")
      .select(pd.columns.toIndexedSeq.map(pd(_)) ++
        Seq(coalesce(winners(markCol), lit(false)).as(markCol)) ++
        extraAgg.map { case (n, _) => winners(n).as(n) }: _*)
  }

  /** Span-level exact dedup (the C4/RefinedWeb-style pass): each document
    * is cut into consecutive `spanTokens`-token spans, every span occurrence
    * except the corpus-FIRST one (minimum (id, position)) is removed, and
    * surviving spans are reassembled in order. Documents whose every span
    * was seen earlier disappear entirely. This is the complement of
    * document-level dedup: it removes repeated boilerplate EMBEDDED in
    * otherwise-distinct documents (headers, license blocks, navigation
    * text), which neither exact nor near document dedup can touch.
    *
    * Returns one row per surviving document: (idCol, n_spans, n_kept,
    * dedup_text). Reassembly joins spans with single spaces, so documents
    * with irregular whitespace come back whitespace-normalized — the same
    * canonicalization every downstream tokenizer applies anyway.
    *
    * Shuffle shape at scale: span TEXT never shuffles more than once per
    * (document, distinct span), and the corpus is scanned ONCE. Occurrences
    * first collapse map-side to (id, span, min pos) — the (id, span) key is
    * not skewed. The corpus-first winner per distinct span comes from
    * [[markCorpusFirst]]: the collapsed skeleton is persisted once (so the
    * dominant explode+collapse stage never re-runs — the double-branch
    * trap the LSH bucket sizing hit), winners are a partial-aggregated
    * `min(struct(id, pos))` groupBy whose exchange carries at most one
    * candidate per span per map partition, and the verdict joins back on
    * the composite (span, id, pos) — so a boilerplate span contained in
    * EVERY document never concentrates in one task (the former
    * span-partitioned window sorted its whole containing-doc set in one);
    * reassembly groups by id (unskewed).
    */
  def dedupSpans(df: DataFrame, textCol: String, idCol: String,
                 spanTokens: Int = 3): DataFrame = {
    // tokenize ONCE into a materialized column: referencing split(text)
    // directly from the span lambda would inline the tokenization into
    // every span's slice — O(spans × text) per document, measured ~5× the
    // whole stage on the bench corpus (CollapseProject keeps a non-cheap
    // multi-referenced alias as its own projection, so this split survives
    // as a single evaluation). Edge empty tokens are filtered: a leading-
    // whitespace document would otherwise cut a " a b" first span that
    // fails to match its unindented twin's "a b" — unlike the hashed-gram
    // operators (where the convention is shared with their oracles), span
    // text is compared ACROSS documents, so indentation must not leak in.
    val tokenized = df.select(col(idCol),
      filter(split(col(textCol), "\\s+"), t => t =!= "").as("__toks"))
    val nSpans = ceil(size(col("__toks")) / lit(spanTokens.toDouble)).cast("long")
    // guard the zero-token (empty/whitespace-only) document: Spark's
    // sequence(0, -1) would DESCEND, emitting two phantom spans
    val spans = tokenized.select(col(idCol), nSpans.as("n_spans"),
        posexplode(when(nSpans >= 1,
          transform(sequence(lit(0), (nSpans - 1).cast("int")),
            i => concat_ws(" ", slice(col("__toks"), i * spanTokens + 1, lit(spanTokens)))))
          .otherwise(array()))
          .as(Seq("pos", "span")))
    // collapse within-doc repeats map-side; keep each doc's first occurrence
    val perDoc = spans.groupBy(col(idCol), col("n_spans"), col("span"))
      .agg(min(col("pos")).as("pos"))
    // corpus-first occurrence per distinct span: salted two-phase min +
    // composite-key join-back (see markCorpusFirst — a window over the
    // span key would sort a hot span's whole containing-doc set in one task)
    markCorpusFirst(perDoc, Seq("span"), idCol, "__isw")
      .filter(col("__isw"))
      .groupBy(col(idCol), col("n_spans"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("span")))),
          x => x.getField("span")), " ").as("dedup_text"))
  }

  /** Corpus-wide exact LINE dedup (the RefinedWeb-style cleanup between
    * [[graft.text.TextOps.dropRepeatedLines]]' within-document pass and
    * [[dedupSpans]]' fixed-token spans): every non-blank line keeps only
    * its corpus-FIRST occurrence (minimum (id, position)) — the nav
    * menus, cookie banners and license blocks a crawl stamps across many
    * pages disappear from all but the earliest page, while line
    * boundaries (the natural unit HTML extraction emits) are respected
    * instead of a token grid. Blank lines are STRUCTURE, not content:
    * preserved per (document, position), never competing — a billion
    * pages' blank lines must not collapse into one document. Documents
    * whose every non-blank line was seen earlier (pure boilerplate
    * replays) disappear; null-text documents vanish like dedupSpans'.
    *
    * Returns (idCol, n_kept, dedup_text) — kept non-blank line count and
    * the reassembled text.
    *
    * Shuffle shape at scale (the L25 discipline): ONE corpus scan; line
    * occurrences collapse map-side to (id, distinct line, min pos) on
    * the unskewed (id, line) key, so a boilerplate line shared by every
    * document contributes ONE row per containing document downstream,
    * never one per occurrence; blank lines carry singleton keys (the key
    * gains their (id, pos), so no corpus-wide ""-group ever forms); the
    * verdict is [[markCorpusFirst]]'s salted two-phase min + composite
    * join-back — no partition scales with a line's document count;
    * reassembly groups by the unskewed id.
    */
  def dedupLinesGlobal(df: DataFrame, textCol: String,
                       idCol: String): DataFrame =
    reassembleLines(lineWinners(df, textCol, idCol), idCol)

  /** Shared line-cut + corpus-first-winner stage of the line-dedup tiers:
    * per-(doc, distinct non-blank line) skeleton rows (blanks carry a
    * per-occurrence key: no within-doc collapse, a singleton group,
    * auto-win), marked by [[markCorpusFirst]] and filtered to winners —
    * one row per kept line occurrence: (idCol, line, __bk, pos).
    */
  private def lineWinners(df: DataFrame, textCol: String,
                          idCol: String): DataFrame = {
    val exploded = df.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val isBlank = trim(col("line")) === ""
    val perDoc = exploded
      .withColumn("__bk",
        when(isBlank, struct(col(idCol), col("pos"))).otherwise(lit(null)))
      .groupBy(col(idCol), col("line"), col("__bk"))
      .agg(min(col("pos")).as("pos"))
    // corpus-first winner per (line, blank-key): salted two-phase min +
    // composite join-back (markCorpusFirst) — a line-partitioned window
    // would sort a universal boilerplate line's whole doc set in one task;
    // the null-safe key lets blank rows' singleton (id, pos) keys and the
    // content rows' null __bk both match themselves through the join
    markCorpusFirst(perDoc, Seq("line", "__bk"), idCol, "__isw")
      .filter(col("__isw"))
  }

  /** Reassemble per-document text from kept line rows; documents with no
    * surviving non-blank line vanish. */
  private def reassembleLines(kept: DataFrame, idCol: String): DataFrame =
    kept.groupBy(col(idCol))
      .agg(
        count(when(trim(col("line")) =!= "", 1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")), "\n").as("dedup_text"))
      .filter(col("n_kept") >= 1)

  /** Create an empty LINE-hash registry table for
    * [[dedupLinesAgainstRegistry]] — one `line_hash` column (md5 hex of
    * the line text), bucketed by it so every later anti-join and append
    * co-locates without shuffling the ever-growing registry side.
    */
  def createLineRegistry(spark: org.apache.spark.sql.SparkSession,
                         table: String, buckets: Int = 32): Unit = {
    import spark.implicits._
    graft.sources.Warehouse.writeBucketed(
      Seq.empty[String].toDF("line_hash"), table, "line_hash", buckets)
  }

  /** Incremental cross-RUN line dedup — the LINE-identity member of the
    * cross-run family, next to the exact-document registry
    * ([[dedupAgainstRegistry]]), the MinHash band index
    * ([[nearDedupAgainstIndex]]), the hamming index, and the semantic IVF
    * probe: a nav menu / cookie banner / license block ingested in an
    * EARLIER run must still strip from today's pages, which the within-run
    * pass ([[dedupLinesGlobal]]) structurally cannot see. Semantics:
    * within-batch corpus-first line dedup first (min (id, pos) wins,
    * blanks preserved per (doc, position) as structure), then every kept
    * non-blank line whose hash is already registered drops from every
    * document (the prior run kept its first occurrence); documents left
    * with no content line vanish. Unless `update = false`, surviving kept
    * lines' hashes append so the NEXT run sees them — lines that only
    * LOST their batch-first election do not register (their winner did).
    *
    * Scale shape: the [[dedupLinesGlobal]] discipline verbatim (map-side
    * (id, line) collapse, salted corpus-first winners, unskewed
    * reassembly), plus ONE anti-join of the batch's winner skeletons
    * against a registry BUCKETED on the line hash — the ever-growing
    * registry is never shuffled, only the day's (bounded) winner set is,
    * and the exchange carries 32-char hashes, never line text.
    *
    * Failure contract ([[dedupAgainstRegistry]]'s verbatim): with
    * `update = true` the anti-join executes exactly once, inside the
    * append job; the returned frame derives the kept content lines from
    * the append's own delta files (a fixed path list), so recomputation
    * after executor loss — or a late re-read after later batches grew the
    * registry — can never lose rows. Single writer per registry table.
    *
    * Returns (idCol, n_kept, dedup_text) — [[dedupLinesGlobal]]'s shape.
    */
  def dedupLinesAgainstRegistry(batch: DataFrame, textCol: String,
                                idCol: String, registryTable: String,
                                update: Boolean = true): DataFrame = {
    val spark = batch.sparkSession
    val winners = lineWinners(batch, textCol, idCol)
    val blanks = winners.filter(col("__bk").isNotNull)
    val content = winners.filter(col("__bk").isNull)
      .withColumn("line_hash", md5(col("line").cast("binary")))
    val keptContent =
      if (!update)
        content.join(spark.table(registryTable), Seq("line_hash"), "left_anti")
          .drop("line_hash")
      else {
        val fresh = content.join(spark.table(registryTable),
          Seq("line_hash"), "left_anti")
        val delta = graft.sources.Warehouse.appendBucketedWithDelta(
          fresh.select(col("line_hash")), registryTable, "line_hash")
        if (delta.isEmpty) content.filter(lit(false)).drop("line_hash")
        else content.join(spark.read.parquet(delta: _*),
          Seq("line_hash"), "left_semi").drop("line_hash")
      }
    reassembleLines(keptContent.unionByName(blanks), idCol)
  }

  /** Exact SUBSTRING dedup — the Lee-et-al.-2021 ("Deduplicating Training
    * Data Makes Language Models Better") tier, approximated on fixed
    * `windowTokens`-token anchors instead of a suffix array: every
    * occurrence of an L-token window except the corpus-FIRST (min
    * (id, pos), including a document's own later repeats) has its covered
    * token range removed, and documents reassemble from surviving tokens.
    * Because windows slide at stride 1, a shared substring is caught at
    * ANY alignment — the shifted repeats [[dedupSpans]]' non-overlapping
    * grid structurally misses (its spans only match when the repeat lands
    * on the same k-token boundary). The relationship to the published
    * suffix-array construction, stated precisely: two positions share an
    * L-token window iff their suffixes share an L-token prefix — the
    * predicate a suffix array's LCP computation answers — and inside a
    * maximal repeat of m ≥ L tokens every one of its m−L+1 windows
    * matches cross-occurrence, so the covered union of a non-first
    * occurrence is EXACTLY its m repeat tokens (spec-pinned on a
    * 13-token repeat at three alignments). The window groupBy therefore
    * computes the same ≥-L-repeat removal in ONE shuffle where prefix
    * doubling pays O(log L) global sorts; what the suffix array would
    * add is sub-threshold LCP statistics this operator does not need.
    * The honest residual deltas: repeats shorter than L are invisible
    * (the threshold semantics both methods share), and the corpus-first
    * winner is elected per WINDOW, so when distinct documents each
    * contain different earliest windows of one repeat, the removal
    * mosaic can differ from a per-repeat election. Pure replays
    * disappear; sub-L and null-text documents pass through / vanish like
    * dedupSpans'.
    *
    * Returns (idCol, n_tokens, n_kept, dedup_text).
    *
    * Shuffle shape at scale: occurrences collapse map-side to one row per
    * (document, distinct window) carrying the position LIST (within-doc
    * repeats are rare and bounded by doc length), so a corpus-hot
    * boilerplate window contributes ONE row per containing document
    * downstream — the L25 discipline; the removal verdict is
    * [[markCorpusFirst]]'s salted two-phase min + composite join-back
    * (no partition scales with a window's document count); coverage
    * marking is row-local (`exists` over the doc's removed-start list);
    * reassembly re-reads the corpus once (2 parquet scans total, the d16
    * shape — verdict rows carry no payload back). Window STRINGS ride
    * the exchange by default
    * (the d08 convention: cross-engine comparability over a 64-bit
    * hash's collision risk); `hashWindows = true` is the 100 TB escape
    * hatch — the exchange key becomes `xxhash64(window)` (~6× fewer
    * shuffled bytes at 8-token windows), results identical barring a
    * 64-bit collision (spec-pinned equal on a planted corpus).
    */
  def dedupSubstrings(df: DataFrame, textCol: String, idCol: String,
                      windowTokens: Int = 8,
                      hashWindows: Boolean = false): DataFrame = {
    require(windowTokens >= 2, s"windowTokens=$windowTokens")
    val L = windowTokens
    val tokenized = df.select(col(idCol),
      filter(split(col(textCol), "\\s+"), t => t =!= "").as("__toks"))
    val nWin = size(col("__toks")) - L + 1
    val winsRaw = tokenized.select(col(idCol),
      posexplode(when(nWin >= 1,
        transform(sequence(lit(0), (nWin - 1).cast("int")),
          i => concat_ws(" ", slice(col("__toks"), i + 1, lit(L)))))
        .otherwise(array()))
        .as(Seq("pos", "win")))
    val wins =
      if (!hashWindows) winsRaw
      else winsRaw.withColumn("win", xxhash64(col("win")))
    // corpus-first winner per distinct window: salted two-phase min +
    // composite join-back (markCorpusFirst) — a win-partitioned window
    // would sort a hot window's whole containing-doc set in one task
    val removed = removedWindowStarts(wins, Seq("win"), idCol)
    tokenized.join(removed, Seq(idCol), "left")
      .select(col(idCol), size(col("__toks")).cast("long").as("n_tokens"),
        filter(col("__toks"), (_, j) =>
          col("__rs").isNull ||
            !exists(col("__rs"), s => s <= j && j < s + L)).as("__kept"))
      .withColumn("n_kept", size(col("__kept")).cast("long"))
      .filter(col("n_kept") >= 1)
      .select(col(idCol), col("n_tokens"), col("n_kept"),
        array_join(col("__kept"), " ").as("dedup_text"))
  }

  /** The shared d19/d20 removal-verdict middle: from one row per
    * stride-1 window occurrence `(idCol, pos, keyCols…)`, collapse
    * within-doc repeats map-side on the unskewed (id, key) key, elect
    * the corpus-first occurrence per distinct key through
    * [[markCorpusFirst]]'s salted two-phase min + composite join-back,
    * and return one row per affected document with the array of
    * REMOVED window start positions (`__rs`). No partition anywhere
    * scales with a key's document count.
    */
  private def removedWindowStarts(keyed: DataFrame, keyCols: Seq[String],
                                  idCol: String): DataFrame = {
    val perDoc = keyed.groupBy((col(idCol) +: keyCols.map(col)): _*)
      .agg(min(col("pos")).as("pos"), collect_list(col("pos")).as("poss"))
    markCorpusFirst(perDoc, keyCols, idCol, "__isw")
      .withColumn("__rm",
        when(col("__isw"), array_except(col("poss"), array(col("pos"))))
          .otherwise(col("poss")))
      .filter(size(col("__rm")) > 0)
      .groupBy(col(idCol))
      .agg(flatten(collect_list(col("__rm"))).as("__rs"))
  }

  /** Per-position exact window keys of length `L` built by PREFIX
    * DOUBLING over equality-preserving dense labels — the distributed
    * suffix-array construction (Manber–Myers doubling), carried only as
    * far as duplicate detection at threshold L needs: ceil(log2 L)
    * labeling rounds give every position its 2^k-token context rank, and
    * the exact-length key is the OVERLAPPING-halves pair
    * `(r_a(p), r_a(p + L − 2^a))` with `2^a = highestOneBit(L)` — two
    * L-windows are equal iff their half-pairs are equal (the classic
    * sparse-table argument: the halves cover the window with overlap).
    *
    * Why this exists next to the window-string path: the exchange never
    * carries TEXT — round k shuffles fixed 24-byte (pos, label) rows and
    * 16-byte label pairs regardless of L, where window strings cost
    * O(L × token bytes) per position (≈300 B at the Lee-et-al. L=50).
    * And unlike `hashWindows`, equality is EXACT — labels are assigned
    * per distinct value as its RANK in the sorted distinct set
    * (sort + zipWithIndex: the index is the value's ordinal in a total
    * order, so it is identical on every run AND under partial
    * recomputation after executor loss — a monotonically_increasing_id
    * label over a shuffled distinct would depend on nondeterministic
    * shuffle-read order and could relabel a recomputed partition
    * differently from labels already consumed elsewhere in the job),
    * so there is no 64-bit collision caveat at any corpus size.
    * Measured honestly (RepeatDedupBench L=50, 100k docs, local[32]):
    * the string engine wins local WALL CLOCK ~4× — its one wide shuffle
    * beats log L rounds when shuffle bytes move at memory speed — so
    * strings stay the default; what the rank engine buys is bounded
    * exchange WIDTH (log L fixed-width rounds vs O(L)-byte keys, the
    * axis that matters when the exchange crosses a real network) and
    * collision-free exactness where `hashWindows` would otherwise be
    * forced by key volume.
    *
    * Scale shape: windows never cross documents, so ranks live as
    * per-document arrays — each round is (a) a row-local pair build,
    * (b) a distinct + label over the pairs, (c) an equi-join back and a
    * per-document regroup. The label join is a shuffled hash join whose
    * hot keys ("the", frequent bigrams) are exactly the shape AQE's
    * skew-join split handles (the small side replicates); intermediates
    * persist via the auto-releasing skeleton discipline so each round
    * materializes once and every block is freed when the consuming
    * query finishes. Total: O(log L) fixed-width shuffle rounds — the
    * 100 TB path for large thresholds.
    *
    * Returns one row per full L-window: (idCol, pos, __k0, __k1).
    */
  private def rankKeyedWindows(tokenized: DataFrame, idCol: String,
                               L: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.storage.StorageLevel
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val W = Integer.highestOneBit(L)
    // deterministic dense labels: rank in the sorted distinct set. The
    // sorted frame persists (auto-released) so zipWithIndex's count job
    // and the emit read one materialization; the index survives partial
    // recomputation because the sort key is total over distinct values.
    def denseLabels(distinctDf: DataFrame, key: Column): DataFrame = {
      val sorted = Bridge.persistedCopyAutoRelease(distinctDf.sort(key),
        StorageLevel.MEMORY_AND_DISK)
      val schema = StructType(sorted.schema.fields :+
        StructField("__r", LongType, nullable = false))
      sorted.sparkSession.createDataFrame(
        sorted.rdd.zipWithIndex.map { case (r, i) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i) },
        schema)
    }
    // width-1 labels: one per distinct token
    val tokOcc = tokenized.select(col(idCol),
      posexplode(col("__toks")).as(Seq("pos", "__t")))
    val lab0 = denseLabels(tokOcc.select(col("__t")).distinct(), col("__t"))
    var cur = tokOcc.join(lab0, "__t")
      .groupBy(col(idCol))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("__r")))),
        x => x.getField("__r")).as("__rks"))
    var w = 1
    while (w < W) {
      // width w → 2w: pair each position's label with the label w ahead
      // (row-local), then re-densify the pairs corpus-wide
      val pairCol = when(size(col("__rks")) >= w + 1,
        transform(sequence(lit(0), (size(col("__rks")) - w - 1).cast("int")),
          i => struct(element_at(col("__rks"), i + 1).as("x"),
            element_at(col("__rks"), i + w + 1).as("y"))))
        .otherwise(array())
      val occ = Bridge.persistedCopyAutoRelease(
        cur.select(col(idCol), posexplode(pairCol).as(Seq("pos", "__p"))),
        StorageLevel.MEMORY_AND_DISK)
      val lab = denseLabels(occ.select(col("__p")).distinct(), col("__p"))
      cur = occ.join(lab, "__p")
        .groupBy(col(idCol))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("__r")))),
          x => x.getField("__r")).as("__rks"))
      w *= 2
    }
    // exact length L from overlapping W-wide halves: positions 0 .. n−L
    val off = L - W
    val keyCol = when(size(col("__rks")) >= off + 1,
      transform(sequence(lit(0), (size(col("__rks")) - off - 1).cast("int")),
        i => struct(element_at(col("__rks"), i + 1).as("__k0"),
          element_at(col("__rks"), i + off + 1).as("__k1"))))
      .otherwise(array())
    cur.select(col(idCol), posexplode(keyCol).as(Seq("pos", "__kk")))
      .select(col(idCol), col("pos"),
        col("__kk.__k0").as("__k0"), col("__kk.__k1").as("__k1"))
  }

  /** Variable-length MAXIMAL-repeat dedup — the Lee-et-al.-2021
    * ("Deduplicating Training Data Makes Language Models Better")
    * ExactSubstr tier at its published granularity: every duplicated
    * substring of `minTokens` or more tokens keeps only its corpus-FIRST
    * occurrence (min (id, pos), within-doc repeats included), and each
    * affected document reports its removed extents as MAXIMAL segments —
    * exact boundaries and exact (variable) lengths, not a fixed window
    * grid. This closes [[dedupSubstrings]]' two documented residuals
    * when run at a lower threshold: repeats shorter than its L become
    * visible (set `minTokens` to the published 50 — or 4 here — rather
    * than tuning one L for both cost and semantics), and the removal
    * union is reported per REPEAT REGION (merged extent + length), the
    * unit a curation pipeline audits.
    *
    * Engines (results identical — spec-pinned):
    *  - `"strings"` (default): stride-1 window strings, the d08/d19
    *    cross-engine-comparable convention — this is the oracle-gated
    *    path.
    *  - `"ranks"`: [[rankKeyedWindows]]' prefix-doubling dense labels —
    *    the exchange never carries text (O(log minTokens) fixed-width
    *    rounds), and equality is exact with NO hash-collision caveat.
    *    Slower at local[32] (measured — see rankKeyedWindows); choose it
    *    when exchange bytes or hash-collision exposure, not local CPU,
    *    is the binding constraint.
    *
    * Returns (idCol, n_tokens, n_kept, n_repeats_removed,
    * max_repeat_len, dedup_text): removed-extent count and longest
    * extent per surviving document; documents whose every token was a
    * non-first repeat disappear (pure replays), sub-threshold and
    * null-text documents pass through / vanish like dedupSubstrings'.
    *
    * Shuffle shape at scale: identical to d19's audited shape — one
    * corpus scan into the collapsed (id, key) skeleton, the
    * [[markCorpusFirst]] salted verdict, row-local coverage/segment
    * folding, and one reassembly re-scan (2 parquet scans total). The
    * segment statistics add NO shuffle: maximal extents are a row-local
    * fold over each document's covered-position flags.
    */
  def dedupRepeats(df: DataFrame, textCol: String, idCol: String,
                   minTokens: Int = 4, engine: String = "strings"): DataFrame = {
    require(minTokens >= 2, s"minTokens=$minTokens")
    val L = minTokens
    val tokenized = df.select(col(idCol),
      filter(split(col(textCol), "\\s+"), t => t =!= "").as("__toks"))
    val (keyed, keys) = engine match {
      case "strings" =>
        val nWin = size(col("__toks")) - L + 1
        (tokenized.select(col(idCol),
          posexplode(when(nWin >= 1,
            transform(sequence(lit(0), (nWin - 1).cast("int")),
              i => concat_ws(" ", slice(col("__toks"), i + 1, lit(L)))))
            .otherwise(array()))
            .as(Seq("pos", "__k0"))), Seq("__k0"))
      case "ranks" =>
        (rankKeyedWindows(tokenized, idCol, L), Seq("__k0", "__k1"))
      case other =>
        throw new IllegalArgumentException(s"engine=$other (strings|ranks)")
    }
    val removed = removedWindowStarts(keyed, keys, idCol)
    val n = size(col("__toks"))
    // covered-position flags, then maximal-run lengths via a row-local
    // fold (cur run length + completed runs)
    val cov = when(n >= 1,
      transform(sequence(lit(0), (n - 1).cast("int")), j =>
        coalesce(exists(col("__rs"), s => s <= j && j < s + L), lit(false))))
      .otherwise(array().cast("array<boolean>"))
    val segLens = aggregate(col("__cov"),
      struct(lit(0).as("cur"), array().cast("array<int>").as("done")),
      (acc, c) => struct(
        when(c, acc.getField("cur") + 1).otherwise(lit(0)).as("cur"),
        when(!c && acc.getField("cur") > 0,
          concat(acc.getField("done"), array(acc.getField("cur"))))
          .otherwise(acc.getField("done")).as("done")),
      acc => when(acc.getField("cur") > 0,
        concat(acc.getField("done"), array(acc.getField("cur"))))
        .otherwise(acc.getField("done")))
    tokenized.join(removed, Seq(idCol), "left")
      .withColumn("__cov", cov)
      .withColumn("__segs", segLens)
      .withColumn("__kept", filter(col("__toks"), (_, j) =>
        col("__rs").isNull ||
          !exists(col("__rs"), s => s <= j && j < s + L)))
      .select(col(idCol), n.cast("long").as("n_tokens"),
        size(col("__kept")).cast("long").as("n_kept"),
        size(col("__segs")).cast("long").as("n_repeats_removed"),
        coalesce(array_max(col("__segs")), lit(0)).cast("long")
          .as("max_repeat_len"),
        array_join(col("__kept"), " ").as("dedup_text"))
      .filter(col("n_kept") >= 1)
  }

  /** Corpus-wide REPEAT MINING — the analysis complement of
    * [[dedupRepeats]]: every maximal duplicated extent (the merged union
    * of overlapping duplicated `minTokens`-windows, in EVERY occurrence
    * including the corpus-first one) is extracted with its text and
    * grouped corpus-wide. This is the "what IS my boilerplate" question
    * a curation run asks before choosing thresholds: nav menus, license
    * blocks and template sentences surface with their document reach and
    * occurrence counts, ranked.
    *
    * Returns topK rows (repeat_text, repeat_len, n_docs, n_occurrences)
    * ordered by n_occurrences desc, then text. Occurrences count maximal
    * extents (a doc repeating a phrase twice in two separate extents
    * contributes two), n_docs distinct documents.
    *
    * Scale shape: duplicated-ness reaches winner rows through
    * [[markCorpusFirst]]'s composite join-back (`extraAgg` total — no
    * second key-only join re-concentrating a hot key); non-winner rows
    * are duplicated by definition. Extent text rides the exchange once
    * per (doc, extent) — the d19 string convention; the final group-by
    * is partial-aggregated (count-distinct expands to the unskewed
    * (text, id) key first), and top-K is a TakeOrdered, never a global
    * sort.
    */
  def repeatProfile(df: DataFrame, textCol: String, idCol: String,
                    minTokens: Int = 4, topK: Int = 100): DataFrame = {
    require(minTokens >= 2, s"minTokens=$minTokens")
    val L = minTokens
    val tokenized = df.select(col(idCol),
      filter(split(col(textCol), "\\s+"), t => t =!= "").as("__toks"))
    val nWin = size(col("__toks")) - L + 1
    val wins = tokenized.select(col(idCol),
      posexplode(when(nWin >= 1,
        transform(sequence(lit(0), (nWin - 1).cast("int")),
          i => concat_ws(" ", slice(col("__toks"), i + 1, lit(L)))))
        .otherwise(array()))
        .as(Seq("pos", "__k0")))
    val perDoc = wins.groupBy(col(idCol), col("__k0"))
      .agg(min(col("pos")).as("pos"), collect_list(col("pos")).as("poss"))
    val marked = markCorpusFirst(perDoc, Seq("__k0"), idCol, "__isw",
      extraAgg = Seq("__tot" -> sum(size(col("poss")))))
    // coverage = every occurrence of a window with ≥2 corpus occurrences:
    // non-winner rows always (the winner site is elsewhere), winner rows
    // when the corpus total says so
    val covStarts = marked
      .withColumn("__cv",
        when(!col("__isw") || col("__tot") >= 2, col("poss"))
          .otherwise(array().cast("array<int>")))
      .filter(size(col("__cv")) > 0)
      .groupBy(col(idCol))
      .agg(flatten(collect_list(col("__cv"))).as("__cs"))
    val n = size(col("__toks"))
    // maximal extents with START positions: row-local fold over j
    val segs = aggregate(
      when(n >= 1, sequence(lit(0), (n - 1).cast("int")))
        .otherwise(array().cast("array<int>")),
      struct(lit(-1).as("st"), lit(0).as("cur"),
        array().cast("array<struct<start:int,len:int>>").as("done")),
      (acc, j) => {
        val c = coalesce(exists(col("__cs"), s => s <= j && j < s + L),
          lit(false))
        struct(
          when(c && acc.getField("cur") === 0, j)
            .otherwise(acc.getField("st")).as("st"),
          when(c, acc.getField("cur") + 1).otherwise(lit(0)).as("cur"),
          when(!c && acc.getField("cur") > 0,
            concat(acc.getField("done"), array(struct(
              acc.getField("st").as("start"), acc.getField("cur").as("len")))))
            .otherwise(acc.getField("done")).as("done"))
      },
      acc => when(acc.getField("cur") > 0,
        concat(acc.getField("done"), array(struct(
          acc.getField("st").as("start"), acc.getField("cur").as("len")))))
        .otherwise(acc.getField("done")))
    tokenized.join(covStarts, Seq(idCol), "inner")
      .withColumn("__sg", explode(segs))
      .select(col(idCol),
        concat_ws(" ", slice(col("__toks"), col("__sg.start") + 1,
          col("__sg.len"))).as("repeat_text"),
        col("__sg.len").cast("long").as("repeat_len"))
      .groupBy(col("repeat_text"), col("repeat_len"))
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("repeat_text"))
      .limit(topK)
  }

  /** Create an empty content-hash registry table for
    * [[dedupAgainstRegistry]] — one `content_hash` column, bucketed by it
    * so every later anti-join and append co-locates without shuffling the
    * (ever-growing) registry side.
    */
  def createRegistry(spark: org.apache.spark.sql.SparkSession, table: String,
                     buckets: Int = 32): Unit = {
    import spark.implicits._
    graft.sources.Warehouse.writeBucketed(
      Seq.empty[String].toDF("content_hash"), table, "content_hash", buckets)
  }

  /** Incremental exact dedup across pipeline RUNS: dedup `batch` within
    * itself (keep-min, [[exact]]'s shape), drop every document whose
    * content hash is already in the persisted registry table, and (unless
    * `update = false`) append the survivors' hashes so the NEXT run sees
    * them. This is the batch complement of the streaming intake's
    * watermark-bounded dedup ([[graft.streaming.EventStreams.curateDocs]]):
    * a daily-growing corpus runs curate() per batch and this pass against
    * the registry of everything already ingested — the same
    * build-once/grow-incrementally contract as
    * [[graft.similarity.Similarity.appendToIvfIndex]].
    *
    * Scale shape: the batch side collapses to one candidate per distinct
    * content map-side before anything touches the registry; the anti-join
    * is keyed on the hash against a registry BUCKETED on it (appends keep
    * the bucket spec from the table's catalog entry), so the registry —
    * the side that grows without bound — is never shuffled, only the
    * (bounded) day's batch is. Text never joins; only 64-char hashes.
    *
    * Failure contract: with `update = true` the anti-join against the big
    * registry executes exactly ONCE, inside the append job; the returned
    * frame is then derived from the append's own delta files (a fixed
    * path list), so recomputation after executor loss — or a caller
    * re-reading the result long after later batches have grown the
    * registry — can never re-run the anti-join against a registry that
    * already contains this batch's hashes and silently lose rows. Single
    * writer per registry table at a time.
    */
  def dedupAgainstRegistry(batch: DataFrame, textCol: String, idCol: String,
                           registryTable: String, update: Boolean = true): DataFrame = {
    val spark = batch.sparkSession
    val withinBatch = exact(batch, textCol, idCol)
      .withColumn("content_hash", sha2(col(textCol).cast("binary"), 256))
    val fresh = withinBatch.join(spark.table(registryTable),
      Seq("content_hash"), "left_anti")
    if (!update) fresh.drop("content_hash")
    else {
      val delta = graft.sources.Warehouse.appendBucketedWithDelta(
        fresh.select(col("content_hash")), registryTable, "content_hash")
      if (delta.isEmpty) withinBatch.filter(lit(false)).drop("content_hash")
      else withinBatch.join(spark.read.parquet(delta: _*),
        Seq("content_hash"), "left_semi").drop("content_hash")
    }
  }

  /** Materialize a MinHash BAND INDEX over a corpus — the NEAR-dup twin
    * of the exact-hash registry ([[createRegistry]]/[[dedupAgainstRegistry]]):
    * a persisted (band, bucket, id) table bucketed on the bucket hash, an
    * id-bucketed `<table>_sigs` signature sibling for verification, and a
    * `<table>_mhspec` geometry sibling (k/numHashes/bands/maxBucket — an
    * append or probe can never hash with different geometry than the
    * build, the `_lshspec` contract). Later batches near-dedup against
    * everything already ingested with ONE signature pass over the day's
    * batch only ([[nearDedupAgainstIndex]]).
    *
    * Mega-bucket bound AT WRITE: each (band, bucket) keeps at most
    * `maxBucket` member rows (deterministic minimum ids — a skeleton-row
    * window, the L2 chain discipline). A batch doc colliding with a
    * truncated boilerplate bucket still verifies against `maxBucket`
    * near-identical representatives, so the dedup VERDICT is unaffected;
    * what is given up is the flood's internal pair list, exactly the
    * batch candidate stage's trade.
    */
  def writeMinhashIndex(df: DataFrame, textCol: String, idCol: String,
                        table: String, k: Int = 3, numHashes: Int = 64,
                        bands: Int = 16, buckets: Int = 32,
                        maxBucket: Int = 1000): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val sigs = df.select(col(idCol).as("id"),
      minhashSignatureFromText(col(textCol), k, numHashes).as("sig"))
    // sigs first; band rows derive from READING BACK the persisted sigs,
    // so the dominant corpus-wide signature UDF pass runs exactly once
    // (two independent jobs over the same lazy plan would run it twice —
    // the measured ~2× the candidate-stage scaladoc warns about)
    graft.sources.Warehouse.writeBucketed(sigs, s"${table}_sigs", "id", buckets)
    // composite (band, bucket) bucketing: the probe joins on exactly that
    // key set, so the scan co-locates and the ever-growing index side is
    // never re-shuffled (bucketing on the prefix alone is incompatible
    // with the two-key join and forces a full index shuffle every probe)
    graft.sources.Warehouse.writeBucketedMulti(
      bandRowsCapped(spark.table(s"${table}_sigs"), bands, maxBucket),
      table, Seq("band", "bucket"), buckets)
    graft.sources.Warehouse.dropTableAndLocation(spark, s"${table}_mhspec")
    Seq((k, numHashes, bands, maxBucket))
      .toDF("k", "num_hashes", "bands", "max_bucket")
      .coalesce(1)
      .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_mhspec")
  }

  // (id, band, bucket) skeleton rows, each (band, bucket) capped to its
  // deterministic min-id maxBucket members via the salted two-phase
  // top-N — the rank input sees 24-byte skeletons only (never text or
  // signatures) and is bounded at saltParts × maxBucket rows per bucket
  // regardless of how many identical-template documents flood one bucket.
  private def bandRowsCapped(sigs: DataFrame, bands: Int, maxBucket: Int): DataFrame =
    graft.operators.Skew.saltedTopN(
      sigs.select(col("id"),
        posexplode(bandBucketsUdf(bands)(col("sig"))).as(Seq("band", "bucket"))),
      Seq(col("band"), col("bucket")), col("id"), Seq(col("id")), maxBucket)

  /** Append new documents to a [[writeMinhashIndex]] table WITHOUT
    * rebuilding: MinHash signatures are data-independent (seeded
    * permutations from the persisted geometry), so an append is one
    * signature pass over the new rows plus bucketed appends — the
    * grow-don't-retrain contract of the other indexes. The write-time
    * `maxBucket` cap applies within the appended generation only; a
    * bucket can grow past the cap across generations (each append adds at
    * most its own rows), so monitor [[minhashIndexMaxBucket]] (the
    * cardinality twin of [[graft.sources.Warehouse.maxFilesPerBucket]]'s
    * file-count signal) and rebuild — which re-caps — once a hot
    * (band, bucket) has drifted meaningfully past the spec's cap.
    *
    * Single-evaluation contract: the input plan executes exactly ONCE —
    * inside the sigs append — and the band append derives from the sigs
    * append's own delta files (returned, so [[nearDedupAgainstIndex]] can
    * derive its result from the same fixed snapshot). A non-deterministic
    * input therefore cannot register a signature without its bands or
    * vice versa, and a batch plan containing a candidate join against
    * this very index cannot observe its own append.
    */
  def appendToMinhashIndex(newRows: DataFrame, textCol: String, idCol: String,
                           table: String): Seq[String] = {
    val spark = newRows.sparkSession
    val sp = spark.table(s"${table}_mhspec").head()
    val (k, numHashes, bands, maxBucket) =
      (sp.getInt(0), sp.getInt(1), sp.getInt(2), sp.getInt(3))
    val buckets = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(s"${table}_sigs"))
      .bucketSpec.map(_.numBuckets).getOrElse(32)
    val sigs = newRows.select(col(idCol).as("id"),
      minhashSignatureFromText(col(textCol), k, numHashes).as("sig"))
    val delta = graft.sources.Warehouse.appendBucketedWithDelta(
      sigs, s"${table}_sigs", "id")
    if (delta.nonEmpty)
      graft.sources.Warehouse.alignBucketsMulti(
          bandRowsCapped(spark.read.parquet(delta: _*), bands, maxBucket),
          Seq("band", "bucket"), buckets)
        .write.bucketBy(buckets, "band", "bucket").sortBy("band", "bucket")
        .mode("append").format("parquet").saveAsTable(table)
    delta
  }

  /** Largest (band, bucket) membership of a [[writeMinhashIndex]] table,
    * with the geometry's write-time cap for comparison — the drift signal
    * for the cross-generation growth [[appendToMinhashIndex]] documents:
    * appends re-cap only within their own generation, so a boilerplate
    * flood arriving daily grows one hot bucket by up to `maxBucket` rows
    * per run and the candidate join's cost with it. Run this on the ops
    * cadence (it is one partial-aggregating scan of the skeleton index,
    * no text, no signatures) and REBUILD the index once
    * `max_members / cap` is meaningfully above 1.
    * Returns (max_members, cap).
    */
  def minhashIndexMaxBucket(spark: org.apache.spark.sql.SparkSession,
                            table: String): (Long, Int) = {
    val cap = spark.table(s"${table}_mhspec").head().getInt(3)
    val m = spark.table(table).groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("n")).agg(max(col("n"))).head()
    (if (m.isNullAt(0)) 0L else m.getLong(0), cap)
  }

  /** Near-dup pairs of `batch` against a persisted [[writeMinhashIndex]]
    * corpus: (batch_id, corpus_id, est_jaccard). Candidates come from the
    * (band, bucket) join of the batch's band skeletons against the index
    * (the skewable stage carries (id, band, bucket) rows only), and each
    * candidate pair is verified with the MinHash ESTIMATE of Jaccard —
    * the fraction of matching signature components, an unbiased estimator
    * with stderr ≈ 1/√numHashes (±0.125 at 64 hashes) — via id-keyed
    * (unskewed) signature joins. An exact-Jaccard verify would need the
    * corpus TEXT; the index deliberately stores only 8-byte-component
    * signatures, the same read-volume trade the quantized ANN tiers make,
    * so set `minEstJaccard` with the estimator noise in mind.
    *
    * The pair list is EAGERLY materialized with truncated lineage
    * (`localCheckpoint`) so the batch signature skeleton — persisted
    * because it feeds both the band branch and the verify join — is
    * released before returning; a daily-run driver accumulates no cache
    * entries (the [[hammingDropIds]] hygiene contract).
    */
  def nearDupsAgainstIndex(batch: DataFrame, textCol: String, idCol: String,
                           table: String,
                           minEstJaccard: Double = 0.7): DataFrame = {
    val (pairs, release) = nearDupsAgainstIndexLazy(batch, textCol, idCol,
      table, minEstJaccard)
    val out = pairs.localCheckpoint()
    release()
    out
  }

  // The lazy plan + release thunk behind [[nearDupsAgainstIndex]],
  // package-visible so the CI plan guard can inspect the REAL exchanges
  // (the public wrapper's checkpoint collapses the plan to an RDD scan).
  private[graft] def nearDupsAgainstIndexLazy(
      batch: DataFrame, textCol: String, idCol: String, table: String,
      minEstJaccard: Double): (DataFrame, () => Unit) = {
    val spark = batch.sparkSession
    val sp = spark.table(s"${table}_mhspec").head()
    val (k, numHashes, bands) = (sp.getInt(0), sp.getInt(1), sp.getInt(2))
    // the batch signature pass feeds BOTH the band branch and the verify
    // join — persist the (id, sig) skeletons so the UDF pass runs once
    val (bsigs, releaseBsigs) =
      org.apache.spark.sql.graftbridge.Bridge.persistedCopyReleasable(
        batch.select(col(idCol).as("__bid"),
          minhashSignatureFromText(col(textCol), k, numHashes).as("__bsig")),
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bbands = bsigs.select(col("__bid"),
      posexplode(bandBucketsUdf(bands)(col("__bsig"))).as(Seq("band", "bucket")))
    val cand = bbands.join(spark.table(table), Seq("band", "bucket"))
      .select(col("__bid"), col("id").as("__cid")).distinct()
    val pairs = cand
      .join(bsigs, Seq("__bid"))
      .join(spark.table(s"${table}_sigs")
        .select(col("id").as("__cid"), col("sig").as("__csig")), Seq("__cid"))
      .select(col("__bid").as("batch_id"), col("__cid").as("corpus_id"),
        sigMatchUdf(col("__bsig"), col("__csig")).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
    (pairs, releaseBsigs)
  }

  // fraction of matching minhash components — E[frac] = Jaccard
  private[graft] val sigMatchUdf = udf { (a: Seq[Long], b: Seq[Long]) =>
    val n = math.min(a.length, b.length)
    var m = 0
    var i = 0
    while (i < n) { if (a(i) == b(i)) m += 1; i += 1 }
    m.toDouble / math.max(1, n)
  }

  /** Incremental NEAR dedup across pipeline RUNS — the MinHash complement
    * of [[dedupAgainstRegistry]]: drop every batch document with a
    * verified near-dup ([[nearDupsAgainstIndex]]) anywhere in the indexed
    * corpus, and (unless `update = false`) append the survivors'
    * signatures and band skeletons so the NEXT run sees them. An exact
    * replay is a near-dup at est_jaccard 1.0, so this subsumes the exact
    * registry for indexed corpora; within-batch dedup stays the caller's
    * composition ([[exact]]/[[nearDedup]] first), mirroring the
    * single-responsibility split of the other cross-run ops.
    *
    * Failure contract: the candidate join against the big index executes
    * exactly ONCE, eagerly, inside [[nearDupsAgainstIndex]] — its result
    * is checkpointed BEFORE the append starts, so the probe can never
    * observe its own append and a non-deterministic batch plan cannot
    * diverge between the probe and the registered rows. With
    * `update = true` the append then also runs exactly once and the
    * RETURNED frame derives from the append's own delta files, so a late
    * re-read can never re-run any join against an index that already
    * contains this batch's bands and silently lose rows. A crash between
    * the (side-effect-free) probe and the append leaves the index
    * untouched — rerun the batch. Single writer per index at a time.
    */
  def nearDedupAgainstIndex(batch: DataFrame, textCol: String, idCol: String,
                            table: String, minEstJaccard: Double = 0.7,
                            update: Boolean = true): DataFrame = {
    val spark = batch.sparkSession
    val dupIds = nearDupsAgainstIndex(batch, textCol, idCol, table, minEstJaccard)
      .select(col("batch_id").as(idCol)).distinct()
    val fresh = batch.join(dupIds, Seq(idCol), "left_anti")
    if (!update) fresh
    else {
      val delta = appendToMinhashIndex(fresh, textCol, idCol, table)
      if (delta.isEmpty) batch.filter(lit(false))
      else batch.join(spark.read.parquet(delta: _*).select(col("id").as(idCol)),
        Seq(idCol), "left_semi")
    }
  }

  /** Materialize a persisted HAMMING INDEX over a 64-bit fingerprint
    * skeleton `(id, h)` — the cross-run twin of the within-run hamming
    * engine ([[hammingDropIds]]), completing the family for the
    * fingerprint identities (SimHash text via
    * [[simhashNearDedupAgainstIndex]], perceptual media via
    * [[graft.multimodal.Multimodal.dedupePerceptualAgainstIndex]]): one
    * table of capped Manku wide-prefix band rows (band, bucket, id, h),
    * bucketed on the prefix hash so probes and appends co-locate without
    * shuffling the (ever-growing) index side, plus a `<table>_hspec`
    * geometry sibling (maxHamming/maxBucket — a probe or append can
    * never band with different geometry than the build). Unlike the
    * MinHash index there is no separate signature sibling: the 8-byte
    * fingerprint itself rides the band rows, so verification is a
    * `bit_count` on the joined row — no second lookup.
    *
    * The table is bucketed on the COMPOSITE (band, bucket) key — the
    * probe's join key — so the scan's HashPartitioning matches the join
    * exactly and only the day's batch shuffles; bucketing on the prefix
    * alone would leave the scan incompatible with the (band, bucket)
    * join and re-shuffle the whole accumulated index every probe.
    * NULL fingerprints (undecodable media) are excluded: the probe and
    * append paths never carry them, and banding them would pile every
    * null row of the corpus into d `(band, NULL)` window partitions.
    */
  def writeHammingIndex(skeleton: DataFrame, table: String, maxHamming: Int,
                        buckets: Int = 32, maxBucket: Int = 10000): Unit = {
    require(maxHamming >= 0 && maxHamming < 64, s"maxHamming=$maxHamming")
    val spark = skeleton.sparkSession
    import spark.implicits._
    graft.sources.Warehouse.writeBucketedMulti(
      hammingBandRows(distinctFingerprints(skeleton), Nil,
        maxHamming, maxBucket),
      table, Seq("band", "bucket"), buckets)
    graft.sources.Warehouse.dropTableAndLocation(spark, s"${table}_hspec")
    Seq((maxHamming, maxBucket)).toDF("max_hamming", "max_bucket")
      .coalesce(1)
      .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_hspec")
  }

  /** Largest (band, bucket) membership of a [[writeHammingIndex]] table,
    * with the geometry's write-time cap — the hamming twin of
    * [[minhashIndexMaxBucket]], and the runtime signal the narrow-prefix
    * advisory ([[hammingPrefixBits]]) points at: at radius ≥ 5 the bucket
    * domain shrinks to ≤ 24 bits, so a growing corpus engages the cap by
    * sheer cardinality (not just adversarial clustering) and every probe
    * against an at-cap bucket can silently miss true neighbors. Appends
    * re-cap only within their own generation, so drift accumulates
    * cross-run. One partial-aggregating scan of the 28 B band skeletons;
    * run it on the ops cadence and REBUILD (wider radius budget or bigger
    * cap) once `max_members / cap` approaches 1. Returns
    * (max_members, cap).
    */
  def hammingIndexMaxBucket(spark: org.apache.spark.sql.SparkSession,
                            table: String): (Long, Int) = {
    val cap = spark.table(s"${table}_hspec").head().getInt(1)
    val m = spark.table(table).groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("n")).agg(max(col("n"))).head()
    (if (m.isNullAt(0)) 0L else m.getLong(0), cap)
  }

  /** Append new fingerprints to a [[writeHammingIndex]] table WITHOUT
    * rebuilding (band assignment is pure bit arithmetic — nothing to
    * retrain): band the new skeleton under the persisted geometry,
    * append under the table's own bucket spec, return the delta files.
    * The write-time cap applies within the appended generation only
    * ([[appendToMinhashIndex]]'s documented trade — here the cap guards
    * adversarial prefix clustering, not ordinary cardinality, so
    * cross-generation drift matters only under attack-shaped data).
    */
  def appendToHammingIndex(skeleton: DataFrame, table: String): Seq[String] = {
    val spark = skeleton.sparkSession
    val sp = spark.table(s"${table}_hspec").head()
    graft.sources.Warehouse.appendBucketedWithDeltaMulti(
      hammingBandRows(distinctFingerprints(skeleton), Nil,
        sp.getInt(0), sp.getInt(1)),
      table, Seq("band", "bucket"))
  }

  // The hamming index's verdict is a pure function of the FINGERPRINT
  // ([[hammingDupIdsAgainstIndex]] never returns index ids), so the index
  // needs exactly ONE row per distinct fingerprint: a batch flooding one
  // new code 10k times would otherwise register min(10k, maxBucket)
  // identical-h rows in EVERY band and inflate all future nearby probes'
  // join fan-out by that factor. Min-id keeps the representative stable.
  private def distinctFingerprints(skeleton: DataFrame): DataFrame =
    skeleton.select(col("id"), col("h")).where(col("h").isNotNull)
      .groupBy(col("h")).agg(min(col("id")).as("id"))
      .select(col("id"), col("h"))

  /** Batch skeleton ids with a fingerprint within the index's Hamming
    * radius anywhere in a persisted [[writeHammingIndex]] corpus. The
    * verdict is a pure function of the FINGERPRINT, so the probe runs
    * over the batch's DISTINCT fingerprints — a flood of identical
    * codes (the exact-dup case the cap window would otherwise truncate,
    * losing over-cap ids) collapses to ONE probe row before banding,
    * and the per-fingerprint verdict fans back out to every carrying id
    * with an unskewed 8-byte semi-join. The banded probe joins the
    * index on (band, bucket) — skeletons only, both sides ~28 B rows,
    * the index read in its composite-bucketed layout with no exchange
    * on the index side — and verifies `bit_count` on the joined pair.
    * Exact replays match at distance 0, so this subsumes an exact
    * fingerprint registry.
    */
  def hammingDupIdsAgainstIndex(skeleton: DataFrame, table: String): DataFrame = {
    val spark = skeleton.sparkSession
    val sp = spark.table(s"${table}_hspec").head()
    val (maxHamming, maxBucket) = (sp.getInt(0), sp.getInt(1))
    val distinctH = skeleton.select(col("h")).where(col("h").isNotNull)
      .distinct()
    val dupH = hammingBandRows(distinctH.select(col("h").as("id"), col("h")),
        Nil, maxHamming, maxBucket)
      .withColumnRenamed("h", "__bh")
      .join(spark.table(table).select(col("band"), col("bucket"),
        col("h").as("__ih")), Seq("band", "bucket"))
      .filter(expr("bit_count(__bh ^ __ih)") <= maxHamming)
      .select(col("__bh").as("h")).distinct()
    skeleton.select(col("id"), col("h"))
      .join(dupH, Seq("h"), "left_semi")
      .select(col("id")).distinct()
  }

  /** Incremental SimHash near-dedup across pipeline RUNS — the
    * hamming-radius member of the cross-run family (exact:
    * [[dedupAgainstRegistry]]; MinHash: [[nearDedupAgainstIndex]];
    * embeddings: [[semanticDedupAgainstIndex]]; this: SimHash distance,
    * catching the small-mutation replays whose shingle sets MinHash also
    * sees but at 1/64th the per-doc index bytes): drop every batch doc
    * whose SimHash is within the index's radius of anything already
    * ingested, and (unless `update = false`) append the survivors'
    * fingerprints so the NEXT run sees them. Null-text rows always
    * survive and never register.
    *
    * Failure contract (the semantic twin's, verbatim): the signature
    * skeleton is computed ONCE (persisted — the dominant tokenize+hash
    * pass never runs twice, the [[writeMinhashIndex]] discipline), the
    * drop set is eagerly checkpointed from it, the SURVIVOR rows are
    * checkpointed next, and the registered fingerprints are that same
    * skeleton minus the drop set — exactly the fingerprints the probe
    * used for the rows the caller receives, so a non-deterministic
    * batch cannot register a fingerprint it never emits, the probe
    * cannot observe its own append, and late re-reads cannot lose rows.
    * Single writer per index at a time.
    */
  def simhashNearDedupAgainstIndex(df: DataFrame, textCol: String,
                                   idCol: String, table: String,
                                   update: Boolean = true): DataFrame =
    nearDedupAgainstHammingIndex(df,
      df.filter(col(textCol).isNotNull)
        .select(col(idCol).as("id"), simhash(col(textCol)).as("h")),
      idCol, table, update)

  /** The probe → anti-join → append sequence shared VERBATIM by the text
    * ([[simhashNearDedupAgainstIndex]]) and media
    * ([[graft.multimodal.Multimodal.dedupePerceptualAgainstIndex]]) faces
    * of the hamming index — one body so the failure contract can never
    * drift between the tiers. `skeleton` is the caller's (id, h) frame
    * with nulls already excluded; rows of `df` absent from it (null
    * text / undecodable media) survive the anti-join by construction and
    * never register.
    */
  private[graft] def nearDedupAgainstHammingIndex(
      df: DataFrame, skeleton: DataFrame, idCol: String, table: String,
      update: Boolean): DataFrame = {
    val (skel, release) =
      org.apache.spark.sql.graftbridge.Bridge.persistedCopyReleasable(
        skeleton, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dupIds = hammingDupIdsAgainstIndex(skel, table).localCheckpoint()
    val survivors = df.join(dupIds.withColumnRenamed("id", idCol),
      Seq(idCol), "left_anti").localCheckpoint()
    if (update) appendToHammingIndex(
      skel.join(dupIds, Seq("id"), "left_anti"), table)
    release()
    survivors
  }

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

  /** Per-source boilerplate-span profile — the DISCOVERY complement of
    * [[dedupSpans]]: for each (source, span), the number of the source's
    * documents containing it and the fraction of the source that is. Spans
    * above `minDocFrac` are the templated headers/footers/navigation a
    * crawl's per-site template engine stamps on every page; run this to
    * size `spanTokens`/decide the span-dedup stage before rewriting
    * anything. Shuffle shape: occurrences collapse to distinct
    * (source, span, doc) map-side, then count per (source, span) — both
    * partial-aggregating. The corpus is scanned ONCE: zero-span documents
    * survive the explode as a null-span row (`explode_outer`), so the
    * per-source doc totals derive from the same distinct-span exchange the
    * span counts consume (ReuseExchange dedupes the scan+explode+partial
    * subplan) instead of a second pass over the input.
    */
  def boilerplateSpans(df: DataFrame, textCol: String, idCol: String,
                       sourceCol: String, spanTokens: Int = 3,
                       minDocFrac: Double = 0.1): DataFrame = {
    val tokenized = df.select(col(idCol), col(sourceCol),
      filter(split(col(textCol), "\\s+"), t => t =!= "").as("__toks"))
    val nSpans = ceil(size(col("__toks")) / lit(spanTokens.toDouble)).cast("long")
    val spans = tokenized.select(col(idCol), col(sourceCol),
        explode_outer(when(nSpans >= 1,
          transform(sequence(lit(0), (nSpans - 1).cast("int")),
            i => concat_ws(" ", slice(col("__toks"), i * spanTokens + 1, lit(spanTokens)))))
          .otherwise(lit(null).cast("array<string>")))
          .as("span"))
      .distinct()
    // unhinted join: AQE broadcasts the per-source totals when they fit
    // (usual case), and a 10M-domain crawl still just shuffle-joins two
    // pre-aggregated frames keyed by source
    val perSource = spans.groupBy(col(sourceCol)).agg(countDistinct(col(idCol)).as("__srcdocs"))
    spans.filter(col("span").isNotNull)
      .groupBy(col(sourceCol), col("span")).agg(count(lit(1)).as("n_docs"))
      .join(perSource, sourceCol)
      .withColumn("doc_frac", round(col("n_docs").cast("double") / col("__srcdocs"), 4))
      .filter(col("doc_frac") >= minDocFrac)
      .select(col(sourceCol), col("span"), col("n_docs"), col("doc_frac"))
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

  /** Jaccard similarity of two precomputed distinct-gram arrays. */
  def jaccardOfSets(ga: Column, gb: Column): Column = {
    val inter = size(array_intersect(ga, gb)).cast("double")
    inter / (size(ga) + size(gb) - inter).cast("double")
  }

  /** Word n-gram Jaccard of two raw text columns — convenience for single
    * pairs; use [[ngramSet]]+[[jaccardOfSets]] around joins.
    */
  def ngramJaccard(a: Column, b: Column, n: Int = 2): Column =
    jaccardOfSets(ngramSet(a, n), ngramSet(b, n))
}
