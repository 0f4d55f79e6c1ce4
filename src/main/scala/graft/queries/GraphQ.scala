package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Link-graph analytics over a synthetic crawl graph (documents have no
  * URL/outlink columns, so — the t11 salting precedent — each doc links
  * to three id-derived targets in a fixed 0..999 node space; at small
  * SFs some targets are pure sinks, exercising the dangling path).
  *
  * The oracle is GENERATED: the power iteration unrolls into one CTE
  * pair per iteration, mirroring the operator's scaled-integer
  * arithmetic term for term (decimal literals cast to DOUBLE so DuckDB's
  * DECIMAL promotion can't diverge from Scala's double math).
  */
object GraphQ {

  // 4 iterations: enough to exercise the full machinery (dangling,
  // contributions, the i=3 checkpoint cut) while keeping the driver-gate
  // query inside the suite's per-query time band — local[32]'s
  // fixed job-scheduling cost dominates an iterative algorithm at
  // 6k-node scale (the per-iteration cost is flat in data volume; see
  // the operator scaladoc for the shape that matters at 10^10 edges)
  private val Iters = 4

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // L69: PageRank (host-authority signal) over the synthetic graph.
    "g01_pagerank" -> { (s, dir) =>
      val edges = Tables(s, dir, "documents")
        .select(col("doc_id").as("src"),
          explode(array(
            pmod(col("doc_id") * 7 + 3, lit(1000)),
            pmod(col("doc_id") * 7 + 34, lit(1000)),
            pmod(col("doc_id") * 7 + 65, lit(1000)))).as("dst"))
      graft.operators.PageRank.run(edges, iters = Iters)
        .orderBy("node")
    },

    // L89: HITS hubs/authorities over the same synthetic graph — the
    // frontier's "where to find MORE content" signal (hub pages) that
    // PageRank structurally under-ranks. Scaled-integer, bit-identical
    // to the generated unrolled oracle.
    "g02_hits" -> { (s, dir) =>
      val edges = Tables(s, dir, "documents")
        .select(col("doc_id").as("src"),
          explode(array(
            pmod(col("doc_id") * 7 + 3, lit(1000)),
            pmod(col("doc_id") * 7 + 34, lit(1000)),
            pmod(col("doc_id") * 7 + 65, lit(1000)))).as("dst"))
      graft.operators.Hits.run(edges, iters = Iters)
        .orderBy("node")
    },

    // L69b: PERSONALIZED PageRank (round 16; Haveliwala 2002) — the
    // teleport vector concentrates on two seed pages, so rank becomes
    // "authority as seen FROM the seeds" (focused-crawl / related-pages
    // ranking); unreachable nodes hold exact integer 0. Same
    // scaled-integer lockstep-oracle discipline as g01.
    "g04_ppr" -> { (s, dir) =>
      import s.implicits._
      val edges = Tables(s, dir, "documents")
        .select(col("doc_id").as("src"),
          explode(array(
            pmod(col("doc_id") * 7 + 3, lit(1000)),
            pmod(col("doc_id") * 7 + 34, lit(1000)),
            pmod(col("doc_id") * 7 + 65, lit(1000)))).as("dst"))
      val seeds = Seq(0L, 500L).toDF("node")
      graft.operators.PageRank.personalized(edges, seeds, iters = Iters)
        .orderBy("node")
    },

    // L107: per-node TRIANGLE counts (round 16; Schank–Wagner degree
    // ordering) — the local clustering signal: spam farms and link
    // rings are triangle-dense, organic neighborhoods sparse. Wedges
    // build from OUT-edges of the (degree, node) orientation only, so
    // the hub d² blow-up cannot happen (out-degree is O(√m) on any
    // graph); a denser %200 target space than g01's so the sf0.01
    // fixture actually closes triangles (54 of them; sf1 is dense).
    "g05_triangles" -> { (s, dir) =>
      val edges = Tables(s, dir, "documents")
        .select(col("doc_id").as("src"),
          explode(array(
            pmod(col("doc_id") * 7 + 3, lit(200)),
            pmod(col("doc_id") * 7 + 34, lit(200)),
            pmod(col("doc_id") * 7 + 65, lit(200)))).as("dst"))
      graft.operators.Triangles.perNode(edges)
        .orderBy("node")
    },

    // L108: k-CORE membership (round 16) — the robustness complement:
    // PageRank can be farmed with pendant chains, but surviving the
    // 5-core requires five mutually-supporting neighbors that
    // themselves survive (dense-nucleus / spam-ring extraction).
    // Iterative peeling with early exit (3 rounds on this fixture:
    // the 50k sources peel first — degree 3 — then the target-space
    // fringe); the oracle unrolls SIX peeling rounds, a safe
    // over-count because peeling is a fixpoint and extra rounds are
    // no-ops.
    "g06_kcore" -> { (s, dir) =>
      val edges = Tables(s, dir, "documents")
        .select(col("doc_id").as("src"),
          explode(array(
            pmod(col("doc_id") * 7 + 3, lit(200)),
            pmod(col("doc_id") * 7 + 34, lit(200)),
            pmod(col("doc_id") * 7 + 65, lit(200)))).as("dst"))
      graft.operators.KCore.membership(edges, k = 5)
        .orderBy("node")
    },

    // A33 / L105: bounded-hop BFS reachability (round 16) — "which
    // pages sit within 4 clicks of these seeds, and how few": focused-
    // crawl scoping, blast-radius analysis. Frontier expansion with an
    // anti-join visited set (each node expanded once, per-round work ∝
    // frontier); early exit on a drained frontier. Oracle = DuckDB
    // WITH RECURSIVE enumeration + MIN(hops) — an independent
    // formulation of the same minimum.
    "g03_reachability" -> { (s, dir) =>
      import s.implicits._
      val edges = Tables(s, dir, "documents")
        .select(col("doc_id").as("src"),
          explode(array(
            pmod(col("doc_id") * 7 + 3, lit(1000)),
            pmod(col("doc_id") * 7 + 34, lit(1000)),
            pmod(col("doc_id") * 7 + 65, lit(1000)))).as("dst"))
      val seeds = Seq(0L, 500L).toDF("node")
      graft.operators.Reachability.bounded(edges, seeds, maxHops = 4)
        .orderBy("node")
    },

    // A42 / L110: weighted single-source SHORTEST PATHS (round 18) —
    // g03's distance complement ("how cheap is the best route", not
    // just "within k clicks"). Deterministic integer weights 1..19 on
    // the same synthetic graph; frontier Bellman–Ford with the exact
    // integer fixpoint exit (an empty frontier before the 8-round
    // bound IS unbounded SSSP). Oracle: hop-bounded recursive path
    // enumeration + MIN — an independent formulation of the same
    // minimum.
    "g07_sssp" -> { (s, dir) =>
      import s.implicits._
      val edges = Tables(s, dir, "documents")
        .select(col("doc_id").as("src"),
          explode(array(
            pmod(col("doc_id") * 7 + 3, lit(1000)),
            pmod(col("doc_id") * 7 + 34, lit(1000)),
            pmod(col("doc_id") * 7 + 65, lit(1000)))).as("dst"))
        .withColumn("w", pmod(col("src") * 13 + col("dst") * 7, lit(19)) + 1)
      val seeds = Seq(0L, 500L).toDF("node")
      graft.operators.ShortestPaths.run(edges, seeds, maxRounds = 8)._1
        .orderBy("node")
    })

  val oracles: Map[String, String] = Map(
    "g01_pagerank" -> {
      val iterCtes = (1 to Iters).map { i =>
        val p = i - 1
        s"""d$i AS (
           |  SELECT COALESCE(SUM(r.rank_s), 0) AS dang
           |  FROM r$p r LEFT JOIN outdeg o ON r.node = o.src
           |  WHERE o.src IS NULL),
           |c$i AS (
           |  SELECT e.dst AS node,
           |    SUM(CAST(ROUND(r.rank_s / o.outdeg) AS BIGINT)) AS in_c
           |  FROM r$p r
           |  JOIN outdeg o ON r.node = o.src
           |  JOIN edges e ON r.node = e.src
           |  GROUP BY e.dst),
           |r$i AS (
           |  SELECT nd.node,
           |    CAST(ROUND(
           |      (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n * 1e12 +
           |      CAST(0.85 AS DOUBLE) *
           |        (COALESCE(c.in_c, 0) + CAST(d.dang AS DOUBLE) / nn.n)
           |    ) AS BIGINT) AS rank_s
           |  FROM nodes nd CROSS JOIN nn CROSS JOIN d$i d
           |  LEFT JOIN c$i c ON nd.node = c.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH edges AS (
         |  SELECT doc_id AS src, (doc_id * 7 + off) % 1000 AS dst
         |  FROM documents CROSS JOIN (SELECT unnest([3, 34, 65]) AS off)),
         |nodes AS (
         |  SELECT DISTINCT node FROM (
         |    SELECT src AS node FROM edges
         |    UNION ALL SELECT dst AS node FROM edges)),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
         |outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
         |r0 AS (
         |  SELECT node, CAST(ROUND(1e12 / nn.n) AS BIGINT) AS rank_s
         |  FROM nodes CROSS JOIN nn),
         |$iterCtes
         |SELECT node, rank_s AS rank_scaled, rank_s / 1e12 AS rank
         |FROM r$Iters
         |ORDER BY node""".stripMargin
    },

    "g02_hits" -> {
      // mirrors Hits.run term for term: exact long half-step sums, sum
      // normalization as one fixed double expression over two exact
      // integers ((raw / tot) * 1e12), rounded back to the long grid
      val iterCtes = (1 to Iters).map { i =>
        val p = i - 1
        s"""ar$i AS (
           |  SELECT e.dst AS node, SUM(h.h_s) AS raw
           |  FROM h$p h JOIN edges e ON h.node = e.src GROUP BY e.dst),
           |at$i AS (SELECT CAST(COALESCE(SUM(raw), 0) AS BIGINT) AS tot FROM ar$i),
           |a$i AS (
           |  SELECT nd.node, CAST(ROUND(
           |    CAST(COALESCE(r.raw, 0) AS DOUBLE) / CAST(t.tot AS DOUBLE) *
           |      CAST(1e12 AS DOUBLE)) AS BIGINT) AS a_s
           |  FROM nodes nd CROSS JOIN at$i t LEFT JOIN ar$i r ON nd.node = r.node),
           |hr$i AS (
           |  SELECT e.src AS node, SUM(a.a_s) AS raw
           |  FROM a$i a JOIN edges e ON a.node = e.dst GROUP BY e.src),
           |ht$i AS (SELECT CAST(COALESCE(SUM(raw), 0) AS BIGINT) AS tot FROM hr$i),
           |h$i AS (
           |  SELECT nd.node, CAST(ROUND(
           |    CAST(COALESCE(r.raw, 0) AS DOUBLE) / CAST(t.tot AS DOUBLE) *
           |      CAST(1e12 AS DOUBLE)) AS BIGINT) AS h_s
           |  FROM nodes nd CROSS JOIN ht$i t LEFT JOIN hr$i r ON nd.node = r.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH edges AS (
         |  SELECT doc_id AS src, (doc_id * 7 + off) % 1000 AS dst
         |  FROM documents CROSS JOIN (SELECT unnest([3, 34, 65]) AS off)),
         |nodes AS (
         |  SELECT DISTINCT node FROM (
         |    SELECT src AS node FROM edges
         |    UNION ALL SELECT dst AS node FROM edges)),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
         |h0 AS (
         |  SELECT node, CAST(ROUND(1e12 / nn.n) AS BIGINT) AS h_s
         |  FROM nodes CROSS JOIN nn),
         |$iterCtes
         |SELECT h.node, h.h_s AS hub_scaled, a.a_s AS auth_scaled,
         |  h.h_s / 1e12 AS hub, a.a_s / 1e12 AS auth
         |FROM h$Iters h JOIN a$Iters a ON h.node = a.node
         |ORDER BY h.node""".stripMargin
    },

    "g04_ppr" -> {
      // PageRank.personalized mirrored term for term: seed-only teleport
      // and seed-only dangling return, non-seeds get ROUND(0.85 * in_c)
      val iterCtes = (1 to Iters).map { i =>
        val p = i - 1
        s"""d$i AS (
           |  SELECT COALESCE(SUM(r.rank_s), 0) AS dang
           |  FROM r$p r LEFT JOIN outdeg o ON r.node = o.src
           |  WHERE o.src IS NULL),
           |c$i AS (
           |  SELECT e.dst AS node,
           |    SUM(CAST(ROUND(r.rank_s / o.outdeg) AS BIGINT)) AS in_c
           |  FROM r$p r
           |  JOIN outdeg o ON r.node = o.src
           |  JOIN edges e ON r.node = e.src
           |  GROUP BY e.dst),
           |r$i AS (
           |  SELECT nd.node,
           |    CAST(ROUND(CASE WHEN s.node IS NOT NULL THEN
           |      (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / ns.n * 1e12 +
           |      CAST(0.85 AS DOUBLE) *
           |        (COALESCE(c.in_c, 0) + CAST(d.dang AS DOUBLE) / ns.n)
           |    ELSE CAST(0.85 AS DOUBLE) * COALESCE(c.in_c, 0)
           |    END) AS BIGINT) AS rank_s
           |  FROM nodes nd CROSS JOIN ns CROSS JOIN d$i d
           |  LEFT JOIN c$i c ON nd.node = c.node
           |  LEFT JOIN sds s ON s.node = nd.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH edges AS (
         |  SELECT doc_id AS src, (doc_id * 7 + off) % 1000 AS dst
         |  FROM documents CROSS JOIN (SELECT unnest([3, 34, 65]) AS off)),
         |sds AS (SELECT unnest([CAST(0 AS BIGINT), CAST(500 AS BIGINT)]) AS node),
         |nodes AS (
         |  SELECT DISTINCT node FROM (
         |    SELECT src AS node FROM edges
         |    UNION ALL SELECT dst AS node FROM edges
         |    UNION ALL SELECT node FROM sds)),
         |ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM sds),
         |outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
         |r0 AS (
         |  SELECT nd.node,
         |    CASE WHEN s.node IS NOT NULL
         |         THEN CAST(ROUND(1e12 / ns.n) AS BIGINT)
         |         ELSE CAST(0 AS BIGINT) END AS rank_s
         |  FROM nodes nd CROSS JOIN ns
         |  LEFT JOIN sds s ON s.node = nd.node),
         |$iterCtes
         |SELECT node, rank_s AS rank_scaled, rank_s / 1e12 AS rank
         |FROM r$Iters
         |ORDER BY node""".stripMargin
    },

    // g05: the canonical-triple formulation — x<y<z with all three
    // edges present counts each triangle exactly once; per-node counts
    // by unnesting the corners. An independent formulation of the same
    // set (the operator finds each triangle at its orientation source).
    "g05_triangles" ->
      """WITH raw AS (
        |  SELECT doc_id AS src, (doc_id * 7 + off) % 200 AS dst
        |  FROM documents CROSS JOIN (SELECT unnest([3, 34, 65]) AS off)),
        |und AS (
        |  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        |  FROM raw WHERE src <> dst),
        |tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM und e1
        |  JOIN und e2 ON e2.a = e1.b
        |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)
        |SELECT node, COUNT(*) AS n_triangles
        |FROM (SELECT unnest([x, y, z]) AS node FROM tri)
        |GROUP BY node
        |ORDER BY node""".stripMargin,

    "g06_kcore" -> {
      // AS MATERIALIZED is load-bearing: each round references the
      // previous 3×, so inlined CTEs re-evaluate 3^6 times — the plan
      // exploded into hundreds of parquet re-scans ("too many open
      // files") before computing anything
      val rounds = (1 to 6).map { i =>
        val p = i - 1
        s"""d$i AS MATERIALIZED (
           |  SELECT node, COUNT(*) AS deg FROM (
           |    SELECT a AS node FROM e$p
           |    UNION ALL SELECT b AS node FROM e$p)
           |  GROUP BY node),
           |k$i AS MATERIALIZED (SELECT node FROM d$i WHERE deg >= 5),
           |e$i AS MATERIALIZED (
           |  SELECT e.a, e.b FROM e$p e
           |  JOIN k$i x ON x.node = e.a
           |  JOIN k$i y ON y.node = e.b)""".stripMargin
      }.mkString(",\n")
      s"""WITH raw AS (
         |  SELECT doc_id AS src, (doc_id * 7 + off) % 200 AS dst
         |  FROM documents CROSS JOIN (SELECT unnest([3, 34, 65]) AS off)),
         |e0 AS MATERIALIZED (
         |  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
         |  FROM raw WHERE src <> dst),
         |$rounds
         |SELECT node, COUNT(*) AS core_deg FROM (
         |  SELECT a AS node FROM e6 UNION ALL SELECT b AS node FROM e6)
         |GROUP BY node
         |ORDER BY node""".stripMargin
    },

    "g03_reachability" ->
      """WITH RECURSIVE e AS (
        |  SELECT doc_id AS src, (doc_id*7+3) % 1000 AS dst FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*7+34) % 1000 FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*7+65) % 1000 FROM documents),
        |reach(node, hops) AS (
        |  SELECT node, CAST(0 AS BIGINT) AS hops
        |  FROM (VALUES (CAST(0 AS BIGINT)), (CAST(500 AS BIGINT))) s(node)
        |  UNION
        |  SELECT e.dst, r.hops + 1
        |  FROM reach r JOIN e ON e.src = r.node
        |  WHERE r.hops < 4)
        |SELECT node, MIN(hops) AS hops
        |FROM reach GROUP BY node
        |ORDER BY node""".stripMargin,

    // Hop-bounded path enumeration + MIN — distinct (node, dist, hops)
    // states stay bounded (dist ≤ 8·19, node space 0..999), so the
    // blind enumeration is safe HERE while the operator's frontier
    // relaxation is the form that scales.
    "g07_sssp" ->
      """WITH RECURSIVE e AS (
        |  SELECT doc_id AS src, (doc_id*7+3) % 1000 AS dst FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*7+34) % 1000 FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*7+65) % 1000 FROM documents),
        |ew AS (
        |  SELECT src, dst, (src*13 + dst*7) % 19 + 1 AS w
        |  FROM (SELECT DISTINCT src, dst FROM e)),
        |p(node, dist, hops) AS (
        |  SELECT node, CAST(0 AS BIGINT) AS dist, 0 AS hops
        |  FROM (VALUES (CAST(0 AS BIGINT)), (CAST(500 AS BIGINT))) s(node)
        |  UNION
        |  SELECT ew.dst, p.dist + ew.w, p.hops + 1
        |  FROM p JOIN ew ON ew.src = p.node
        |  WHERE p.hops < 8)
        |SELECT node, MIN(dist) AS dist FROM p GROUP BY node
        |ORDER BY node""".stripMargin)
}
