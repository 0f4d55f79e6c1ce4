package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.pipeline.CorpusPipeline
import graft.text.TextOps

/** The composed curation pipeline as driver queries.
  *
  * c01 runs the full pipeline (MinHash near-dedup included) — rows-only,
  * because the MinHash stage is not DuckDB-expressible; every stage is
  * individually oracle-gated through its own query (t01/t02/d01/d06/t07)
  * and the composition is spec-tested with planted defects.
  *
  * c02 runs the SAME composition with the near-dedup stage disabled
  * (threshold > 1.0): langID → quality gate → exact dedup → contamination
  * drop → split assignment. Every stage is ANSI-SQL-expressible, so the
  * whole composed pipeline sits under the driver's hash gate via one
  * DuckDB WITH-chain — the composition itself (stage order, survivor
  * plumbing, gate interactions) is what this query certifies.
  *
  * c03 is c02 plus the span-level dedup REWRITE stage: the oracle chain
  * gains the shared span CTEs and every later stage keys on the rewritten
  * text, with its md5 in the output so the rewrite itself is hash-pinned.
  *
  * c04 is c02 plus the SEMANTIC dedup stage over a planted-twin embedding
  * column: every tenth doc gets a twin (id + 1000000, salted text so the
  * text-keyed dedups pass it through, byte-identical embedding). The
  * oracle derives the same drop set through the exact quadratic cosine
  * path (the d10 argument: exact-copy twins always share a k-means cell,
  * the natural corpus has no pair near the threshold, and the dup graph
  * is disjoint pairs, so greedy pair-drop ≡ connected-components
  * keep-min) — the hash gate certifies the stage INSIDE the composition:
  * semantic drops happen after the text dedups and before contamination,
  * and the split/contamination stages run on the semantic survivors.
  */
object PipelineQ {

  private val CurateLangs = Set("en", "fr", "es", "de", "zh", "und")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // L22: full curation over the documents table, benchmark = ids < 20.
    "c01_curate" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      CorpusPipeline.curate(
        docs.filter(col("doc_id") >= 20), "text", "doc_id",
        CorpusPipeline.Config(
          langs = CurateLangs,
          minQuality = 0.3, nearDupThreshold = 0.7, contaminationNgram = 5),
        benchmark = Some(docs.filter(col("doc_id") < 20)))
        .select(col("doc_id"), col("lang"), round(col("quality"), 4).as("quality"),
          col("split"))
        .orderBy("doc_id")
    },

    // L22 (hash-gated): the same composition, near-dedup disabled — fully
    // DuckDB-expressible end to end.
    "c02_curate_exact" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      CorpusPipeline.curate(
        docs.filter(col("doc_id") >= 20), "text", "doc_id",
        CorpusPipeline.Config(
          langs = CurateLangs,
          minQuality = 0.3, nearDupThreshold = 1.5, contaminationNgram = 5),
        benchmark = Some(docs.filter(col("doc_id") < 20)))
        .select(col("doc_id"), col("lang"), round(col("quality"), 4).as("quality"),
          col("split"))
        .orderBy("doc_id")
    },

    // L22+L25 (hash-gated): c02's composition plus the span-level dedup
    // REWRITE stage (3-token spans). The gate covers the stage ordering
    // that matters: contamination grams and the split assignment key on
    // the REWRITTEN text, and `text_md5` pins the rewritten text itself.
    "c03_curate_span" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      CorpusPipeline.curate(
        docs.filter(col("doc_id") >= 20), "text", "doc_id",
        CorpusPipeline.Config(
          langs = CurateLangs,
          minQuality = 0.3, nearDupThreshold = 1.5, contaminationNgram = 5,
          spanDedupTokens = Some(3)),
        benchmark = Some(docs.filter(col("doc_id") < 20)))
        .select(col("doc_id"), col("lang"), round(col("quality"), 4).as("quality"),
          col("split"), md5(col("text").cast("binary")).as("text_md5"))
        .orderBy("doc_id")
    },

    // L22+L26b (hash-gated): c02's composition plus the semantic-dedup
    // stage, over the documents⋈embeddings corpus with planted twins.
    "c04_curate_semantic" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val base = docs.filter(col("doc_id") >= 20)
        .join(Tables(s, dir, "embeddings")
          .select(col("vec_id").as("doc_id"), col("embedding")), Seq("doc_id"))
      val twins = base.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000)
        .withColumn("text", concat(col("text"), lit(" semantic twin probe")))
      CorpusPipeline.curate(base.unionByName(twins), "text", "doc_id",
        CorpusPipeline.Config(
          langs = CurateLangs,
          minQuality = 0.3, nearDupThreshold = 1.5, contaminationNgram = 5,
          embCol = Some("embedding"), semanticThreshold = 0.8,
          semanticCentroids = 8),
        benchmark = Some(docs.filter(col("doc_id") < 20)))
        .select(col("doc_id"), col("lang"), round(col("quality"), 4).as("quality"),
          col("split"))
        .orderBy("doc_id")
    },

    // L76 composed (hash-gated): c02's curation feeding chunkDocs — the
    // prepare-for-training tail (curate → window-cut), gated end-to-end
    // so stage ordering (chunk AFTER the gates/dedup, text from the kept
    // originals) is pinned, not just each stage alone.
    "c08_curate_chunks" -> { (s, dir) =>
      val kept = queries("c02_curate_exact")(s, dir).select("doc_id")
      TextOps.chunkDocs(
          Tables(s, dir, "documents").join(kept, "doc_id")
            .select(col("doc_id"), col("text")),
          "text", "doc_id", maxTokens = 40, overlap = 8)
        .orderBy("doc_id", "chunk_id")
    },

    // L22c (hash-gated): c02's composition made INCREMENTAL across runs
    // via Config.registryTable. Day 1 (two thirds of the corpus) runs
    // curate() against a fresh registry — the append inside
    // dedupAgainstRegistry executes eagerly, so the call itself registers
    // day 1's surviving hashes. Day 2 (the remaining third PLUS replays of
    // day-1 documents under new ids, same text) then drops every replay to
    // the registry while keeping genuinely new content. The registry is
    // dropped and rebuilt per call: day 2 must see exactly day 1's state,
    // never a previous run's day-2 hashes.
    "c05_curate_registry" -> { (s, dir) =>
      import graft.dedup.Dedup
      val docs = Tables(s, dir, "documents")
      val reg = "c05_registry_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      graft.sources.Warehouse.dropTableAndLocation(s, reg)
      Dedup.createRegistry(s, reg, buckets = 8)
      val cfg = CorpusPipeline.Config(
        langs = CurateLangs, minQuality = 0.3, nearDupThreshold = 1.5,
        registryTable = Some(reg))
      CorpusPipeline.curate(docs.filter(col("doc_id") % 3 =!= 0),
        "text", "doc_id", cfg)
      val day2 = docs.filter(col("doc_id") % 3 === 0)
        .unionByName(docs.filter(col("doc_id") % 6 === 1)
          .withColumn("doc_id", col("doc_id") + 2000000))
      CorpusPipeline.curate(day2, "text", "doc_id", cfg)
        .select(col("doc_id"), col("lang"), round(col("quality"), 4).as("quality"),
          col("split"))
        .orderBy("doc_id")
    },

    // L72 (hash-gated): the composed crawl FRONTIER — outlinks of a
    // salted link page resolve against each doc's base URL, collapse to
    // canonical identity (a utm-tracking citation and its clean twin are
    // ONE entry with n_refs 2), drop links back into the batch's own
    // pages (the root-relative self link), and cap each host at 3 URLs
    // (the salted top-N). Registry and robots stages are spec-gated
    // (UDF/table state — not DuckDB-expressible); this query hash-pins
    // the extract→resolve→normalize→self-drop→count→cap composition.
    "c06_frontier" -> { (s, dir) =>
      val k = pmod(col("doc_id"), lit(7)).cast("string")
      val j = pmod(col("doc_id"), lit(10)).cast("string")
      val id = col("doc_id").cast("string")
      val base = concat(lit("https://site"), k, lit(".com/dir/page"), k,
        lit(".html"))
      val page = concat(
        lit("<a href=\"http://other"), id, lit(".com/p?utm_source=z\">a</a>"),
        lit("<a href='//cdn"), j, lit(".net/lib.js'>b</a>"),
        lit("<a href=\"/dir/page"), k, lit(".html\">self</a>"),
        lit("<a href=\"p"), id, lit(".html\">c</a>"),
        lit("<a href=\"http://other"), id, lit(".com/p\">dup</a>"))
      val pages = Tables(s, dir, "documents")
        .select(base.as("url"), page.as("html"))
      graft.pipeline.CrawlPipeline.frontier(pages, "url", "html",
        maxPerHost = 3)
        .orderBy("url")
    },

    // L74 (hash-gated): the cross-run PRIORITIZED frontier — run 1 (two
    // thirds of the corpus) seeds the citation registry and fetches its
    // 2-per-host lanes; run 2's schedule must rank by ACCUMULATED
    // citations (run-1 counts included), drop run-1's emitted URLs (lane
    // losers stay pending), and serialize each hub's lane under its
    // crawl delay (fetch_seq, not_before_s). Registries are dropped and
    // rebuilt per call (the c05 replay discipline); robots/PageRank
    // inputs are spec-gated.
    "c07_frontier_schedule" -> { (s, dir) =>
      import s.implicits._
      import graft.pipeline.CrawlPipeline
      val suffix = dir.replaceAll("[^A-Za-z0-9]", "_")
      val cit = s"c07_cit_$suffix"
      val seen = s"c07_seen_$suffix"
      for (t <- Seq(cit, seen))
        graft.sources.Warehouse.dropTableAndLocation(s, t)
      CrawlPipeline.createCitationRegistry(s, cit, buckets = 8)
      graft.dedup.Dedup.createRegistry(s, seen, buckets = 8)
      val k = pmod(col("doc_id"), lit(5)).cast("string")
      val id = col("doc_id").cast("string")
      val base = concat(lit("https://src"), id, lit(".com/page.html"))
      val page = concat(
        lit("<a href=\"http://hub"), k, lit(".com/top\">t</a>"),
        lit("<a href=\"http://hub"), k, lit(".com/p"),
        pmod(col("doc_id"), lit(4)).cast("string"), lit(".html\">p</a>"),
        lit("<a href=\"http://one"), id, lit(".com/x\">o</a>"))
      val docs = Tables(s, dir, "documents")
      def pages(f: org.apache.spark.sql.Column) =
        docs.filter(f).select(base.as("url"), page.as("html"))
      val delays = Seq(("hub0.com", 1.0), ("hub1.com", 2.0), ("hub2.com", 3.0))
        .toDF("host", "crawl_delay")
      def run(f: org.apache.spark.sql.Column) =
        CrawlPipeline.frontierPrioritized(pages(f), "url", "html",
          citationRegistryTable = Some(cit),
          crawlDelayByHost = Some(delays),
          seenRegistryTable = Some(seen), maxPerHost = 2)
      run(col("doc_id") % 3 =!= 0) // run 1: eager — registries populated
      run(col("doc_id") % 3 === 0).orderBy("url")
    },

    // L97: per-document drop ATTRIBUTION over c01's exact composition —
    // every input doc labeled with the FIRST stage that dropped it, or
    // kept. The labels come from curate()'s own stage frames observed
    // through the passive tap (zero logic duplication), 'kept' from the
    // real output; the oracle replays the same attribution as ordered
    // set membership over the already-replayed stage CTEs.
    "c09_curate_audit" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      CorpusPipeline.curateAudit(
        docs.filter(col("doc_id") >= 20), "text", "doc_id",
        CorpusPipeline.Config(
          langs = CurateLangs,
          minQuality = 0.3, nearDupThreshold = 0.7, contaminationNgram = 5),
        benchmark = Some(docs.filter(col("doc_id") < 20)))
        .orderBy("doc_id")
    },

    // L57b: published-snapshot version diff — corpus-iteration
    // observability over the atomic versioned publishing tier: publish
    // two deterministic curations of the corpus as v1/v2 under a
    // run-scoped root, then ask the warehouse what changed. v2 drops the
    // doc_id % 3 == 0 slice (removed), gains the % 4 == 0 docs v1
    // lacked (added), and revises text where doc_id % 5 == 0 (changed);
    // unchanged rows are suppressed, the at-scale default. Spark
    // compares 64-bit row-local content fingerprints so the join ships
    // 16 bytes/row; the oracle compares CONTENT directly (IS DISTINCT
    // FROM over a recomputed full-outer join) — an independent
    // formulation, so a fingerprint bug cannot hide.
    "c10_version_diff" -> { (s, dir) =>
      import graft.sources.Warehouse
      val root = graft.queries.OracleHashLib.exportRoot + "/c10_pub"
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true) // fixed v1/v2 on re-runs
      val base = Tables(s, dir, "documents")
        .withColumn("shard", pmod(col("doc_id"), lit(8L)))
      Warehouse.publishShards(
        base.filter(col("doc_id") % 4 =!= 0), root)
      Warehouse.publishShards(
        base.filter(col("doc_id") % 3 =!= 0)
          .withColumn("text", when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(" rev2"))).otherwise(col("text"))),
        root)
      Warehouse.diffVersions(s, root, 1, 2, "doc_id",
          Seq("text", "lang", "source"))
        .orderBy("doc_id")
    },

    // L104 → c11: CDC MERGE apply (round 16) — the lakehouse MERGE INTO
    // primitive in batch form: a synthesized change batch (updates on
    // %7 keys, deletes on %11 — seq 2, so on %77 keys the delete wins
    // the per-key election over the seq-1 update — inserts on new %13
    // keys) folds into the orders snapshot. The winner election windows
    // over the BATCH only; the base pays one key-partitioned anti-join
    // (bucketed base tables ride their bucketing — the d12 discipline).
    "c11_merge_upserts" -> { (s, dir) =>
      import graft.sources.Warehouse
      val base = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"))
      val upd = base.filter(pmod(col("o_orderkey"), lit(7L)) === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          lit("UPD").as("o_orderstatus"),
          (col("o_totalprice") + 100.0).as("o_totalprice"),
          lit("U").as("op"), lit(1L).as("seq"))
      val del = base.filter(pmod(col("o_orderkey"), lit(11L)) === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"),
          lit("D").as("op"), lit(2L).as("seq"))
      val ins = base.filter(pmod(col("o_orderkey"), lit(13L)) === 0)
        .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
          col("o_custkey"), lit("NEW").as("o_orderstatus"),
          col("o_totalprice"), lit("I").as("op"), lit(1L).as("seq"))
      Warehouse.applyChanges(base,
          upd.unionByName(del).unionByName(ins),
          "o_orderkey", Seq("seq"), "op")
        .orderBy("o_orderkey")
    },

    // L111: incremental MATERIALIZED-AGGREGATE maintenance (round 18) —
    // the metrics view kept current by appending per-run partial states
    // (n, sum, min, max) and merging at read on the bucketing; two
    // "days" of events appended, snapshot vs the direct one-shot
    // group-by oracle. Sums ride DECIMAL through the registry (exact,
    // run-order free).
    "c12_incremental_agg" -> { (s, dir) =>
      import graft.sources.Warehouse
      val table = "graft_aggreg_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      if (!s.catalog.tableExists(table)) {
        Warehouse.dropTableAndLocation(s, table)
        Warehouse.createAggRegistry(s, table)
        val ev = Tables(s, dir, "events")
        Warehouse.appendAggDelta(
          ev.filter(pmod(col("event_id"), lit(2L)) === 0),
          "event_type", "value", table)
        Warehouse.appendAggDelta(
          ev.filter(pmod(col("event_id"), lit(2L)) === 1),
          "event_type", "value", table)
      }
      Warehouse.aggSnapshot(s, table)
        .select(col("key").as("event_type"), col("n_rows"),
          col("sum_value"), col("min_value"), col("max_value"))
        .orderBy("event_type")
    }
  )

  // The c02/c03 oracles replay every stage of curate() in one DuckDB
  // WITH-chain (both generated from this template so the shared stages can
  // never drift). The lang CASE is generated from TextOps.stopwords (same
  // literals as the Scala side, same tie-break: first language in list
  // order wins); quality is t02's formula; exact dedup keeps the lowest
  // doc_id per distinct text; with `spanStage` the d08 span-dedup SQL
  // rewrites the surviving text BEFORE the later stages; contamination
  // mirrors d06's string-5-gram logic against the doc_id < 20 benchmark
  // slice over the (possibly rewritten) text; split is t07's md5-bucket
  // assignment on the same text.
  // `registryStage` replays c05: the corpus is day 2 (fresh third +
  // replays), and after the within-batch keep-min the oracle drops every
  // text present in the day-1 slice. That equals dedup against day 1's
  // registry (= day 1's distinct GATED texts) because the gate is a pure
  // function of the text: a day-2 doc whose text was gated OUT on day 1
  // fails day 2's own gate identically, so the ungated day-1 texts can
  // never matter. No benchmark on c05, so the contamination CTE degenerates
  // to an empty dirty set.
  // The within-run MinHash near-dedup stage replayed INSIDE the curate
  // composition (c01): signatures/bands via OracleHashLib's d02-certified
  // machinery over the exact-stage survivors, exhaustive same-bucket
  // candidate pairs (a < b), hashed-bigram Jaccard >= 0.7 verify
  // (jaccardOfSets' exact integer arithmetic), drop every verified pair's
  // b side — nearDedup's greedy rule. Mega-bucket chains (minhashCandidates'
  // >1000-member cap) are NOT modeled: the guard forces an empty — loudly
  // failing — result if any bucket exceeds the cap, rather than silently
  // diverging (no bucket on this corpus family comes within 100x of it).
  private lazy val nearDropSql: String =
    s"""${OracleHashLib.minhashSiglistCtes("exact", "mh")},
       #mhbands AS MATERIALIZED (
       #  ${OracleHashLib.bandSelectP("mh")}
       #), mhguard AS (
       #  SELECT coalesce(max(c), 0) <= 1000 AS ok
       #  FROM (SELECT count(*) AS c FROM mhbands GROUP BY band, bucket)
       #), mhpairs AS (
       #  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
       #  FROM mhbands l JOIN mhbands r USING (band, bucket)
       #  WHERE l.doc_id < r.doc_id
       #), mhbg AS MATERIALIZED (
       #  SELECT doc_id, list_distinct(CASE WHEN len(hs) < 2
       #    THEN [g_s64(list_reduce(list_prepend(1125899906842597::HUGEINT, hs),
       #          (acc, x) -> ((acc * 31 + x) & 18446744073709551615)))]
       #    ELSE list_transform(range(1, len(hs)),
       #      i -> g_s64((g_mul64((g_mul64(1125899906842597::HUGEINT,
       #        1099511628211) + hs[i]) & 18446744073709551615,
       #        1099511628211) + hs[i+1]) & 18446744073709551615))
       #    END) AS gs
       #  FROM mhth
       #), mhver AS (
       #  SELECT DISTINCT c.b
       #  FROM mhpairs c
       #  JOIN mhbg ga ON ga.doc_id = c.a
       #  JOIN mhbg gb ON gb.doc_id = c.b
       #  WHERE len(list_intersect(ga.gs, gb.gs))::DOUBLE
       #        / (len(ga.gs) + len(gb.gs)
       #           - len(list_intersect(ga.gs, gb.gs)))::DOUBLE >= 0.7
       #), nearkept AS (
       #  SELECT e.* FROM exact e, mhguard g
       #  WHERE g.ok AND e.doc_id NOT IN (SELECT b FROM mhver)
       #),""".stripMargin('#')

  private def curateOracle(spanStage: Boolean,
                           semanticStage: Boolean = false,
                           registryStage: Boolean = false,
                           nearStage: Boolean = false,
                           audit: Boolean = false): String = {
    val counts = TextOps.stopwords.map { case (lang, words) =>
      val lits = words.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(ltoks, t -> list_contains([$lits], t))) AS c_$lang"
    }.mkString(",\n    ")
    val langs = TextOps.stopwords.map(_._1)
    val best = langs.map(l => s"c_$l").mkString("GREATEST(", ", ", ")")
    val vote = langs.init.map(l => s"WHEN c_$l = best THEN '$l'").mkString("\n       ") +
      s"\n       ELSE '${langs.last}'"
    val langList = CurateLangs.toSeq.sorted.map(l => s"'$l'").mkString(", ")
    // with the semantic stage, the corpus is documents⋈embeddings plus the
    // planted twins (salted text, byte-identical embedding — c04's input)
    val srcCtes =
      if (!semanticStage && !registryStage) "FROM documents WHERE doc_id >= 20),"
      else """FROM raw),"""
    val rawCte =
      if (semanticStage)
        """raw AS (
          |  SELECT d.doc_id, d.text FROM documents d
          |  JOIN embeddings em ON em.vec_id = d.doc_id WHERE d.doc_id >= 20
          |  UNION ALL
          |  SELECT d.doc_id + 1000000, d.text || ' semantic twin probe'
          |  FROM documents d JOIN embeddings em ON em.vec_id = d.doc_id
          |  WHERE d.doc_id >= 20 AND d.doc_id % 10 = 0),
          |""".stripMargin
      else if (registryStage)
        """raw AS (
          |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
          |  UNION ALL
          |  SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 6 = 1),
          |""".stripMargin
      else ""
    val exactCte =
      if (spanStage) spanRewriteSql
      else if (registryStage)
        """registry AS (
          |  SELECT DISTINCT text FROM documents WHERE doc_id % 3 <> 0),
          |exact AS (
          |  SELECT doc_id, lang, quality, text, toks FROM exact0
          |  WHERE text NOT IN (SELECT text FROM registry)),""".stripMargin
      else passthroughSql
    val contamCtes =
      if (registryStage) "dirty AS (SELECT doc_id FROM documents WHERE FALSE)"
      else s"""bgrams AS (
       |  SELECT DISTINCT unnest(
       |    list_distinct(CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
       |      ELSE list_transform(range(1, len(toks) - 3),
       |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
       |                  toks[i+3] || ' ' || toks[i+4])
       |      END)) AS gr
       |  FROM (SELECT text, string_split_regex(text, '\\s+') AS toks
       |        FROM documents WHERE doc_id < 20)),
       |cgrams AS (
       |  SELECT doc_id, unnest(
       |    list_distinct(CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
       |      ELSE list_transform(range(1, len(toks) - 3),
       |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
       |                  toks[i+3] || ' ' || toks[i+4])
       |      END)) AS gr
       |  FROM ${if (semanticStage) "semkept"
                  else if (nearStage) "nearkept" else "exact"}),
       |dirty AS (
       |  SELECT doc_id FROM cgrams JOIN bgrams USING (gr)
       |  GROUP BY doc_id HAVING COUNT(*) >= 1)""".stripMargin
    val surv = if (semanticStage) "semkept"
      else if (nearStage) "nearkept" else "exact"
    (if (nearStage) OracleHashLib.preamble else "") +
    s"""WITH ${rawCte}t AS (
       |  SELECT doc_id, text,
       |    string_split_regex(lower(text), '\\s+') AS ltoks,
       |    string_split_regex(text, '\\s+') AS toks
       |  $srcCtes
       |scored0 AS (
       |  SELECT doc_id, text, toks,
       |    CAST(len(regexp_extract_all(text, '[\\x{4E00}-\\x{9FFF}]')) AS DOUBLE)
       |      / GREATEST(CAST(LENGTH(text) AS DOUBLE), 1.0) AS cjk,
       |    CAST(len(regexp_extract_all(text, '[\\x{3040}-\\x{30FF}]')) AS DOUBLE)
       |      / GREATEST(CAST(LENGTH(text) AS DOUBLE), 1.0) AS kana,
       |    CAST(len(regexp_extract_all(text, '[\\x{AC00}-\\x{D7A3}]')) AS DOUBLE)
       |      / GREATEST(CAST(LENGTH(text) AS DOUBLE), 1.0) AS hangul,
       |    $counts,
       |    CAST(len(toks) AS DOUBLE) AS n_tokens,
       |    CAST(LENGTH(text) AS DOUBLE) AS n_chars
       |  FROM t),
       |scored1 AS (SELECT *, $best AS best FROM scored0),
       |scored AS (
       |  SELECT doc_id, text, toks,
       |    CASE WHEN hangul > 0.25 THEN 'ko'
       |         WHEN kana > 0.10 THEN 'ja'
       |         WHEN cjk > 0.25 THEN 'zh'
       |         WHEN best = 0 THEN 'und'
       |         $vote END AS lang,
       |    LEAST(1.0, n_tokens / 64.0) *
       |      (CASE WHEN (n_chars - n_tokens + 1.0) / n_tokens >= 3.0
       |             AND (n_chars - n_tokens + 1.0) / n_tokens <= 10.0
       |            THEN 1.0 ELSE 0.5 END) AS quality
       |  FROM scored1),
       |gated AS (
       |  SELECT * FROM scored
       |  WHERE lang IN ($langList) AND quality >= 0.3),
       |exact0 AS (
       |  SELECT * FROM gated
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1),
       |$exactCte
       |__NEARSTAGE__${
         if (semanticStage) semanticDropSql else ""}$contamCtes
       |${if (!audit)
        s"""SELECT e.doc_id, e.lang, ROUND(e.quality, 4) AS quality,
       #  CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split${
          if (spanStage) ",\n       #  md5(e.text) AS text_md5" else ""}
       #FROM (SELECT *,
       #        CAST(('0x' || substring(md5(text), 1, 6)) AS BIGINT) % 100 AS b
       #      FROM $surv) e
       #WHERE e.doc_id NOT IN (SELECT doc_id FROM dirty)
       #ORDER BY e.doc_id""".stripMargin('#')
      else
        // the audit face: every input doc labeled with the FIRST stage
        // that dropped it — the CTE chain already exposes each stage's
        // survivor set, so attribution is pure set membership in order
        s"""SELECT s.doc_id,
       #  CASE WHEN NOT (s.lang IN ($langList) AND s.quality >= 0.3)
       #         THEN 'lang_quality'
       #       WHEN s.doc_id NOT IN (SELECT doc_id FROM exact0)
       #         THEN 'exact_dup'
       #       WHEN s.doc_id NOT IN (SELECT doc_id FROM $surv)
       #         THEN 'near_dup'
       #       WHEN s.doc_id IN (SELECT doc_id FROM dirty)
       #         THEN 'contaminated'
       #       ELSE 'kept' END AS verdict
       #FROM scored s
       #ORDER BY s.doc_id""".stripMargin('#')}""".stripMargin
      // spliced AFTER the '|'-margin strip: the near block's SQL contains
      // line-leading bitwise ORs that stripMargin would eat as margins
      .replace("__NEARSTAGE__", if (nearStage) nearDropSql else "")
  }

  // The semantic stage replayed through the exact quadratic cosine path
  // over the post-exact-dedup survivors: double-cast dot products, norms
  // factored per side, unrounded threshold — the d10 oracle's derivation,
  // applied INSIDE the composition. The dup graph is disjoint twin pairs
  // on this corpus, so dropping every pair's greater id ≡ the Spark
  // side's connected-components keep-min.
  private val semanticDropSql: String =
    """emb0 AS (
      |  SELECT vec_id AS doc_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings WHERE vec_id >= 20
      |  UNION ALL
      |  SELECT vec_id + 1000000,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE))
      |  FROM embeddings WHERE vec_id >= 20 AND vec_id % 10 = 0),
      |sn AS (
      |  SELECT s.doc_id, e, SQRT(list_dot_product(e, e)) AS nrm
      |  FROM emb0 s JOIN exact USING (doc_id)),
      |sp AS (
      |  SELECT a.doc_id AS a, b.doc_id AS b
      |  FROM sn a JOIN sn b ON a.doc_id < b.doc_id
      |  WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.8),
      |semkept AS (
      |  SELECT * FROM exact
      |  WHERE doc_id NOT IN (SELECT DISTINCT b FROM sp)),
      |""".stripMargin

  // d08's span-dedup CTE chain (SHARED from DedupQ — single source of
  // truth for the span semantics) applied to the exact-dedup survivors:
  // reassemble the kept spans in order; documents consumed entirely drop
  // via the join. The rewritten text REPLACES `text`/`toks` for every
  // later stage.
  private val spanRewriteSql: String =
    s"""${DedupQ.spanDedupCtes("exact0")},
      |rw AS (
      |  SELECT doc_id, string_agg(span, ' ' ORDER BY pos) AS text
      |  FROM __kept GROUP BY doc_id),
      |exact AS (
      |  SELECT e.doc_id, e.lang, e.quality, r.text,
      |    string_split_regex(r.text, '\\s+') AS toks
      |  FROM exact0 e JOIN rw r USING (doc_id)),""".stripMargin

  private val passthroughSql: String =
    "exact AS (SELECT doc_id, lang, quality, text, toks FROM exact0),"

  /** TextOps.normalizeUrl as one nested DuckDB scalar over `inner` — the
    * t20 oracle's verified chain (scheme strip → host lower/www/port →
    * fragment/tracking/separator/trailing cleanup → host ++ rtrim'd
    * rest), composed inline so c06 can apply it to both the resolved
    * links and the batch's own base URLs without CTE duplication.
    */
  private def normUrlSql(inner: String): String = {
    val strip = s"regexp_replace(trim($inner), '^[Hh][Tt][Tt][Pp][Ss]?://', '')"
    val host = "regexp_replace(regexp_replace(lower(regexp_extract(" + strip +
      ", '^([^/?#]*)', 1)), '^www\\.', ''), ':(80|443)$', '')"
    val rest = "regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
      s"regexp_replace($strip, '^[^/?#]*', ''), '#.*$$', ''), " +
      "'([?&])(?:utm_[a-zA-Z0-9]+|fbclid|gclid)=[^&]*', '\\1', 'g'), " +
      "'([?&])&+', '\\1', 'g'), '[?&]+$', '')"
    s"($host || regexp_replace($rest, '/+$$', ''))"
  }

  /** TextOps.resolveUrl(base, href) as a DuckDB CASE — t28's verified
    * mirror (absolute pass-through, scheme-relative, root-relative,
    * relative against the base directory with the host-only-base case).
    */
  private def resolveSql(base: String, href: String): String = {
    val sch = "^([A-Za-z][A-Za-z0-9+.-]*):"
    val org = "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"
    s"""CASE
       |    WHEN regexp_matches($href, '^[A-Za-z][A-Za-z0-9+.-]*:') THEN $href
       |    WHEN starts_with($href, '//') THEN regexp_extract($base, '$sch', 1) || ':' || $href
       |    WHEN starts_with($href, '/') THEN regexp_extract($base, '$org', 1) || $href
       |    ELSE (CASE WHEN regexp_matches(regexp_replace($base, '[?#].*$$', ''), '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*$$')
       |      THEN regexp_replace($base, '[?#].*$$', '') || '/'
       |      ELSE regexp_replace(regexp_replace($base, '[?#].*$$', ''), '[^/]*$$', '') END) || $href
       |  END""".stripMargin
  }

  private val frontierOracle: String =
    s"""WITH s AS (
       |  SELECT doc_id,
       |    'https://site' || CAST(doc_id % 7 AS VARCHAR) || '.com/dir/page' ||
       |      CAST(doc_id % 7 AS VARCHAR) || '.html' AS base,
       |    '<a href="http://other' || CAST(doc_id AS VARCHAR) || '.com/p?utm_source=z">a</a>' ||
       |    '<a href=''//cdn' || CAST(doc_id % 10 AS VARCHAR) || '.net/lib.js''>b</a>' ||
       |    '<a href="/dir/page' || CAST(doc_id % 7 AS VARCHAR) || '.html">self</a>' ||
       |    '<a href="p' || CAST(doc_id AS VARCHAR) || '.html">c</a>' ||
       |    '<a href="http://other' || CAST(doc_id AS VARCHAR) || '.com/p">dup</a>' AS page
       |  FROM documents),
       |l AS (
       |  SELECT doc_id, base, unnest(${graft.text.Html.duckLinks("page")}) AS href
       |  FROM s),
       |u AS (
       |  SELECT ${normUrlSql(resolveSql("base", "href"))} AS url FROM l),
       |selfu AS (
       |  SELECT DISTINCT ${normUrlSql("base")} AS url FROM s),
       |cand AS (
       |  SELECT url, COUNT(*) AS n_refs FROM u GROUP BY url),
       |fr AS (
       |  SELECT cand.url, cand.n_refs FROM cand ANTI JOIN selfu USING (url)),
       |h AS (
       |  SELECT url, lower(regexp_extract(url, '^([^/?#]*)', 1)) AS host,
       |    n_refs, CAST(NULL AS DOUBLE) AS crawl_delay
       |  FROM fr)
       |SELECT url, host, n_refs, crawl_delay FROM h
       |QUALIFY row_number() OVER (PARTITION BY host ORDER BY url) <= 3
       |ORDER BY url""".stripMargin

  // c07: both runs replayed in one WITH-chain — run 1's post-self-drop
  // candidate counts are the citation registry's state, its capped lane
  // the seen set; run 2 ranks by accumulated totals, drops run-1's
  // emitted URLs, and serializes each host's lane under the delay table.
  private val frontierScheduleOracle: String =
    s"""WITH s AS (
       |  SELECT doc_id,
       |    'https://src' || CAST(doc_id AS VARCHAR) || '.com/page.html' AS base,
       |    '<a href="http://hub' || CAST(doc_id % 5 AS VARCHAR) || '.com/top">t</a>' ||
       |    '<a href="http://hub' || CAST(doc_id % 5 AS VARCHAR) || '.com/p' ||
       |      CAST(doc_id % 4 AS VARCHAR) || '.html">p</a>' ||
       |    '<a href="http://one' || CAST(doc_id AS VARCHAR) || '.com/x">o</a>' AS page
       |  FROM documents),
       |l AS (
       |  SELECT doc_id, base, unnest(${graft.text.Html.duckLinks("page")}) AS href
       |  FROM s),
       |u AS (
       |  SELECT doc_id, ${normUrlSql(resolveSql("base", "href"))} AS url FROM l),
       |c1 AS (
       |  SELECT url, COUNT(*) AS n FROM u WHERE doc_id % 3 <> 0 GROUP BY url),
       |self1 AS (
       |  SELECT DISTINCT ${normUrlSql("base")} AS url FROM s WHERE doc_id % 3 <> 0),
       |f1 AS (SELECT c1.url, c1.n FROM c1 ANTI JOIN self1 USING (url)),
       |h1 AS (
       |  SELECT url, lower(regexp_extract(url, '^([^/?#]*)', 1)) AS host, n
       |  FROM f1),
       |em1 AS (
       |  SELECT url FROM h1
       |  QUALIFY row_number() OVER (PARTITION BY host ORDER BY n DESC, url) <= 2),
       |c2 AS (
       |  SELECT url, COUNT(*) AS n FROM u WHERE doc_id % 3 = 0 GROUP BY url),
       |self2 AS (
       |  SELECT DISTINCT ${normUrlSql("base")} AS url FROM s WHERE doc_id % 3 = 0),
       |f2 AS (SELECT c2.url, c2.n FROM c2 ANTI JOIN self2 USING (url)),
       |tot AS (
       |  SELECT f2.url, f2.n AS n_refs, f2.n + COALESCE(f1.n, 0) AS n_refs_total
       |  FROM f2 LEFT JOIN f1 USING (url)),
       |unseen AS (SELECT * FROM tot ANTI JOIN em1 USING (url)),
       |hh AS (
       |  SELECT url, lower(regexp_extract(url, '^([^/?#]*)', 1)) AS host,
       |    n_refs, n_refs_total
       |  FROM unseen),
       |del AS (SELECT * FROM (VALUES ('hub0.com', 1.0), ('hub1.com', 2.0),
       |  ('hub2.com', 3.0)) AS t(host, crawl_delay)),
       |wd AS (SELECT hh.*, del.crawl_delay FROM hh LEFT JOIN del USING (host)),
       |capd AS (
       |  SELECT * FROM wd
       |  QUALIFY row_number() OVER (PARTITION BY host ORDER BY n_refs_total DESC, url) <= 2),
       |sch AS (
       |  SELECT url, host, n_refs, n_refs_total, crawl_delay,
       |    CAST(row_number() OVER (PARTITION BY host ORDER BY n_refs_total DESC, url) AS INT)
       |      AS fetch_seq
       |  FROM capd)
       |SELECT url, host, n_refs, n_refs_total, crawl_delay, fetch_seq,
       |  (fetch_seq - 1) * COALESCE(crawl_delay, 0.0) AS not_before_s
       |FROM sch
       |ORDER BY url""".stripMargin

  val oracles: Map[String, String] = {
    val base = Map(
      "c06_frontier" -> frontierOracle,
      "c07_frontier_schedule" -> frontierScheduleOracle,
      "c01_curate" -> curateOracle(spanStage = false, nearStage = true),
      "c02_curate_exact" -> curateOracle(spanStage = false),
      "c03_curate_span" -> curateOracle(spanStage = true),
      "c04_curate_semantic" -> curateOracle(spanStage = false, semanticStage = true),
      "c05_curate_registry" -> curateOracle(spanStage = false, registryStage = true),
      "c09_curate_audit" -> curateOracle(spanStage = false, nearStage = true,
        audit = true))
    // c08 = c02's survivors chunked: the c02 oracle runs verbatim as the
    // kept-id subquery, then t32's stride/slice math over their text.
    base + ("c08_curate_chunks" ->
      s"""WITH kept AS (
         |${base("c02_curate_exact")}),
         |cbase AS (
         |  SELECT d.doc_id,
         |    list_filter(string_split_regex(d.text, '\\s+'), x -> x <> '') AS toks
         |  FROM documents d JOIN kept k ON k.doc_id = d.doc_id),
         |cn AS (
         |  SELECT doc_id, toks, CAST(len(toks) AS INTEGER) AS n
         |  FROM cbase WHERE len(toks) > 0),
         |cc AS (
         |  SELECT doc_id, toks, n,
         |    unnest(range(0, CAST(CEIL(GREATEST(n - 8, 1) / 32.0) AS BIGINT))) AS cid
         |  FROM cn),
         |cc2 AS (SELECT doc_id, toks, n, CAST(cid AS INTEGER) AS chunk_id FROM cc)
         |SELECT doc_id, chunk_id,
         |  array_to_string(list_slice(toks, chunk_id * 32 + 1, chunk_id * 32 + 40), ' ') AS chunk_text,
         |  LEAST(40, n - chunk_id * 32) AS n_tokens
         |FROM cc2
         |ORDER BY doc_id, chunk_id""".stripMargin) +
    // c10: the version diff replayed as a recomputed FULL OUTER JOIN with
    // DIRECT content comparison (IS DISTINCT FROM) — deliberately NOT the
    // fingerprint the Spark side ships, so a hash bug cannot hide
    ("c10_version_diff" ->
      """WITH v1 AS (
        |  SELECT doc_id, text, lang, source FROM documents
        |  WHERE doc_id % 4 <> 0),
        |v2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' rev2' ELSE text END AS text,
        |    lang, source
        |  FROM documents WHERE doc_id % 3 <> 0),
        |j AS (
        |  SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
        |    CASE WHEN a.doc_id IS NULL THEN 'added'
        |         WHEN b.doc_id IS NULL THEN 'removed'
        |         WHEN (a.text IS DISTINCT FROM b.text)
        |           OR (a.lang IS DISTINCT FROM b.lang)
        |           OR (a.source IS DISTINCT FROM b.source) THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
        |SELECT doc_id, status FROM j
        |WHERE status <> 'unchanged'
        |ORDER BY doc_id""".stripMargin) +
    // c11: the CDC merge replayed — same synthesized batch, winner per
    // key by (seq DESC, payload-row DESC, op DESC) exactly as
    // Warehouse.applyChanges orders its window, then anti-join + union
    ("c11_merge_upserts" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |  FROM orders),
        |changes AS (
        |  SELECT o_orderkey, o_custkey, 'UPD' AS o_orderstatus,
        |    o_totalprice + 100.0 AS o_totalprice, 'U' AS op, 1 AS seq
        |  FROM base WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |    'D', 2 FROM base WHERE o_orderkey % 11 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, o_custkey, 'NEW', o_totalprice,
        |    'I', 1 FROM base WHERE o_orderkey % 13 = 0),
        |latest AS (
        |  SELECT * FROM changes
        |  QUALIFY row_number() OVER (PARTITION BY o_orderkey
        |    ORDER BY seq DESC,
        |      ROW(o_custkey, o_orderstatus, o_totalprice) DESC,
        |      op DESC) = 1)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM base
        |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM latest)
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM latest WHERE op <> 'D'
        |ORDER BY o_orderkey""".stripMargin) +
    // c12: the incremental view's invariant IS the oracle — N appended
    // partial states merge to exactly the one-shot group-by (DECIMAL
    // sums make the merge order-free)
    ("c12_incremental_agg" ->
      """SELECT event_type, COUNT(value) AS n_rows,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        |  CAST(MIN(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS min_value,
        |  CAST(MAX(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS max_value
        |FROM events WHERE value IS NOT NULL
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin)
  }
}
