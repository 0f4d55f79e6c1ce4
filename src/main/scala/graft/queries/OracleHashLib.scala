package graft.queries

/** Pure-SQL DuckDB macro library that re-expresses graft's JVM hash
  * primitives — scala.util.hashing.MurmurHash3.stringHash, the wrapping
  * 64-bit polynomial/FNV folds, splitmix64 permutation parameters, and
  * the gear-CDC chunker — so queries whose identity is a JVM hash
  * (d02/d03/d14/t04/d25/d26/t14) gate against the DuckDB oracle instead
  * of a rows-only check.
  *
  * Everything here is plain SQL prepended to the oracle statement
  * (`CREATE OR REPLACE MACRO …; SELECT …`): DuckDB's python API runs
  * multi-statement strings and returns the last relation, so the
  * driver's comparator needs no UDF registration. 64-bit wrapping
  * arithmetic rides HUGEINT (int128) with explicit masks; 32-bit rides
  * BIGINT. The library is validated end-to-end: each converted oracle
  * was diffed value-exact against the Spark parquet dumps before
  * shipping (see OracleHashLibSpec for the in-repo pins).
  *
  * Scope note (honest contract): the char-indexed macros (`g_codes`,
  * `g_scala_stringhash`) equate DuckDB code points with JVM UTF-16 code
  * units — exact for the BMP; the driver corpus is ASCII. Supplementary
  * planes would need a surrogate-pair expansion here.
  */
object OracleHashLib {

  /** splitmix64 stream — mirrors Dedup.permParams / Cdc.Gear derivation. */
  private def splitmixStream(seed: Long, n: Int): Array[Long] = {
    var x = seed
    Array.fill(n) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
  }

  private def u64(v: Long): BigInt = BigInt(v) & ((BigInt(1) << 64) - 1)

  /** (i, a, b) VALUES rows for the d02 MinHash permutations
    * (numHashes=64, seed=42 — the minhashSignatureFromText defaults).
    */
  private val permRows: String = {
    val s = splitmixStream(42L, 128)
    val as = s.take(64).map(_ | 1L)
    val bs = s.drop(64)
    as.zip(bs).zipWithIndex.map { case ((a, b), i) =>
      s"($i,${u64(a)}::HUGEINT,${u64(b)}::HUGEINT)"
    }.mkString(",")
  }

  /** 256-entry low-5-bit gear table (only bits 0–4 of the gear state can
    * influence the avgBits=5 cut mask, so the full 64-bit table is never
    * needed SQL-side).
    */
  private val gear5List: String =
    graft.dedup.Cdc.Gear.map(_ & 31L).mkString("[", ",", "]")

  private val M64 = "18446744073709551615" // 2^64 - 1

  /** The macro preamble every converted oracle starts with. */
  val preamble: String =
    s"""CREATE OR REPLACE MACRO g_mul64(a, b) AS
       #  (((a & 4294967295) * (b & 4294967295)
       #    + ((((a >> 32) * (b & 4294967295) + (a & 4294967295) * (b >> 32))
       #        & 4294967295) << 32)) & $M64);
       #CREATE OR REPLACE MACRO g_s64(u) AS
       #  (CASE WHEN (u & $M64) >= 9223372036854775808::HUGEINT
       #        THEN ((u & $M64) - 18446744073709551616::HUGEINT)::BIGINT
       #        ELSE (u & $M64)::BIGINT END);
       #CREATE OR REPLACE MACRO g_us(x) AS
       #  (CASE WHEN x < 0 THEN (x::HUGEINT + 18446744073709551616::HUGEINT)
       #        ELSE x::HUGEINT END);
       #CREATE OR REPLACE MACRO g_mul32(a, b) AS
       #  (((a::HUGEINT * b::HUGEINT) & 4294967295)::BIGINT);
       #CREATE OR REPLACE MACRO g_rotl32(x, r) AS
       #  ((((x << r) | (x >> (32 - r))) & 4294967295));
       #CREATE OR REPLACE MACRO g_s32(u) AS
       #  (CASE WHEN u >= 2147483648 THEN u - 4294967296 ELSE u END);
       #CREATE OR REPLACE MACRO g_u32(x) AS
       #  (CASE WHEN x < 0 THEN x + 4294967296 ELSE x END);
       #CREATE OR REPLACE MACRO g_xsr(h, r) AS (xor(h, h >> r));
       #CREATE OR REPLACE MACRO g_mmh3_mixk(k) AS
       #  (g_mul32(g_rotl32(g_mul32(k, 3432918353), 15), 461845907));
       #CREATE OR REPLACE MACRO g_mmh3_mix(h, k) AS
       #  ((g_mul32(g_rotl32(xor(h, g_mmh3_mixk(k)), 13), 5) + 3864292196)
       #   & 4294967295);
       #CREATE OR REPLACE MACRO g_mmh3_avalanche(h0) AS
       #  (g_xsr(g_mul32(g_xsr(g_mul32(g_xsr(h0, 16), 2246822507), 13),
       #                 3266489909), 16));
       #CREATE OR REPLACE MACRO g_codes(s) AS
       #  (list_transform(range(1, length(s) + 1), i -> unicode(s[i])));
       #CREATE OR REPLACE MACRO g_scala_stringhash(s, seed) AS
       #  (g_s32(g_mmh3_avalanche(xor(
       #     CASE WHEN length(s) % 2 = 1
       #       THEN xor(
       #         list_reduce(list_prepend(g_u32(seed)::BIGINT,
       #           list_transform(range(0, length(s) // 2),
       #             j -> (unicode(s[2*j+1]) << 16) + unicode(s[2*j+2]))),
       #           (h, k) -> g_mmh3_mix(h, k)),
       #         g_mmh3_mixk(unicode(s[length(s)])))
       #       ELSE
       #         list_reduce(list_prepend(g_u32(seed)::BIGINT,
       #           list_transform(range(0, length(s) // 2),
       #             j -> (unicode(s[2*j+1]) << 16) + unicode(s[2*j+2]))),
       #           (h, k) -> g_mmh3_mix(h, k))
       #     END,
       #     length(s)))));
       #CREATE OR REPLACE MACRO g_rotl64(x, r) AS
       #  ((((x << r) | (x >> (64 - r))) & $M64));
       #CREATE OR REPLACE MACRO g_xxh64_fmix(x0) AS
       #  (g_xsr(g_mul64(g_xsr(g_mul64(g_xsr(x0, 33), 14029467366897019727),
       #                       29), 1609587929392839161), 32));
       #CREATE OR REPLACE MACRO g_xxh64long(l, seed) AS
       #  (g_xxh64_fmix((g_mul64(g_rotl64(xor((seed + 2870177450012600261 + 8)
       #      & $M64,
       #      g_mul64(g_rotl64(g_mul64(l, 14029467366897019727), 31),
       #              11400714785074694791)), 27), 11400714785074694791)
       #    + 9650029242287828579) & $M64));
       #CREATE OR REPLACE MACRO g_cdc_warm(g5, start, d) AS
       #  (CASE d
       #     WHEN 0 THEN g5[start+17]::BIGINT
       #     WHEN 1 THEN g5[start+18]::BIGINT + 2*g5[start+17]::BIGINT
       #     WHEN 2 THEN g5[start+19]::BIGINT + 2*g5[start+18]::BIGINT
       #                 + 4*g5[start+17]::BIGINT
       #     ELSE        g5[start+20]::BIGINT + 2*g5[start+19]::BIGINT
       #                 + 4*g5[start+18]::BIGINT + 8*g5[start+17]::BIGINT
       #   END % 32);
       #CREATE OR REPLACE MACRO g_cdc_next(g5, p5, n, start) AS
       #  (CASE WHEN n - start <= 16 THEN n ELSE
       #    least(
       #      coalesce(start + 17 + list_min(list_filter([0,1,2,3],
       #        d -> start + 17 + d <= least(start + 256, n)
       #             AND g_cdc_warm(g5, start, d) = 0)), 1073741824),
       #      coalesce(list_min(list_filter(p5,
       #        p -> p >= start + 21 AND p <= least(start + 256, n))),
       #        1073741824),
       #      least(start + 256, n))
       #   END);
       #""".stripMargin('#')

  /** Scala MurmurHash3.stringSeed (0xf7ca7fd2) as unsigned decimal. */
  val StringSeed = "4157243346"

  /** The minhash token-hash low-word seed (0x9747b28c). */
  val AltSeed = "2538058380"

  /** 64-bit token/combined hash CTE fragment: per-document whitespace
    * tokens joined to a distinct-token vocabulary (the driver corpus
    * vocabulary is tiny, so hashing distinct tokens once dominates).
    * `lowSeedExpr(t)` builds the low 32 bits from token `t`.
    */
  def tokenHashCtes(docsCte: String, lowExpr: String, p: String = ""): String =
    s"""${p}toks AS (
       #  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS t,
       #         generate_subscripts(string_split_regex(text, '\\s+'), 1) AS ord
       #  FROM $docsCte
       #), ${p}vocab AS MATERIALIZED (
       #  SELECT t,
       #    ((g_u32(g_scala_stringhash(t, $StringSeed))::HUGEINT << 32)
       #     | g_u32($lowExpr)::HUGEINT) AS h
       #  FROM (SELECT DISTINCT t FROM ${p}toks)
       #)""".stripMargin('#')

  /** SimHash CTE block: per-document 64-bit SimHash as signed BIGINT,
    * exposed as `simh(doc_id, h)`. Expects `docsCte(doc_id, text)`.
    */
  def simhashCtes(docsCte: String): String =
    s"""${tokenHashCtes(docsCte, s"g_scala_stringhash(reverse(t), $StringSeed)")},
       #th AS (SELECT doc_id, h FROM toks JOIN vocab USING (t)),
       #votes AS (
       #  SELECT doc_id, b AS bit,
       #         CASE WHEN 2 * sum(((h >> b) & 1)::BIGINT) > count(*)
       #              THEN 1::HUGEINT ELSE 0::HUGEINT END AS bitset
       #  FROM th, (SELECT unnest(range(0,64)) AS b)
       #  GROUP BY doc_id, b
       #), simh AS MATERIALIZED (
       #  SELECT doc_id, g_s64(sum(bitset << bit)) AS h
       #  FROM votes GROUP BY doc_id
       #)""".stripMargin('#')

  /** Gear-CDC chunk CTE block over `(media_id, txt)` rows produced by
    * `blobExpr` (ASCII text standing in for the UTF-8 blob bytes —
    * byte values ≡ code points). Exposes `${p}chunks(media_id, strt,
    * ln, chunk_hash)` with the exact Cdc.boundaries/fnv1a semantics at
    * minSize=16, avgBits=5, maxSize=256 (the d25/d26 geometry). The
    * recursion advances one CHUNK per step (positions where the 5-byte
    * gear window can cut are precomputed in `p5`; warm-up truncation is
    * start-dependent and handled by g_cdc_warm).
    */
  def cdcChunkCtes(p: String, blobExpr: String): String =
    s"""${p}blobs AS MATERIALIZED (
       #  SELECT media_id,
       #         list_transform(g_codes(txt), c -> $gear5List[c+1]) AS g5,
       #         g_codes(txt) AS bs,
       #         length(txt) AS n
       #  FROM ($blobExpr)
       #), ${p}blobp AS MATERIALIZED (
       #  SELECT media_id, g5, bs, n,
       #    list_filter(range(5, n + 1),
       #      j -> (16*g5[j-4] + 8*g5[j-3] + 4*g5[j-2] + 2*g5[j-1] + g5[j])
       #           % 32 = 0) AS p5
       #  FROM ${p}blobs
       #), ${p}ends AS (
       #  WITH RECURSIVE rec(media_id, strt, fin) AS (
       #    SELECT media_id, 0, g_cdc_next(g5, p5, n, 0) FROM ${p}blobp
       #    WHERE n > 0
       #    UNION ALL
       #    SELECT r.media_id, r.fin, g_cdc_next(b.g5, b.p5, b.n, r.fin)
       #    FROM rec r JOIN ${p}blobp b USING (media_id) WHERE r.fin < b.n
       #  ) SELECT * FROM rec
       #), ${p}chunks AS MATERIALIZED (
       #  SELECT e.media_id, e.strt, e.fin - e.strt AS ln,
       #    g_s64(list_reduce(
       #      list_prepend(14695981039346656037::HUGEINT, b.bs[e.strt+1:e.fin]),
       #      (h, c) -> g_mul64(xor(h, c::HUGEINT), 1099511628211))) AS chunk_hash
       #  FROM ${p}ends e JOIN ${p}blobp b USING (media_id)
       #)""".stripMargin('#')

  /** The d25/d26 mirror banner as a SQL string expression. */
  val BannerSql: String =
    "'HTTP/1.1 200 OK' || chr(13) || chr(10) || 'X-Mirror: cdn-7' || " +
      "chr(13) || chr(10) || chr(13) || chr(10)"

  /** d02's permutation parameter VALUES clause. */
  val permValues: String = s"perms(i, a, b) AS (VALUES $permRows)"

  /** MinHash signature CTE block (k=3, 64 perms, seed 42 — the
    * minhashSignatureFromText defaults): exposes
    * `siglist(doc_id, sig)` with `sig` a 64-element unsigned-HUGEINT
    * list, over `docsCte(doc_id, text)`. Shared by the d02 band oracle
    * and the d13 cross-run index oracle.
    */
  def minhashSiglistCtes(docsCte: String, p: String = ""): String =
    s"""${p}perms(i, a, b) AS (VALUES $permRows),
       #${tokenHashCtes(docsCte, s"g_scala_stringhash(t, $AltSeed)", p)},
       #${p}th AS MATERIALIZED (
       #  SELECT doc_id, list(h ORDER BY ord) AS hs
       #  FROM ${p}toks JOIN ${p}vocab USING (t) GROUP BY doc_id
       #), ${p}grams AS (
       #  SELECT doc_id, unnest(CASE WHEN len(hs) < 3
       #    THEN [list_reduce(list_prepend(1125899906842597::HUGEINT, hs),
       #          (acc, x) -> ((acc * 31 + x) & 18446744073709551615))]
       #    ELSE list_transform(range(1, len(hs) - 1),
       #      i0 -> ((g_mul64(((g_mul64((g_mul64(1125899906842597::HUGEINT,
       #        1099511628211) + hs[i0]) & 18446744073709551615,
       #        1099511628211) + hs[i0+1]) & 18446744073709551615),
       #        1099511628211) + hs[i0+2]) & 18446744073709551615))
       #    END) AS g
       #  FROM ${p}th
       #), ${p}dg AS (SELECT DISTINCT doc_id, g FROM ${p}grams),
       #${p}gv AS MATERIALIZED (
       #  SELECT g, i, g_s64((g_mul64(a, g) + b) & 18446744073709551615) AS v
       #  FROM (SELECT DISTINCT g FROM ${p}dg), ${p}perms
       #), ${p}sigs AS (
       #  SELECT doc_id, i, min(v) AS s
       #  FROM ${p}dg JOIN ${p}gv USING (g) GROUP BY doc_id, i
       #), ${p}siglist AS MATERIALIZED (
       #  SELECT doc_id, list(g_us(s) ORDER BY i) AS sig FROM ${p}sigs
       #  GROUP BY doc_id
       #)""".stripMargin('#')

  /** The 16-band FNV bucket fold over a `siglist` row — (band, bucket)
    * pairs as an exploded SELECT fragment.
    */
  def bandSelectP(p: String): String =
    s"""SELECT doc_id, unnest(range(0, 16))::INT AS band,
      #    unnest(list_transform(range(0, 16), bnd ->
      #      g_s64(g_mul64(xor(
      #        g_mul64(xor(
      #          g_mul64(xor(
      #            g_mul64(xor(xor(14695981039346656037::HUGEINT,
      #                            bnd::HUGEINT), sig[4*bnd+1]),
      #              1099511628211),
      #            sig[4*bnd+2]), 1099511628211),
      #          sig[4*bnd+3]), 1099511628211),
      #        sig[4*bnd+4]), 1099511628211)))) AS bucket
      #  FROM ${p}siglist""".stripMargin('#')

  val bandSelect: String = bandSelectP("")

  /** Staged one-block xxh64 (Spark's `xxhash64` on a single LONG) over a
    * source CTE — four MATERIALIZED multiply levels, the t42 precedent:
    * the nested `g_xxh64long` macro form inlines exponentially (g_mul64
    * references each argument multiple times) and takes tens of seconds
    * to BIND for a single call site, so every level here wraps only bare
    * columns. Emits CTEs `{p}x1..{p}x4`; `{p}x4` carries `carry` plus
    * `outCol` (the unsigned 64-bit hash as HUGEINT). `lExpr` is evaluated
    * exactly once (in {p}x1), so it may be arbitrarily complex (e.g. the
    * two-murmur key64 composition); `seedExpr` is likewise evaluated once
    * — pass a literal (`"42"`) or a column (chaining two staged calls
    * replays Spark's `xxhash64(a, b)` fold).
    */
  def xxh64StagedCtes(p: String, srcCte: String, carry: Seq[String],
                      lExpr: String, seedExpr: String,
                      outCol: String): String = {
    val csc = if (carry.isEmpty) "" else carry.mkString(", ") + ", "
    val p1 = "11400714785074694791"
    val p2 = "14029467366897019727"
    val p3 = "1609587929392839161"
    val p4 = "9650029242287828579"
    // PRIME64_5 + 8 pre-added; the seed column joins in x2 via one xor
    s"""${p}x1 AS MATERIALIZED (
       #  SELECT $csc ($seedExpr)::HUGEINT AS __sd,
       #    g_mul64(g_rotl64(g_mul64(($lExpr), $p2), 31), $p1) AS __k1
       #  FROM $srcCte
       #), ${p}x2 AS MATERIALIZED (
       #  SELECT $csc g_mul64(g_rotl64(
       #      xor((__sd + 2870177450012600269) & $M64, __k1), 27), $p1) AS __acc
       #  FROM ${p}x1
       #), ${p}x3 AS MATERIALIZED (
       #  SELECT $csc g_mul64(g_xsr((__acc + $p4) & $M64, 33), $p2) AS __f1
       #  FROM ${p}x2
       #), ${p}x4 AS MATERIALIZED (
       #  SELECT $csc g_xsr(g_mul64(g_xsr(__f1, 29), $p3), 32) AS $outCol
       #  FROM ${p}x3
       #)""".stripMargin('#')
  }

  /** The two-murmur 64-bit key the sketch registries derive slots/bits
    * from ([[graft.operators.KeyHash]].key64): high word
    * `stringHash(s, stringSeed)`, low word `stringHash(s, 0x9747b28c)` —
    * as an unsigned HUGEINT SQL expression over a string expression.
    */
  def key64Sql(sExpr: String): String =
    s"((g_u32(g_scala_stringhash($sExpr, $StringSeed))::HUGEINT << 32)" +
      s" | g_u32(g_scala_stringhash($sExpr, $AltSeed))::HUGEINT)"

  /** Root for trained-state exports the oracle SQL reads back. Keyed by
    * the verify run (Verify sets `graft.oracle.exportRoot` to
    * `<outDir>/oracle_export` before queries run AND before oracleSql is
    * rendered, so the dumped SQL and the parquet writes agree) — a fixed
    * shared /tmp path made dumping sf0.01 and sf1 before one check.py run
    * destructive: the second dump overwrote the first sf's state.
    */
  def exportRoot: String =
    sys.props.getOrElse("graft.oracle.exportRoot", "/tmp/graft_oracle_export")

  /** Where t14 exports its trained weights for the oracle re-score. */
  def T14ModelExport = s"$exportRoot/t14_model.parquet"

  /** Where t19 exports its learned BPE merge table (rank, a, b). */
  def T19MergesExport = s"$exportRoot/t19_merges.parquet"

  /** Per-query IVF centroid export path (cell, centroid DOUBLE[]) — the
    * Lloyd-trained state behind the s03/s04/s05/s06/s09 oracles.
    */
  def centroidExport(query: String): String =
    s"$exportRoot/${query}_centroids.parquet"

  /** t42's value-exact replay of the portable cardinality registry
    * ([[graft.operators.Cardinality]]): xxhash64(doc_id) staged through
    * MATERIALIZED CTEs (one multiply level per stage — the nested-macro
    * form inlines exponentially and takes ~35 s to BIND for a single
    * call), then the sparse/dense mode split and the exact-integer
    * raw-HLL estimator on HUGEINT. Constants (lgK, sparse cap, alphaQ,
    * the numerator) come from the operator object — one source of truth,
    * so an estimator change breaks this oracle loudly instead of
    * silently. Replays value-exact in BOTH regimes: exact distinct
    * count at sf0.01 (25/source ≤ cap), dense register estimate at sf1
    * (2500/source).
    */
  def t42OracleSql(): String = {
    import graft.operators.Cardinality._
    val lgK = PortableLgK
    val m = 1 << lgK
    val k = 64 - lgK + 1
    val cap = PortableSparseCap
    val num = PortableNum.toString
    val seedBase = // 42 + PRIME64_5 + 8, wrapped — xxh64's 1-block accumulator
      ((BigInt(42) + BigInt("2870177450012600261") + 8) &
        ((BigInt(1) << 64) - 1)).toString
    val p1 = "11400714785074694791"
    val p2 = "14029467366897019727"
    val p3 = "1609587929392839161"
    val p4 = "9650029242287828579"
    preamble +
      s"""WITH c0 AS MATERIALIZED (
         #  SELECT source AS grp, g_us(doc_id::BIGINT) AS u
         #  FROM documents WHERE doc_id IS NOT NULL GROUP BY 1, 2
         #), c1 AS MATERIALIZED (
         #  SELECT grp, g_mul64(g_rotl64(g_mul64(u, $p2), 31), $p1) AS k1
         #  FROM c0
         #), c2 AS MATERIALIZED (
         #  SELECT grp, g_mul64(g_rotl64(xor($seedBase::HUGEINT, k1), 27),
         #                      $p1) AS acc
         #  FROM c1
         #), c3 AS MATERIALIZED (
         #  SELECT grp, g_mul64(g_xsr((acc + $p4) & $M64, 33), $p2) AS x1
         #  FROM c2
         #), c4 AS MATERIALIZED (
         #  SELECT grp, g_xsr(g_mul64(g_xsr(x1, 29), $p3), 32) AS h FROM c3
         #), hx AS MATERIALIZED (
         #  SELECT DISTINCT grp, h FROM c4
         #), d AS (
         #  SELECT grp, count(*) AS n FROM hx GROUP BY grp
         #), reg AS (
         #  SELECT grp, (h >> ${64 - lgK}) AS bucket,
         #    max(CASE WHEN (h & ((1::HUGEINT << ${64 - lgK}) - 1)) = 0
         #         THEN $k
         #         ELSE $k - length(format('{:b}',
         #                (h & ((1::HUGEINT << ${64 - lgK}) - 1))::BIGINT))
         #         END) AS mx
         #  FROM hx GROUP BY grp, bucket
         #), s AS (
         #  SELECT grp, count(*) AS present,
         #         sum(1::HUGEINT << ($k - mx)) AS sp
         #  FROM reg GROUP BY grp
         #)
         #SELECT d.grp AS "group",
         #  CASE WHEN d.n <= $cap THEN d.n::BIGINT
         #       ELSE ($num::HUGEINT
         #             // ((($m - s.present)::HUGEINT * (1::HUGEINT << $k)
         #                  + s.sp) << 30)
         #            )::BIGINT END AS n_distinct_est
         #FROM d JOIN s USING (grp)
         #ORDER BY "group"""".stripMargin('#')
  }

  /** One unrolled greedy-BPE merge step: find each word's lowest-rank
    * adjacent pair, merge ALL its non-overlapping occurrences
    * left-to-right (the a==b overlap case resolves by run-offset parity —
    * a run of k equal symbols merges at offsets 0,2,4…), words with no
    * applicable pair pass through. MATERIALIZED per step: the e/p/g/b
    * chain referenced un-materialized inlines exponentially.
    */
  private def bpeStep(k: Int): String = {
    val prev = s"e${k - 1}"
    s""", b$k AS MATERIALIZED (
       #  SELECT t.word, min(m.rank) AS br
       #  FROM (SELECT word, syms, unnest(range(1, len(syms))) AS i FROM $prev) t
       #  JOIN merges m ON m.a = t.syms[i] AND m.b = t.syms[i+1]
       #  GROUP BY t.word
       #), p$k AS MATERIALIZED (
       #  SELECT e.word, e.syms,
       #    CASE WHEN b.br IS NULL THEN NULL ELSE
       #      list_transform(range(1, len(e.syms)),
       #        i -> CASE WHEN e.syms[i] = mm.a AND e.syms[i+1] = mm.b
       #             THEN 1 ELSE 0 END)
       #    END AS ml
       #  FROM $prev e
       #  LEFT JOIN b$k b USING (word)
       #  LEFT JOIN merges mm ON mm.rank = b.br
       #), g$k AS MATERIALIZED (
       #  SELECT word, syms,
       #    CASE WHEN ml IS NULL THEN NULL ELSE
       #      list_transform(range(1, len(syms)),
       #        i -> ml[i] = 1 AND
       #             ((i - coalesce(list_max(list_filter(range(1, i),
       #                 j -> ml[j] = 0)), 0) - 1) % 2 = 0))
       #    END AS gl
       #  FROM p$k
       #), e$k AS MATERIALIZED (
       #  SELECT word,
       #    CASE WHEN gl IS NULL THEN syms ELSE
       #      list_filter(list_transform(range(1, len(syms) + 1),
       #        i -> CASE WHEN i < len(syms) AND gl[i] THEN syms[i] || syms[i+1]
       #                  WHEN i > 1 AND gl[i-1] THEN NULL
       #                  ELSE syms[i] END),
       #        x -> x IS NOT NULL)
       #    END AS syms
       #  FROM g$k
       #)""".stripMargin('#')
  }

  /** The t19 oracle: greedy-encode every DISTINCT word against the
    * exported merge table through `steps` unrolled passes (one merge rank
    * applied per pass per word — corpus words are ≤ 8 chars + the EOW
    * marker, so 10 passes close any encode; a word still carrying a
    * mergeable pair after the last pass nulls the whole answer, failing
    * the gate LOUDLY rather than silently undercounting).
    */
  def t19OracleSql(steps: Int = 10): String = {
    s"""WITH merges AS MATERIALIZED (
       #  SELECT rank, a, b
       #  FROM read_parquet('$T19MergesExport/*.parquet')
       #), toks AS MATERIALIZED (
       #  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS word
       #  FROM documents
       #), words AS MATERIALIZED (
       #  SELECT DISTINCT word FROM toks WHERE word <> ''
       #), e0 AS (
       #  SELECT word,
       #    list_append(list_transform(range(1, length(word) + 1),
       #      i -> word[i]), '</w>') AS syms
       #  FROM words
       #)""".stripMargin('#') +
      (1 to steps).map(bpeStep).mkString +
      s"""
       #, leftover AS MATERIALIZED (
       #  SELECT count(*) AS n FROM
       #    (SELECT word, syms, unnest(range(1, len(syms))) AS i FROM e$steps) t
       #    JOIN merges m ON m.a = t.syms[i] AND m.b = t.syms[i+1]
       #), wl AS (
       #  SELECT word,
       #    CASE WHEN (SELECT n FROM leftover) = 0 THEN len(syms) END AS wtoks
       #  FROM e$steps
       #), agg AS (
       #  SELECT t.doc_id, sum(w.wtoks)::INT AS n_bpe
       #  FROM toks t JOIN wl w USING (word)
       #  WHERE t.word <> ''
       #  GROUP BY t.doc_id
       #)
       #SELECT d.doc_id,
       #  CASE WHEN d.text IS NULL THEN NULL
       #       ELSE coalesce(a.n_bpe, 0) END AS n_bpe
       #FROM documents d LEFT JOIN agg a USING (doc_id)
       #ORDER BY d.doc_id""".stripMargin('#')
  }

  /** Where t50 exports its trained unigram vocabulary
    * (piece, score, kind ∈ piece|unk) — integer micro-nat scores, so the
    * Viterbi DP below is exact-integer on both engines.
    */
  def T50VocabExport = s"$exportRoot/t50_vocab.parquet"

  /** The t50 oracle: Viterbi-encode every DISTINCT word against the
    * exported unigram vocabulary via an UNROLLED position DP — CTE `pK`
    * holds the best (score, np) state after consuming K characters, built
    * from the states `p(K-l)` for every piece length l ≤ `maxPieceLen`
    * plus the always-available single-char `<unk>` fallback; candidate
    * order (score DESC, np ASC, last-piece-length DESC) is the exact
    * comparator `Unigram.viterbiWord` applies, and scores are integer
    * micro-nats, so the argmax is bit-identical across engines. Corpus
    * words are ≤ 8 chars; `maxLen` = 12 leaves headroom, and any longer
    * word nulls the whole answer (the t19 loud-failure pattern) rather
    * than silently truncating.
    */
  /** Where t51 exports its (identically trained) vocabulary — own path so
    * the t51 oracle never depends on t50 having run in the same dump.
    */
  def T51VocabExport = s"$exportRoot/t51_vocab.parquet"

  /** Shared Viterbi-DP CTE chain (no leading WITH): tokenize `textExpr`
    * over documents, then unrolled integer DP per distinct word; ends in
    * `fin(word, np, score, nu)` — piece count, total micro-nat score, and
    * `<unk>` piece count for the canonical segmentation. `toks` carries
    * (doc_id, source, word) so callers can aggregate either way.
    */
  private def uniDpCtes(vocabExport: String, textExpr: String,
                        maxLen: Int, maxPieceLen: Int): String = {
    def step(k: Int): String = {
      val pieceArms = (1 to math.min(maxPieceLen, k)).map { l =>
        s"""
           #    SELECT p.word, p.score + v.score AS score, p.np + 1 AS np,
           #           p.nu AS nu, $l AS ll
           #    FROM p${k - l} p JOIN w ON w.word = p.word
           #    JOIN vocab v ON v.piece = substr(p.word, ${k - l + 1}, $l)
           #    WHERE w.n >= $k""".stripMargin('#')
      }
      val unkArm =
        s"""
           #    SELECT p.word, p.score + (SELECT score FROM unk) AS score,
           #           p.np + 1 AS np, p.nu + 1 AS nu, 1 AS ll
           #    FROM p${k - 1} p JOIN w ON w.word = p.word
           #    WHERE w.n >= $k""".stripMargin('#')
      s"""
         #, p$k AS MATERIALIZED (
         #  SELECT word, score, np, nu FROM (${(pieceArms :+ unkArm).mkString("\n    UNION ALL")}
         #  )
         #  QUALIFY row_number() OVER (PARTITION BY word
         #    ORDER BY score DESC, np ASC, ll DESC) = 1
         #)""".stripMargin('#')
    }
    val allp = (1 to maxLen)
      .map(k => s"  SELECT $k AS k, word, score, np, nu FROM p$k")
      .mkString("\n  UNION ALL\n")
    s"""vall AS MATERIALIZED (
       #  SELECT piece, score, kind
       #  FROM read_parquet('$vocabExport/*.parquet')
       #), vocab AS MATERIALIZED (
       #  SELECT piece, score FROM vall WHERE kind = 'piece'
       #), unk AS MATERIALIZED (
       #  SELECT score FROM vall WHERE kind = 'unk'
       #), toks AS MATERIALIZED (
       #  SELECT doc_id, source,
       #    unnest(string_split_regex($textExpr, '\\s+')) AS word
       #  FROM documents
       #), w AS MATERIALIZED (
       #  SELECT word, length(word) AS n
       #  FROM (SELECT DISTINCT word FROM toks WHERE word <> '')
       #), p0 AS (
       #  SELECT word, 0::BIGINT AS score, 0 AS np, 0 AS nu FROM w
       #)""".stripMargin('#') +
      (1 to maxLen).map(step).mkString +
      s"""
       #, over_cap AS MATERIALIZED (
       #  SELECT count(*) AS n FROM w WHERE n > $maxLen
       #), fin AS MATERIALIZED (
       #  SELECT w.word,
       #    CASE WHEN (SELECT n FROM over_cap) = 0 THEN p.np END AS np,
       #    CASE WHEN (SELECT n FROM over_cap) = 0 THEN p.score END AS score,
       #    CASE WHEN (SELECT n FROM over_cap) = 0 THEN p.nu END AS nu
       #  FROM w JOIN (
       #$allp
       #  ) p ON p.word = w.word AND p.k = w.n
       #)""".stripMargin('#')
  }

  def t50OracleSql(maxLen: Int = 12, maxPieceLen: Int = 3): String =
    "WITH " + uniDpCtes(T50VocabExport, "text", maxLen, maxPieceLen) +
      s"""
       #, agg AS (
       #  SELECT t.doc_id, sum(f.np)::INT AS n_uni,
       #         sum(f.score)::BIGINT AS uscore_micro
       #  FROM toks t JOIN fin f ON f.word = t.word
       #  WHERE t.word <> ''
       #  GROUP BY t.doc_id
       #)
       #SELECT d.doc_id,
       #  CASE WHEN d.text IS NULL THEN NULL
       #       ELSE coalesce(a.n_uni, 0) END AS n_uni,
       #  CASE WHEN d.text IS NULL THEN NULL
       #       ELSE coalesce(a.uscore_micro, 0::BIGINT) END AS uscore_micro
       #FROM documents d LEFT JOIN agg a USING (doc_id)
       #ORDER BY d.doc_id""".stripMargin('#')

  /** The SQL rendering of t51's probe salt — documents text with appended
    * digit-bearing tokens (digits are outside the training alphabet, so
    * they exercise the `<unk>` path deterministically). Must mirror the
    * Spark column in TextQ's t51 exactly; null text propagates.
    */
  /** The SQL rendering of t53's multilingual probe salt — each document
    * becomes its own text, a Spanish-stopword line, the text again, and
    * (on even ids) a German-stopword line, so per-line language votes and
    * segment boundaries are exercised deterministically. Must mirror the
    * Spark column in TextQ's t53 exactly (single-sourced, the t51
    * convention); chr(10) because '\n' escapes differently in the two
    * engines' string literals; null text propagates.
    */
  def t53SaltSqlExpr: String =
    "text || chr(10) || 'el los las del por con es y' || chr(10) || text || " +
      "CASE WHEN doc_id % 2 = 0 " +
      "THEN chr(10) || 'der die das und den von zu mit' ELSE '' END"

  def t51SaltSqlExpr: String =
    "text || ' v' || CAST(doc_id % 7 AS STRING) || " +
      "CASE WHEN doc_id % 3 = 0 THEN ' x' || CAST(doc_id % 11 AS STRING) " +
      "ELSE '' END"

  /** The t51 oracle: the same unrolled Viterbi DP as t50 (run against
    * t51's own vocabulary export and the salted probe text), aggregated
    * per SOURCE into tokenizer-coverage counters — total pieces, `<unk>`
    * pieces, and integral parts-per-million OOV rate.
    */
  def t51OracleSql(maxLen: Int = 12, maxPieceLen: Int = 3): String =
    "WITH " + uniDpCtes(T51VocabExport, s"($t51SaltSqlExpr)", maxLen,
      maxPieceLen) +
      s"""
       #, agg AS (
       #  SELECT t.source, sum(f.np)::BIGINT AS n_pieces,
       #         sum(f.nu)::BIGINT AS n_unk
       #  FROM toks t JOIN fin f ON f.word = t.word
       #  WHERE t.word <> ''
       #  GROUP BY t.source
       #)
       #SELECT s.source, a.n_pieces, a.n_unk,
       #  CASE WHEN coalesce(a.n_pieces, 0) > 0
       #       THEN (a.n_unk * 1000000) // a.n_pieces END AS oov_ppm
       #FROM (SELECT DISTINCT source FROM documents) s
       #LEFT JOIN agg a USING (source)
       #ORDER BY s.source""".stripMargin('#')
}
