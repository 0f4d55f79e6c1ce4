package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.OracleHashLib

/** Drift guards for the DuckDB-side hash library: the SQL macros mirror
  * JVM hash derivations (splitmix64 permutation params, the gear table,
  * scala MurmurHash3 seeds), and those constants are embedded into the
  * oracle strings at build time. If an operator's hash derivation moves
  * (seed, prime, table), these pins fail before the driver's DuckDB gate
  * can silently mismatch. The value-exact gate itself is check.py — each
  * converted oracle (d02/d03/d14/t04/d25/d26/t14) is diffed against the
  * Spark parquet dump at sf0.01 and sf0.1.
  */
class OracleHashLibSpec extends AnyFunSuite {

  test("gear5 literal mirrors Cdc.Gear's low 5 bits") {
    val expected = graft.dedup.Cdc.Gear.map(_ & 31L).mkString("[", ",", "]")
    assert(OracleHashLib.cdcChunkCtes("", "SELECT 1").contains(expected))
  }

  test("perm VALUES mirror Dedup's splitmix64(seed=42) stream") {
    // first permutation pair, independently derived
    var x = 42L
    def next(): Long = {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val a0 = next() | 1L
    (1 until 64).foreach(_ => next()) // a1..a63 consumed in order
    val b0 = next()                   // 65th draw = first b
    def u(v: Long) = (BigInt(v) & ((BigInt(1) << 64) - 1)).toString
    assert(OracleHashLib.permValues.startsWith(
      s"perms(i, a, b) AS (VALUES (0,${u(a0)}::HUGEINT,${u(b0)}::HUGEINT)"))
  }

  test("scala MurmurHash3 seeds are embedded as unsigned decimals") {
    assert(OracleHashLib.StringSeed == (0xf7ca7fd2L & 0xFFFFFFFFL).toString)
    assert(OracleHashLib.AltSeed == (0x9747b28cL & 0xFFFFFFFFL).toString)
  }

  test("every converted oracle carries the macro preamble") {
    val converted = Seq("d02_minhash_bands", "d03_simhash",
      "d13_near_registry", "d14_simhash_near_dedup", "d15_hamming_registry",
      "d25_cdc_containment", "d26_chunk_registry", "c01_curate",
      "m01_perceptual_dedup", "t04_fingerprint", "t14_quality_classifier")
    val oracles = SparkEntry.oracleSql
    converted.foreach { q =>
      assert(oracles.contains(q), s"$q lost its oracle")
      assert(oracles(q).startsWith("CREATE OR REPLACE MACRO g_mul64"),
        s"$q oracle missing the hash-lib preamble")
    }
    // the export-the-state family needs no hash macros, only its exports
    assert(oracles("t19_bpe_tokens").contains(
      graft.queries.OracleHashLib.T19MergesExport))
    Seq("s03_knn_ivf", "s04_knn_ivf_batch", "s05_knn_ivf_indexed",
      "s06_knn_ivf_indexed_batch", "s08_semantic_dedup_registry",
      "s09_cluster_sample").foreach { q =>
      assert(oracles(q).contains(
        graft.queries.OracleHashLib.centroidExport(q)), s"$q export path")
    }
    assert(oracles("s12_knn_lsh_multiprobe").contains("psig"))
    // t42 regained an oracle in round 15 via the PORTABLE sketch: its
    // exact-integer estimator replays at any cardinality (the r13/r14
    // DataSketches coupon-exact oracle was withdrawn because estimates
    // left the exact regime at sf1). Pin the estimator constants into
    // the SQL so a drifted estimator fails here before the driver gate.
    locally {
      val t42 = oracles("t42_distinct_per_source")
      assert(t42.startsWith("CREATE OR REPLACE MACRO g_mul64"))
      assert(t42.contains(graft.operators.Cardinality.PortableNum.toString))
      assert(t42.contains(s"<= ${graft.operators.Cardinality.PortableSparseCap}"))
    }
    // t35 (round 16): a bit-exact DEFLATE codec still has no SQL
    // expression — its oracle is the export-the-state pattern with the
    // roles reversed: expected ratios computed by CPython zlib at dump
    // time, read back from the export root
    locally {
      val t35 = oracles("t35_compression_ratio")
      assert(t35.contains(
        s"${graft.queries.OracleHashLib.exportRoot}/t35_expected.parquet"),
        s"t35 oracle must read the zlib export: $t35")
      assert(SparkEntry.queries.contains("t35_compression_ratio"))
    }
  }
}
