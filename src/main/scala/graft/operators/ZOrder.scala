package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) data layout — multi-column locality for scan
  * pruning, the lakehouse `OPTIMIZE ZORDER BY` primitive.
  *
  * A table sorted lexically by `x` gives parquet row groups tight
  * min/max ranges on `x` and USELESS ranges on every other column: a
  * 2-D box predicate `x BETWEEN .. AND y BETWEEN ..` prunes on `x`
  * only, and at 100 TB the difference between reading the x-slab and
  * reading the box is the whole job. Interleaving the bits of both
  * columns (z = x₀y₀x₁y₁…, the Morton curve) makes curve-contiguous
  * row groups cover small RECTANGLES, so min/max stats are tight on
  * BOTH columns and a box predicate prunes multiplicatively
  * (ZORDERBENCH measures the read-bytes gap on identical data).
  *
  * The interleave is pure column algebra — five mask-and-shift
  * doubling steps per column (`shiftleft`/`bitwiseAND`/`bitwiseOR`,
  * whole-stage-codegen'd, scan-hot-path safe), no UDF — and the same
  * arithmetic is DuckDB-expressible, so t41 hash-gates the z-values
  * cross-engine.
  *
  * Inputs must be in [0, 2³¹): the interleave of two 31-bit values
  * stays below 2⁶², so SIGNED long comparison equals unsigned curve
  * order (a negative or ≥2³¹ input would fold the curve and silently
  * break locality — guarded with a row-level raise_error, the
  * corrupt-fails-loudly convention for layout writers where a silent
  * mis-sort poisons every later read). Callers bucket or rank wider
  * domains first (e.g. `% 1024`, epoch-day, [[graft.dedup.Dedup]]'s
  * rank engine).
  */
object ZOrder {

  /** Spread the low 32 bits of `c` to even positions (bit i → bit 2i)
    * — the classic mask-doubling sequence.
    */
  private def spread2(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFFFFFL))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x3333333333333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 64-bit Morton z-value of two columns in [0, 2³¹): `a`'s bit i
    * lands at 2i, `b`'s at 2i+1. Null if either input is null;
    * raise_error outside the domain.
    */
  def zvalue2(a: Column, b: Column): Column = {
    def guarded(c: Column) = {
      val v = c.cast("long")
      when(v.isNull, lit(null).cast("long"))
        .when(v >= 0 && v < lit(1L << 31), v)
        .otherwise(raise_error(concat(
          lit("zvalue2 input out of [0, 2^31): "), v.cast("string"))))
    }
    spread2(guarded(a)).bitwiseOR(shiftleft(spread2(guarded(b)), 1))
  }

  /** JVM reference of [[zvalue2]] for specs and the bench generator. */
  private[graft] def zvalueLocal(a: Long, b: Long): Long = {
    require(a >= 0 && a < (1L << 31) && b >= 0 && b < (1L << 31))
    var z = 0L
    var i = 0
    while (i < 31) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** The same interleave as ANSI SQL over BIGINT bit operators, for the
    * cross-engine oracle — generated from the identical mask constants
    * so the two sides cannot drift.
    */
  def duckZvalue2(a: String, b: String): String = {
    def spread(e: String): String = {
      var x = s"($e & 4294967295)"
      x = s"(($x | ($x << 16)) & ${0x0000FFFF0000FFFFL})"
      x = s"(($x | ($x << 8)) & ${0x00FF00FF00FF00FFL})"
      x = s"(($x | ($x << 4)) & ${0x0F0F0F0F0F0F0F0FL})"
      x = s"(($x | ($x << 2)) & ${0x3333333333333333L})"
      s"(($x | ($x << 1)) & ${0x5555555555555555L})"
    }
    s"(${spread(a)} | (${spread(b)} << 1))"
  }

  /** Spread the low 21 bits of `c` to every third position (bit i →
    * bit 3i) — the 3-D Morton mask sequence.
    */
  private def spread3(c: Column): Column = {
    var x = c.bitwiseAND(lit(0x1FFFFFL))
    x = x.bitwiseOR(shiftleft(x, 32)).bitwiseAND(lit(0x001F00000000FFFFL))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x001F0000FF0000FFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x100F00F00F00F00FL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x10C30C30C30C30C3L))
    x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x1249249249249249L))
  }

  /** 63-bit Morton z-value of three columns in [0, 2²¹) — the
    * three-predicate-column layout (e.g. host-bucket × day × quality
    * band). Same null/domain contract as [[zvalue2]]. 21 bits per
    * column: callers bucket wider domains first.
    */
  def zvalue3(a: Column, b: Column, c: Column): Column = {
    def guarded(col0: Column) = {
      val v = col0.cast("long")
      when(v.isNull, lit(null).cast("long"))
        .when(v >= 0 && v < lit(1L << 21), v)
        .otherwise(raise_error(concat(
          lit("zvalue3 input out of [0, 2^21): "), v.cast("string"))))
    }
    spread3(guarded(a))
      .bitwiseOR(shiftleft(spread3(guarded(b)), 1))
      .bitwiseOR(shiftleft(spread3(guarded(c)), 2))
  }

  /** JVM reference of [[zvalue3]] for specs. */
  private[graft] def zvalue3Local(a: Long, b: Long, c: Long): Long = {
    require(a >= 0 && a < (1L << 21) && b >= 0 && b < (1L << 21) &&
      c >= 0 && c < (1L << 21))
    var z = 0L
    var i = 0
    while (i < 21) {
      z |= ((a >> i) & 1L) << (3 * i)
      z |= ((b >> i) & 1L) << (3 * i + 1)
      z |= ((c >> i) & 1L) << (3 * i + 2)
      i += 1
    }
    z
  }

  /** [[duckZvalue2]]'s 3-column sibling — same generated-constants
    * discipline.
    */
  def duckZvalue3(a: String, b: String, c: String): String = {
    def spread(e: String): String = {
      var x = s"($e & ${0x1FFFFFL})"
      x = s"(($x | ($x << 32)) & ${0x001F00000000FFFFL})"
      x = s"(($x | ($x << 16)) & ${0x001F0000FF0000FFL})"
      x = s"(($x | ($x << 8)) & ${0x100F00F00F00F00FL})"
      x = s"(($x | ($x << 4)) & ${0x10C30C30C30C30C3L})"
      s"(($x | ($x << 2)) & ${0x1249249249249249L})"
    }
    s"(${spread(a)} | (${spread(b)} << 1) | (${spread(c)} << 2))"
  }

  /** Rewrite `df` in z-order on (`aCol`, `bCol`): range-partition by
    * z-value (contiguous curve segments per output file), sort within
    * partitions, drop the helper column. `partitions` sizes output
    * files; row-group min/max stats inside each file are then tight on
    * BOTH columns. The row multiset is unchanged — this is a LAYOUT
    * operator; correctness of every downstream query is untouched
    * (spec-pinned).
    */
  def cluster(df: DataFrame, aCol: String, bCol: String,
              partitions: Int = 0): DataFrame = {
    val z = zvalue2(col(aCol), col(bCol))
    val withZ = df.withColumn("__zorder", z)
    val parted =
      if (partitions > 0) withZ.repartitionByRange(partitions, col("__zorder"))
      else withZ.repartitionByRange(col("__zorder"))
    parted.sortWithinPartitions("__zorder").drop("__zorder")
  }
}
