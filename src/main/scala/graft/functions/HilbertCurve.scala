package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** HILBERT-curve index of two bucketed columns — the better-locality
  * sibling of [[graft.operators.ZOrder]]'s Morton interleave, and the
  * curve modern lakehouse clustering actually prefers: the Hilbert curve
  * is CONTINUOUS (consecutive curve positions are always Manhattan
  * distance 1 apart, where Morton takes corner-to-corner jumps at every
  * power-of-two boundary), so curve-contiguous parquet row groups cover
  * tighter rectangles and a 2-D box predicate prunes strictly better at
  * the same file count — the gap widens exactly at the block boundaries
  * Morton handles worst.
  *
  * Unlike the Morton interleave, the xy→d mapping is STATEFUL across bit
  * levels (each level conditionally reflects/transposes the lower bits),
  * so it is not expressible as a handful of mask-shift column ops without
  * exponential expression blowup. Preference ladder (b): a codegen'd
  * Catalyst expression — one tight O(bits) loop inside whole-stage
  * codegen, scan-hot-path safe, interpreted fallback sharing the same
  * JVM kernel. The identical per-level algebra is emitted as a DuckDB
  * CTE chain ([[HilbertCurve2.duckStages]]) from the same constants, so
  * the q23 oracle cannot drift from the kernel.
  *
  * Inputs must lie in [0, 2^bits) — a wider value would fold the curve
  * and silently break locality, so it raises (the ZOrder layout-writer
  * convention: a silent mis-sort poisons every later read). Callers
  * bucket wider domains first (`% 2^bits`, epoch-day, rank).
  */
case class HilbertCurve2(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression with ExpectsInputTypes {

  require(bits >= 1 && bits <= 31, s"hilbert2 bits=$bits (need 1..31)")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert2"

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HilbertCurve2.xy2d(bits, a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HilbertCurve2.xy2d($bits, $a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertCurve2 {
  /** Column-level entry point: Hilbert index of (x, y), each in
    * [0, 2^bits). Null if either input is null.
    */
  def apply(x: Column, y: Column, bits: Int): Column =
    Bridge.column(HilbertCurve2(
      Bridge.expression(x.cast("long")), Bridge.expression(y.cast("long")),
      bits))

  /** The xy→d kernel (classic reflect-and-transpose walk, top bit level
    * down). Public: generated code calls it through the companion's
    * static forwarder, and specs pin it against the 4×4 reference table.
    */
  def xy2d(bits: Int, xin: Long, yin: Long): Long = {
    val n = 1L << bits
    if (xin < 0 || xin >= n || yin < 0 || yin >= n)
      throw new IllegalArgumentException(
        s"hilbert2 input out of [0, 2^$bits): ($xin, $yin)")
    var x = xin
    var y = yin
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** The inverse walk (d → (x, y)) — spec-side only: the adjacency
    * property (consecutive d are Manhattan-distance-1 neighbors, the
    * continuity Morton lacks) is pinned by walking the whole curve.
    */
  private[graft] def d2xy(bits: Int, din: Long): (Long, Long) = {
    val n = 1L << bits
    var x = 0L; var y = 0L
    var t = din
    var s = 1L
    while (s < n) {
      val rx = (t / 2) & 1L
      val ry = (t ^ rx) & 1L
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }

  /** The identical per-level algebra as a DuckDB CTE chain, generated
    * from the same constants so the oracle cannot drift: given a prior
    * CTE `src` exposing bucketed BIGINT columns `hx`, `hy` (plus any
    * passthrough columns in `carry`), emits `bits + 1` chained CTEs
    * whose last, `h$bits`, exposes `carry` columns and `hval`.
    */
  def duckStages(src: String, bits: Int, carry: Seq[String]): String = {
    val keep = carry.mkString(", ")
    val sb = new StringBuilder
    sb.append(s"h0 AS (SELECT $keep, hx AS x0, hy AS y0, CAST(0 AS BIGINT) AS d0 FROM $src)")
    for (i <- 1 to bits) {
      val s = 1L << (bits - i)
      val p = i - 1
      sb.append(s""",
        |h$i AS (
        |  SELECT $keep,
        |    CASE WHEN ((y$p >> ${bits - i}) & 1) = 0
        |         THEN (CASE WHEN ((x$p >> ${bits - i}) & 1) = 1
        |                    THEN $s - 1 - y$p ELSE y$p END)
        |         ELSE x$p END AS x$i,
        |    CASE WHEN ((y$p >> ${bits - i}) & 1) = 0
        |         THEN (CASE WHEN ((x$p >> ${bits - i}) & 1) = 1
        |                    THEN $s - 1 - x$p ELSE x$p END)
        |         ELSE y$p END AS y$i,
        |    d$p + $s * $s * xor(3 * ((x$p >> ${bits - i}) & 1),
        |                        ((y$p >> ${bits - i}) & 1)) AS d$i
        |  FROM h$p)""".stripMargin)
    }
    sb.append(s""",
      |hf AS (SELECT $keep, d$bits AS hval FROM h$bits)""".stripMargin)
    sb.toString
  }
}
