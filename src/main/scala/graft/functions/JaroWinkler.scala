package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Jaro–Winkler similarity (Winkler 1990) over two string
  * columns — the record-linkage scorer for SHORT names/titles where
  * edit distance is too coarse (a one-letter typo in a 5-char name is
  * 20% of it; JW weighs matches, transpositions, and the shared prefix
  * humans rarely mistype).
  *
  * Semantics pinned to the standard (and to DuckDB's
  * `jaro_winkler_similarity`, the oracle function — spec asserts
  * bit-identical doubles on the reference pairs):
  *  - Jaro: match window ⌊max(|a|,|b|)/2⌋−1 (≥ 0), greedy left-to-right
  *    matching, transpositions = half the out-of-order matches,
  *    j = (m/|a| + m/|b| + (m−t)/m) / 3; empty/No-match → 0, equal → 1.
  *  - Winkler boost ONLY above the 0.7 threshold (DuckDB's variant):
  *    jw = j + min(prefix, 4)·0.1·(1−j).
  *
  * Operates on UTF-16 code units of the decoded string (ASCII-safe;
  * the corpus fixtures are ASCII — documented, not a parity risk
  * here). The hot loop is a primitive char-array scan inside
  * whole-stage codegen via a static call — the Levenshtein built-in's
  * own pattern (a branchy two-phase scan gains nothing from inlined
  * generated code; avoiding the interpreted-Expression fallback is
  * what matters).
  */
object JaroWinklerFn {

  /** Static kernel — called from both eval and generated code. */
  def jw(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString
    val t = b.toString
    val ls = s.length
    val lt = t.length
    // either side empty -> 0, INCLUDING both-empty (the DuckDB/oracle
    // convention; RapidFuzz-style 1.0-on-equal-empties would break the
    // bit-parity contract)
    if (ls == 0 || lt == 0) return 0.0
    if (s == t) return 1.0
    val window = math.max(0, math.max(ls, lt) / 2 - 1)
    val sMatch = new Array[Boolean](ls)
    val tMatch = new Array[Boolean](lt)
    var m = 0
    var i = 0
    while (i < ls) {
      val lo = math.max(0, i - window)
      val hi = math.min(lt - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s.charAt(i) == t.charAt(j)) {
          sMatch(i) = true; tMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars of s in order vs matched chars of t
    var trans = 0
    var k = 0
    i = 0
    while (i < ls) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val j = (md / ls + md / lt + (md - trans / 2) / md) / 3.0
    if (j > 0.7) {
      var p = 0
      val pMax = math.min(4, math.min(ls, lt))
      while (p < pMax && s.charAt(p) == t.charAt(p)) p += 1
      j + p * 0.1 * (1.0 - j)
    } else j
  }
}

case class JaroWinklerSim(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerFn.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerFn.jw($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(JaroWinklerSim(Bridge.expression(a), Bridge.expression(b)))
}
