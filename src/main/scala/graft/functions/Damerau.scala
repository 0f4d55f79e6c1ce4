package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd UNRESTRICTED Damerau–Levenshtein distance (Lowrance &
  * Wagner 1975) — edit distance where an adjacent TRANSPOSITION costs
  * one edit instead of two: the dominant real-world typo class
  * ("teh", "hte") that plain Levenshtein double-charges. Spark ships
  * no Damerau at all; the oracle's `damerau_levenshtein` is the same
  * unrestricted variant (probed: CA→ABC = 2, not OSA's 3), so the gate
  * is pure integer cross-engine parity.
  *
  * Full Lowrance–Wagner DP with the last-occurrence table (the
  * restricted/OSA shortcut would disagree with the oracle on
  * transpose-then-edit chains). O(|a|·|b|) time, O(|a|·|b|) ints —
  * title/name-sized strings; the FuzzyJoin tier blocks candidates
  * before any kernel call. UTF-16 code units (ASCII-safe fixtures).
  */
object DamerauFn {

  // last-occurrence table per thread: a full char-indexed int array,
  // reset via a touched-list after each call (the kernel runs once per
  // candidate PAIR — a boxed HashMap here was the d33 verify's
  // dominant cpu term, ~3× the DP itself)
  private val daTl = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](1 << 16)
  }
  private val touchedTl = new ThreadLocal[Array[Char]] {
    override def initialValue(): Array[Char] = new Array[Char](512)
  }

  def dist(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.toString
    val b = ub.toString
    val n = a.length
    val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    // d is (n+2) x (m+2), flattened; row 0/col 0 hold the ∞ sentinel
    val w = m + 2
    val d = new Array[Int]((n + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= n) { d((i + 1) * w) = inf; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= m) { d(j + 1) = inf; d(w + j + 1) = j; j += 1 }
    // last row index (1-based) where each char occurred in `a`
    val da = daTl.get()
    val touched =
      if (n <= touchedTl.get().length) touchedTl.get()
      else new Array[Char](n)
    var nTouched = 0
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val k = da(b.charAt(j - 1))
        val l = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 }
          else 1
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val trans = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var best = sub
        if (ins < best) best = ins
        if (del < best) best = del
        if (trans < best) best = trans
        d((i + 1) * w + j + 1) = best
        j += 1
      }
      val c = a.charAt(i - 1)
      if (da(c) == 0) { touched(nTouched) = c; nTouched += 1 }
      da(c) = i
      i += 1
    }
    val out = d((n + 1) * w + m + 1)
    i = 0
    while (i < nTouched) { da(touched(i)) = 0; i += 1 }
    out
  }
}

case class DamerauDistance(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DamerauFn.dist(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DamerauFn.dist($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Damerau {
  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(DamerauDistance(Bridge.expression(a), Bridge.expression(b)))
}
