package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType}

/** Codegen'd product-quantization asymmetric dot product: for an m-byte PQ
  * code (one codebook index per subspace) and a per-QUERY lookup table of
  * `m × 256` floats (entry `s·256 + c` = dot of the query's s-th subvector
  * with codebook centroid c of subspace s, precomputed driver-side),
  * returns Σ_s lut[s·256 + code[s]] — the dot product of the query with
  * the code's reconstruction, in m table lookups instead of `dim`
  * multiplies, over codes 4·dim/m× smaller than the raw vectors.
  *
  * The scoring kernel of [[graft.similarity.Similarity.ivfProbePq]]; same
  * primitive-loop/whole-stage-codegen shape as [[FloatDot]]/[[Int8Dot]].
  */
case class PqDot(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_dot"

  override def inputTypes: Seq[DataType] =
    Seq(BinaryType, ArrayType(FloatType))

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val code = a.asInstanceOf[Array[Byte]]
    val lut = b.asInstanceOf[ArrayData]
    val m = math.min(code.length, lut.numElements() >> 8)
    var acc = 0.0
    var s = 0
    while (s < m) { acc += lut.getFloat((s << 8) | (code(s) & 0xFF)).toDouble; s += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      s"""
         |final int $m = java.lang.Math.min($a.length, $b.numElements() >> 8);
         |double $acc = 0.0;
         |for (int $s = 0; $s < $m; $s++) {
         |  $acc += (double) $b.getFloat(($s << 8) | ($a[$s] & 0xFF));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqDot {
  /** Column-level entry point (m-byte codes, m×256 float LUT). */
  def apply(code: Column, lut: Column): Column =
    Bridge.column(PqDot(Bridge.expression(code), Bridge.expression(lut)))
}
