package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType}

/** Codegen'd dot product between an UNSIGNED-int8 code vector (a `binary`
  * column, one byte per dimension) and an `array<float>` query vector,
  * accumulated left-to-right in double: Σ (code[i] & 0xFF) · q[i].
  *
  * This is the scoring kernel of the quantized IVF probe
  * ([[graft.similarity.Similarity.ivfProbeQuantized]]): the index stores
  * per-vector scalar-quantized codes (4× smaller than float32), and the
  * approximate dot against a full-precision query is recovered as
  * `scale · int8_dot(code, q) + offset · Σq` — one primitive loop inside
  * whole-stage codegen, same shape as [[FloatDot]].
  */
case class Int8Dot(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "int8_dot"

  override def inputTypes: Seq[DataType] =
    Seq(BinaryType, ArrayType(FloatType))

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.length, y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += (x(i) & 0xFF).toDouble * y.getFloat(i).toDouble; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.length, $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) ($a[$i] & 0xFF)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Int8Dot {
  /** Column-level entry point (binary codes, array<float> query). */
  def apply(code: Column, q: Column): Column =
    Bridge.column(Int8Dot(Bridge.expression(code), Bridge.expression(q)))
}
