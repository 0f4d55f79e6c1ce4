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
  *
  * A code/query LENGTH MISMATCH throws: the probe also adds `offset · Σq`
  * over the FULL query, so a wrong-embedding-model query must fail loudly
  * instead of silently scoring a truncated prefix — the same contract the
  * PQ tier's LUT construction enforces.
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
    Int8Dot.checkDims(x.length, y.numElements())
    val n = x.length
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
         |graft.functions.Int8Dot.checkDims($a.length, $b.numElements());
         |final int $n = $a.length;
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

  // called from generated code too — must be public and JVM-static-ish
  def checkDims(codeLen: Int, queryLen: Int): Unit =
    if (codeLen != queryLen)
      throw new IllegalArgumentException(
        s"int8_dot: code length $codeLen != query dim $queryLen — " +
          "wrong embedding model for this index?")
}
