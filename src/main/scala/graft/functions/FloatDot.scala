package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product over two `array<float>` columns, accumulated
  * left-to-right in double.
  *
  * This replaces an `aggregate(zip_with(...))` higher-order composition:
  * identical arithmetic (same operation order → bit-identical results), but
  * the interpreted lambda dispatch per element becomes a primitive loop
  * inside whole-stage codegen — on 64-dim vectors this is ~50× faster and
  * allocation-free, which is what the ANN/dedup pair loops need at scale.
  */
case class FloatDot(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  // Declared input types make calls safe: ArrayData.getFloat on an
  // array<double> would silently reinterpret bytes, so any non-float-array
  // input is now an analysis error instead of garbage at runtime. (The SQL
  // builder in GraftExtensions additionally casts numeric arrays, since
  // SQL array literals default to array<double> and Catalyst's implicit
  // casts never narrow.)
  // (typed Seq[DataType] — the parent's AbstractDataType is private[sql];
  // covariant override keeps the contract without naming it)
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FloatDot {
  /** Column-level entry point (inputs must be array<float> columns). */
  def apply(a: Column, b: Column): Column =
    Bridge.column(FloatDot(Bridge.expression(a), Bridge.expression(b)))
}
