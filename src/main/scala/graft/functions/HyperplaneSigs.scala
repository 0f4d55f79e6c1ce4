package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** All `tables` random-hyperplane LSH signatures of an `array<float>` vector
  * in one pass: for table t, `bits` sign bits of dot products against
  * deterministic Gaussian directions, packed into a long tagged with t in
  * its high bits (so "any table matches" over two signature arrays is one
  * native `arrays_overlap`).
  *
  * A codegen'd expression instead of a UDF on purpose: the UDF form pays
  * ~90 µs/row in Seq[Float] boxing (each element is re-boxed tables×bits
  * times) and nested-array indirection; here the generated loop reads
  * `ArrayData.getFloat` straight off the unsafe row and indexes one flat
  * double[] — the whole tables×bits×dim kernel stays primitive. Same
  * pattern (and arithmetic order, so bit-identical signatures) as
  * [[FloatDot]].
  *
  * @param dirs flattened direction matrix, laid out [t][bit][dim]
  */
case class HyperplaneSigs(child: Expression, dim: Int, bits: Int, tables: Int,
                          dirs: Array[Double])
  extends UnaryExpression with ExpectsInputTypes {

  require(dirs.length == tables * bits * dim, "direction matrix shape mismatch")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_sigs"
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var b = 0
      while (b < bits) {
        val base = (t * bits + b) * dim
        var acc = 0.0
        var i = 0
        while (i < n) { acc += v.getFloat(i).toDouble * dirs(base + i); i += 1 }
        if (acc >= 0) sig |= (1L << b)
        b += 1
      }
      out(t) = (t.toLong << bits) | sig
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dirsRef = ctx.addReferenceObj("dirs", dirs, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val sig = ctx.freshName("sig")
      val base = ctx.freshName("base")
      s"""
         |final int $n = java.lang.Math.min($v.numElements(), $dim);
         |final long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $sig = 0L;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    final int $base = ($t * $bits + $b) * $dim;
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += ((double) $v.getFloat($i)) * $dirsRef[$base + $i];
         |    }
         |    if ($acc >= 0) $sig |= (1L << $b);
         |  }
         |  $out[$t] = (((long) $t) << $bits) | $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSigs {
  /** Column entry point; directions are derived from (dim, bits, seed+t)
    * exactly as [[graft.similarity.Similarity.directions]].
    */
  def apply(vec: Column, dim: Int, bits: Int, tables: Int, seed: Long): Column = {
    val flat = new Array[Double](tables * bits * dim)
    var t = 0
    while (t < tables) {
      val tdirs = graft.similarity.Similarity.directions(dim, bits, seed + t)
      var b = 0
      while (b < bits) {
        System.arraycopy(tdirs(b), 0, flat, (t * bits + b) * dim, dim)
        b += 1
      }
      t += 1
    }
    Bridge.column(HyperplaneSigs(Bridge.expression(vec), dim, bits, tables, flat))
  }
}
