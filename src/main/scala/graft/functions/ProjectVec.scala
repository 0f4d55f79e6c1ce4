package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Johnson–Lindenstrauss random projection of an `array<float>` vector
  * to `outDim` dimensions: out[j] = (1/√outDim) · Σᵢ mat[j][i]·x[i]
  * with deterministic Gaussian directions — the compute-reduction
  * complement of the IVF tier's int8/PQ READ reduction: a candidate
  * scan over 16-dim projections costs a quarter of the 64-dim
  * multiplies, and JL keeps relative distances within (1±ε) whp, so an
  * overfetched projected top-k reranked EXACTLY on the original
  * vectors recovers the true neighbors (spec-gated recall).
  *
  * Codegen'd for the same reason as [[HyperplaneSigs]]: the kernel
  * stays primitive (flat double[] matrix, `ArrayData.getFloat` off the
  * unsafe row), no per-element boxing. Accumulation order is the fixed
  * inner loop, so projections are bit-identical at any partitioning.
  *
  * @param mat flattened projection matrix, laid out [outDim][dim],
  *            already scaled by 1/√outDim
  */
case class ProjectVec(child: Expression, dim: Int, outDim: Int,
                      mat: Array[Double])
  extends UnaryExpression with ExpectsInputTypes {

  require(mat.length == outDim * dim, "projection matrix shape mismatch")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "project_vec"
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val out = new Array[Float](outDim)
    var j = 0
    while (j < outDim) {
      val base = j * dim
      var acc = 0.0
      var i = 0
      while (i < n) { acc += v.getFloat(i).toDouble * mat(base + i); i += 1 }
      out(j) = acc.toFloat
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("mat", mat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      s"""
         |final int $n = java.lang.Math.min($v.numElements(), $dim);
         |final float[] $out = new float[$outDim];
         |for (int $j = 0; $j < $outDim; $j++) {
         |  final int $base = $j * $dim;
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $v.getFloat($i)) * $matRef[$base + $i];
         |  }
         |  $out[$j] = (float) $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ProjectVec {
  /** Column entry point; the Gaussian matrix derives from
    * (dim, outDim, seed) via [[graft.similarity.Similarity.directions]]
    * and is pre-scaled by 1/√outDim.
    */
  def apply(vec: Column, dim: Int, outDim: Int, seed: Long): Column = {
    val rows = graft.similarity.Similarity.directions(dim, outDim, seed)
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    val flat = new Array[Double](outDim * dim)
    var j = 0
    while (j < outDim) {
      var i = 0
      while (i < dim) { flat(j * dim + i) = rows(j)(i) * scale; i += 1 }
      j += 1
    }
    Bridge.column(ProjectVec(Bridge.expression(vec), dim, outDim, flat))
  }
}
