package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Index of the nearest centroid (squared L2) for an `array<float>` vector —
  * the IVF cell-assignment kernel. Codegen'd for the same reason as
  * [[HyperplaneSigs]]: the k×dim argmin is pure primitive arithmetic, and a
  * UDF re-boxes every element k times.
  *
  * @param centroids flattened centroid matrix, laid out [cell][dim]
  */
case class NearestCentroid(child: Expression, dim: Int, k: Int,
                           centroids: Array[Double])
  extends UnaryExpression with ExpectsInputTypes {

  require(centroids.length == k * dim, "centroid matrix shape mismatch")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    var best = -1
    var bestD = Double.MaxValue
    var c = 0
    while (c < k) {
      val base = c * dim
      var d = 0.0
      var i = 0
      while (i < n) {
        val diff = v.getFloat(i).toDouble - centroids(base + i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centRef = ctx.addReferenceObj("centroids", centroids, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val base = ctx.freshName("base")
      s"""
         |final int $n = java.lang.Math.min($v.numElements(), $dim);
         |int $best = -1;
         |double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < $k; $c++) {
         |  final int $base = $c * $dim;
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $diff = ((double) $v.getFloat($i)) - $centRef[$base + $i];
         |    $d += $diff * $diff;
         |  }
         |  if ($d < $bestD) { $bestD = $d; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {
  /** Column entry point: `centroids(cell) -> vector`, flattened row-major. */
  def apply(vec: Column, centroids: Array[Array[Double]]): Column = {
    val k = centroids.length
    val dim = centroids.head.length
    val flat = new Array[Double](k * dim)
    var c = 0
    while (c < k) { System.arraycopy(centroids(c), 0, flat, c * dim, dim); c += 1 }
    Bridge.column(NearestCentroid(Bridge.expression(vec), dim, k, flat))
  }
}
