package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, FloatType}
import graft.functions.FloatDot
import graft.wiki.WikiMarkup

/** Session integration: makes graft's custom expressions and wiki functions
  * available to SQL users.
  *
  * Two entry points:
  *  - cluster config: `spark.sql.extensions=graft.plans.GraftExtensions`
  *    (the standard injection path, applied at session build);
  *  - [[GraftExtensions.register]]: imperative registration on a live
  *    session (tests, notebooks).
  *
  * Deliberately small: graft's operators are DataFrame transforms over
  * native plans, so Catalyst's existing rules (pushdown, pruning, join
  * selection, AQE) apply unchanged — the point of declaring plans instead
  * of scheduling them. The one optimizer rule ([[RangeJoinRewrite]])
  * exists for the case Catalyst itself plans badly — a pure interval join
  * becomes a nested loop — and is conf-gated
  * (`spark.graft.rangeJoin.binWidth`), so injection alone changes nothing.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.floatDotDescriptor)
    ext.injectFunction(GraftExtensions.jaroWinklerDescriptor)
    ext.injectFunction(GraftExtensions.damerauDescriptor)
    ext.injectOptimizerRule(_ => RangeJoinRewrite)
  }
}

object GraftExtensions {

  private def binaryStringDescriptor(
      name: String, clazz: Class[_],
      build: (Expression, Expression) => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          throw new IllegalArgumentException(
            s"$name requires exactly 2 arguments, got ${children.length}")
        build(children.head, children(1))
      })

  // the round-18 string-similarity expressions, SQL-surfaced for
  // spark.sql users (string inputs resolve through Catalyst's normal
  // implicit casts — no builder-side coercion needed)
  private[plans] val jaroWinklerDescriptor =
    binaryStringDescriptor("jaro_winkler",
      classOf[graft.functions.JaroWinklerSim],
      graft.functions.JaroWinklerSim(_, _))
  private[plans] val damerauDescriptor =
    binaryStringDescriptor("damerau_levenshtein",
      classOf[graft.functions.DamerauDistance],
      graft.functions.DamerauDistance(_, _))

  private[plans] val floatDotDescriptor =
    (new FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "float_dot"),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          throw new IllegalArgumentException(
            s"float_dot requires exactly 2 arguments, got ${children.length}")
        // SQL array literals default to array<double>, and Catalyst's
        // implicit casts never narrow — so cast here (double→float is an
        // explicit-cast-only conversion); non-numeric arrays still fail
        // analysis with a type error
        val floatArrays = children.map {
          case c if c.resolved && c.dataType == ArrayType(FloatType) => c
          case c => Cast(c, ArrayType(FloatType))
        }
        FloatDot(floatArrays.head, floatArrays(1))
      })

  /** Register SQL functions on a live session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      floatDotDescriptor._1, floatDotDescriptor._2, floatDotDescriptor._3)
    spark.sessionState.functionRegistry.registerFunction(
      jaroWinklerDescriptor._1, jaroWinklerDescriptor._2,
      jaroWinklerDescriptor._3)
    spark.sessionState.functionRegistry.registerFunction(
      damerauDescriptor._1, damerauDescriptor._2, damerauDescriptor._3)
    spark.udf.register("wiki_clean", (t: String) => WikiMarkup.clean(t))
    spark.udf.register("wiki_compact",
      (t: String) => WikiMarkup.compact(WikiMarkup.clean(t)))
    spark.udf.register("normalize_title", (t: String) => WikiMarkup.normalizeTitle(t))
  }
}
