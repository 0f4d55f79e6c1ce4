package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule: plan a pure interval-predicate inner join (`v >= lo AND
  * v <= hi`, no equi conjunct) as [[graft.operators.RangeJoin]]'s binned
  * equi-join instead of the BroadcastNestedLoopJoin / cartesian product
  * Catalyst otherwise produces — so a plain SQL `JOIN ... ON v BETWEEN lo
  * AND hi` gets the O(matches) plan without calling the operator.
  *
  * Rewrite (semantics-preserving, same trick as the operator): the bound
  * side filters `lo <= hi` (inverted intervals match nothing; Catalyst's
  * `sequence` would walk them DESCENDING) and explodes to every
  * fixed-width bin the interval overlaps; the value side projects its
  * single containing bin; the new join keys on bin equality with the
  * ORIGINAL predicates kept as the residual condition, so strict bounds
  * (`>`/`<`) and boundary semantics are exact and a qualifying pair still
  * co-occurs in exactly one bin (no dedup). Null values/bounds produce a
  * null bin or a null guard and match nothing — BETWEEN's semantics.
  *
  * OPT-IN: fires only when `spark.graft.rangeJoin.binWidth` is set
  * positive — bin width is a data-dependent choice (≈ the typical
  * interval width; replication is span/width + 1 per interval row) the
  * user owns, exactly like the operator's parameter. Matches only an
  * INNER join whose condition is EXACTLY two range conjuncts over the
  * same numeric value expression with both bounds from the other side —
  * anything with an equi conjunct already hash-joins natively (the range
  * becomes a residual there), and the rule's own output contains a bin
  * equality so it can never re-match itself at the fixed point.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val widthConf = "spark.graft.rangeJoin.binWidth"

  // (value, bound) with value on the >= side: v >= b  |  b <= v
  private def lowerOf(e: Expression): Seq[(Expression, Expression)] = e match {
    case GreaterThanOrEqual(a, b) => Seq((a, b))
    case GreaterThan(a, b) => Seq((a, b))
    case LessThanOrEqual(a, b) => Seq((b, a))
    case LessThan(a, b) => Seq((b, a))
    case _ => Seq.empty
  }
  // (value, bound) with value on the <= side
  private def upperOf(e: Expression): Seq[(Expression, Expression)] = e match {
    case LessThanOrEqual(a, b) => Seq((a, b))
    case LessThan(a, b) => Seq((a, b))
    case GreaterThanOrEqual(a, b) => Seq((b, a))
    case GreaterThan(a, b) => Seq((b, a))
    case _ => Seq.empty
  }

  private def numeric(e: Expression): Boolean =
    e.dataType.isInstanceOf[NumericType] && e.deterministic

  private def binOf(e: Expression, w: Double): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w))), LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // a malformed width must not take down every query in the session —
    // an optimizer rule runs on all of them; warn and stand down instead
    val w = conf.getConfString(widthConf, "0").toDoubleOption.getOrElse {
      logWarning(s"$widthConf is not numeric; range-join rewrite disabled")
      0.0
    }
    if (w <= 0) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if splitConjunctivePredicates(cond).length == 2 =>
        val Seq(c1, c2) = splitConjunctivePredicates(cond)
        // candidate (v, lo, hi) triples from the two conjuncts, both ways
        val triples =
          (for ((v1, lo) <- lowerOf(c1); (v2, hi) <- upperOf(c2)
                if v1.semanticEquals(v2)) yield (v1, lo, hi)) ++
          (for ((v1, lo) <- lowerOf(c2); (v2, hi) <- upperOf(c1)
                if v1.semanticEquals(v2)) yield (v1, lo, hi))
        val usable = triples.find { case (v, lo, hi) =>
          numeric(v) && numeric(lo) && numeric(hi) && {
            val (vs, bs) = (v.references, lo.references ++ hi.references)
            (vs.subsetOf(left.outputSet) && bs.subsetOf(right.outputSet)) ||
              (vs.subsetOf(right.outputSet) && bs.subsetOf(left.outputSet))
          }
        }
        usable match {
          case None => j
          case Some((v, lo, hi)) =>
            val valueOnLeft = v.references.subsetOf(left.outputSet)
            val binAttr = AttributeReference("__graft_bin", LongType,
              nullable = false)()
            def explodeBins(dims: LogicalPlan): LogicalPlan =
              Generate(
                // Sequence is TimeZoneAware (date sequences) and counts as
                // unresolved until a zone is pinned, even for longs
                Explode(Sequence(binOf(lo, w), binOf(hi, w),
                  Some(Literal(1L)), Some(conf.sessionLocalTimeZone))),
                unrequiredChildIndex = Nil, outer = false, qualifier = None,
                generatorOutput = Seq(binAttr),
                child = Filter(LessThanOrEqual(lo, hi), dims))
            val vbin = Alias(binOf(v, w), "__graft_vbin")()
            def projectBin(facts: LogicalPlan): LogicalPlan =
              Project(facts.output :+ vbin, facts)
            val (newLeft, newRight) =
              if (valueOnLeft) (projectBin(left), explodeBins(right))
              else (explodeBins(left), projectBin(right))
            val newCond = And(EqualTo(vbin.toAttribute, binAttr), cond)
            Project(j.output,
              Join(newLeft, newRight, Inner, Some(newCond), hint))
        }
    }
  }
}
