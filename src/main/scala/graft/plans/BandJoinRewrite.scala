package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/**
 * Optimizer rule: rewrite a keyless band join — `Inner Join` whose
 * only condition is `point BETWEEN lo AND hi` (any conjunct order /
 * operand orientation, strict or inclusive) with `point` from one side
 * and both bounds from the other — into the binned equi-join
 * [[graft.operators.RangeJoin]] implements explicitly: Catalyst plans
 * the raw predicate as a broadcast nested loop (or full cartesian),
 * O(points × intervals); the rewrite explodes each interval into the
 * integer bins it covers, tags each point with its single bin, and
 * joins on bin equality with the original predicate as an exact
 * post-filter. A point has ONE bin and an interval appears at most
 * once per bin, so no duplicates and no distinct pass; strict bounds
 * stay exact because binning on the closure is a superset.
 *
 * Opt-in by config: `spark.graft.bandJoin.binWidth` (value units;
 * size to the typical interval length — blow-up is len/width + 1).
 * Unset or ≤ 0 disables the rule, leaving Catalyst's plan untouched:
 * bin width is a data-dependent tuning choice the engine must not
 * guess silently.
 *
 * The rewritten join carries an equality conjunct, so the rule cannot
 * re-trigger on its own output inside the fixed-point batch (and AQE
 * re-optimizations hit the same guard). Injected via
 * [[graft.functions.GraftExtensions]].
 */
class BandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def binWidth: Double =
    try SQLConf.get.getConfString("spark.graft.bandJoin.binWidth", "0").toDouble
    catch { case _: NumberFormatException => 0.0 }

  /** One normalized comparison: `point (≥|>|≤|<) bound`. */
  private case class Cmp(point: Expression, bound: Expression, isLower: Boolean)

  private def normalize(e: Expression): Option[Cmp] = e match {
    case GreaterThanOrEqual(a, b) => Some(Cmp(a, b, isLower = true))
    case GreaterThan(a, b)        => Some(Cmp(a, b, isLower = true))
    case LessThanOrEqual(a, b)    => Some(Cmp(b, a, isLower = true))
    case LessThan(a, b)           => Some(Cmp(b, a, isLower = true))
    case _                        => None
  } // `point >= bound` and `bound <= point` both normalize to a lower bound

  private def numeric(e: Expression): Boolean =
    e.dataType.isInstanceOf[NumericType]

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = binWidth
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && hint == JoinHint.NONE =>
        val conjuncts = splitConjunctivePredicates(cond)
        val cmps = conjuncts.map(normalize)
        if (conjuncts.length != 2 || cmps.exists(_.isEmpty)) j
        else {
          // two normalized lower-bounds a ≥ x and b ≥ y form a band iff
          // one's point is the other's bound: p ≥ lo  ∧  hi ≥ p
          val Seq(c1, c2) = cmps.map(_.get)
          val band: Option[(Expression, Expression, Expression)] =
            if (c1.point.semanticEquals(c2.bound))
              Some((c1.point, c1.bound, c2.point)) // (p, lo, hi)
            else if (c2.point.semanticEquals(c1.bound))
              Some((c2.point, c2.bound, c1.point))
            else None
          band match {
            case Some((p, lo, hi))
                if p.deterministic && lo.deterministic && hi.deterministic &&
                  numeric(p) && numeric(lo) && numeric(hi) &&
                  p.references.nonEmpty &&
                  (lo.references ++ hi.references).nonEmpty =>
              val fromLeft = p.references.subsetOf(left.outputSet) &&
                (lo.references ++ hi.references).subsetOf(right.outputSet)
              val fromRight = p.references.subsetOf(right.outputSet) &&
                (lo.references ++ hi.references).subsetOf(left.outputSet)
              if (fromLeft) rewrite(j, left, right, p, lo, hi, w, swapped = false)
              else if (fromRight) rewrite(j, right, left, p, lo, hi, w, swapped = true)
              else j
            case _ => j
          }
        }
    }
  }

  // the analyzer's ResolveTimeZone has already run, so time-zone-aware
  // expressions built HERE must carry the zone themselves or the plan
  // re-validates as unresolved
  private def tz: Option[String] = Some(SQLConf.get.sessionLocalTimeZone)

  private def bin(e: Expression, w: Double): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType, tz), Literal(w))), LongType, tz)

  /** `points ⋈ intervals` on bin equality + the original predicate;
    * `swapped` restores the original child order in the output join. */
  private def rewrite(j: Join, points: LogicalPlan, intervals: LogicalPlan,
                      p: Expression, lo: Expression, hi: Expression,
                      w: Double, swapped: Boolean): LogicalPlan = {
    val binP = Alias(bin(p, w), "_graft_bin_p")()
    val pointsP = Project(points.output :+ binP, points)
    // inverted intervals match nothing; dropping them also keeps
    // Sequence from stepping backward and fabricating bins
    val kept = Filter(LessThanOrEqual(lo, hi), intervals)
    val gen = Explode(new Sequence(bin(lo, w), bin(hi, w), Some(Literal(1L)), tz))
    val binI = AttributeReference("_graft_bin_i", LongType,
      nullable = gen.elementSchema.head.nullable)()
    val genNode = Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(binI), child = kept)
    val cond = And(EqualTo(binP.toAttribute, binI), j.condition.get)
    val joined =
      if (swapped) Join(genNode, pointsP, Inner, Some(cond), JoinHint.NONE)
      else Join(pointsP, genNode, Inner, Some(cond), JoinHint.NONE)
    Project(j.output, joined)
  }
}
