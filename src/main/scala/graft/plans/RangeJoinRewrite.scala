package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a pure range join — an INNER join whose
  * condition bounds one side's numeric "point" between two expressions of
  * the other side, with NO equi-conjunct — into the binned equi-join shape
  * of [[graft.operators.RangeJoin]].
  *
  * Why a rule and not just the operator: the operator only helps callers
  * who know it exists. Plain `spark.sql("... a JOIN b ON a.v >= b.lo AND
  * a.v < b.hi")` plans BroadcastNestedLoopJoin (or a cartesian product) —
  * O(|a|·|b|) compares, the canonical 100 TB scale-killer. With this rule
  * active the same SQL plans a shuffled equi-join on the bin key: the point
  * side computes `floor(v / w)`, the interval side explodes to its
  * overlapping bins, and the original predicate filters residuals. Shuffle
  * cost drops to O(rows × bins-per-interval).
  *
  * Activation is conf-gated per session/query: set
  * `spark.graft.rangeJoin.binWidth` to a positive bin width (same unit as
  * the point column; ≈ the median interval length, so intervals span O(1)
  * bins). Unset → the rule is inert and Spark plans as before. The width
  * is data-dependent knowledge only the caller has — same contract as the
  * operator's `binWidth` parameter, and the reason there is no default.
  *
  * Correctness notes (all pinned by RangeRewriteSpec):
  *  - The equi-join is on bins, the ORIGINAL condition rides along as a
  *    residual filter — bound strictness (>=/>, </<=, BETWEEN) never
  *    affects the rewrite's result, only which superset of bins is probed.
  *  - Null point / null bound ⇒ bin key or bin array is null ⇒ the row
  *    matches nothing, exactly like the comparison predicate itself.
  *  - Inverted intervals (lo > hi) produce an EMPTY bin array (the If
  *    guard), not a descending sequence.
  *  - A join that already has an equi-conjunct is left alone: Spark plans
  *    those as hash/sort-merge joins natively, and re-binning could only
  *    add work. This is also the rule's fixed point — its own output
  *    carries a bin equi-conjunct, so it is never rewritten twice.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  val BinWidthKey = "spark.graft.rangeJoin.binWidth"

  private def binWidth: Option[Double] =
    Option(conf.getConfString(BinWidthKey, null)).flatMap(_.toDoubleOption)
      .filter(w => w > 0 && !w.isInfinite)

  override def apply(plan: LogicalPlan): LogicalPlan = binWidth match {
    case None => plan
    case Some(w) =>
      plan.transformUp {
        case j: Join if j.joinType == Inner && j.condition.isDefined =>
          rewrite(j, w).getOrElse(j)
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other     => Seq(other)
  }

  /** Each inequality conjunct read both ways: `a >= b` is "a has lower
    * bound b" AND "b has upper bound a". Returns (point, bound, isLower)
    * candidates. */
  private def boundCandidates(e: Expression): Seq[(Expression, Expression, Boolean)] =
    e match {
      case GreaterThanOrEqual(a, b) => Seq((a, b, true), (b, a, false))
      case GreaterThan(a, b)        => Seq((a, b, true), (b, a, false))
      case LessThanOrEqual(a, b)    => Seq((a, b, false), (b, a, true))
      case LessThan(a, b)           => Seq((a, b, false), (b, a, true))
      case _                        => Nil
    }

  private def numeric(e: Expression): Boolean = e.dataType match {
    case _: NumericType => true
    case _              => false
  }

  private def rewrite(j: Join, w: Double): Option[LogicalPlan] = {
    val cond = j.condition.get
    val conjuncts = splitConjuncts(cond)

    def sidesOf(e: Expression): (Boolean, Boolean) =
      (e.references.subsetOf(j.left.outputSet),
        e.references.subsetOf(j.right.outputSet))

    // bail out if any equi-conjunct spans both sides — Spark's own
    // equi-join planning takes over, and this is our fixed point
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        val (al, ar) = sidesOf(a); val (bl, br) = sidesOf(b)
        (al && a.references.nonEmpty && br && b.references.nonEmpty) ||
          (ar && a.references.nonEmpty && bl && b.references.nonEmpty)
      case EqualNullSafe(a, b) =>
        val (al, ar) = sidesOf(a); val (bl, br) = sidesOf(b)
        (al && a.references.nonEmpty && br && b.references.nonEmpty) ||
          (ar && a.references.nonEmpty && bl && b.references.nonEmpty)
      case _ => false
    }
    if (hasEqui) return None

    // candidate bounds: point strictly from one side, bound strictly from
    // the other, both deterministic and numeric
    val cands = conjuncts.flatMap(boundCandidates).filter {
      case (p, b, _) =>
        p.deterministic && b.deterministic && numeric(p) && numeric(b) &&
          p.references.nonEmpty && b.references.nonEmpty && {
            val (pl, pr) = sidesOf(p); val (bl, br) = sidesOf(b)
            (pl && br) || (pr && bl)
          }
    }

    // find one point expression carrying BOTH a lower and an upper bound
    val pair = cands.collectFirst {
      case (p, lo, true) if cands.exists {
            case (p2, _, false) => p2.semanticEquals(p)
            case _              => false
          } =>
        val hi = cands.collectFirst {
          case (p2, h, false) if p2.semanticEquals(p) => h
        }.get
        (p, lo, hi)
    }

    pair.map { case (point, lo, hi) =>
      val pointOnLeft = point.references.subsetOf(j.left.outputSet)
      val (pointPlan, intervalPlan) = if (pointOnLeft) (j.left, j.right) else (j.right, j.left)

      // explicit timeZoneId on every TimeZoneAwareExpression we mint: the
      // analyzer's ResolveTimeZone has already run by optimization time,
      // so a None here would leave the plan unresolved (caught by Spark's
      // per-rule plan validation)
      val tz = Some(conf.sessionLocalTimeZone)

      def bin(e: Expression): Expression =
        Cast(Floor(Divide(Cast(e, DoubleType, tz), Literal(w))), LongType, tz)

      // point side: project the bin key alongside the original output
      val pBin = Alias(bin(point), "__graft_bin")()
      val newPoint = Project(pointPlan.output :+ pBin, pointPlan)

      // interval side: explode to covered bins; If guards inverted/null
      // intervals (null condition takes the else branch → empty array)
      val loBin = bin(lo)
      val hiBin = bin(hi)
      val bins = If(LessThanOrEqual(loBin, hiBin),
        Sequence(loBin, hiBin, None, tz),
        Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)))
      val gBin = AttributeReference("__graft_bin_g", LongType, nullable = false)()
      val gen = Generate(Explode(bins), unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(gBin), child = intervalPlan)

      val binEq = EqualTo(pBin.toAttribute, gBin)
      val newJoin =
        if (pointOnLeft) Join(newPoint, gen, Inner, Some(And(binEq, cond)), j.hint)
        else Join(gen, newPoint, Inner, Some(And(binEq, cond)), j.hint)

      // restore the original output (attribute ids are preserved; only the
      // helper bin columns need dropping)
      Project(j.output, newJoin)
    }
  }
}
