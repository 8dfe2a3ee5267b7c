package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite an interval-OVERLAP join — an INNER join whose
  * condition is the classic `a.lo <= b.hi AND b.lo <= a.hi` pair of
  * cross-side inequalities with NO equi-conjunct — into a binned
  * equi-join. The sibling of [[RangeJoinRewrite]] (point-in-interval);
  * together they cover the two shapes that make plain SQL fall into
  * BroadcastNestedLoopJoin at scale.
  *
  * Shape: both sides explode to the 1-D grid bins their interval covers
  * (`floor(x / w)`), the join becomes an equi-join on the bin, and two
  * residual conjuncts restore exactness:
  *   - the ORIGINAL condition (so bound strictness never matters), and
  *   - `bin = max(bin(a.lo), bin(b.lo))` — the FIRST bin the two
  *     intervals share — so a pair overlapping many bins is emitted
  *     exactly once (grid-join dedup without a distinct).
  *
  * Correctness for degenerate inputs (all pinned by OverlapRewriteSpec):
  *   - An INVERTED interval (lo > hi) can still satisfy the original
  *     predicate (`a.lo<=b.hi AND b.lo<=a.hi` does not imply `a.lo<=a.hi`),
  *     so unlike the point rule we must NOT drop it. Each side bins the
  *     CLAMPED interval `[lo, max(lo, hi)]` instead: clamped intervals
  *     always overlap whenever the original predicate holds (lo_a <=
  *     hi_b <= max(lo_b,hi_b), symmetrically), are never descending, and
  *     any false candidates die in the residual.
  *   - NULL lo ⇒ null bin start ⇒ `Sequence` is null ⇒ the row explodes
  *     to nothing; the original predicate is also null-false. NULL hi
  *     alone ⇒ `Greatest` skips the null ⇒ bins collapse to `[lo, lo]`,
  *     a superset of what the (null-false) predicate matches.
  *   - The dedup `max` compares bins of rows that both survived
  *     explosion, so its inputs are never null.
  *
  * Activation: set `spark.graft.overlapJoin.binWidth` to a positive bin
  * width ≈ the median interval length (same contract and reasoning as the
  * point rule's width — data-dependent knowledge only the caller has).
  * Unset ⇒ inert. A join with a cross-side equi-conjunct is left alone,
  * which is also the fixed point: the rewritten join carries one.
  */
object OverlapJoinRewrite extends Rule[LogicalPlan] {

  val BinWidthKey = "spark.graft.overlapJoin.binWidth"

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

  /** Each inequality conjunct normalized to `small <= big` (strictness is
    * the residual's business). */
  private def upperBounds(e: Expression): Option[(Expression, Expression)] =
    e match {
      case LessThanOrEqual(a, b)    => Some((a, b))
      case LessThan(a, b)           => Some((a, b))
      case GreaterThanOrEqual(a, b) => Some((b, a))
      case GreaterThan(a, b)        => Some((b, a))
      case _                        => None
    }

  private def numeric(e: Expression): Boolean = e.dataType match {
    case _: NumericType => true
    case _              => false
  }

  private def rewrite(j: Join, w: Double): Option[LogicalPlan] = {
    val conjuncts = splitConjuncts(j.condition.get)

    def leftOnly(e: Expression): Boolean =
      e.references.nonEmpty && e.references.subsetOf(j.left.outputSet)
    def rightOnly(e: Expression): Boolean =
      e.references.nonEmpty && e.references.subsetOf(j.right.outputSet)

    // same bail-out and fixed point as RangeJoinRewrite: an equi-conjunct
    // means Spark already has a hash-join key
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (leftOnly(a) && rightOnly(b)) || (rightOnly(a) && leftOnly(b))
      case EqualNullSafe(a, b) =>
        (leftOnly(a) && rightOnly(b)) || (rightOnly(a) && leftOnly(b))
      case _ => false
    }
    if (hasEqui) return None

    def usable(e: Expression): Boolean = e.deterministic && numeric(e)

    // (leftExpr <= rightExpr) candidates and the mirror image
    val ltr = conjuncts.flatMap(upperBounds).filter {
      case (s, b) => usable(s) && usable(b) && leftOnly(s) && rightOnly(b)
    }
    val rtl = conjuncts.flatMap(upperBounds).filter {
      case (s, b) => usable(s) && usable(b) && rightOnly(s) && leftOnly(b)
    }

    // one of each orientation makes an overlap: left interval [la, lh],
    // right interval [rl, rh] with conjuncts la<=rh and rl<=lh.
    // (When la==lh this degrades gracefully to point-in-interval.)
    (ltr.headOption, rtl.headOption) match {
      case (Some((la, rh)), Some((rl, lh))) =>
        val tz = Some(conf.sessionLocalTimeZone)

        def castD(e: Expression): Expression = Cast(e, DoubleType, tz)
        def binD(d: Expression): Expression =
          Cast(Floor(Divide(d, Literal(w))), LongType, tz)

        // clamped bin range per side: [bin(lo), max(bin(lo), bin(hi))]
        def binRange(lo: Expression, hi: Expression): (Expression, Expression) = {
          val loBin = binD(castD(lo))
          (loBin, Greatest(Seq(loBin, binD(castD(hi)))))
        }

        val (lLoBin, lHiBin) = binRange(la, lh)
        val (rLoBin, rHiBin) = binRange(rl, rh)

        def explodeBins(child: LogicalPlan, lo: Expression, hi: Expression,
            name: String): (LogicalPlan, Attribute) = {
          val out = AttributeReference(name, LongType, nullable = false)()
          (Generate(Explode(Sequence(lo, hi, None, tz)),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(out), child = child), out)
        }

        val (genL, binL) = explodeBins(j.left, lLoBin, lHiBin, "__graft_obin_l")
        val (genR, binR) = explodeBins(j.right, rLoBin, rHiBin, "__graft_obin_r")

        // emit each pair only in the first bin both intervals cover
        val firstShared = EqualTo(binL, Greatest(Seq(lLoBin, rLoBin)))
        val cond = And(And(EqualTo(binL, binR), firstShared), j.condition.get)

        Some(Project(j.output, Join(genL, genR, Inner, Some(cond), j.hint)))
      case _ => None
    }
  }
}
