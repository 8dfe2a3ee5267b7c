package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DecimalType, DoubleType, NumericType}

/** Optimizer rule: partial-aggregate BELOW `Expand` for ROLLUP / CUBE /
  * GROUPING SETS — the cure for the named scale-killer "Expand-before-
  * aggregate row multiplication".
  *
  * Spark lowers every grouping-sets aggregate to `Aggregate(Expand(child))`
  * where Expand replicates EVERY input row once per grouping set (4× for a
  * two-column CUBE) *before* the shuffle. At 100 TB that multiplies both
  * the rows entering the exchange and the map-side partial-agg hash tables
  * by the number of grouping sets. But when every aggregate is algebraic
  * (COUNT / SUM / MIN / MAX — re-aggregatable), the same answer is
  * computable by first collapsing the input to one row per FULL grouping
  * key (an ordinary partial-aggregated group-by: map-side combine, one
  * tiny shuffle), and only then expanding: Expand's input drops from
  * |rows| to |distinct keys|, and the grouping-sets shuffle moves the
  * collapsed relation instead of the corpus.
  *
  *   Aggregate(G ∪ gid, aggs, Expand(P, out, child))
  *     ⇒ Aggregate(G ∪ gid, merge(aggs), Expand(P', out',
  *         Aggregate(keys, keys ++ partial(aggs), child)))
  *
  * with COUNT→SUM(partial count) (wrapped in COALESCE(…, 0) to keep the
  * non-nullable schema), SUM→SUM, MIN→MIN, MAX→MAX, and (r10)
  * AVG→Σ(partial SUM)/Σ(partial COUNT) — AVG is not itself
  * re-aggregatable (an average of averages is wrong under unequal group
  * sizes) but decomposes exactly into two partials that are.
  *
  * Correctness relies only on the aggregates being re-aggregatable and on
  * `spark_grouping_id` riding through untouched, so NULL grouping values
  * keep their gid-disambiguated semantics; the rewrite refuses anything
  * else (DISTINCT aggregates, FILTER clauses, non-algebraic functions,
  * decimal SUM — whose re-sum would widen the result precision — and
  * aggregates over the *nulled* grouping copies, whose value legitimately
  * depends on the projection). PreAggExpandSpec pins rewritten ≡ plain on
  * randomized data for every guarded shape; the q17/q22/q32 oracle rows
  * hash-check it against DuckDB every round.
  *
  * Conf-gated per session/query: `spark.graft.preAggExpand` (default ON —
  * the rewrite is a strict improvement whenever it fires; the only
  * degenerate case, near-unique grouping keys, adds one pass-through
  * partial aggregation to a query whose Expand output is near-|rows|×sets
  * anyway). Fixed point: the rewrite's own output has an Aggregate as the
  * Expand child, which the guard rejects.
  */
object PreAggExpandRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.preAggExpand"

  /** Stamped on the rebuilt Expand: the structural guard (child is an
    * Aggregate) is sufficient today, but would stop holding if another
    * fixed-point rule interposed a node (e.g. a Project) between the
    * Expand and the pre-aggregate — the tag makes "already rewritten"
    * explicit rather than inferred, so the rule can never stack. */
  private val RewrittenTag =
    org.apache.spark.sql.catalyst.trees.TreeNodeTag[Unit](
      "graft.preAggExpand.rewritten")

  private def enabled: Boolean =
    conf.getConfString(EnabledKey, "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case agg @ Aggregate(_, _, expand: Expand, _)
          if !expand.child.isInstanceOf[Aggregate] &&
            expand.getTagValue(RewrittenTag).isEmpty =>
        rewrite(agg, expand).getOrElse(agg)
    }

  /** Position classification of one Expand output slot. */
  private sealed trait Slot
  /** gid-style: a distinct literal per projection. */
  private case class LitSlot(lits: Seq[Literal]) extends Slot
  /** Same child-side expression in every projection. */
  private case class UniformSlot(e: Expression) extends Slot
  /** Child-side expression in some projections, typed NULL in the rest. */
  private case class GroupSlot(e: Expression, nullIn: Set[Int]) extends Slot

  private def classify(entries: Seq[Expression]): Option[Slot] = {
    def isNull(e: Expression) = e match {
      case Literal(null, _) => true
      case _                => false
    }
    if (entries.forall(_.isInstanceOf[Literal]) && !entries.exists(isNull)) {
      Some(LitSlot(entries.map(_.asInstanceOf[Literal])))
    } else if (entries.tail.forall(_.semanticEquals(entries.head)) && !isNull(entries.head)) {
      if (entries.head.deterministic) Some(UniformSlot(entries.head)) else None
    } else {
      val nonNull = entries.zipWithIndex.filterNot { case (e, _) => isNull(e) }
      val nullIdx = entries.zipWithIndex.filter { case (e, _) => isNull(e) }.map(_._2)
      nonNull.map(_._1) match {
        case es if es.nonEmpty && es.tail.forall(_.semanticEquals(es.head)) &&
            es.head.deterministic && !es.head.isInstanceOf[Literal] =>
          Some(GroupSlot(es.head, nullIdx.toSet))
        case _ => None
      }
    }
  }

  private def rewrite(agg: Aggregate, expand: Expand): Option[LogicalPlan] = {
    val nSets = expand.projections.size
    if (nSets < 2) return None
    if (expand.projections.exists(_.size != expand.output.size)) return None

    // classify every output slot; bail if any slot is irregular
    val slots: Seq[(Attribute, Slot)] =
      expand.output.zipWithIndex.map { case (a, i) =>
        classify(expand.projections.map(_(i))) match {
          case Some(s) => (a, s)
          case None    => return None
        }
      }
    val slotOf: Map[Attribute, Slot] = slots.map { case (a, s) => (a: Attribute) -> s }.toMap

    // upper-aggregate reference sets
    val aggExpressions = agg.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression => ae
    })
    val aggInputRefs = AttributeSet(aggExpressions.flatMap(_.references))

    // references appearing OUTSIDE aggregate functions: walk each output
    // expression, skipping AggregateExpression subtrees
    def refsOutsideAgg(e: Expression): Seq[Attribute] = e match {
      case _: AggregateExpression => Nil
      case a: Attribute           => Seq(a)
      case other                  => other.children.flatMap(refsOutsideAgg)
    }
    val outsideRefs = AttributeSet(
      agg.groupingExpressions.flatMap(refsOutsideAgg) ++
        agg.aggregateExpressions.flatMap(refsOutsideAgg))

    // every upper grouping expression must only touch grouping/uniform/gid
    // slots of this Expand (post-analysis they are plain attributes)
    if (!agg.references.subsetOf(AttributeSet(expand.output))) return None

    // aggregate-function inputs must never touch a nulled grouping copy:
    // those values depend on which projection produced the row
    val groupSlotAttrs = AttributeSet(slots.collect {
      case (a, _: GroupSlot) => a
    })
    if (aggInputRefs.intersect(groupSlotAttrs).nonEmpty) return None
    // gid slots can only be referenced outside aggregate functions
    val litSlotAttrs = AttributeSet(slots.collect { case (a, _: LitSlot) => a })
    if (aggInputRefs.intersect(litSlotAttrs).nonEmpty) return None

    // all aggregate calls must be algebraic (or, for AVG, decomposable
    // into algebraic partials), bare, and decimal-free
    val supported = aggExpressions.forall { ae =>
      !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
        case _: Count => true
        case Sum(e, _) => !e.dataType.isInstanceOf[DecimalType]
        case _: Min | _: Max => true
        // AVG = Σsum/Σcount only for plain numerics: decimal re-sum
        // widens precision, and interval averages have their own
        // division semantics — both refused
        case Average(e, _) => e.dataType match {
          case _: DecimalType => false
          case _: NumericType => true
          case _              => false
        }
        case _ => false
      })
    }
    if (!supported || aggExpressions.isEmpty) return None

    // substitution: Expand output attr -> child-side expression
    val childSideOf: Map[Attribute, Expression] = slots.collect {
      case (a, UniformSlot(e)) => (a: Attribute) -> e
      case (a, GroupSlot(e, _)) => (a: Attribute) -> e
    }.toMap

    // ---- lower (pre-Expand) aggregate ----------------------------------
    // keys: child-side expressions of every slot the parent still needs as
    // a VALUE (grouping copies + uniform slots referenced outside aggs)
    val keySlots: Seq[(Attribute, Expression)] = slots.collect {
      case (a, GroupSlot(e, _)) if agg.references.contains(a) => (a, e)
      case (a, UniformSlot(e)) if outsideRefs.contains(a)     => (a, e)
    }
    // distinct key expressions (two slots may carry the same expression)
    val distinctKeys = keySlots.map(_._2).foldLeft(Seq.empty[Expression]) {
      (acc, e) => if (acc.exists(_.semanticEquals(e))) acc else acc :+ e
    }
    val keyNamed: Seq[NamedExpression] = distinctKeys.map {
      case a: Attribute => a
      case e            => Alias(e, "__graft_key")()
    }
    def keyAttrFor(e: Expression): Attribute =
      keyNamed(distinctKeys.indexWhere(_.semanticEquals(e))).toAttribute

    // partial aggregates — one per distinct upper AggregateExpression,
    // except AVG which decomposes into a SUM + COUNT partial pair (each
    // under a FRESH resultId: two buffers must not share an id)
    val distinctAggs = aggExpressions.foldLeft(Seq.empty[AggregateExpression]) {
      (acc, ae) => if (acc.exists(_.semanticEquals(ae))) acc else acc :+ ae
    }
    val partials: Seq[(AggregateExpression, Seq[Alias])] = distinctAggs.map { ae =>
      val loweredFn = ae.aggregateFunction
        .transform { case a: Attribute => childSideOf.getOrElse(a, a) }
        .asInstanceOf[AggregateFunction]
      // inputs must now be pure child-side expressions
      if (!loweredFn.references.subsetOf(expand.child.outputSet)) return None
      val aliases = loweredFn match {
        case Average(e, _) => Seq(
          Alias(ae.copy(aggregateFunction = Sum(e),
            resultId = NamedExpression.newExprId), "__graft_psum")(),
          Alias(ae.copy(aggregateFunction = Count(e),
            resultId = NamedExpression.newExprId), "__graft_pcnt")())
        case fn =>
          Seq(Alias(ae.copy(aggregateFunction = fn), "__graft_partial")())
      }
      ae -> aliases
    }
    val lower =
      Aggregate(keyNamed, keyNamed ++ partials.flatMap(_._2), expand.child)

    // ---- rebuilt Expand over the collapsed relation --------------------
    val partialAttrs = partials.flatMap(_._2).map(_.toAttribute)
    val keptSlots = slots.filter {
      case (_, _: LitSlot) => true
      case (a, _)          => keySlots.exists(_._1 == a)
    }
    val newProjections: Seq[Seq[Expression]] = (0 until nSets).map { p =>
      keptSlots.map {
        case (_, LitSlot(lits))                     => lits(p)
        case (a, GroupSlot(_, nullIn)) if nullIn(p) => Literal.create(null, a.dataType)
        case (_, GroupSlot(e, _))                   => keyAttrFor(e)
        case (_, UniformSlot(e))                    => keyAttrFor(e)
      } ++ partialAttrs
    }
    // kept slots keep their ORIGINAL attribute ids so parent references
    // resolve unchanged; partial columns ride through under their own ids
    val newOutput = keptSlots.map(_._1) ++ partialAttrs
    val newExpand = Expand(newProjections, newOutput, lower)
    newExpand.setTagValue(RewrittenTag, ())

    // ---- upper aggregate over merged partials --------------------------
    val mergeOf: Map[AggregateExpression, Expression] =
      partials.map { case (ae, ps) =>
        val pAttrs = ps.map(_.toAttribute)
        val pa = pAttrs.head
        val merged: Expression = ae.aggregateFunction match {
          case _: Count =>
            // COUNT is non-nullable; SUM of never-null partial counts can
            // only be null for an empty group, which cannot occur below an
            // Expand of a non-empty aggregate — COALESCE keeps the schema
            Coalesce(Seq(
              ae.copy(aggregateFunction = Sum(pa)), Literal(0L)))
          case _: Sum => ae.copy(aggregateFunction = Sum(pa))
          case _: Min => ae.copy(aggregateFunction = Min(pa))
          case _: Max => ae.copy(aggregateFunction = Max(pa))
          case _: Average =>
            // AVG = Σ partial sums / Σ partial non-null counts. LEGACY
            // division (Average's own internal mode) yields NULL when the
            // count is 0, reproducing AVG's all-null-group result even
            // under ANSI sessions; casts normalize both sides to AVG's
            // double result type (partial sums may be long for integral
            // inputs)
            val Seq(psum, pcnt) = pAttrs
            Divide(
              Cast(ae.copy(aggregateFunction = Sum(psum),
                resultId = NamedExpression.newExprId), DoubleType),
              Cast(ae.copy(aggregateFunction = Sum(pcnt),
                resultId = NamedExpression.newExprId), DoubleType),
              EvalMode.LEGACY)
          case _      => return None
        }
        if (merged.dataType != ae.dataType) return None
        ae -> merged
      }.toMap
    // transformUp: the replacement contains a NEW AggregateExpression of
    // its own, which a top-down transform would re-visit and fail to map
    val newAggExprs = agg.aggregateExpressions.map { ne =>
      ne.transformUp {
        case ae: AggregateExpression =>
          mergeOf.collectFirst { case (k, v) if k.semanticEquals(ae) => v }
            .getOrElse(ae)
      }.asInstanceOf[NamedExpression]
    }
    Some(agg.copy(aggregateExpressions = newAggExprs, child = newExpand))
  }
}
