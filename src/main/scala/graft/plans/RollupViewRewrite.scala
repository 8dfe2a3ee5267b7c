package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DecimalType, DoubleType, NumericType}

/** X91 — materialized-rollup rewrite: answer coarse aggregations from a
  * registered KB-sized rollup instead of the fact table.
  *
  * The 100 TB dashboard reality: the same fact table is re-aggregated all
  * day by queries that group on a handful of low-cardinality keys. A
  * rollup materialized ONCE per (key-set, measure-set) — counts, sums,
  * mins, maxes, non-null counts per full key group
  * ([[graft.etl.MaterializedRollup.build]]) — answers every query whose
  * grouping is a SUBSET of the rollup keys and whose aggregates are
  * re-aggregatable from those partials, at |distinct keys| input rows
  * instead of |fact|. This rule performs that rerouting as a Catalyst
  * optimizer rewrite, so user queries keep targeting the base table:
  *
  *   Aggregate(G ⊆ keys, algebraic aggs, [Project][Filter(keys-only)] Scan(base))
  *     ⇒ Aggregate(G, merged aggs, [Filter'](Scan(mv)))
  *
  * with COUNT(*)→COALESCE(SUM(cnt),0), COUNT(c)→COALESCE(SUM(cnt_c),0),
  * SUM(c)→SUM(sum_c), MIN/MAX(c)→MIN/MAX(min_c/max_c), and
  * AVG(c)→Σ(sum_c)/Σ(cnt_c) (AVG is not re-aggregatable; its exact
  * decomposition is — the [[PreAggExpandRewrite]] contract). A
  * grouping-only aggregate (DISTINCT keys) also qualifies. Everything
  * else refuses: DISTINCT/FILTER aggregate modifiers, decimal SUM/AVG
  * (re-sum widens precision), computed grouping or aggregate children,
  * filters touching non-key columns, any referenced column outside
  * keys ∪ measures.
  *
  * Correctness contract — the rewrite preserves semantics because the
  * rollup holds one row per DISTINCT full key combination present in the
  * base (groups absent from the base are absent from both plans), filters
  * on key columns commute with the per-key collapse (replayed verbatim on
  * the rollup), and every merged aggregate is the exact algebraic
  * composition of its partials. Output attribute ids, names, and types
  * are preserved exactly (aliases carry the original exprIds), so parent
  * operators resolve unchanged; any type mismatch aborts the rewrite.
  *
  * STALENESS is the registrar's contract, standard for materialized
  * views: registering asserts the rollup reflects the base; refresh after
  * base changes ([[graft.etl.MaterializedRollup.createAndRegister]]
  * re-runs, or maintain it incrementally with X33's IncrementalAgg).
  *
  * Fixed point: the rewritten aggregate scans the rollup's path, which is
  * never a registered BASE path (self-registration is refused), so the
  * rule cannot re-fire on its own output. Conf-gated per session/query:
  * `spark.graft.rollupViewRewrite` (default ON; the registry is empty
  * unless the user registers views, so the default is inert).
  */
object RollupViewRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.rollupViewRewrite"

  /** A registered rollup: `mv` holds keys ++ cnt ++ per-measure partials
    * (sum_c, min_c, max_c, cnt_c) at `mvPath`, one row per distinct key
    * combination of the base relation rooted at `basePath`. */
  final case class View(name: String, basePath: String, keys: Seq[String],
      measures: Seq[String], mv: LogicalRelation) {
    require(basePath != "", "empty base path")
  }

  private val views =
    new java.util.concurrent.ConcurrentHashMap[String, View]()

  def register(v: View): Unit = {
    val mvPaths = rootPaths(v.mv).toSet
    require(!mvPaths.contains(v.basePath),
      s"rollup view ${v.name} cannot be registered over its own path")
    views.put(v.name, v)
  }
  def unregister(name: String): Unit = views.remove(name)
  def clear(): Unit = views.clear()
  def registered: Seq[View] = views.values.asScala.toSeq

  private def enabled: Boolean =
    conf.getConfString(EnabledKey, "true").toBoolean

  private def rootPaths(lr: LogicalRelation): Seq[String] = lr.relation match {
    case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
    case _                    => Nil
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled || views.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate => rewrite(agg).getOrElse(agg)
    }

  /** Unwrap attribute-only Projects and key-only Filters down to the base
    * relation; returns (relation, filter conditions met on the way). */
  private def unwrap(p: LogicalPlan,
      conds: Seq[Expression]): Option[(LogicalRelation, Seq[Expression])] =
    p match {
      case lr: LogicalRelation => Some((lr, conds))
      case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        unwrap(child, conds)
      case Filter(cond, child) => unwrap(child, conds :+ cond)
      case _ => None
    }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    val (baseRel, filterConds) = unwrap(agg.child, Nil) match {
      case Some(x) => x
      case None    => return None
    }
    val basePaths = rootPaths(baseRel)
    if (basePaths.size != 1) return None
    val basePath = basePaths.head

    // grouping must be plain attributes
    val groupAttrs: Seq[AttributeReference] = agg.groupingExpressions.map {
      case a: AttributeReference => a
      case _                     => return None
    }
    // candidate views: base matches, keys cover the grouping AND every
    // filter condition; measures cover the aggregate inputs (checked
    // below). Prefer the fewest-keys cover (smallest rollup wins).
    val filterRefs = filterConds.flatMap(_.references.toSeq)
    val candidates = views.values.asScala.toSeq
      .filter(v => v.basePath == basePath)
      .filter(v => groupAttrs.forall(a => v.keys.contains(a.name)))
      .filter(v => filterRefs.forall(a => v.keys.contains(a.name)))
      .sortBy(v => (v.keys.size, v.name))
    candidates.view.flatMap(v => rewriteWith(agg, filterConds, v)).headOption
  }

  private def rewriteWith(agg: Aggregate, filterConds: Seq[Expression],
      v: View): Option[LogicalPlan] = {
    // fresh MV attribute ids per use (several rewrites may share a view)
    val mvRel = v.mv.newInstance()
    val mvAttr: Map[String, Attribute] = mvRel.output.map(a => a.name -> a).toMap
    def partial(prefix: String, c: String): Option[Attribute] =
      mvAttr.get(s"${prefix}_$c")

    val aggExpressions = agg.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression => ae
    })

    // merged replacement per distinct aggregate call — None (outer) aborts
    val distinctAggs = aggExpressions.foldLeft(Seq.empty[AggregateExpression]) {
      (acc, ae) => if (acc.exists(_.semanticEquals(ae))) acc else acc :+ ae
    }
    val mergeOf: Map[AggregateExpression, Expression] = distinctAggs.map { ae =>
      if (ae.isDistinct || ae.filter.nonEmpty) return None
      val merged: Expression = ae.aggregateFunction match {
        case Count(Seq(l: Literal)) if l.value != null =>
          val cnt = mvAttr.getOrElse("cnt", return None)
          Coalesce(Seq(ae.copy(aggregateFunction = Sum(cnt),
            resultId = NamedExpression.newExprId), Literal(0L)))
        case Count(Seq(a: AttributeReference)) =>
          val cc = partial("cnt", a.name).getOrElse(return None)
          Coalesce(Seq(ae.copy(aggregateFunction = Sum(cc),
            resultId = NamedExpression.newExprId), Literal(0L)))
        case Sum(a: AttributeReference, _)
            if !a.dataType.isInstanceOf[DecimalType] =>
          val sc = partial("sum", a.name).getOrElse(return None)
          ae.copy(aggregateFunction = Sum(sc),
            resultId = NamedExpression.newExprId)
        case Min(a: AttributeReference) =>
          val mc = partial("min", a.name).getOrElse(return None)
          ae.copy(aggregateFunction = Min(mc),
            resultId = NamedExpression.newExprId)
        case Max(a: AttributeReference) =>
          val mc = partial("max", a.name).getOrElse(return None)
          ae.copy(aggregateFunction = Max(mc),
            resultId = NamedExpression.newExprId)
        case Average(a: AttributeReference, _) => a.dataType match {
          case _: DecimalType => return None
          case _: NumericType =>
            val sc = partial("sum", a.name).getOrElse(return None)
            val cc = partial("cnt", a.name).getOrElse(return None)
            // LEGACY division: NULL at count 0, reproducing AVG's
            // all-null-group result even under ANSI sessions
            Divide(
              Cast(ae.copy(aggregateFunction = Sum(sc),
                resultId = NamedExpression.newExprId), DoubleType),
              Cast(ae.copy(aggregateFunction = Sum(cc),
                resultId = NamedExpression.newExprId), DoubleType),
              EvalMode.LEGACY)
          case _ => return None
        }
        case _ => return None
      }
      if (merged.dataType != ae.dataType) return None
      ae -> merged
    }.toMap

    // every column the aggregate touches must be a key (outside agg
    // functions) — aggregate inputs were validated per-call above
    def refsOutsideAgg(e: Expression): Seq[Attribute] = e match {
      case _: AggregateExpression => Nil
      case a: Attribute           => Seq(a)
      case other                  => other.children.flatMap(refsOutsideAgg)
    }
    val outside = agg.aggregateExpressions.flatMap(refsOutsideAgg) ++
      agg.groupingExpressions.flatMap(refsOutsideAgg)
    if (!outside.forall(a => v.keys.contains(a.name))) return None

    // the MV file must actually carry every declared key column
    if (!v.keys.forall(mvAttr.contains)) return None

    // rebuild: [Filter'] over the fresh MV relation (every attr reaching
    // here was validated to be a key, and keys ⊆ mv columns just above)
    def toMv(e: Expression): Expression = e.transformUp {
      case a: AttributeReference if mvAttr.contains(a.name) => mvAttr(a.name)
    }
    val child: LogicalPlan = filterConds match {
      case Seq() => mvRel
      case cs    => Filter(cs.map(toMv).reduce(And), mvRel)
    }

    // result expressions: merged aggregates + key attrs, under the
    // ORIGINAL names and exprIds so parents resolve unchanged
    val newResult: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference =>
        Alias(mvAttr.getOrElse(a.name, return None), a.name)(exprId = a.exprId)
      case al: Alias =>
        val rewritten = al.child.transformUp {
          case ae: AggregateExpression =>
            mergeOf.collectFirst { case (k, m) if k.semanticEquals(ae) => m }
              .getOrElse(return None)
        }
        // remaining base-side attrs outside aggregate subtrees are keys
        // (validated above); mv-side attrs introduced by the merge are
        // mapped to themselves harmlessly
        val mapped = rewritten.transformUp {
          case a: AttributeReference if v.keys.contains(a.name) =>
            mvAttr.getOrElse(a.name, return None)
        }
        if (!mapped.references.subsetOf(mvRel.outputSet)) return None
        Alias(mapped, al.name)(exprId = al.exprId, qualifier = al.qualifier,
          explicitMetadata = Some(al.metadata))
      case _ => return None
    }
    val newGrouping = agg.groupingExpressions.map(toMv)
    Some(agg.copy(groupingExpressions = newGrouping,
      aggregateExpressions = newResult, child = child))
  }
}
