package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: fuse N scalar `percentile(col, p_i)` aggregates over the
  * same column into ONE array-argument percentile plus an element-extracting
  * projection.
  *
  * Exact `percentile` builds a per-group value map (OpenHashMap of every
  * distinct value); N scalar calls build and merge N identical maps. Fusing
  * them is a ~N× saving on aggregation state and merge traffic — measured
  * 5.4 s → 1.9 s for 4 quantiles over 600k rows (SURVEY.md §6). Users get
  * it for free via `spark.sql.extensions=graft.GraftExtensions`; the fused
  * result is bit-identical because Percentile computes all requested
  * percentages from the same sorted counts map either way.
  *
  * Fires only on aggregates that are: non-distinct, unfiltered, frequency 1,
  * forward-ordered, with a foldable double percentage — anything else is
  * left untouched. The rewritten aggregate's percentage is an array, so the
  * rule cannot re-fire on its own output.
  */
object FusePercentiles extends Rule[LogicalPlan] {

  private case class Fusable(alias: Alias, ae: AggregateExpression, p: Percentile, pct: Double)

  private def fusable(ne: NamedExpression): Option[Fusable] = ne match {
    case al @ Alias(ae @ AggregateExpression(
        p @ Percentile(_, Literal(pct: Double, DoubleType), Literal(1L, LongType), _, _, false),
        _, false, None, _), _) =>
      Some(Fusable(al, ae, p, pct))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(groupings, aggExprs, child, hint) =>
      val byColumn = aggExprs.flatMap(fusable)
        .groupBy(f => f.p.child.canonicalized)
        .filter(_._2.size >= 2)
      if (byColumn.isEmpty) agg
      else {
        // One fused array-percentile per fusable column, in first-appearance
        // order; remember each original alias → (fused attr, 1-based index).
        val fusedAliases = scala.collection.mutable.LinkedHashMap.empty[Expression, Alias]
        val extractors = scala.collection.mutable.Map.empty[ExprId, (Alias, Int)]
        byColumn.foreach { case (key, fs) =>
          val fusedFn = new Percentile(fs.head.p.child,
            CreateArray(fs.map(f => Literal(f.pct, DoubleType))))
          val fusedAe = AggregateExpression(fusedFn, fs.head.ae.mode,
            isDistinct = false, filter = None, resultId = NamedExpression.newExprId)
          val fusedAlias = Alias(fusedAe, s"graft_fused_percentile")()
          fusedAliases(key) = fusedAlias
          fs.zipWithIndex.foreach { case (f, i) =>
            extractors(f.alias.exprId) = (fusedAlias, i + 1)
          }
        }
        val newAggExprs = aggExprs.flatMap { ne =>
          fusable(ne) match {
            case Some(f) =>
              // keep only the first fusable per column (the fused alias),
              // drop the rest — all are re-derived in the projection
              val (fusedAlias, idx) = extractors(f.alias.exprId)
              if (idx == 1) Some(fusedAlias) else None
            case None => Some(ne)
          }
        }
        val projections = aggExprs.map { ne =>
          extractors.get(ne.exprId) match {
            case Some((fusedAlias, idx)) =>
              Alias(ElementAt(fusedAlias.toAttribute, Literal(idx)), ne.name)(
                exprId = ne.exprId, qualifier = ne.toAttribute.qualifier)
            case None => ne.toAttribute
          }
        }
        Project(projections, Aggregate(groupings, newAggExprs, child, hint))
      }
  }
}
