package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Optimizer rule: the "most frequent items" idiom
  *
  *   SELECT x, count(*) AS c FROM t GROUP BY x ORDER BY c DESC [, ...]
  *   LIMIT k
  *
  * → one `approx_top_k` frequent-items sketch, armed by
  *
  *   spark.graft.approxTopK = freq
  *   spark.graft.approxTopK.maxItemsTracked = <capacity>  (default 65536)
  *
  * This completes the sketch-mode trilogy ([[ApproxDistinctRewrite]] =
  * B6 Theta, [[ApproxPercentileRewrite]] = B7 KLL; this is the
  * reference's B8 TOP K — its frequent-items semantic — as a session
  * mode). The exact plan's exchange carries EVERY DISTINCT KEY from
  * every mapper (the partial count aggregate pre-combines, but a
  * high-cardinality key column still ships each mapper's distinct set,
  * the same blow-up shape as exact distinct) and then ranks it; armed,
  * each mapper ships one bounded frequent-items sketch and the final
  * merge answers top-k directly. Results follow the sketch's
  * heavy-hitter contract: EXACT while distinct items fit the tracked
  * capacity, approximate counts (and possibly-different tail membership)
  * beyond — the user's explicit opt-in, the same contract as Bullet's
  * TOP K.
  *
  * Boundary ties: when the sort carries a user tiebreak after the
  * count (`ORDER BY c DESC, x`), asking the sketch for exactly k items
  * would let IT pick among counts tied at the k-th position before the
  * tiebreak ever runs — different membership than exact even below
  * capacity. The rewrite therefore requests the sketch's FULL tracked
  * capacity whenever a tiebreak is present (below capacity that is
  * every distinct item, with exact counts), re-applies the user's
  * whole sort, and only then truncates to k — bit-identical membership
  * in the exact regime, at the cost of sorting ≤ capacity rows after
  * the final merge (the shipped sketch bytes are identical). Without a
  * tiebreak the exact plan's own tie membership is arbitrary, so the
  * sketch's pick is in-contract and k items suffice.
  *
  * Scope guards (anything else keeps its exact plan): single
  * non-nullable deterministic grouping expression of a sketch-supported
  * type (null items never reach the sketch, but the exact plan COUNTS a
  * null group — nullable keys keep exactness); aggregate list is exactly
  * the grouping column plus one unfiltered, non-distinct `count(*)`/
  * `count(<literal>)`; the sort leads with that count DESCENDING
  * (remaining tiebreak orders are re-applied verbatim above the rewrite,
  * as is the LIMIT); k bounded by the armed capacity.
  */
object TopKFrequentRewrite extends Rule[LogicalPlan] {

  val Key = "spark.graft.approxTopK"
  val MaxTrackedKey = "spark.graft.approxTopK.maxItemsTracked"

  private def armed: Boolean =
    SQLConf.get.getConfString(Key, "") == "freq"

  private def maxTracked: Int =
    scala.util.Try(SQLConf.get.getConfString(MaxTrackedKey, "65536").toInt).getOrElse(65536)

  private def supported(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
         StringType | DateType | BooleanType | _: DecimalType => true
    case _: TimestampType => true
    case _ => false
  }

  private def isCountStar(f: AggregateFunction): Boolean = f match {
    case Count(Seq(l: Literal)) => l.value != null
    case _ => false
  }

  /** (groupAlias index, countAlias) if the aggregate list is exactly
    * [group column, count(*) alias] in either order. */
  private def shape(agg: Aggregate): Option[(NamedExpression, Alias)] = {
    if (agg.groupingExpressions.size != 1 || agg.aggregateExpressions.size != 2) return None
    val grp = agg.groupingExpressions.head
    val (cnts, grps) = agg.aggregateExpressions.partition {
      case Alias(AggregateExpression(f, _, false, None, _), _) => isCountStar(f)
      case _ => false
    }
    (cnts, grps) match {
      case (Seq(c: Alias), Seq(g)) if g.toAttribute.semanticEquals(grp) ||
          (g match { case Alias(e, _) => e.semanticEquals(grp); case e => e.semanticEquals(grp) }) =>
        Some((g, c))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!armed) plan
    else plan.transformUp {
      case gl @ GlobalLimit(le @ Literal(k: Int, IntegerType),
          LocalLimit(_, sort @ Sort(orders, true, agg: Aggregate, _)))
          if agg.resolved && k >= 1 && k <= maxTracked =>
        shape(agg) match {
          case Some((grpNe, cntAlias))
              if agg.groupingExpressions.head.deterministic &&
                !agg.groupingExpressions.head.nullable &&
                supported(agg.groupingExpressions.head.dataType) &&
                orders.headOption.exists(so => so.direction == Descending &&
                  so.child.semanticEquals(cntAlias.toAttribute)) &&
                orders.tail.forall(_.child.deterministic) =>
            val item = agg.groupingExpressions.head
            // user tiebreak present → surface the full tracked set so the
            // re-applied sort decides boundary-tie membership (see scaladoc)
            val sketchK = if (orders.size > 1) maxTracked else k
            val tk = Alias(AggregateExpression(
              new ApproxTopK(item, Literal(sketchK), Literal(maxTracked)),
              Complete, isDistinct = false), "__graft_tk")()
            val sketchAgg = Aggregate(Nil, Seq(tk), agg.child)
            val elemType = tk.dataType.asInstanceOf[ArrayType].elementType
            val elem = AttributeReference("__graft_elem", elemType, nullable = false)()
            val gen = Generate(Explode(tk.toAttribute),
              unrequiredChildIndex = Seq(0), outer = false, qualifier = None,
              generatorOutput = Seq(elem), child = sketchAgg)
            val restored = Seq(
              Alias(GetStructField(elem, 0), grpNe.name)(exprId = grpNe.exprId),
              Alias(Cast(GetStructField(elem, 1), LongType), cntAlias.name)(
                exprId = cntAlias.exprId))
            val projected = Project(
              agg.aggregateExpressions.map(ne =>
                restored.find(_.exprId == ne.exprId).get), gen)
            // original sort (count desc + user tiebreaks) and limit
            // re-apply verbatim over <= k rows
            GlobalLimit(le, LocalLimit(le, Sort(orders, global = true, projected)))
          case _ => gl
        }
    }
}
