package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Optimizer rule: exact `percentile(x, p)` / `median(x)` → KLL-sketch
  * quantile estimate, armed by
  *
  *   spark.graft.approxPercentile = kll
  *   spark.graft.approxPercentile.k = <nominal k>   (default 65535)
  *
  * The DISTRIBUTION analogue of [[ApproxDistinctRewrite]] (the
  * reference's B7 semantic — its DISTRIBUTION *is* a quantile sketch —
  * as a session mode): Spark's exact Percentile aggregate buffers a
  * value→count map PER GROUP and ships it through the exchange, so a
  * high-cardinality value column costs memory and shuffle proportional
  * to the distinct values per group — the same blow-up shape as exact
  * distinct. Armed, every exact percentile/median plans as one
  * partial+final KLL sketch (fixed ≤k-bounded bytes per group per
  * mapper) interrogated at the same percentage points.
  *
  * Results become ESTIMATES under the sketch's rank-error contract
  * (±~0.06 % rank at the default k=65535), and the answer is an actual
  * data value (inclusive rank — the engine's own B7 convention) rather
  * than Spark's linear interpolation between neighbors; that trade is
  * the user's explicit opt-in, the same contract as Bullet's
  * DISTRIBUTION. Unarmed (default) the rule never touches a plan.
  *
  * Scope guards: unit frequency (`percentile(x, p, f)` keeps its exact
  * plan), non-reverse ordering, NUMERIC input (cast to double — the
  * domain Spark's own interpolation computes in anyway), foldable
  * scalar-or-array percentage (Percentile requires that already);
  * DISTINCT percentile keeps its exact plan; the aggregate FILTER
  * clause is preserved. Median needs no case of its own: the analyzer
  * replaces `median(x)` with `percentile(x, 0.5)` before optimization.
  *
  * Empty-group hazard (upstream): `kll_sketch_agg`'s never-updated
  * buffer serializes to bytes `kll_sketch_get_quantile` rejects at
  * runtime (KLL_INVALID_INPUT_SKETCH_BUFFER) — a group whose rows are
  * all filtered out or all null would CRASH, where exact percentile
  * returns null. The rewrite therefore pairs the sketch with a
  * count(input) aggregate and evaluates the quantile lazily behind
  * `If(cnt = 0, null, ...)`, restoring Percentile's null-on-empty
  * contract exactly (ApproxPercentileSpec pins both hazards).
  */
object ApproxPercentileRewrite extends Rule[LogicalPlan] {

  val Key = "spark.graft.approxPercentile"
  val KKey = "spark.graft.approxPercentile.k"

  private def armed: Boolean =
    SQLConf.get.getConfString(Key, "") == "kll"

  private def nominalK: Int =
    scala.util.Try(SQLConf.get.getConfString(KKey, "65535").toInt).getOrElse(65535)

  private def unitFrequency(e: Expression): Boolean = e match {
    case Literal(1L, LongType) | Literal(1, IntegerType) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!armed) plan
    else plan.transformUp {
      case agg: Aggregate if agg.resolved =>
        agg.transformExpressions {
          case AggregateExpression(p: Percentile, mode, false, filter, _)
              if unitFrequency(p.frequencyExpression) && !p.reverse &&
                p.child.dataType.isInstanceOf[NumericType] && p.child.deterministic =>
            val input = p.child.dataType match {
              case DoubleType => p.child
              case _ => Cast(p.child, DoubleType)
            }
            val sk = AggregateExpression(
              new KllSketchAggDouble(input, Literal(nominalK)),
              mode, isDistinct = false, filter)
            val q = KllSketchGetQuantileDouble(sk, p.percentageExpression)
            val cnt = AggregateExpression(
              Count(Seq(input)), mode, isDistinct = false, filter)
            If(EqualTo(cnt, Literal(0L)), Literal.create(null, q.dataType), q)
        }
    }
}
