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
  * count aggregate over the SAME input the sketch ingests and
  * evaluates the quantile lazily behind `If(cnt = 0, null, ...)`,
  * restoring Percentile's null-on-empty contract exactly
  * (ApproxPercentileSpec pins both hazards).
  *
  * NaN hazard (upstream): datasketches' `KllDoublesSketch.update`
  * silently DROPS NaN, and Spark's `kll_sketch_agg` doesn't
  * pre-filter — so a non-null NaN row increments a naive count(input)
  * guard while never reaching the sketch, and an all-NaN group would
  * hit the same empty-buffer crash with cnt > 0. The rewrite
  * therefore null-masks NaN out of BOTH the sketch input and its
  * guard count for float/double children, and adds a second count so
  * an all-NaN group returns NaN — matching exact percentile, whose
  * ordering places NaN greatest. The one documented divergence:
  * groups MIXING NaN with finite values estimate over the finite
  * values only (NaN-exclusion contract), where exact percentile lets
  * NaN occupy the top ranks — e.g. exact `percentile(v, 1.0)` is NaN,
  * armed returns the max finite value (spec-pinned).
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
            // Only float/double children can carry NaN (integral casts can't
            // produce one); mask it to null so the sketch input and its
            // guard count agree on what was ingested.
            val mayNaN = p.child.dataType == DoubleType || p.child.dataType == FloatType
            val safe =
              if (mayNaN) If(IsNaN(input), Literal.create(null, DoubleType), input)
              else input
            val sk = AggregateExpression(
              new KllSketchAggDouble(safe, Literal(nominalK)),
              mode, isDistinct = false, filter)
            val q = KllSketchGetQuantileDouble(sk, p.percentageExpression)
            val cntSafe = AggregateExpression(
              Count(Seq(safe)), mode, isDistinct = false, filter)
            val nullLit = Literal.create(null, q.dataType)
            if (!mayNaN) {
              If(EqualTo(cntSafe, Literal(0L)), nullLit, q)
            } else {
              // cntSafe = 0 but cntAll > 0 means every non-null value was
              // NaN: exact percentile's ordering (NaN greatest) answers NaN
              // at every rank, so do the same instead of crashing the
              // never-updated sketch buffer.
              val cntAll = AggregateExpression(
                Count(Seq(input)), mode, isDistinct = false, filter)
              val nanLit: Expression = q.dataType match {
                case at: ArrayType =>
                  val n = p.percentageExpression.eval() match {
                    case a: org.apache.spark.sql.catalyst.util.ArrayData => a.numElements()
                    case _ => 0
                  }
                  Literal.create(Seq.fill(n)(Double.NaN), at)
                case _ => Literal(Double.NaN)
              }
              If(EqualTo(cntSafe, Literal(0L)),
                If(EqualTo(cntAll, Literal(0L)), nullLit, nanLit),
                q)
            }
        }
    }
}
