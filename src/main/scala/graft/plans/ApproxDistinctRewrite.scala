package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Optimizer rule: COUNT(DISTINCT x) → Theta-sketch estimate, armed by
  *
  *   spark.graft.approxDistinct = theta
  *
  * This is the reference's core semantic (its COUNT DISTINCT *is* a Theta
  * sketch, SURVEY.md §2.B B6) exposed as a session MODE: arm it and every
  * exact count-distinct in user SQL/DataFrame code plans as one
  * partial+final sketch aggregate instead of the exact distinct plan
  * (per-group pre-aggregation or an Expand for the multi-agg case, then a
  * second shuffle keyed on (group, value) — at 100 TB the distinct
  * exchange carries every distinct VALUE, the sketch exchange carries one
  * 4 KB sketch per group per mapper). Results become estimates: EXACT
  * below the sketch's nominal-entries threshold (4096 — many real group
  * cardinalities), ±~2 % beyond; that trade is the user's explicit opt-in,
  * the same contract as Bullet. Unarmed (default) the rule never touches
  * a plan.
  *
  * Scope guards: only `Count` with isDistinct and ONE argument of a
  * sketch-supported type (integral/float/double/string/binary); the
  * aggregate FILTER clause is preserved; multi-arg count(distinct a, b)
  * and other distinct aggregates (sum/avg) keep their exact plans.
  * Type-exact: theta_sketch_estimate returns BIGINT like Count.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  val Key = "spark.graft.approxDistinct"

  private def armed: Boolean =
    SQLConf.get.getConfString(Key, "") == "theta"

  private def supported(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
         StringType | BinaryType => true
    case _ => false
  }

  /** ThetaSketchAgg's inputTypes start at int — byte/short columns are
    * widened with an injective integral cast (distinct counts are
    * preserved exactly), because this rewrite runs POST-analysis and no
    * type check would re-fire before execution. */
  private def sketchInput(e: Expression): Expression = e.dataType match {
    case ByteType | ShortType => Cast(e, IntegerType)
    case _ => e
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!armed) plan
    else plan.transformUp {
      case agg: Aggregate if agg.resolved =>
        agg.transformExpressions {
          case ae @ AggregateExpression(Count(Seq(e)), mode, true, filter, _)
              if supported(e.dataType) && e.deterministic =>
            ThetaSketchEstimate(AggregateExpression(
              new ThetaSketchAgg(sketchInput(e)), mode, isDistinct = false, filter))
        }
    }
}
