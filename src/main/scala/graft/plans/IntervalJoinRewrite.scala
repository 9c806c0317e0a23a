package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite an inequality-only INTERVAL-OVERLAP join into a
  * bucketized equi-join.
  *
  * Spark executes a join whose only condition is
  * `a_s <= b_e AND b_s <= a_e` as a BroadcastNestedLoopJoin — O(|A|·|B|)
  * row comparisons, the single worst plan shape a temporal-alignment query
  * can hit at scale. The standard fix (what `j_interval_overlap` hand-
  * writes) is mechanical: explode each interval onto fixed-width time
  * buckets, equi-join on the bucket, re-check the exact predicate, and
  * keep each pair only in its CANONICAL bucket (the one containing the
  * later start — provably covered by both intervals, so every qualifying
  * pair survives exactly once; see the proof sketch below). This rule
  * applies that rewrite AUTOMATICALLY whenever the session arms it with
  *
  *   spark.graft.intervalJoin.bucketWidth = <w>   (same unit as the bounds)
  *
  * so a user can write the natural inequality join and still get the
  * shuffle-parallel plan. Unarmed (the default), the rule is a no-op —
  * it never changes plans behind a user's back.
  *
  * Correctness (any integers, including degenerate s > e "intervals"):
  * for a pair with `a_s <= b_e` and `b_s <= a_e`, let m = max(a_s, b_s).
  * Then min(a_s, a_e) <= m <= max(a_s, a_e) and likewise for b (case
  * split on which side m comes from, using the two condition inequalities)
  * — so bucket(m) lies in BOTH sides' generated bucket ranges (Sequence
  * covers the same bucket SET whether it steps up or down), the equi-join
  * meets the pair there, and the `bucket = bucket(m)` filter keeps exactly
  * that one meeting. The original predicate is re-applied verbatim, so no
  * false pairs survive.
  *
  * Scope guards: inner joins only; both bounds integer/long (bucket
  * arithmetic is exact integral division — for NEGATIVE epochs two
  * adjacent values can share a truncated bucket, which is still correct,
  * just one bucket wider); every extra conjunct is preserved in the
  * post-join filter. Width choice is the user's: w >= the typical
  * interval length keeps the per-row explode at <= 2 buckets.
  */
object IntervalJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val WidthKey = "spark.graft.intervalJoin.bucketWidth"

  private def width: Option[Long] =
    Option(SQLConf.get.getConfString(WidthKey, null)).flatMap(s =>
      scala.util.Try(s.toLong).toOption).filter(_ > 0)

  /** Normalize a conjunct to (lhs <= rhs). STRICT comparisons also
    * qualify: a < b implies a <= b, so treating them as non-strict only
    * WIDENS the candidate bucket ranges (completeness preserved) while
    * the untouched original predicate still filters exactly. */
  private def lte(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThanOrEqual(a, b) => Some((a, b))
    case GreaterThanOrEqual(a, b) => Some((b, a))
    case LessThan(a, b) => Some((a, b))
    case GreaterThan(a, b) => Some((b, a))
    case _ => None
  }

  private def isIntegral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  private def fromSide(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  /** The four interval bounds, if the two conjuncts form the overlap
    * pattern: (aS <= bE) AND (bS <= aE) with a-bounds from `left` and
    * b-bounds from `right` (conjunct order immaterial). */
  private def overlapBounds(c1: (Expression, Expression), c2: (Expression, Expression),
      left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Expression, Expression)] = {
    val ((x1, y1), (x2, y2)) = (c1, c2)
    if (fromSide(x1, left) && fromSide(y1, right) &&
        fromSide(x2, right) && fromSide(y2, left))
      Some((x1, y2, x2, y1)) // aS, aE, bS, bE
    else if (fromSide(x1, right) && fromSide(y1, left) &&
        fromSide(x2, left) && fromSide(y2, right))
      Some((x2, y1, x1, y2))
    else None
  }

  private def bucketsOf(child: LogicalPlan, s: Expression, e: Expression,
      w: Long, name: String): (LogicalPlan, Attribute) = {
    val attr = AttributeReference(name, LongType, nullable = false)()
    // Sequence is TimeZoneAwareExpression: it stays UNRESOLVED until the
    // timezone is pinned, even for integral sequences that never use it.
    val gen = Explode(new Sequence(
      IntegralDivide(asLong(s), Literal(w)), IntegralDivide(asLong(e), Literal(w)),
      None, Some(SQLConf.get.sessionLocalTimeZone)))
    (Generate(gen, Nil, outer = false, None, Seq(attr), child), attr)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = width match {
    case None => plan
    case Some(w) => plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && !cond.exists(_.isInstanceOf[EqualTo]) =>
        val ltes = splitConjunctivePredicates(cond).flatMap(lte)
        val hit = (for {
          (c1, idx1) <- ltes.zipWithIndex.iterator
          (c2, idx2) <- ltes.zipWithIndex if idx2 > idx1
          bounds <- overlapBounds(c1, c2, left, right)
          if Seq(bounds._1, bounds._2, bounds._3, bounds._4).forall(isIntegral)
        } yield bounds).take(1).toList.headOption
        hit match {
          case None => j
          case Some((aS, aE, bS, bE)) =>
            val (lB, bktL) = bucketsOf(left, aS, aE, w, "__graft_bktL")
            val (rB, bktR) = bucketsOf(right, bS, bE, w, "__graft_bktR")
            val equi = Join(lB, rB, Inner, Some(EqualTo(bktL, bktR)), hint)
            val canonical = EqualTo(bktL,
              IntegralDivide(Greatest(Seq(asLong(aS), asLong(bS))), Literal(w)))
            Project(j.output, Filter(And(cond, canonical), equi))
        }
    }
  }
}
