package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

import graft.functions.TopKMin

/** Optimizer rule: rewrite the per-group top-N window idiom
  *
  *   row_number() OVER (PARTITION BY p ORDER BY s) AS rn ... WHERE rn <= N
  *
  * into the bounded-heap `topk_min` aggregate + posexplode.
  *
  * Spark 3.5+ already bounds this idiom's EXCHANGE with
  * InferWindowGroupLimit (a partial WindowGroupLimit keeps k rows per group
  * per mapper), but that plan still FULL-SORTS every map partition to feed
  * the group limit — O(n log n) comparisons and sort spill over the whole
  * input — then sorts again on the reduce side and runs the window pass.
  * The heap shape replaces all of that with one streaming O(n log k)
  * ObjectHashAggregate whose memory is O(|groups| x k): no map-side sort,
  * no spill, no WindowExec (measured numbers in BASELINE.md). The engine's
  * own call sites all hand-write this shape (`graft.functions.TopKMin`, rank-identity proven in TopKRankSpec);
  * this rule applies the same rewrite AUTOMATICALLY to user-written window
  * plans when the session arms it with
  *
  *   spark.graft.topk.rewriteMaxK = <maxK>   (rewrite fires for N <= maxK)
  *
  * Unarmed (the default) the rule is a no-op — it never changes plans
  * behind a user's back, because the rewrite refines the window's
  * tie-break: row_number() over a NON-total order is nondeterministic,
  * and the heap resolves those ties by the full-row struct ordering
  * (a legal row_number assignment, but not necessarily the one WindowExec
  * would emit). Callers with total orders (unique tie-break column — what
  * deterministic pipelines need anyway) see bit-identical results.
  *
  * Scope guards (anything else keeps its window):
  *  - exactly one window expression, and it is row_number() with the
  *    standard RowFrame UnboundedPreceding..CurrentRow;
  *  - the filter directly above bounds rn by a literal: rn <= N, rn < N,
  *    rn = 1 (top-1/dedup idiom), conjuncts in any order — the TIGHTEST
  *    bound becomes the heap size and the original filter is re-applied
  *    verbatim above the rewrite;
  *  - descending keys are encoded by an order-reversing transform
  *    (BitwiseNot for integrals — overflow-free — and negation for
  *    float/double/decimal), so they must be numeric; descending
  *    strings/dates keep their window. Null placement is exact for all
  *    four direction/null-order combinations via an explicit null-flag
  *    field. NaN scores under a descending key follow the topk_min
  *    contract (sorted last, not first — see the TopKMin scaladoc); the
  *    engine's own sites cannot produce NaN.
  *
  * Shape after rewrite: Aggregate(p, topk_min(struct(keys..., row), N))
  * -> posexplode -> project, with rn = pos + 1. The aggregate plans as
  * ObjectHashAggregate partial+final, so the pre-shuffle side is already
  * N-bounded per group — the per-group analogue of TakeOrderedAndProject.
  */
object TopKWindowRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val MaxKKey = "spark.graft.topk.rewriteMaxK"

  private def maxK: Option[Int] =
    Option(SQLConf.get.getConfString(MaxKKey, null)).flatMap(s =>
      scala.util.Try(s.toInt).toOption).filter(_ > 0)

  private def isRowNumberWindow(ne: NamedExpression): Boolean = ne match {
    case Alias(WindowExpression(_: RowNumber, WindowSpecDefinition(_, _,
        SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _) => true
    case _ => false
  }

  /** Tightest literal bound N such that the conjuncts imply rn <= N
    * (None if no conjunct bounds rn, or the bound is non-positive). */
  private def bound(conjuncts: Seq[Expression], rn: Attribute): Option[Int] = {
    def lit(e: Expression): Option[Long] = e match {
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case Literal(v: Long, LongType) => Some(v)
      case _ => None
    }
    val bounds = conjuncts.flatMap {
      case LessThanOrEqual(a: Attribute, l) if a.semanticEquals(rn) => lit(l)
      case GreaterThanOrEqual(l, a: Attribute) if a.semanticEquals(rn) => lit(l)
      case LessThan(a: Attribute, l) if a.semanticEquals(rn) => lit(l).map(_ - 1)
      case GreaterThan(l, a: Attribute) if a.semanticEquals(rn) => lit(l).map(_ - 1)
      case EqualTo(a: Attribute, l) if a.semanticEquals(rn) => lit(l)
      case EqualTo(l, a: Attribute) if a.semanticEquals(rn) => lit(l)
      case _ => None
    }
    if (bounds.isEmpty) None
    else Some(bounds.min).filter(n => n >= 1 && n <= Int.MaxValue).map(_.toInt)
  }

  private def isIntegral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def isNumeric(t: DataType): Boolean = t match {
    case FloatType | DoubleType | _: DecimalType => true
    case t2 => isIntegral(t2)
  }

  /** Order-reversing transform for a descending key: BitwiseNot is a
    * perfect, overflow-free reversal for signed integrals (~MinValue =
    * MaxValue); floating/decimal negate (no overflow — IEEE negation and
    * the symmetric decimal range are total). Non-numeric descending keys
    * have no such transform — the caller bails and keeps the window. */
  private def reversed(e: Expression): Option[Expression] = e.dataType match {
    case t if isIntegral(t) => Some(BitwiseNot(e))
    case FloatType | DoubleType | _: DecimalType => Some(UnaryMinus(e))
    case _ => None
  }

  /** Heap-orderable encoding of one sort key as struct fields, or None if
    * unsupported. The struct min-ordering natively sorts a null field
    * FIRST, which matches ASC NULLS FIRST; every other null placement gets
    * an explicit boolean null-flag field ahead of the key (false < true),
    * so nulls land exactly where the SortOrder put them and never collide
    * with real values. */
  private def keyFields(so: SortOrder): Option[Seq[Expression]] = {
    val e = so.child
    (so.direction, so.nullOrdering) match {
      case (Ascending, NullsFirst) => Some(Seq(e))
      case (Ascending, NullsLast) =>
        Some(if (e.nullable) Seq(IsNull(e), e) else Seq(e))
      case (Descending, NullsLast) =>
        reversed(e).map(r => if (e.nullable) Seq(IsNull(e), r) else Seq(r))
      case (Descending, NullsFirst) =>
        reversed(e).map(r => if (e.nullable) Seq(IsNotNull(e), r) else Seq(r))
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = maxK match {
    case None => plan
    case Some(mk) => plan.transformUp {
      case f @ Filter(cond, w @ Window(Seq(we), partitionSpec, orderSpec, child, _))
          if f.resolved && isRowNumberWindow(we) && orderSpec.nonEmpty &&
            partitionSpec.forall(_.deterministic) &&
            orderSpec.forall(_.child.deterministic) =>
        val rn = we.toAttribute
        val keys = orderSpec.map(keyFields)
        bound(splitConjunctivePredicates(cond), rn) match {
          case Some(n) if n <= mk && keys.forall(_.isDefined) =>
            // struct(k0, ..., kN, payload = struct(child.output))
            val payload = CreateNamedStruct(child.output.zipWithIndex.flatMap {
              case (a, i) => Seq(Literal(s"c$i"), a)
            })
            val flatKeys = keys.flatten.flatten
            val heapElem = CreateNamedStruct(
              flatKeys.zipWithIndex.flatMap { case (k, i) =>
                Seq(Literal(s"k$i"), k)
              } ++ Seq(Literal("payload"), payload))
            val tk = Alias(AggregateExpression(
              TopKMin(heapElem, n), aggregate.Complete, isDistinct = false), "__graft_tk")()
            val agg = Aggregate(partitionSpec, Seq(tk), child)
            val pos = AttributeReference("__graft_pos", IntegerType, nullable = false)()
            val elem = AttributeReference("__graft_elem", heapElem.dataType, nullable = false)()
            val gen = Generate(PosExplode(tk.toAttribute),
              unrequiredChildIndex = Seq(0), outer = false, qualifier = None,
              generatorOutput = Seq(pos, elem), child = agg)
            val payloadField = GetStructField(elem, flatKeys.size, Some("payload"))
            val restored = child.output.zipWithIndex.map { case (a, i) =>
              Alias(GetStructField(payloadField, i, Some(s"c$i")), a.name)(exprId = a.exprId)
            }
            val rnOut = Alias(Add(pos, Literal(1)), rn.name)(exprId = rn.exprId)
            // Window output order is child.output :+ rn; the original
            // filter re-applies verbatim (rn conjunct now a no-op).
            Filter(cond, Project(restored :+ rnOut, gen))
          case _ => f
        }
    }
  }
}
