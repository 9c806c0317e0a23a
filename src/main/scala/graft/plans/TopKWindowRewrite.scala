package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

import graft.functions.WindowTopK

/** Optimizer rule: rewrite the per-group top-N window idiom
  *
  *   {row_number()|rank()|dense_rank()} OVER (PARTITION BY p ORDER BY s)
  *     AS rn ... WHERE rn <= N
  *
  * into the tie-aware bounded-buffer `window_topk` aggregate + explode —
  * the same three rank functions Spark's own InferWindowGroupLimit
  * covers.
  *
  * Spark 3.5+ already bounds this idiom's EXCHANGE with
  * InferWindowGroupLimit (a partial WindowGroupLimit keeps the top rows
  * per group per mapper), but that plan still FULL-SORTS every map
  * partition to feed the group limit — O(n log n) comparisons and sort
  * spill over the whole input — then sorts again on the reduce side and
  * runs the window pass. The bounded-buffer shape replaces all of that
  * with one streaming O(n log k) ObjectHashAggregate whose memory is
  * O(|groups| x k): no map-side sort, no spill, no WindowExec (measured
  * numbers in BASELINE.md). The engine's own call sites hand-write the
  * row_number shape (`graft.functions.TopKMin`); this rule applies the
  * rewrite AUTOMATICALLY to user-written window plans when the session
  * arms it with
  *
  *   spark.graft.topk.rewriteMaxK = <maxK>   (rewrite fires for N <= maxK)
  *
  * Unarmed (the default) the rule is a no-op — it never changes plans
  * behind a user's back, because for row_number() the rewrite refines the
  * window's tie-break: row_number() over a NON-total order is
  * nondeterministic, and the buffer resolves boundary ties by arrival
  * order (a legal row_number assignment, but not necessarily the one
  * WindowExec would emit). Callers with total orders (unique tie-break
  * column — what deterministic pipelines need anyway) see bit-identical
  * results; rank()/dense_rank() keep ALL boundary ties, so their
  * rewritten row SET is deterministic regardless.
  *
  * Scope guards (anything else keeps its window):
  *  - exactly one window expression, and it is row_number(), rank() or
  *    dense_rank() with the standard RowFrame
  *    UnboundedPreceding..CurrentRow;
  *  - the filter DIRECTLY above the window bounds rn by a literal:
  *    rn <= N, rn < N, rn = 1 (top-1/dedup idiom), conjuncts in any
  *    order — the TIGHTEST bound becomes the buffer size and the
  *    original filter is re-applied verbatim above the rewrite. A
  *    Project between the filter and the window keeps its window (same
  *    matching scope as InferWindowGroupLimit's filter pattern; pinned
  *    by TopKRewriteSpec's boundary test);
  *  - every ORDER BY key type must be orderable (RowOrdering.isOrderable;
  *    a map-typed KEY keeps its window). Direction and null placement
  *    are handed to the aggregate as SortOrder flags and evaluated by
  *    Spark's own InterpretedOrdering — descending strings/dates/structs
  *    work, and NaN/null/-0.0 placement is bit-identical to the window
  *    sort. Non-key payload columns are never compared, so map-typed
  *    PAYLOAD columns ride along untouched.
  *
  * Shape after rewrite:
  *   Aggregate(p, window_topk(struct(keys...), struct(row), N, mode))
  *   -> explode -> project(payload..., rnk as rn) -> original filter.
  * The aggregate plans as ObjectHashAggregate partial+final, so the
  * pre-shuffle side is already N-bounded per group — the per-group
  * analogue of TakeOrderedAndProject.
  */
object TopKWindowRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val MaxKKey = "spark.graft.topk.rewriteMaxK"

  private def maxK: Option[Int] =
    Option(SQLConf.get.getConfString(MaxKKey, null)).flatMap(s =>
      scala.util.Try(s.toInt).toOption).filter(_ > 0)

  /** The rank-function mode, if `ne` is one of the three top-N window
    * functions over the standard running RowFrame. */
  private def rankMode(ne: NamedExpression): Option[Int] = ne match {
    case Alias(WindowExpression(fn, WindowSpecDefinition(_, _,
        SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _) => fn match {
      case _: RowNumber => Some(WindowTopK.RowNumberMode)
      case _: Rank => Some(WindowTopK.RankMode)
      case _: DenseRank => Some(WindowTopK.DenseRankMode)
      case _ => None
    }
    case _ => None
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

  override def apply(plan: LogicalPlan): LogicalPlan = maxK match {
    case None => plan
    case Some(mk) => plan.transformUp {
      case f @ Filter(cond, Window(Seq(we), partitionSpec, orderSpec, child, _))
          if f.resolved && rankMode(we).isDefined && orderSpec.nonEmpty &&
            partitionSpec.forall(_.deterministic) &&
            orderSpec.forall(so => so.child.deterministic &&
              RowOrdering.isOrderable(so.child.dataType)) =>
        val mode = rankMode(we).get
        val rn = we.toAttribute
        bound(splitConjunctivePredicates(cond), rn) match {
          case Some(n) if n <= mk =>
            val keyStruct = CreateNamedStruct(orderSpec.zipWithIndex.flatMap {
              case (so, i) => Seq(Literal(s"k$i"), so.child)
            })
            val payload = CreateNamedStruct(child.output.zipWithIndex.flatMap {
              case (a, i) => Seq(Literal(s"c$i"), a)
            })
            val tk = Alias(AggregateExpression(
              WindowTopK(keyStruct, payload, n, mode,
                orderSpec.map(_.direction == Descending),
                orderSpec.map(_.nullOrdering == NullsFirst)),
              aggregate.Complete, isDistinct = false), "__graft_tk")()
            val agg = Aggregate(partitionSpec, Seq(tk), child)
            val elemType = tk.dataType.asInstanceOf[ArrayType].elementType
            val elem = AttributeReference("__graft_elem", elemType, nullable = false)()
            val gen = Generate(Explode(tk.toAttribute),
              unrequiredChildIndex = Seq(0), outer = false, qualifier = None,
              generatorOutput = Seq(elem), child = agg)
            val payloadField = GetStructField(elem, 1, Some("payload"))
            val restored = child.output.zipWithIndex.map { case (a, i) =>
              Alias(GetStructField(payloadField, i, Some(s"c$i")), a.name)(exprId = a.exprId)
            }
            val rnOut = Alias(GetStructField(elem, 0, Some("rnk")), rn.name)(exprId = rn.exprId)
            // Window output order is child.output :+ rn; the original
            // filter re-applies verbatim (its rn conjunct is now exact:
            // the aggregate emits true window ranks).
            Filter(cond, Project(restored :+ rnOut, gen))
          case _ => f
        }
    }
  }
}
