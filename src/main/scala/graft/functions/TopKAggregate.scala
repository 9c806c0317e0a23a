package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Bounded-heap top-k aggregate: keeps the k SMALLEST values of `child`
  * (by Spark's interpreted ordering for the child's type) and evaluates to
  * them as an array sorted ascending.
  *
  * This is the scale-path replacement for the
  * `row_number().over(Window.partitionBy(group).orderBy(...))` ranking
  * idiom: a window rank shuffles EVERY candidate row into |groups|
  * partitions and sorts each group in a single task, so a corpus-sized
  * candidate set ranked for a handful of probes serializes on a handful
  * of reducers. As a TypedImperativeAggregate this runs partial+final
  * (ObjectHashAggregate): each map task keeps at most k entries per group,
  * the exchange carries |groups| x k rows total, and the final merge is a
  * k-vs-k heap merge — the per-group analogue of what
  * `TakeOrderedAndProject` does for a global ORDER BY ... LIMIT.
  *
  * Descending sort keys are encoded by negation on the caller side
  * (`topk_min(struct(-score, id), k)` = "top k by score desc, id asc"),
  * or — when EVERY key should reverse — by the `reverse` flag
  * (`topk_max`), which flips the comparator wholesale: works for any
  * orderable type (strings/dates/structs have no negation) and keeps
  * NaN at Spark's greatest-first placement.
  * Ties AT the k-th position are kept by arrival order, so callers must
  * make the ordering total (include a unique id in the struct) for a
  * deterministic result — every call site here does.
  *
  * NaN caveat: negation does NOT reproduce the window contract for NaN
  * scores. Spark's ordering sorts NaN GREATEST, so `ORDER BY score DESC`
  * ranked a NaN first, while `topk_min(struct(-score, ...))` sorts the
  * (still-NaN) negation LAST and drops it once k real scores exist — a
  * zero-norm embedding (cosine 0/0) silently vanishes from the top-k
  * instead of leading it. Callers that can produce NaN and want the old
  * behavior must guard (filter NaN rows, or null the struct so the
  * null-skip path drops them explicitly — see TopKRankSpec's null-key
  * test). The engine's call sites cannot produce NaN (cosine_sim returns
  * 0 for zero-norm inputs), so none guard.
  *
  * The reference has no ranking operator at all (its closest is TOP K
  * frequent-items, SURVEY.md §2 B8); this is part of the ANN/search
  * extension surface.
  */
case class TopKMin(
    child: Expression,
    k: Int,
    reverse: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Any]] with UnaryLike[Expression] {

  require(k > 0, s"topk_min needs k > 0, got $k")

  // max-heap over the kept k (head = current worst), so insert is O(log k).
  // `reverse` flips the comparator wholesale: the aggregate keeps the k
  // LARGEST values and evaluates to a DESCENDING array (`topk_max`) — the
  // comparator-flag alternative to negation encoding, which exists for
  // every orderable type (strings/dates/structs) and keeps NaN exactly
  // where Spark's ordering puts it (greatest → first under topk_max).
  @transient private lazy val ord: Ordering[Any] = {
    val base = TypeUtils.getInterpretedOrdering(child.dataType)
    if (reverse) base.reverse else base
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = if (reverse) "topk_max" else "topk_min"

  override def createAggregationBuffer(): mutable.PriorityQueue[Any] =
    new mutable.PriorityQueue[Any]()(ord)

  private def insert(buf: mutable.PriorityQueue[Any], v: Any): Unit = {
    if (buf.size < k) buf += v
    else if (ord.lt(v, buf.head)) { buf.dequeue(); buf += v }
  }

  override def update(
      buf: mutable.PriorityQueue[Any], input: InternalRow): mutable.PriorityQueue[Any] = {
    val v = child.eval(input)
    // nulls are skipped (matching the "desc nulls drop out of top-k" caller
    // contract); struct children are never null, only their fields can be
    if (v != null) insert(buf, InternalRow.copyValue(v))
    buf
  }

  override def merge(
      a: mutable.PriorityQueue[Any], b: mutable.PriorityQueue[Any]): mutable.PriorityQueue[Any] = {
    b.foreach(insert(a, _))
    a
  }

  override def eval(buf: mutable.PriorityQueue[Any]): Any =
    new GenericArrayData(buf.toArray.sorted(ord))

  @transient private lazy val serProj =
    UnsafeProjection.create(Array[DataType](ArrayType(child.dataType, containsNull = false)))

  override def serialize(buf: mutable.PriorityQueue[Any]): Array[Byte] =
    serProj(InternalRow(new GenericArrayData(buf.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Any] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buf = createAggregationBuffer()
    var i = 0
    while (i < arr.numElements()) {
      insert(buf, InternalRow.copyValue(arr.get(i, child.dataType)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKMin =
    copy(child = newChild)
}
