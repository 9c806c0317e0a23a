package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending,
  Expression, InterpretedOrdering, NullsFirst, NullsLast, RowOrdering, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Buffer for [[WindowTopK]]: surviving rows grouped by sort key, in sort
  * order, plus the total row count. The TreeMap is ordered by the
  * aggregate's SortOrder-derived comparator, so "max group" = the group
  * that ranks LAST under the window's own ordering. */
final class WindowTopKBuffer(ord: Ordering[InternalRow]) {
  val groups = new java.util.TreeMap[InternalRow, mutable.ArrayBuffer[Any]](ord)
  var totalRows: Int = 0
}

object WindowTopK {
  /** Rank-function modes — which rows survive and what rank they get. */
  val RowNumberMode = 0
  val RankMode = 1
  val DenseRankMode = 2
}

/** Tie-aware bounded top-N buffer for the window top-N rewrite
  * (plans/TopKWindowRewrite.scala): keeps exactly the rows whose
  * row_number()/rank()/dense_rank() under (key, directions, null orders)
  * is <= k, and evaluates to array<struct(rnk int, payload)> — the rank
  * each surviving row would have received from WindowExec, plus the full
  * original row.
  *
  * Unlike [[TopKMin]] (the caller-facing heap, which orders by the whole
  * element and encodes descending keys by negation), this aggregate
  * separates KEY from PAYLOAD and orders with Spark's own
  * InterpretedOrdering over per-field SortOrders. That buys exactly the
  * generality the rewrite needs:
  *  - ties are defined by the SORT KEY alone (rank semantics), never by
  *    payload bytes, and the payload may be any type — maps included;
  *  - descending works for EVERY orderable type (strings, dates,
  *    structs) — no order-reversing encode, so no BitwiseNot/negation;
  *  - NaN, null placement, -0.0 and collation follow the window sort's
  *    ordering bit-for-bit, because it IS the same ordering code.
  *
  * Memory: row_number keeps exactly min(k, rows) rows per group. rank
  * keeps < k rows strictly below the boundary key plus ALL ties at the
  * boundary; dense_rank keeps the first k distinct keys with all their
  * ties — both match what the rank semantics force ANY evaluator to
  * return, and WindowGroupLimit's rank path has the same bound. The
  * admission fast path is one compare against the current boundary key,
  * so a stream of losing rows costs O(log #groups) each; #groups never
  * exceeds k+1.
  *
  * Plans as ObjectHashAggregate partial+final: each map task's exchange
  * contribution is its own surviving rows only — the per-group analogue
  * of TakeOrderedAndProject, with no map-side sort at all.
  */
case class WindowTopK(
    key: Expression,
    payload: Expression,
    k: Int,
    mode: Int,
    desc: Seq[Boolean],
    nullsFirst: Seq[Boolean],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[WindowTopKBuffer] with BinaryLike[Expression] {

  import WindowTopK._

  require(k > 0, s"window_topk needs k > 0, got $k")
  require(mode >= RowNumberMode && mode <= DenseRankMode, s"unknown mode $mode")

  override def left: Expression = key
  override def right: Expression = payload

  private def keyFields: Array[StructField] =
    key.dataType.asInstanceOf[StructType].fields

  override def checkInputDataTypes(): TypeCheckResult = key.dataType match {
    case s: StructType if s.length == desc.size && desc.size == nullsFirst.size =>
      if (RowOrdering.isOrderable(s)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"window_topk key fields must be orderable, got ${s.simpleString}")
    case other => TypeCheckResult.TypeCheckFailure(
      s"window_topk key must be a struct with one field per sort direction, got $other")
  }

  /** The window's own ordering, reconstructed over the key struct's
    * fields — InterpretedOrdering is the code WindowExec's sort uses, so
    * direction, null placement, NaN and collation agree by construction. */
  @transient private lazy val ordering: Ordering[InternalRow] = {
    val sos = keyFields.zipWithIndex.map { case (f, i) =>
      SortOrder(BoundReference(i, f.dataType, f.nullable),
        if (desc(i)) Descending else Ascending,
        if (nullsFirst(i)) NullsFirst else NullsLast, Seq.empty)
    }
    new InterpretedOrdering(sos.toIndexedSeq)
  }

  override def dataType: DataType = ArrayType(new StructType()
    .add("rnk", IntegerType, nullable = false)
    .add("payload", payload.dataType, nullable = false), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "window_topk"

  override def createAggregationBuffer(): WindowTopKBuffer = new WindowTopKBuffer(ordering)

  /** Admit/evict one row. `kRow`/`pv` may be reused backing memory — they
    * are copied if and only if stored. `pv` is BY-NAME: the losing path
    * (almost every row once buffers fill) never evaluates or copies the
    * payload struct at all — only the key is touched. */
  private def insert(buf: WindowTopKBuffer, kRow: InternalRow, pv: => Any): Unit = {
    val g = buf.groups
    val existing = g.get(kRow)
    if (existing != null) {
      // tie with a SURVIVING key group
      if (mode == RowNumberMode && buf.totalRows >= k &&
          ordering.compare(kRow, g.lastKey) >= 0) {
        // full buffer, tie at the boundary: keeping the incumbent is a
        // legal row_number tie-break (row_number over a non-total order
        // is nondeterministic; total orders never hit this branch)
      } else {
        existing += InternalRow.copyValue(pv)
        buf.totalRows += 1
        evict(buf)
      }
    } else {
      val admit = mode match {
        case RowNumberMode => buf.totalRows < k || ordering.compare(kRow, g.lastKey) < 0
        case DenseRankMode => g.size < k || ordering.compare(kRow, g.lastKey) < 0
        case RankMode =>
          if (g.isEmpty) true
          else if (ordering.compare(kRow, g.lastKey) > 0) buf.totalRows < k
          else {
            // rows in strictly-smaller groups; O(#groups <= k+1), and only
            // on the rare new-key-below-boundary path
            var below = 0
            val it = g.headMap(kRow, false).values().iterator()
            while (it.hasNext) below += it.next().size
            below < k
          }
      }
      if (admit) {
        g.put(kRow.copy(), mutable.ArrayBuffer(InternalRow.copyValue(pv)))
        buf.totalRows += 1
        evict(buf)
      }
    }
  }

  /** Restore the mode's invariant by trimming from the boundary (last)
    * group: row_number caps TOTAL ROWS at k; rank drops whole groups
    * whose rank exceeds k; dense_rank caps DISTINCT KEYS at k. */
  private def evict(buf: WindowTopKBuffer): Unit = {
    val g = buf.groups
    mode match {
      case RowNumberMode =>
        while (buf.totalRows > k) {
          val last = g.lastEntry()
          val rows = last.getValue
          rows.remove(rows.size - 1)
          if (rows.isEmpty) g.remove(last.getKey)
          buf.totalRows -= 1
        }
      case RankMode =>
        while (g.size > 1 && buf.totalRows - g.lastEntry().getValue.size >= k) {
          buf.totalRows -= g.lastEntry().getValue.size
          g.remove(g.lastKey)
        }
      case DenseRankMode =>
        while (g.size > k) {
          buf.totalRows -= g.lastEntry().getValue.size
          g.remove(g.lastKey)
        }
    }
  }

  override def update(buf: WindowTopKBuffer, input: InternalRow): WindowTopKBuffer = {
    val kRow = key.eval(input).asInstanceOf[InternalRow]
    // a null key struct cannot occur from the rewrite (CreateNamedStruct
    // is non-null); skip defensively rather than crash. payload.eval
    // only runs if the row is admitted (by-name argument).
    if (kRow != null) insert(buf, kRow, payload.eval(input))
    buf
  }

  override def merge(a: WindowTopKBuffer, b: WindowTopKBuffer): WindowTopKBuffer = {
    val it = b.groups.entrySet().iterator()
    while (it.hasNext) {
      val en = it.next()
      en.getValue.foreach(p => insert(a, en.getKey, p))
    }
    a
  }

  override def eval(buf: WindowTopKBuffer): Any = {
    val out = new Array[Any](buf.totalRows)
    var i = 0; var rowsBefore = 0; var groupIdx = 0
    val it = buf.groups.entrySet().iterator()
    while (it.hasNext) {
      val en = it.next()
      val groupRank = mode match {
        case DenseRankMode => groupIdx + 1
        case _ => rowsBefore + 1
      }
      en.getValue.foreach { p =>
        val rnk = if (mode == RowNumberMode) i + 1 else groupRank
        out(i) = InternalRow(rnk, p)
        i += 1
      }
      rowsBefore += en.getValue.size
      groupIdx += 1
    }
    new GenericArrayData(out)
  }

  @transient private lazy val serElemType = new StructType()
    .add("k", key.dataType, nullable = false)
    .add("p", payload.dataType, nullable = false)
  @transient private lazy val serProj =
    UnsafeProjection.create(Array[DataType](ArrayType(serElemType, containsNull = false)))

  override def serialize(buf: WindowTopKBuffer): Array[Byte] = {
    val rows = new Array[Any](buf.totalRows)
    var i = 0
    val it = buf.groups.entrySet().iterator()
    while (it.hasNext) {
      val en = it.next()
      en.getValue.foreach { p => rows(i) = InternalRow(en.getKey, p); i += 1 }
    }
    serProj(InternalRow(new GenericArrayData(rows))).getBytes
  }

  override def deserialize(bytes: Array[Byte]): WindowTopKBuffer = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buf = createAggregationBuffer()
    var i = 0
    while (i < arr.numElements()) {
      val elem = arr.getStruct(i, 2)
      insert(buf,
        elem.get(0, key.dataType).asInstanceOf[InternalRow],
        elem.get(1, payload.dataType))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): WindowTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): WindowTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WindowTopK =
    copy(key = newLeft, payload = newRight)
}
