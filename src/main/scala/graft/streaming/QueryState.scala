package graft.streaming

import scala.collection.mutable

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Union}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

import graft.bql.Ast._
import graft.bql.Compiler

/** Per-query incremental state — the Spark-native replacement for the
  * reference's `Querier(Mode.PARTITION)` / `combine()` / `Mode.ALL` split
  * (`/root/reference/src/main/scala/com/yahoo/bullet/spark/FilterStreaming.scala:108`,
  * `JoinStreaming.scala:126`).
  *
  * Division of labor at scale: executors crunch each micro-batch down to a
  * bounded partial (Catalyst partial+final aggregation, sketch binaries ≤
  * a few hundred KB, group maps capped at `maxGroups`); the driver merges
  * only those partials. Per-query driver state is O(sketch), never O(data)
  * — exactly Bullet's memory contract (SURVEY.md §6).
  */
sealed trait QueryState {
  /** Consume one micro-batch (already filtered to this query's predicate).
    * Returns the number of records consumed (for RECORD windows). */
  def update(batch: DataFrame): Long
  /** Current result records. */
  def present(spark: SparkSession): Seq[Row]
  /** Reset for a new window (`WINDOW` include type). */
  def reset(): Unit
  /** RAW completion: collected enough records to finish the query. */
  def isDone: Boolean = false
  /** Serialize incremental state for checkpointing (A9). */
  def snapshot(): Array[Byte]
  /** Restore from a [[snapshot]] taken by the same query shape. */
  def restore(bytes: Array[Byte]): Unit
}

private[streaming] object SerUtil {
  def write(v: Any): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(v)
    oos.close()
    bos.toByteArray
  }
  def read[T](b: Array[Byte]): T = {
    val ois = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(b))
    try ois.readObject().asInstanceOf[T] finally ois.close()
  }
}

/** States whose per-batch partial is a fixed set of global aggregate
  * columns. The engine fuses every such query into ONE Spark job per
  * micro-batch (each query's filter becomes a `when(pred, …)` conditional
  * inside its aggregate columns), so concurrent-query cost is one shared
  * scan + n cheap aggregate columns instead of n jobs — the scalability
  * property that lets thousands of queries ride one 100 TB stream. */
trait GlobalCombinable {
  /** Aggregate columns for this query over the UNFILTERED batch; the
    * query's own predicate must be folded into each column. The last
    * column must be the consumed-record count. */
  def partialAggCols(pred: Option[Column]): Seq[Column]
  /** Merge one combined-row slice [start, start+width); returns consumed
    * record count. */
  def mergeCombined(row: Row, start: Int): Long
  def partialWidth: Int
}

/** Keyed variant: queries sharing identical GROUP BY key expressions ride
  * one groupBy job per batch (GroupState with keys, TopKState). */
trait KeyedCombinable extends GlobalCombinable {
  def keySignature: String
  def keyColumns: Seq[Column]
  /** Merge combined groupBy rows; slice columns at [start, start+width),
    * keys at [0, nKeys). Returns consumed record count. */
  def mergeCombinedKeyed(rows: Seq[Row], nKeys: Int, start: Int): Long
  /** True iff merging `n` arbitrary new groups cannot lose information
    * regardless of row order — the engine's fused fast path may then feed
    * this state an UNORDERED collect. A capped map near its cap must say
    * no (insertion order would decide the survivors). */
  def canAbsorbUnordered(n: Int): Boolean
  /** This state's own solo-path per-batch candidate cap — the fused
    * over-cap slice must take exactly this many rows so the fused
    * candidate set matches the solo path's. */
  def batchCandidateCap: Int
}

object QueryState {
  /** Bullet defaults: RAW max 100 records, aggregations capped at 500
    * groups (bullet-core 1.5.2 defaults, SURVEY.md §6). */
  val DefaultRawMax = 100
  val MaxGroups = 500

  def forQuery(q: Query, conf: String => Option[String] = _ => None): QueryState = q.agg match {
    // RAW with a tumbling RECORD window is the reference's "reactive"
    // query (`FilterStreamingTest.scala:241-275`): it emits a window per N
    // records — each window carrying exactly those records — and never
    // completes on the RAW max (duration ends it). All other RAW queries
    // buffer to the limit and COMPLETE there.
    case RawAll =>
      val reactive = q.window.collect {
        case WindowSpec(every, RecordUnit, false) => every.toInt
      }
      new RawState(q, q.limit.getOrElse(DefaultRawMax), reactive)
    case g: GroupAgg => new GroupState(q, g)
    // per-query sketch knobs via BQL SET, falling back to session conf
    // (same precedence as the batch compiler: per-query SET > session
    // conf > default — the streaming default of KLL k=2048 trades
    // accuracy for checkpoint size; a query that wants the batch path's
    // 65535 asks for it in its own text or the session sets it)
    case cd: CountDistinctAgg =>
      new ThetaState(cd, Compiler.intSetting(q, conf, Compiler.ThetaLgkKey, 12, 4, 26))
    case tk: TopKAgg => new TopKState(tk)
    case qa: QuantileAgg => new KllState(qa.field, KllPresent.Quantiles(
      if (qa.probs.nonEmpty) qa.probs else Seq(0.25, 0.5, 0.75), qa.name),
      Compiler.intSetting(q, conf, Compiler.KllKKey, 2048, 8, 65535))
    case pa: PmfAgg => new KllState(pa.field, KllPresent.Distribution(
      pa.points, pa.cdf, pa.name, pa.linearN),
      Compiler.intSetting(q, conf, Compiler.KllKKey, 2048, 8, 65535))
  }
}

/** RAW (B4): collect up to `limit` projected records; done at limit.
  *
  * With `windowEvery` set (reactive RECORD window), the buffer is drained
  * in window-sized chunks by the engine instead of completing at the
  * limit; the per-batch collect is then capped at a safety multiple of the
  * window size so one hot batch cannot flood the driver (records beyond
  * the cap are dropped for that batch — bounded-state backpressure). */
final class RawState(q: Query, limit: Int, windowEvery: Option[Int] = None) extends QueryState {
  private val buf = mutable.ArrayBuffer.empty[Row]

  def isReactive: Boolean = windowEvery.isDefined
  def buffered: Int = buf.size

  /** How many more records this state will accept right now — the fused
    * RAW pass truncates each query's share of the shared scan here. */
  def remainingBudget: Int = windowEvery match {
    case Some(n) => math.max(n * 64, 1024) - buf.size
    case None => limit - buf.size
  }

  override def update(batch: DataFrame): Long = {
    val projected = Compiler.rawProjection(q, batch)
    val take = remainingBudget
    val got = if (take > 0) projected.limit(take).collect() else Array.empty[Row]
    buf ++= got
    got.length.toLong
  }

  /** Fused path: append already-projected rows from the shared RAW job
    * (the engine has truncated them to [[remainingBudget]]). Returns the
    * consumed count. */
  def offer(rows: Seq[Row]): Long = {
    val take = math.min(remainingBudget, rows.size)
    buf ++= rows.take(take)
    take.toLong
  }

  /** Remove and return the first `n` buffered records (reactive windows). */
  def drainWindow(n: Int): Seq[Row] = {
    val chunk = buf.take(n).toSeq
    buf.remove(0, chunk.size)
    chunk
  }

  override def present(spark: SparkSession): Seq[Row] = buf.toSeq
  override def reset(): Unit = buf.clear()
  override def isDone: Boolean = windowEvery.isEmpty && buf.size >= limit
  override def snapshot(): Array[Byte] = SerUtil.write(buf.toList)
  override def restore(bytes: Array[Byte]): Unit = {
    buf.clear(); buf ++= SerUtil.read[List[Row]](bytes)
  }
}

/** GROUP BY / GROUP ALL (B5): capped hash map of group → partial values,
  * merged from per-batch Catalyst partial aggregates. Keyless (GROUP ALL)
  * instances are [[GlobalCombinable]]. */
final class GroupState(q: Query, g: GroupAgg) extends QueryState with KeyedCombinable {
  // partial schema: one column per key, then per-op partial columns
  private val keyNames = g.keys.zipWithIndex.map { case (s, i) =>
    s.alias.orElse(s.expr match { case FieldRef(p) => Some(p); case _ => None })
      .getOrElse(s"expr_$i")
  }
  private val groups = mutable.LinkedHashMap.empty[Seq[Any], Array[Any]]
  private var partialSchema: StructType = _

  private def partialCols: Seq[Column] = partialColsWith(None)

  /** Partial columns with the query predicate folded in (for the fused
    * multi-query job the predicate cannot be a DataFrame filter). */
  private def partialColsWith(pred: Option[Column]): Seq[Column] = {
    def w(c: Column): Column = pred.map(p => when(p, c)).getOrElse(c)
    g.ops.flatMap { op =>
      val c = op.arg.map(Compiler.column)
      op.fn match {
        case "COUNT" => Seq(count(w(c.getOrElse(lit(1)))).as(op.name))
        case "SUM" => Seq(sum(w(c.get)).as(op.name))
        case "MIN" => Seq(min(w(c.get)).as(op.name))
        case "MAX" => Seq(max(w(c.get)).as(op.name))
        case "AVG" => Seq(sum(w(c.get)).as(s"__sum_${op.name}"), count(w(c.get)).as(s"__cnt_${op.name}"))
        case other => throw new IllegalArgumentException(s"bad agg $other")
      }
    }
  }

  /** Value-column names in partial order (after the keys). */
  private def valueNames: Seq[String] = g.ops.flatMap { op =>
    if (op.fn == "AVG") Seq(s"__sum_${op.name}", s"__cnt_${op.name}") else Seq(op.name)
  }

  /** Merge one partial group row into the capped map. */
  private def mergeGroup(key: Seq[Any], values: IndexedSeq[Any]): Unit =
    groups.get(key) match {
      case Some(acc) =>
        var i = 0
        g.ops.foreach { op =>
          val width = if (op.fn == "AVG") 2 else 1
          (0 until width).foreach { w =>
            val fn = if (op.fn == "AVG") (if (w == 0) "SUM" else "COUNT") else op.fn
            acc(i) = mergeValue(fn, acc(i), values(i))
            i += 1
          }
        }
      case None =>
        if (groups.size < QueryState.MaxGroups)
          groups(key) = values.toArray
      // over cap: group dropped (Bullet drops over-cardinality groups)
    }

  private def mergeValue(fn: String, a: Any, b: Any): Any =
    if (a == null) b
    else if (b == null) a
    else fn match {
      case "SUM" | "COUNT" => (a, b) match {
        case (x: Long, y: Long) => x + y
        case (x: Double, y: Double) => x + y
        case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.add(y)
        case (x: Number, y: Number) => x.doubleValue() + y.doubleValue()
      }
      case "MIN" => cmpMin(a, b)
      case "MAX" => cmpMax(a, b)
    }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: Int, y: Int) => Integer.compare(x, y)
    case (x: String, y: String) => x.compareTo(y)
    case (x: java.sql.Timestamp, y: java.sql.Timestamp) => x.compareTo(y)
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y)
    case (x: Number, y: Number) => java.lang.Double.compare(x.doubleValue(), y.doubleValue())
    case _ => a.toString.compareTo(b.toString)
  }
  private def cmpMin(a: Any, b: Any): Any = if (cmp(a, b) <= 0) a else b
  private def cmpMax(a: Any, b: Any): Any = if (cmp(a, b) >= 0) a else b

  override def update(batch: DataFrame): Long = {
    val keyCols = g.keys.zipWithIndex.map { case (s, i) =>
      Compiler.column(s.expr).as(keyNames(i))
    }
    val pcs = partialCols :+ count(lit(1)).as("__n")
    val partial =
      if (keyCols.isEmpty) batch.agg(pcs.head, pcs.tail: _*)
      else batch.groupBy(keyCols: _*).agg(pcs.head, pcs.tail: _*)
    // over-cap batches keep their LARGEST groups (TakeOrdered — a
    // deterministic choice, vs an arbitrary limit()), mirroring Bullet's
    // drop-over-cardinality behavior with a sane survivor set; the group
    // key breaks count ties so the cut line itself is deterministic (Spark
    // sort is not stable across partitions)
    val rows =
      if (keyNames.isEmpty) partial.collect()
      else partial.orderBy(col("__n").desc +: keyNames.map(col): _*)
        .limit(QueryState.MaxGroups * 4).collect()
    if (partialSchema == null) partialSchema = partial.schema
    var n = 0L
    val nKeys = keyNames.size
    val nVals = partialSchema.size - nKeys - 1
    rows.foreach { r =>
      val key = (0 until nKeys).map(r.get)
      n += r.getLong(partialSchema.size - 1)
      mergeGroup(key, (0 until nVals).map(i => r.get(nKeys + i)))
    }
    n
  }

  // ---- GlobalCombinable (GROUP ALL; keyed fusion shares the same cols) ----
  def isGlobal: Boolean = g.keys.isEmpty
  override def partialWidth: Int = valueNames.size + 1
  override def partialAggCols(pred: Option[Column]): Seq[Column] =
    partialColsWith(pred) :+
      count(pred.map(p => when(p, lit(1))).getOrElse(lit(1))).as("__n")
  override def mergeCombined(row: Row, start: Int): Long = {
    val nVals = valueNames.size
    if (partialSchema == null)
      partialSchema = StructType(
        valueNames.zipWithIndex.map { case (nm, i) =>
          row.schema.fields(start + i).copy(name = nm)
        } :+ StructField("__n", LongType))
    mergeGroup(Seq.empty, (0 until nVals).map(i => row.get(start + i)))
    row.getLong(start + nVals)
  }

  // ---- keyed fusion: queries sharing the same GROUP BY key expressions
  // ride one groupBy job; a group a query's filter never matched has
  // __n == 0 for that query and is skipped (not a real group of it).
  // The signature is the COMPILED key column's canonical SQL (plus the
  // output name, since fuseKeyed names the shared key columns after one
  // member), so `GROUP BY event_type` and `TOP K(.., event_type)` land in
  // the same fusion group instead of stringifying different AST shapes.
  override def keySignature: String = g.keys.zipWithIndex.map { case (s, i) =>
    s"${keyNames(i)}=${ColumnBridge.expression(Compiler.column(s.expr)).sql}"
  }.mkString("|")
  override def keyColumns: Seq[Column] = g.keys.zipWithIndex.map { case (s, i) =>
    Compiler.column(s.expr).as(keyNames(i))
  }
  // new groups only insert while under the cap, so unordered merges are
  // safe exactly when every probe group could be a new insertion
  override def canAbsorbUnordered(n: Int): Boolean =
    groups.size + n <= QueryState.MaxGroups
  override def batchCandidateCap: Int = QueryState.MaxGroups * 4
  override def mergeCombinedKeyed(rows: Seq[Row], nKeys: Int, start: Int): Long = {
    val nVals = valueNames.size
    var n = 0L
    rows.foreach { r =>
      if (partialSchema == null)
        partialSchema = StructType(
          keyNames.zipWithIndex.map { case (nm, i) => r.schema.fields(i).copy(name = nm) } ++
            valueNames.zipWithIndex.map { case (nm, i) =>
              r.schema.fields(start + i).copy(name = nm)
            } :+ StructField("__n", LongType))
      val cnt = r.getLong(start + nVals)
      if (cnt > 0) {
        mergeGroup((0 until nKeys).map(r.get), (0 until nVals).map(i => r.get(start + i)))
        n += cnt
      }
    }
    n
  }

  override def present(spark: SparkSession): Seq[Row] = {
    if (partialSchema == null) return Seq.empty
    // finalize AVG = sum/count, drop partial helper columns; run the
    // post-agg chain (HAVING/ORDER BY/LIMIT/CULL) through Catalyst on the
    // tiny result set so semantics match the batch path exactly.
    val rows = groups.map { case (k, acc) =>
      Row.fromSeq(k ++ acc.toSeq)
    }.toSeq
    val base = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(partialSchema.fields.dropRight(1)))
    var df: DataFrame = base
    val finalCols =
      keyNames.map(col) ++ g.ops.map { op =>
        if (op.fn == "AVG")
          (col(s"__sum_${op.name}").cast(DoubleType) / col(s"__cnt_${op.name}")).as(op.name)
        else col(op.name)
      }
    df = df.select(finalCols: _*)
    Compiler.postAgg(q, df).collect().toSeq
  }

  override def reset(): Unit = groups.clear()
  override def snapshot(): Array[Byte] =
    SerUtil.write((groups.toList.map { case (k, v) => (k.toList, v.toList) }, partialSchema))
  override def restore(bytes: Array[Byte]): Unit = {
    val (gs, schema) = SerUtil.read[(List[(List[Any], List[Any])], StructType)](bytes)
    groups.clear()
    gs.foreach { case (k, v) => groups(k) = v.toArray }
    partialSchema = schema
  }
}

/** COUNT DISTINCT (B6): per-batch Theta sketch binaries from the
  * executors, merged on the driver with the DataSketches union. */
final class ThetaState(cd: CountDistinctAgg, lgk: Int = 12)
    extends QueryState with GlobalCombinable {
  private def newUnion(): Union =
    SetOperation.builder().setLogNominalEntries(lgk).buildUnion()
  private var union: Union = newUnion()

  override def update(batch: DataFrame): Long = {
    val cs = partialAggCols(None)
    mergeCombined(batch.agg(cs.head, cs.tail: _*).head(), 0)
  }

  override def partialWidth: Int = 2
  override def partialAggCols(pred: Option[Column]): Seq[Column] = {
    val key = expr(Compiler.compositeKey(cd.fields))
    val k = pred.map(p => when(p, key)).getOrElse(key)
    Seq(call_function("theta_sketch_agg", k, lit(lgk)).as("sk"),
      count(pred.map(p => when(p, lit(1))).getOrElse(lit(1))).as("__n"))
  }
  override def mergeCombined(row: Row, start: Int): Long = {
    Option(row.get(start)).foreach(b =>
      union.union(Memory.wrap(b.asInstanceOf[Array[Byte]])))
    row.getLong(start + 1)
  }

  override def present(spark: SparkSession): Seq[Row] = {
    val est = Math.round(union.getResult.getEstimate)
    Seq(new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      Array(est), StructType(Seq(StructField(cd.name, LongType)))))
  }

  override def reset(): Unit = union = newUnion()
  override def snapshot(): Array[Byte] = union.getResult.toByteArray
  override def restore(bytes: Array[Byte]): Unit = {
    union = newUnion()
    if (bytes.nonEmpty) union.union(Memory.wrap(bytes))
  }
}

/** TOP K (B8): per-batch grouped counts (top candidates only leave the
  * executors), merged into a capped driver map — the same
  * bounded-state/approximate-tail contract as Bullet's FrequentItems
  * sketch. */
final class TopKState(tk: TopKAgg) extends QueryState with KeyedCombinable {
  private val counts = mutable.HashMap.empty[Seq[Any], Long]
  private var keySchema: StructType = _
  /** candidates kept per batch: generous multiple of k bounds the error */
  private val candidatesPerBatch = math.max(tk.k * 16, 1024)

  override def update(batch: DataFrame): Long = {
    val partial = batch.groupBy(tk.fields.map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc +: tk.fields.map(col): _*)
      .limit(candidatesPerBatch)
    val rows = partial.collect()
    if (keySchema == null) keySchema = StructType(partial.schema.dropRight(1))
    var n = 0L
    rows.foreach { r =>
      val key = (0 until tk.fields.size).map(r.get)
      val c = r.getLong(tk.fields.size)
      n += c
      counts(key) = counts.getOrElse(key, 0L) + c
    }
    n
  }

  override def present(spark: SparkSession): Seq[Row] = {
    if (keySchema == null) return Seq.empty
    val schema = StructType(keySchema.fields :+ StructField(tk.countName, LongType))
    counts.toSeq
      .sortBy { case (k, c) => (-c, k.map(_.toString).mkString("|")) }
      .take(tk.k)
      .map { case (k, c) =>
        new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
          (k :+ c).toArray, schema)
      }
  }

  override def reset(): Unit = { counts.clear() }

  // ---- keyed fusion: TOP K shares a groupBy job with same-key GROUP BYs
  // (same name=canonical-sql signature form as GroupState).
  override def keySignature: String =
    tk.fields.map(f => s"$f=${ColumnBridge.expression(col(f)).sql}").mkString("|")
  override def keyColumns: Seq[Column] = tk.fields.map(col)
  // the counts map is uncapped and += is commutative: order never matters
  override def canAbsorbUnordered(n: Int): Boolean = true
  override def batchCandidateCap: Int = candidatesPerBatch
  override def partialWidth: Int = 2
  override def partialAggCols(pred: Option[Column]): Seq[Column] = {
    val one = pred.map(p => when(p, lit(1))).getOrElse(lit(1))
    Seq(count(one).as("__c"), count(one).as("__n"))
  }
  override def mergeCombined(row: Row, start: Int): Long =
    throw new UnsupportedOperationException("TopK is keyed-combinable only")
  override def mergeCombinedKeyed(rows: Seq[Row], nKeys: Int, start: Int): Long = {
    var n = 0L
    rows.foreach { r =>
      if (keySchema == null)
        keySchema = StructType((0 until nKeys).map(i => r.schema.fields(i)))
      val c = r.getLong(start)
      if (c > 0) {
        val key = (0 until nKeys).map(r.get)
        counts(key) = counts.getOrElse(key, 0L) + c
        n += c
      }
    }
    n
  }

  override def snapshot(): Array[Byte] =
    SerUtil.write((counts.toList.map { case (k, v) => (k.toList, v) }, keySchema))
  override def restore(bytes: Array[Byte]): Unit = {
    val (cs, schema) = SerUtil.read[(List[(List[Any], Long)], StructType)](bytes)
    counts.clear()
    cs.foreach { case (k, v) => counts(k) = v }
    keySchema = schema
  }
}

/** What a KLL-backed query presents: quantile values, or a PMF/CDF over
  * split points. */
sealed trait KllPresent
object KllPresent {
  final case class Quantiles(probs: Seq[Double], name: String) extends KllPresent
  /** `linearN = Some(n)` generates the n split points from the sketch's
    * own min/max at present time (bullet-core's LINEAR point form). */
  final case class Distribution(points: Seq[Double], cdf: Boolean, name: String,
      linearN: Option[Int] = None) extends KllPresent
}

/** DISTRIBUTION (B7, all three forms: QUANTILE/PMF/CDF): per-batch KLL
  * sketch binaries merged on the driver. */
final class KllState(field: String, presentAs: KllPresent, k: Int = 2048)
    extends QueryState with GlobalCombinable {
  private var sketch: KllDoublesSketch = KllDoublesSketch.newHeapInstance(k)

  override def update(batch: DataFrame): Long = {
    val cs = partialAggCols(None)
    mergeCombined(batch.agg(cs.head, cs.tail: _*).head(), 0)
  }

  override def partialWidth: Int = 2
  override def partialAggCols(pred: Option[Column]): Seq[Column] = {
    val v = pred.map(p => when(p, col(field))).getOrElse(col(field))
    Seq(call_function("kll_sketch_agg_double", v, lit(k)).as("sk"),
      count(v).as("__n"))
  }
  override def mergeCombined(row: Row, start: Int): Long = {
    Option(row.get(start)).foreach { b =>
      sketch.merge(KllDoublesSketch.heapify(Memory.wrap(b.asInstanceOf[Array[Byte]])))
    }
    row.getLong(start + 1)
  }

  override def present(spark: SparkSession): Seq[Row] = {
    if (sketch.isEmpty) return Seq.empty
    def row(schema: StructType, vs: Any*) =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(vs.toArray, schema)
    presentAs match {
      case KllPresent.Quantiles(probs, name) =>
        val schema = StructType(Seq(
          StructField("quantile", DoubleType), StructField(name, DoubleType)))
        probs.map(p => row(schema, p, sketch.getQuantile(p)))
      case KllPresent.Distribution(points0, isCdf, name, linearN) =>
        val points = linearN match {
          case Some(np) =>
            // the generated-domain form: n points evenly spaced between
            // the sketch's exact min/max (KLL tracks both exactly)
            val lo = sketch.getMinItem
            val hi = sketch.getMaxItem
            (0 until np).map(i => lo + (hi - lo) * (i.toDouble / (np - 1)))
          case None => points0
        }
        val n = sketch.getN
        if (isCdf) {
          // estimated count of values <= point (matches the batch path's
          // count(v <= p) up to sketch error)
          val schema = StructType(Seq(
            StructField("point", DoubleType), StructField(name, LongType)))
          val cdf = sketch.getCDF(points.toArray)
          points.zipWithIndex.map { case (p, i) =>
            row(schema, p, Math.round(cdf(i) * n))
          }
        } else {
          val schema = StructType(Seq(
            StructField("bin", IntegerType), StructField(name, LongType)))
          val pmf = sketch.getPMF(points.toArray)
          pmf.zipWithIndex.map { case (mass, i) =>
            row(schema, i, Math.round(mass * n))
          }.toSeq
        }
    }
  }

  override def reset(): Unit = { sketch = KllDoublesSketch.newHeapInstance(k) }
  override def snapshot(): Array[Byte] = sketch.toByteArray
  override def restore(bytes: Array[Byte]): Unit = {
    sketch = if (bytes.isEmpty) KllDoublesSketch.newHeapInstance(k)
    else KllDoublesSketch.heapify(Memory.wrap(bytes))
  }
}
