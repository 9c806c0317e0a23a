package graft.streaming

import scala.collection.mutable

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Union}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
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
}

object QueryState {
  /** Bullet defaults: RAW max 100 records, aggregations capped at 500
    * groups (bullet-core 1.5.2 defaults, SURVEY.md §6). */
  val DefaultRawMax = 100
  val MaxGroups = 500

  def forQuery(q: Query): QueryState = q.agg match {
    case RawAll => new RawState(q, q.limit.getOrElse(DefaultRawMax))
    case g: GroupAgg => new GroupState(q, g)
    case cd: CountDistinctAgg => new ThetaState(cd)
    case tk: TopKAgg => new TopKState(tk)
    case qa: QuantileAgg => new KllState(qa)
  }
}

/** RAW (B4): collect up to `limit` projected records; done at limit. */
final class RawState(q: Query, limit: Int) extends QueryState {
  private val buf = mutable.ArrayBuffer.empty[Row]

  override def update(batch: DataFrame): Long = {
    val projected = q.agg match {
      case RawAll if q.select.nonEmpty =>
        batch.select(q.select.zipWithIndex.map { case (s, i) =>
          val c = Compiler.column(s.expr)
          s.alias.orElse(s.expr match { case FieldRef(p) => Some(p); case _ => None })
            .map(c.as).getOrElse(c.as(s"expr_$i"))
        }: _*)
      case _ => batch
    }
    val take = limit - buf.size
    val got = if (take > 0) projected.limit(take).collect() else Array.empty[Row]
    buf ++= got
    got.length.toLong
  }

  override def present(spark: SparkSession): Seq[Row] = buf.toSeq
  override def reset(): Unit = buf.clear()
  override def isDone: Boolean = buf.size >= limit
}

/** GROUP BY / GROUP ALL (B5): capped hash map of group → partial values,
  * merged from per-batch Catalyst partial aggregates. */
final class GroupState(q: Query, g: GroupAgg) extends QueryState {
  // partial schema: one column per key, then per-op partial columns
  private val keyNames = g.keys.zipWithIndex.map { case (s, i) =>
    s.alias.orElse(s.expr match { case FieldRef(p) => Some(p); case _ => None })
      .getOrElse(s"expr_$i")
  }
  private val groups = mutable.LinkedHashMap.empty[Seq[Any], Array[Any]]
  private var partialSchema: StructType = _

  private def partialCols: Seq[Column] = g.ops.flatMap { op =>
    val c = op.arg.map(Compiler.column)
    op.fn match {
      case "COUNT" => Seq(c.map(count).getOrElse(count(lit(1))).as(op.name))
      case "SUM" => Seq(sum(c.get).as(op.name))
      case "MIN" => Seq(min(c.get).as(op.name))
      case "MAX" => Seq(max(c.get).as(op.name))
      case "AVG" => Seq(sum(c.get).as(s"__sum_${op.name}"), count(c.get).as(s"__cnt_${op.name}"))
      case other => throw new IllegalArgumentException(s"bad agg $other")
    }
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
    val rows = partial.limit(QueryState.MaxGroups * 4).collect()
    if (partialSchema == null) partialSchema = partial.schema
    var n = 0L
    val nKeys = keyNames.size
    val nVals = partialSchema.size - nKeys - 1
    rows.foreach { r =>
      val key = (0 until nKeys).map(r.get)
      n += r.getLong(partialSchema.size - 1)
      groups.get(key) match {
        case Some(acc) =>
          var i = 0
          var opIdx = 0
          g.ops.foreach { op =>
            val width = if (op.fn == "AVG") 2 else 1
            (0 until width).foreach { w =>
              val fn = if (op.fn == "AVG") (if (w == 0) "SUM" else "COUNT") else op.fn
              acc(i) = mergeValue(fn, acc(i), r.get(nKeys + i))
              i += 1
            }
            opIdx += 1
          }
        case None =>
          if (groups.size < QueryState.MaxGroups) {
            val acc = new Array[Any](nVals)
            (0 until nVals).foreach(i => acc(i) = r.get(nKeys + i))
            groups(key) = acc
          } // over cap: group dropped (Bullet drops over-cardinality groups)
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
    q.having.foreach(h => df = df.filter(Compiler.column(h)))
    if (q.orderBy.nonEmpty)
      df = df.orderBy(q.orderBy.map(o =>
        if (o.desc) Compiler.column(o.expr).desc else Compiler.column(o.expr).asc): _*)
    if (q.culling.nonEmpty) df = df.drop(q.culling: _*)
    q.limit.foreach(n => df = df.limit(n))
    df.collect().toSeq
  }

  override def reset(): Unit = groups.clear()
}

/** COUNT DISTINCT (B6): per-batch Theta sketch binaries from the
  * executors, merged on the driver with the DataSketches union. */
final class ThetaState(cd: CountDistinctAgg) extends QueryState {
  private var union: Union = SetOperation.builder().buildUnion()

  override def update(batch: DataFrame): Long = {
    val r = batch.agg(
      expr(s"theta_sketch_agg(${Compiler.compositeKey(cd.fields)})").as("sk"),
      count(lit(1)).as("__n")).head()
    Option(r.get(0)).foreach(b => union.union(Memory.wrap(r.getAs[Array[Byte]](0))))
    r.getLong(1)
  }

  override def present(spark: SparkSession): Seq[Row] = {
    val est = Math.round(union.getResult.getEstimate)
    Seq(new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      Array(est), StructType(Seq(StructField(cd.name, LongType)))))
  }

  override def reset(): Unit = union = SetOperation.builder().buildUnion()
}

/** TOP K (B8): per-batch grouped counts (top candidates only leave the
  * executors), merged into a capped driver map — the same
  * bounded-state/approximate-tail contract as Bullet's FrequentItems
  * sketch. */
final class TopKState(tk: TopKAgg) extends QueryState {
  private val counts = mutable.HashMap.empty[Seq[Any], Long]
  private var keySchema: StructType = _
  /** candidates kept per batch: generous multiple of k bounds the error */
  private val candidatesPerBatch = math.max(tk.k * 16, 1024)

  override def update(batch: DataFrame): Long = {
    val partial = batch.groupBy(tk.fields.map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc)
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
}

/** DISTRIBUTION/QUANTILE (B7): per-batch KLL sketch binaries merged on the
  * driver. */
final class KllState(qa: QuantileAgg) extends QueryState {
  private var sketch: KllDoublesSketch = KllDoublesSketch.newHeapInstance(2048)
  private val probs = if (qa.probs.nonEmpty) qa.probs else Seq(0.25, 0.5, 0.75)

  override def update(batch: DataFrame): Long = {
    val r = batch.agg(
      expr(s"kll_sketch_agg_double(${qa.field}, 2048)").as("sk"),
      count(col(qa.field)).as("__n")).head()
    Option(r.get(0)).foreach { _ =>
      sketch.merge(KllDoublesSketch.heapify(Memory.wrap(r.getAs[Array[Byte]](0))))
    }
    r.getLong(1)
  }

  override def present(spark: SparkSession): Seq[Row] = {
    val schema = StructType(Seq(
      StructField("quantile", DoubleType), StructField(qa.name, DoubleType)))
    if (sketch.isEmpty) Seq.empty
    else probs.map { p =>
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array(p, sketch.getQuantile(p)), schema)
    }
  }

  override def reset(): Unit = { sketch = KllDoublesSketch.newHeapInstance(2048) }
}
