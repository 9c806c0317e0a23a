package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.types._

/** TEST HARNESS, NOT INGEST. The `ss_*` differential queries replay a
  * fixture through `MemoryStream` to prove drained-streaming ≡ batch
  * against one oracle; the replay necessarily collects the fixture to
  * the driver because `MemoryStream.addData` is a driver-side API. On a
  * real deployment the SAME streaming plan reads a distributed source
  * (Kafka/files) and nothing is ever collected — only the feeder is
  * driver-bounded, never the operator.
  *
  * Every feeder goes through [[collectOrdered]], which enforces an
  * explicit row cap so this pattern can never silently become an
  * unbounded driver ingest if a future fixture grows: past the cap it
  * FAILS with instructions, it does not truncate (a truncated replay
  * would diff against a full-fixture oracle and mislead). */
object HarnessFeed {

  /** Raise only for a deliberately larger differential run. */
  val MaxRowsKey = "spark.graft.harness.maxFeedRows"
  val DefaultMaxRows = 2000000

  /** `df.harnessFeed(keys*)` — the capped driver collect every `ss_*`
    * feeder goes through (replaces bare `.collect()` at the feed sites so
    * the cap is structural, not convention).
    *
    * With `keys`, the replay order is produced by a DRIVER-SIDE sort of
    * the collected rows instead of a Spark `orderBy`: the feeder already
    * collects every row to the driver (that is what a MemoryStream replay
    * is), so the cluster-side global sort bought nothing but a range-
    * sampling pass plus a full shuffle of the fixture per `ss_*` query —
    * profiled at 1.5-2.5 s each across ~25 queries. Ascending,
    * nulls-first, UTF-8-binary string order — the same total order the
    * replaced `orderBy(col(k)*)` produced on the fixture's types. */
  implicit class HarnessFeedOps(private val df: DataFrame) extends AnyVal {
    def harnessFeed(keys: String*): Array[Row] =
      if (keys.isEmpty) HarnessFeed.collectOrdered(df)
      else HarnessFeed.collectDriverSorted(df, keys)
  }

  /** Spark's string `orderBy` compares UTF8String BYTES (UTF-8 binary =
    * code-point order); Java's `String.compareTo` compares UTF-16 code
    * units, which diverges for supplementary-plane text (surrogate units
    * 0xD800-0xDFFF sort BELOW 0xE000-0xFFFF although they encode code
    * points ≥ 0x10000). This is the standard allocation-free fix-up (the
    * Hadoop `Text` trick): at the first differing unit, remap the
    * 0xD800-0xFFFF region so surrogates land above the BMP tail, giving
    * exact code-point order for all well-formed strings. */
  private def compareUtf8(a: String, b: String): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c1 = a.charAt(i)
      val c2 = b.charAt(i)
      if (c1 != c2) {
        if (c1 >= 0xD800 && c2 >= 0xD800) {
          val f1 = if (c1 < 0xE000) c1 + 0x2000 else c1 - 0x800
          val f2 = if (c2 < 0xE000) c2 + 0x2000 else c2 - 0x800
          return f1 - f2
        }
        return c1 - c2
      }
      i += 1
    }
    a.length - b.length
  }

  /** Capped unsorted collect + driver timsort on the named key columns.
    * Supports the fixture key types; anything else fails fast (use the
    * Spark-side orderBy path for exotic keys). */
  def collectDriverSorted(df: DataFrame, keys: Seq[String]): Array[Row] = {
    val rows = collectOrdered(df)
    val schema = df.schema
    val idx = keys.map(schema.fieldIndex).toArray
    val cmp = new java.util.Comparator[Row] {
      override def compare(a: Row, b: Row): Int = {
        var k = 0
        while (k < idx.length) {
          val i = idx(k)
          val (x, y) = (a.get(i), b.get(i))
          val c =
            if (x == null && y == null) 0
            else if (x == null) -1 // asc nulls first, Spark's default
            else if (y == null) 1
            else (x, y) match {
              case (p: java.lang.Long, q: java.lang.Long) => java.lang.Long.compare(p, q)
              case (p: java.lang.Integer, q: java.lang.Integer) => Integer.compare(p, q)
              case (p: java.lang.Double, q: java.lang.Double) => java.lang.Double.compare(p, q)
              case (p: String, q: String) => compareUtf8(p, q)
              case (p: java.sql.Timestamp, q: java.sql.Timestamp) => p.compareTo(q)
              case (p: java.sql.Date, q: java.sql.Date) => p.compareTo(q)
              case other => throw new IllegalArgumentException(
                s"harnessFeed driver sort: unsupported key type ${other._1.getClass}")
            }
          if (c != 0) return c
          k += 1
        }
        0
      }
    }
    // stable merge sort across the driver's cores — parallelSort and
    // sort are both stable, so with the same comparator the output
    // permutation is identical; only the wall time changes (~0.2-0.3 s
    // per 600 k-row feed, paid by every keyed ss_* feeder)
    java.util.Arrays.parallelSort(rows, cmp)
    rows
  }

  /** A replay feed kept in Spark's internal row format end to end:
    * `rows` are the fed columns as (copied, driver-owned) [[UnsafeRow]]s
    * in replay order, `schema` their struct type (for the binary-layout
    * compatibility check at append time). */
  final case class RawFeedRows(rows: Array[UnsafeRow], schema: StructType) {
    def length: Int = rows.length
  }

  /** [[collectDriverSorted]] without ever leaving UnsafeRow form: the
    * feeder's old chain was executeCollect → external Row decode → driver
    * sort → per-site Row→tuple map → tuple→UnsafeRow re-encode
    * (GraftParallelFeed) — three driver passes that deserialize and then
    * re-serialize the exact bytes the scan already produced. This path
    * sorts the collected InternalRows directly (UTF8String.compareTo IS
    * Spark's binary string order; longs/ints/doubles compare as
    * primitives) and, when `feedCols` narrows the frame (sort-only key
    * columns that are not fed), applies one driver-side UnsafeProjection
    * instead of the decode/re-encode round trip. Same plan, same collect
    * order, same stable sort ⇒ the replay permutation is identical to the
    * Row path's (RawFeedSpec pins drain equality; the oracle pins the 30
    * `ss_*` end results). */
  def collectRawSorted(df: DataFrame, keys: Seq[String],
      feedCols: Seq[String] = Nil): RawFeedRows = {
    val cap = maxRows(df)
    val limited = df.limit(cap + 1)
    val schema = limited.schema
    val collected = limited.queryExecution.executedPlan.executeCollect()
    require(collected.length <= cap,
      s"harness feed exceeds $cap rows — the MemoryStream replay is a test " +
        s"harness, not a production ingest; raise $MaxRowsKey only for a " +
        "deliberately larger differential run")
    // executeCollect returns driver-owned UnsafeRow copies for row-based
    // plans; anything else is defensively re-projected once
    val toUnsafe = UnsafeProjection.create(schema)
    val rows: Array[UnsafeRow] = collected.map {
      case u: UnsafeRow => u
      case r => toUnsafe(r).copy()
    }
    if (keys.nonEmpty)
      java.util.Arrays.parallelSort(rows, internalComparator(schema, keys))
    if (feedCols.isEmpty || feedCols == schema.fieldNames.toSeq)
      RawFeedRows(rows, schema)
    else {
      val idx = feedCols.map(schema.fieldIndex)
      val proj = UnsafeProjection.create(idx.map(i =>
        BoundReference(i, schema(i).dataType, schema(i).nullable)))
      RawFeedRows(rows.map(r => proj(r).copy()),
        StructType(idx.map(schema(_))))
    }
  }

  /** Spark-order comparator over InternalRows for the fixture key types
    * (asc, nulls first — the `orderBy(col(k)*)` default). */
  private def internalComparator(schema: StructType, keys: Seq[String])
      : java.util.Comparator[UnsafeRow] = {
    val ks = keys.map { k =>
      val i = schema.fieldIndex(k)
      (i, schema(i).dataType)
    }.toArray
    new java.util.Comparator[UnsafeRow] {
      override def compare(a: UnsafeRow, b: UnsafeRow): Int = {
        var j = 0
        while (j < ks.length) {
          val (i, dt) = ks(j)
          val (an, bn) = (a.isNullAt(i), b.isNullAt(i))
          val c =
            if (an && bn) 0
            else if (an) -1
            else if (bn) 1
            else dt match {
              case LongType | TimestampType | TimestampNTZType =>
                java.lang.Long.compare(a.getLong(i), b.getLong(i))
              case IntegerType | DateType =>
                Integer.compare(a.getInt(i), b.getInt(i))
              case DoubleType =>
                java.lang.Double.compare(a.getDouble(i), b.getDouble(i))
              case StringType => a.getUTF8String(i).compareTo(b.getUTF8String(i))
              case BooleanType =>
                java.lang.Boolean.compare(a.getBoolean(i), b.getBoolean(i))
              case other => throw new IllegalArgumentException(
                s"harnessFeed raw sort: unsupported key type $other")
            }
          if (c != 0) return c
          j += 1
        }
        0
      }
    }
  }

  /** ScaleCheck sets the cap to DefaultMaxRows * k, which can exceed
    * Int.MaxValue at large k — parse as Long and clamp (limit takes Int;
    * a >2G-row driver collect would OOM long before the clamp matters). */
  private def maxRows(df: DataFrame): Int =
    df.sparkSession.conf.getOption(MaxRowsKey)
      .map(v => math.min(v.toLong, Int.MaxValue.toLong - 1).toInt)
      .getOrElse(DefaultMaxRows)

  /** Collect `df` in replay order, capped at `spark.graft.harness.
    * maxFeedRows` (default 2M — comfortably above the sf0.1 fixtures,
    * far below driver memory). */
  def collectOrdered(df: DataFrame, order: Column*): Array[Row] = {
    val cap = maxRows(df)
    val ordered = if (order.isEmpty) df else df.orderBy(order: _*)
    val rows = ordered.limit(cap + 1).collect()
    require(rows.length <= cap,
      s"harness feed exceeds $cap rows — the MemoryStream replay is a test " +
        s"harness, not a production ingest; raise $MaxRowsKey only for a " +
        "deliberately larger differential run")
    rows
  }
}
