package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row}

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
    * nulls-first, binary-ASCII string order — the same total order the
    * replaced `orderBy(col(k)*)` produced on the fixture's types. */
  implicit class HarnessFeedOps(private val df: DataFrame) extends AnyVal {
    def harnessFeed(keys: String*): Array[Row] =
      if (keys.isEmpty) HarnessFeed.collectOrdered(df)
      else HarnessFeed.collectDriverSorted(df, keys)
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
              case (p: String, q: String) => p.compareTo(q)
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

  /** Collect `df` in replay order, capped at `spark.graft.harness.
    * maxFeedRows` (default 2M — comfortably above the sf0.1 fixtures,
    * far below driver memory). */
  def collectOrdered(df: DataFrame, order: Column*): Array[Row] = {
    // ScaleCheck sets the cap to DefaultMaxRows * k, which can exceed
    // Int.MaxValue at large k — parse as Long and clamp (limit takes Int;
    // a >2G-row driver collect would OOM long before the clamp matters).
    val cap = df.sparkSession.conf.getOption(MaxRowsKey)
      .map(v => math.min(v.toLong, Int.MaxValue.toLong - 1).toInt)
      .getOrElse(DefaultMaxRows)
    val ordered = if (order.isEmpty) df else df.orderBy(order: _*)
    val rows = ordered.limit(cap + 1).collect()
    require(rows.length <= cap,
      s"harness feed exceeds $cap rows — the MemoryStream replay is a test " +
        s"harness, not a production ingest; raise $MaxRowsKey only for a " +
        "deliberately larger differential run")
    rows
  }
}
