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

  /** `df.harnessFeed()` — the capped driver collect every `ss_*` feeder
    * goes through (replaces bare `.collect()` at the feed sites so the
    * cap is structural, not convention). */
  implicit class HarnessFeedOps(private val df: DataFrame) extends AnyVal {
    def harnessFeed(): Array[Row] = HarnessFeed.collectOrdered(df)
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
