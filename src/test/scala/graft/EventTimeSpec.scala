package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventTime

/** Event-time windows + watermark (the §2.C extension): tumbling windows
  * close when the watermark passes, late data beyond the watermark is
  * dropped — asserted end-to-end through Structured Streaming. */
class EventTimeSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession.local(4)

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("tumbling event-time window emits on watermark pass; late data dropped") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val agg = EventTime.tumbling(
      mem.toDF().toDF("ts", "v"), "ts", "10 minutes", "5 minutes",
      keys = Seq.empty, aggs = Seq(count(lit(1)).as("cnt"), sum(col("v")).as("sv")))
    val q = agg.writeStream.format("memory").queryName("evt_tumble")
      .outputMode("append").start()
    try {
      // window [10:00,10:10): two rows; then advance event time far enough
      // that the watermark (max - 5min) passes 10:10 → window closes
      mem.addData((ts(1), 1L), (ts(5), 2L))
      q.processAllAvailable()
      mem.addData((ts(20), 10L)) // watermark -> 10:15, closes [10:00,10:10)
      q.processAllAvailable()
      // late arrival for the closed window: must be dropped
      mem.addData((ts(2), 100L))
      q.processAllAvailable()
      mem.addData((ts(40), 1L)) // close [10:20,10:30) too
      q.processAllAvailable()
      val rows = spark.table("evt_tumble")
        .select(col("window.start").cast("string"), col("cnt"), col("sv"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows.contains(("2026-01-01 10:00:00", 2L, 3L)),
        s"first window must contain only the 2 on-time rows, got $rows")
      assert(!rows.exists(_._3 == 103L), "late row leaked into a closed window")
    } finally q.stop()
  }

  test("event-time session window groups by gap") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val agg = EventTime.sessions(
      mem.toDF().toDF("ts", "u"), "ts", "5 minutes", "1 minute",
      keys = Seq(col("u")), aggs = Seq(count(lit(1)).as("cnt")))
    val q = agg.writeStream.format("memory").queryName("evt_sess")
      .outputMode("complete").start()
    try {
      // user 1: events at 10:01,10:03 (one session), 10:30 (another)
      mem.addData((ts(1), 1L), (ts(3), 1L), (ts(30), 1L))
      q.processAllAvailable()
      val rows = spark.table("evt_sess").select("u", "cnt")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(rows == Seq((1L, 1L), (1L, 2L)), s"got $rows")
    } finally q.stop()
  }
}
