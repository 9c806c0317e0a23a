package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.execution.streaming.runtime.GraftParallelFeed.FastFeedOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.HarnessFeed

/** The raw (UnsafeRow end-to-end) replay feed must be replay-equivalent to
  * the Row-decode + tuple-re-encode path it replaces: identical row
  * PERMUTATION out of the driver sort (same plan, same collect order, both
  * sorts stable with the same total order) and identical drained rows +
  * micro-batch count when appended via GraftParallelFeed.addRaw. */
class RawFeedSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession.local(4)

  private def fixture = {
    import spark.implicits._
    // mixed types, null strings, duplicate sort keys (stability matters),
    // plus a sort-only column the feed projection drops
    (0 until 50000).map { i =>
      (i.toLong % 1000,
        if (i % 13 == 0) null else s"s${i % 31}",
        (i % 7) * 0.5,
        (i * 2654435761L) % 100)
    }.toDF("k", "s", "v", "sortonly")
  }

  test("raw collect+sort+project yields the Row path's exact permutation") {
    val df = fixture
    val rowPath = HarnessFeed.collectDriverSorted(df, Seq("sortonly", "k"))
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq
    val raw = HarnessFeed.collectRawSorted(df,
      keys = Seq("sortonly", "k"), feedCols = Seq("k", "s", "v"))
    val rawPath = raw.rows.map { r =>
      (r.getLong(0),
        if (r.isNullAt(1)) null else r.getUTF8String(1).toString,
        r.getDouble(2))
    }.toSeq
    assert(raw.schema.fieldNames.toSeq == Seq("k", "s", "v"))
    assert(rawPath == rowPath,
      "raw feed permutation diverged from the Row-path driver sort")
  }

  test("addRaw drains to the same rows and batch count as addFast") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val df = fixture

    def drain(useRaw: Boolean): (Seq[(Long, String, Double, Long)], Long) = {
      val mem = MemoryStream[(Long, String, Double)]
      val agg = mem.toDF().toDF("k", "s", "v")
        .groupBy(col("k"), col("s")).agg(sum(col("v")).as("sv"),
          count(lit(1)).as("n"))
      val sink = s"rf_${if (useRaw) "raw" else "tup"}_${System.nanoTime()}"
      val q = agg.writeStream.format("memory").queryName(sink)
        .outputMode("complete").start()
      try {
        if (useRaw) {
          val raw = HarnessFeed.collectRawSorted(df,
            keys = Seq("sortonly", "k"), feedCols = Seq("k", "s", "v"))
          raw.rows.grouped(raw.length / 3 + 1).foreach { slice =>
            mem.addRaw(slice, raw.schema)
            q.processAllAvailable()
          }
        } else {
          val rows = HarnessFeed.collectDriverSorted(df, Seq("sortonly", "k"))
            .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
          rows.grouped(rows.length / 3 + 1).foreach { slice =>
            mem.addFast(slice.toSeq)
            q.processAllAvailable()
          }
        }
        val out = spark.table(sink).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
          .sortBy(t => (t._1, Option(t._2).getOrElse("")))
          .toSeq
        (out, q.lastProgress.batchId)
      } finally q.stop()
    }

    val (tup, tupBatches) = drain(useRaw = false)
    val (rawR, rawBatches) = drain(useRaw = true)
    assert(rawR == tup, "raw feed drained different rows")
    assert(rawBatches == tupBatches,
      s"raw feed changed the micro-batch count: $rawBatches vs $tupBatches")
  }

  test("addRaw rejects layout-incompatible schemas") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val raw = HarnessFeed.collectRawSorted(fixture,
      keys = Seq("k"), feedCols = Seq("k", "s", "v"))
    intercept[IllegalArgumentException] {
      mem.addRaw(raw.rows.take(10), raw.schema)
    }
  }
}
