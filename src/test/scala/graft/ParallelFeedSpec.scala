package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.execution.streaming.runtime.GraftParallelFeed.FastFeedOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GraftParallelFeed (the driver-parallel MemoryStream.addData twin) must
  * be drain-equivalent to the stock serial path: same rows, same number of
  * micro-batches (one offset per call), under a mixed-type tuple encoder
  * with null strings — the shapes the `ss_*` feeders actually replay. */
class ParallelFeedSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession.local(4)

  private def drain(rows: Seq[(Long, String, Double)], fast: Boolean)
      : (Seq[(Long, String, Double, Long)], Long) = {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Double)]
    val withBatch = mem.toDF().toDF("k", "s", "v")
      .groupBy(col("k"), col("s")).agg(sum(col("v")).as("sv"),
        count(lit(1)).as("n"))
    val sink = s"pf_${if (fast) "fast" else "slow"}_${System.nanoTime()}"
    val q = withBatch.writeStream.format("memory").queryName(sink)
      .outputMode("complete").start()
    var batches = 0L
    try {
      rows.grouped(math.max(1, rows.size / 3)).foreach { slice =>
        if (fast) mem.addFast(slice.toSeq) else mem.addData(slice.toSeq)
        q.processAllAvailable()
        batches += 1
      }
      val out = spark.table(sink)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
        .sortBy(t => (t._1, Option(t._2).getOrElse("")))
        .toSeq
      (out, q.lastProgress.batchId)
    } finally q.stop()
  }

  test("addFast drains to the same rows and batch count as addData") {
    // force the pool path: > 2 * MinRowsForPool rows
    val n = 80000
    val rows = (0 until n).map { i =>
      (i.toLong % 97,
        if (i % 13 == 0) null else s"s${i % 31}",
        i * 0.5)
    }
    val (slow, slowBatch) = drain(rows, fast = false)
    val (fastR, fastBatch) = drain(rows, fast = true)
    assert(fastR == slow, "parallel feed drained different rows")
    assert(fastBatch == slowBatch,
      s"parallel feed changed the micro-batch count: $fastBatch vs $slowBatch")
  }

  test("addFast falls back to addData for small slices and conf off") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Double)]
    mem.addFast(Seq((1L, "a", 1.0))) // small: serial path, must not throw
    spark.conf.set("spark.graft.harness.parfeed", "false")
    try mem.addFast((0 until 100000).map(i => (i.toLong, "x", 0.0)))
    finally spark.conf.set("spark.graft.harness.parfeed", "true")
    val q = mem.toDF().writeStream.format("memory")
      .queryName("pf_fallback").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("pf_fallback").count() == 100001L)
    } finally q.stop()
  }
}
