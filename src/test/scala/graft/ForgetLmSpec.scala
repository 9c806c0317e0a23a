package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the round-13 continuation's enforcement and model-maintenance
  * twins: `ss_forget_enforce` (live right-to-be-forgotten — per-user O(1)
  * GroupState of the first deletion request) and `ss_lm_maintain` (the
  * bigram-LM count stores folded incrementally, scored with
  * tx_lm_surprisal's shared helper). The value-level gate on the driver
  * fixtures is the DuckDB oracle; these pin the cross-batch suppression
  * semantics, intra-batch disorder handling, and slice/model-maintenance
  * invariance. */
class ForgetLmSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = GraftSession.local(4)

  private def withSlices[A](n: String)(body: => A): A = {
    val saved = spark.conf.getOption("spark.graft.ssjoin.slices")
    spark.conf.set("spark.graft.ssjoin.slices", n)
    try body
    finally saved match {
      case Some(v) => spark.conf.set("spark.graft.ssjoin.slices", v)
      case None => spark.conf.unset("spark.graft.ssjoin.slices")
    }
  }

  private def eventsDir(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graftforget").toString
    val s = spark
    import s.implicits._
    rows.zipWithIndex.map { case ((uid, tpe, ts), i) =>
      (i.toLong, java.sql.Timestamp.valueOf(ts), uid, tpe, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("forget enforcement: suppression crosses micro-batch boundaries; slices never matter") {
    // user 1 opts out (error) at t2: their t1 event survives, the request
    // itself and everything after it is suppressed — including events
    // arriving many batches later. user 2 never opts out.
    val dir = eventsDir(Seq(
      (1L, "click", "2024-05-01 10:00:00"),     // id 0: kept
      (2L, "view", "2024-05-01 11:00:00"),      // id 1: kept
      (1L, "error", "2024-05-02 09:00:00"),     // id 2: the request — suppressed
      (1L, "click", "2024-05-03 09:00:00"),     // id 3: suppressed
      (2L, "click", "2024-05-03 10:00:00"),     // id 4: kept
      (1L, "purchase", "2024-05-04 09:00:00"))) // id 5: suppressed
    Seq("1", "6").foreach { n =>
      val kept = withSlices(n) {
        SparkEntry.queries("ss_forget_enforce")(spark, dir).collect()
          .map(_.getLong(0)).toSeq
      }
      assert(kept == Seq(0L, 1L, 4L), s"retained ids at $n slices: $kept")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("forget fold: intra-batch disorder cannot leak a post-request event") {
    // one batch, deliberately unsorted: the request (t=20) arrives FIRST
    // in arrival order but t=10 precedes it in event time — the fold
    // sorts by (ts, id), so t=10 is kept and t=30 suppressed
    val s = spark
    import s.implicits._
    val rows = Seq(
      (7L, 20L, 102L, "error", true),
      (7L, 10L, 101L, "click", false),
      (7L, 30L, 103L, "click", false))
    val kept = graft.streaming.StatefulOps.forgetEnforce(rows.toDS())
      .collect().map(_.event_id).toSeq
    assert(kept == Seq(101L), s"retained: $kept")
  }

  test("forget fold: a same-timestamp event with a smaller id than the request survives") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (7L, 20L, 100L, "click", false), // same ts, id < request id: kept
      (7L, 20L, 102L, "error", true),
      (7L, 20L, 103L, "click", false)) // same ts, id > request id: suppressed
    val kept = graft.streaming.StatefulOps.forgetEnforce(rows.toDS())
      .collect().map(_.event_id).toSeq
    assert(kept == Seq(100L), s"retained: $kept")
  }

  test("forget enforcement equals the batch predicate on the driver fixture") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
    val first = ev.filter(col("event_type") === "error")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))))
      .filter(col("rn") === 1)
      .select(col("user_id").as("fu"), col("ts").as("fts"), col("event_id").as("fid"))
    val expected = ev.join(first, col("user_id") === col("fu"), "left")
      .filter(col("fts").isNull || col("ts") < col("fts") ||
        (col("ts") === col("fts") && col("event_id") < col("fid")))
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy(col("event_id")).collect().toSeq
    val streamed = SparkEntry.queries("ss_forget_enforce")(spark, sfDir)
      .collect().toSeq
    assert(streamed == expected,
      s"sizes ${streamed.size} vs ${expected.size}")
  }

  test("bm25 maintenance: the appended postings index serves the batch ranking; slices never matter") {
    val batch = SparkEntry.queries("srch_bm25")(spark, sfDir).collect().toSeq
    Seq("1", "5").foreach { n =>
      val served = withSlices(n) {
        SparkEntry.queries("ss_bm25_maintain")(spark, sfDir).collect().toSeq
      }
      assert(served == batch, s"ss_bm25_maintain != srch_bm25 at $n slices")
    }
  }

  test("lm maintenance: the folded model scores identically to the batch model; slices never matter") {
    val batch = SparkEntry.queries("tx_lm_surprisal")(spark, sfDir).collect().toSeq
    Seq("1", "5").foreach { n =>
      val maintained = withSlices(n) {
        SparkEntry.queries("ss_lm_maintain")(spark, sfDir).collect().toSeq
      }
      assert(maintained == batch, s"ss_lm_maintain != tx_lm_surprisal at $n slices")
    }
  }
}
