package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Differential gate for `ss_join_stream` (§2.C stream-stream join):
  * the drained Structured Streaming join must equal the batch join
  * row-for-row, and the replay must actually exercise cross-batch state
  * (matches whose click and view land in different micro-batches).
  */
class StreamJoinDifferentialSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = GraftSession.local(4)

  private def streamed(): Set[(Long, Long, Long)] =
    SparkEntry.queries("ss_join_stream")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def batch(): Set[(Long, Long, Long)] = {
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val c = ev.filter(col("event_id") % 2 === 0).toDF("cid", "cuser", "cus")
    val v = ev.filter(col("event_id") % 2 === 1).toDF("vid", "vuser", "vus")
    c.join(v, col("cuser") === col("vuser") &&
        col("vus") >= col("cus") - lit(21600000000L) &&
        col("vus") <= col("cus"))
      .select(col("cid"), col("vid"), col("cuser"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("streaming join equals batch join across micro-batches") {
    val want = batch()
    val got = streamed()
    assert(want.nonEmpty, "fixture produced no matches — test is vacuous")
    assert(got == want)
  }

  test("slicing is exercised: some matches cross micro-batch boundaries") {
    // Recompute the slice assignment the query uses and assert at least
    // one matched pair spans two slices — i.e. the equality above really
    // certifies retained join state, not just a single-batch join.
    val nSlices = spark.conf.get("spark.graft.ssjoin.slices", "4").toInt
    val rows = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (lo, hi) = (rows.map(_._2).min, rows.map(_._2).max)
    val sliceUs = (hi - lo) / nSlices + 1
    val sliceOf = rows.map { case (id, us) => id -> ((us - lo) / sliceUs) }.toMap
    val crossing = batch().count { case (cid, vid, _) => sliceOf(cid) != sliceOf(vid) }
    assert(crossing > 0, s"no match crosses a slice boundary at nSlices=$nSlices")
  }

  test("slice count does not change the result (state retention differential)") {
    val base = streamed()
    val saved = spark.conf.getOption("spark.graft.ssjoin.slices")
    try {
      spark.conf.set("spark.graft.ssjoin.slices", "1")
      assert(streamed() == base)
      spark.conf.set("spark.graft.ssjoin.slices", "8")
      assert(streamed() == base)
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.graft.ssjoin.slices", v)
        case None    => spark.conf.unset("spark.graft.ssjoin.slices")
      }
    }
  }

  // ---- left-outer variant (ss_join_outer): the eviction machinery ----

  private def streamedOuter(): Set[(Long, Option[Long], Long)] =
    SparkEntry.queries("ss_join_outer")(spark, sfDir)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2))).toSet

  private def batchOuter(): Set[(Long, Option[Long], Long)] = {
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val c = ev.filter(col("event_id") % 2 === 0).toDF("cid", "cuser", "cus")
    val v = ev.filter(col("event_id") % 2 === 1).toDF("vid", "vuser", "vus")
    c.join(v, col("cuser") === col("vuser") &&
        col("vus") >= col("cus") - lit(21600000000L) &&
        col("vus") <= col("cus"), "left_outer")
      .select(col("cid"), col("vid"), col("cuser"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2))).toSet
  }

  test("streaming LEFT OUTER join equals batch left join, null rows included") {
    val want = batchOuter()
    val got = streamedOuter()
    assert(got == want)
  }

  test("outer join actually evicts: unmatched clicks emit null-padded rows") {
    // the null rows can ONLY come from watermark-driven state eviction —
    // if the sentinel/watermark plumbing breaks, the join degrades to
    // inner semantics and this catches it independently of the oracle
    val nulls = streamedOuter().count(_._2.isEmpty)
    assert(nulls > 0, "no null-padded rows drained — eviction never fired")
  }

  // ---- streaming sessionization (ss_sessionize) ----

  private def streamedSessions(): Set[(Long, Long, Long)] =
    SparkEntry.queries("ss_sessionize")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def batchSessions(): Set[(Long, Long, Long)] = {
    // independent batch recomputation (not the oracle SQL): lag-based
    // session ids, strict 6 h gap, same (user, start_us, n_events) shape
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val cum = byUser.rowsBetween(Long.MinValue, 0)
    Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("new_s",
        when(col("us") - lag(col("us"), 1).over(byUser) < 6L * 3600 * 1000000, 0)
          .otherwise(1))
      .withColumn("sid", sum(col("new_s")).over(cum))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("us")).as("session_start_us"), count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start_us"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("streaming dedup equals batch distinct across micro-batches") {
    val got = SparkEntry.queries("ss_dedup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val want = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(want.nonEmpty, "fixture produced no keys — test is vacuous")
    assert(got == want)
  }

  test("dedup suppression crosses micro-batch boundaries") {
    // at least one dedup key must occur in two different slices, so the
    // equality above certifies cross-batch suppression state, not just
    // per-batch dropDuplicates
    val nSlices = spark.conf.get("spark.graft.ssjoin.slices", "4").toInt
    val rows = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => ((r.getLong(0), r.getString(1), r.getString(2)), r.getLong(3)))
    val (lo, hi) = (rows.map(_._2).min, rows.map(_._2).max)
    val sliceUs = (hi - lo) / nSlices + 1
    val slicesPerKey = rows.groupBy(_._1).view
      .mapValues(_.map(v => (v._2 - lo) / sliceUs).distinct.size)
    assert(slicesPerKey.values.exists(_ > 1),
      s"no dedup key spans two slices at nSlices=$nSlices")
  }

  test("streaming window agg equals batch day-bucket agg, with cross-batch windows") {
    val got = SparkEntry.queries("ss_window_agg")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val want = Tables.load(spark, sfDir, "events")
      .groupBy(unix_micros(date_trunc("day", col("ts"))).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("user_id")).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(want.nonEmpty, "fixture produced no windows — test is vacuous")
    assert(got == want)
    // the equality only certifies cross-batch window state if some
    // window's events span two micro-batch slices
    val nSlices = spark.conf.get("spark.graft.ssjoin.slices", "4").toInt
    val rows = Tables.load(spark, sfDir, "events")
      .select(unix_micros(date_trunc("day", col("ts"))).as("w"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (lo, hi) = (rows.map(_._2).min, rows.map(_._2).max)
    val sliceUs = (hi - lo) / nSlices + 1
    val spanning = rows.groupBy(_._1).view
      .mapValues(_.map(v => (v._2 - lo) / sliceUs).distinct.size)
    assert(spanning.values.exists(_ > 1),
      s"no window spans two slices at nSlices=$nSlices")
  }

  test("streaming sessionization equals batch sessionization") {
    val want = batchSessions()
    val got = streamedSessions()
    assert(want.size > 100, s"fixture yields only ${want.size} sessions — differential too weak")
    assert(got == want)
  }

  test("sessions cross micro-batch boundaries: cross-batch session-state merge is exercised") {
    val nSlices = spark.conf.get("spark.graft.ssjoin.slices", "4").toInt
    val rows = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (lo, hi) = (rows.map(_._2).min, rows.map(_._2).max)
    val sliceUs = (hi - lo) / nSlices + 1
    // a session whose start and (start + span) land in different slices
    // must have merged state across batches
    val spanning = batchSessions().count { case (uid, start, n) =>
      n > 1 && {
        val members = rows.filter(r => r._1 == uid && r._2 >= start)
          .map(_._2).sorted.take(n.toInt)
        (start - lo) / sliceUs != (members.last - lo) / sliceUs
      }
    }
    assert(spanning > 0, "no session spans a micro-batch boundary — differential too weak")
  }

  test("ss_topk heap state survives a checkpointed stop/restart") {
    // the A9 property for the streaming bounded heap: kill the query
    // mid-stream, restart from the checkpoint, feed the rest — the
    // restored TypedImperativeAggregate buffers must merge the second
    // half as if the query never stopped (snapshot == the batch rank
    // over ALL rows). This is the recovery contract a production
    // leaderboard relies on; without state restore the first half's
    // docs would vanish from the heap.
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.functions.topk_min
    val rows = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val (first, second) = rows.splitAt(rows.length / 2)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ss_topk_ckpt").toString
    val sink = "ss_topk_restart_sink"
    spark.catalog.dropTempView(sink)
    val feed = MemoryStream[(Long, String, Long)]
    def start() = feed.toDF().toDF("doc_id", "source", "n_chars")
      .groupBy(col("source"))
      .agg(topk_min(struct((-col("n_chars")).as("nq"), col("doc_id").as("doc_id"),
        col("n_chars").as("n_chars")), 5).as("tk"))
      .select(col("source"), posexplode(col("tk")).as(Seq("pos", "st")))
      .select(col("source"), (col("pos") + 1).as("rnk"),
        col("st.doc_id").as("doc_id"), col("st.n_chars").as("n_chars"))
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()
    val q1 = start()
    try { feed.addData(first.toSeq); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    def asTuple(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getAs[Number](1).longValue, r.getAs[Number](2).longValue,
        r.getAs[Number](3).longValue)
    val got =
      try {
        feed.addData(second.toSeq); q2.processAllAvailable()
        spark.table(sink).collect().map(asTuple).toSet
      } finally q2.stop()
    val want = SparkEntry.queries("samp_group_cap")(spark, sfDir).collect()
      .map(asTuple).toSet
    assert(want.nonEmpty)
    assert(got == want,
      s"restored heap snapshot diverged from the batch rank: got ${got.size}, want ${want.size}")
  }
}
