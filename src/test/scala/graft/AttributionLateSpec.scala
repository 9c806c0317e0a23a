package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StatefulOps

/** Late-arrival semantics of the attribution twins — the one place a
  * streaming correctness contract is feed-order-conditional, so both
  * sides are pinned:
  *
  *  - [[StatefulOps.attributionLive]] credits AT ARRIVAL and is exact
  *    only for per-user event-time-ordered feeds: a purchase processed
  *    before a touch that event-time-precedes it lands on `(none)`.
  *    That divergence IS the contract — asserted here on a crafted
  *    purchase-before-touch cross-batch feed.
  *  - [[StatefulOps.attributionBuffered]] holds each purchase until the
  *    watermark passes it, so the SAME disordered feed produces the
  *    batch op_attribution algebra exactly — the graduation for feeds
  *    without an ordering guarantee (`spark.graft.attribution
  *    .latenessSec` switches the ss_attribution harness onto it).
  */
class AttributionLateSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = GraftSession.local(4)

  private val Hour = 3600L * 1000000L

  /** Replay `slices` through the chosen fold, drain, return
    * (touch_type, conv_id, credit) rows sorted. `bufferedLateness`
    * None → attributionLive, Some(s) → attributionBuffered + sentinel
    * drain. */
  private def drain(slices: Seq[Seq[(Long, Long, Long, String, Long)]],
      bufferedLateness: Option[String]): Seq[(String, Long, Long)] = {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val feed = MemoryStream[(Long, Long, Long, String, Long)]
    val credits = bufferedLateness match {
      case Some(l) => StatefulOps.attributionBuffered(feed.toDS(), l)
      case None => StatefulOps.attributionLive(feed.toDS())
    }
    val sink = s"attr_late_sink_${System.nanoTime()}"
    val q = credits.toDF().writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      slices.foreach { sl => feed.addData(sl); q.processAllAvailable() }
      if (bufferedLateness.isDefined) {
        val maxUs = slices.flatten.map(_._2).max
        val far = maxUs + 8L * 24 * Hour
        Seq(far, far + 1000000L).foreach { usv =>
          feed.addData((0L, usv, Long.MaxValue, "noop", 0L))
          q.processAllAvailable()
        }
      }
    } finally q.stop()
    s.table(sink).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
  }

  // user 1: click(eid 1) then view(eid 2) then a 10.00 purchase(eid 3),
  // all within 2h — but the purchase is FED FIRST, one batch ahead of
  // its touches; user 2: an untouched 5.00 purchase (eid 4).
  private val t0 = 1700000000L * 1000000L
  private val disordered = Seq(
    Seq((1L, t0 + 2 * Hour, 3L, "purchase", 1000L),
      (2L, t0 + 2 * Hour, 4L, "purchase", 500L)),
    Seq((1L, t0, 1L, "click", 0L),
      (1L, t0 + Hour, 2L, "view", 0L)))

  // batch algebra on the same events: 2 touches, base 500 each, no
  // remainder; user 2 purchase is '(none)'
  private val batchExpected = Seq(
    ("(none)", 4L, 500L), ("click", 3L, 500L), ("view", 3L, 500L)).sorted

  test("contract: at-arrival crediting sends an out-of-order purchase to (none)") {
    val got = drain(disordered, None)
    assert(got == Seq(("(none)", 3L, 1000L), ("(none)", 4L, 500L)).sorted,
      s"the documented divergence: the purchase must credit (none), got $got")
    // the same events fed in event-time order credit exactly the batch way
    val ordered = Seq(disordered.flatten.sortBy(r => (r._2, r._3)))
    assert(drain(ordered, None) == batchExpected)
  }

  test("graduation: watermark-buffered crediting repairs the disorder exactly") {
    assert(drain(disordered, Some("3 hours")) == batchExpected,
      "buffered mode must credit the late-fed touches")
    // money conserves in both modes regardless of order
    assert(drain(disordered, None).map(_._3).sum == 1500L)
    assert(drain(disordered, Some("3 hours")).map(_._3).sum == 1500L)
  }

  test("a too-late touch emits the (late_dropped) counter row; money still conserves") {
    // batch 1 carries a frontier event at t0+30h, so after it the
    // watermark sits at t0+27h (3h lateness). batch 2 then feeds a touch
    // at t0 — 27h older than the watermark: crediting it exactly is no
    // longer possible (user 1's purchase flushes at the same watermark),
    // so it must surface as the explicit counter row, not vanish. A
    // too-late PURCHASE (eid 9) must carry its full cents on the marker
    // so credited + late_dropped still sums to total purchase cents.
    val lateFeed = Seq(
      Seq((1L, t0 + 2 * Hour, 3L, "purchase", 1000L),
        (9L, t0 + 30 * Hour, 8L, "noop", 0L)),
      Seq((1L, t0, 1L, "click", 0L),
        (2L, t0 + Hour, 9L, "purchase", 700L)))
    val got = drain(lateFeed, Some("3 hours"))
    val lateRows = got.filter(_._1 == "(late_dropped)")
    assert(lateRows.toSet == Set(("(late_dropped)", 1L, 0L), ("(late_dropped)", 9L, 700L)),
      s"both watermark-late events must be counted, got $got")
    // the purchase that flushed before the late touch arrived lands on
    // (none) — the documented bound — and every purchase cent is visible
    assert(got.contains(("(none)", 3L, 1000L)))
    assert(got.map(_._3).sum == 1700L, "credited + late_dropped = total cents")
  }

  test("buffered ss_attribution still matches the batch report on the ordered fixture") {
    val base = SparkEntry.queries("ss_attribution")(spark, sfDir).collect().toSeq
    val saved = spark.conf.getOption("spark.graft.attribution.latenessSec")
    try {
      spark.conf.set("spark.graft.attribution.latenessSec", "60")
      val buffered = SparkEntry.queries("ss_attribution")(spark, sfDir).collect().toSeq
      assert(buffered == base,
        "buffered mode on an ordered feed must aggregate to the same report")
    } finally saved match {
      case Some(v) => spark.conf.set("spark.graft.attribution.latenessSec", v)
      case None => spark.conf.unset("spark.graft.attribution.latenessSec")
    }
  }
}
