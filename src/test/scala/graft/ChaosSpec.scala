package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.streaming.MultiQueryEngine

/** Randomized lifecycle soak: a seeded interleaving of submits (valid,
  * malformed, and duplicate-id), kills (live and unknown ids), data
  * batches (including empty), clock jumps, and ticks must keep the engine
  * invariants intact after every operation:
  *
  *  - `queries_running` gauge == live query count,
  *  - `queries_received` == number of submit calls,
  *  - done + killed + failed == received − running,
  *  - every emitted clip carries its query_id,
  *  - no operation ever throws.
  */
class ChaosSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = GraftSession.local(4)

  // depth tunable for one-off long soaks: GRAFT_CHAOS_N=2000 sbt test
  private val chaosN = sys.env.getOrElse("GRAFT_CHAOS_N", "400").toInt

  test(s"$chaosN random lifecycle operations preserve engine invariants") {
    val rnd = new scala.util.Random(424242L)
    val events = Tables.load(spark, sfDir, "events")
    var now = 1000000L
    val e = new MultiQueryEngine(spark, () => now, rateLimitMaxEmits = 50,
      rateLimitIntervalMs = 1000000L)
    var submits = 0L
    val ids = (0 until 25).map(i => s"c$i")

    def randomBql(): String = rnd.nextInt(6) match {
      case 0 => s"SELECT event_id FROM STREAM LIMIT ${1 + rnd.nextInt(200)}"
      case 1 => "SELECT COUNT(*) AS cnt FROM STREAM WINDOWING EVERY(1, RECORD, ALL)"
      case 2 => s"SELECT event_type, COUNT(*) AS cnt FROM STREAM " +
        s"WHERE value > ${rnd.nextInt(300)} GROUP BY event_type DURATION ${50 + rnd.nextInt(500)}"
      case 3 => "SELECT COUNT(DISTINCT user_id) AS nd FROM STREAM DURATION 300"
      case 4 => "SELECT TOP(3, event_type) AS cnt FROM STREAM WINDOWING EVERY(40, TIME, WINDOW)"
      case 5 => "SELEKT definitely broken ((" // malformed → Fail path
    }

    (1 to chaosN).foreach { step =>
      rnd.nextInt(10) match {
        case 0 | 1 | 2 =>
          e.submit(ids(rnd.nextInt(ids.size)), randomBql())
          submits += 1
        case 3 =>
          e.kill(ids(rnd.nextInt(ids.size))) // may or may not be live
        case 4 | 5 | 6 =>
          val lo = rnd.nextInt(900)
          e.processBatch(events.filter(
            col("event_id") >= lo && col("event_id") < lo + rnd.nextInt(300)))
        case 7 =>
          e.processBatch(events.filter(col("event_id") < 0)) // empty batch
        case 8 =>
          now += rnd.nextInt(200); e.tick()
        case 9 =>
          now += 1 // idle step
      }
      val m = e.metrics.snapshot
      assert(m("queries_running") == e.activeQueryIds.size,
        s"step $step: gauge ${m("queries_running")} != live ${e.activeQueryIds.size}")
      assert(m("queries_received") == submits, s"step $step")
      assert(m("queries_done") + m("queries_killed") + m("queries_failed")
        == m("queries_received") - m("queries_running"), s"step $step: $m")
      e.drainResults().foreach { r =>
        assert(r.clip.meta("query_id") == r.queryId)
      }
    }

    e.activeQueryIds.foreach(e.kill)
    assert(e.metrics.snapshot("queries_running") == 0L)
  }

  /** Same invariants with the A5 thread pool live: many distinct-keyed
    * queries run their solo jobs concurrently while submits/kills/ticks
    * interleave between batches — the shared surfaces (results queue,
    * metrics, sinks, TrieMap registry) must stay consistent. */
  test("lifecycle invariants hold under parallel solo execution") {
    val rnd = new scala.util.Random(777L)
    val events = Tables.load(spark, sfDir, "events")
    var now = 1000000L
    val e = new MultiQueryEngine(spark, () => now, soloParallelism = 4)
    var submits = 0L
    // distinct moduli → distinct key signatures → nothing fuses
    (0 until 12).foreach { i =>
      assert(e.submit(s"p$i", s"SELECT user_id % ${i + 2} AS k, COUNT(*) AS cnt " +
        s"FROM STREAM GROUP BY user_id % ${i + 2} DURATION ${200 + 100 * i}").isRight)
      submits += 1
    }
    (1 to 30).foreach { step =>
      rnd.nextInt(5) match {
        case 0 =>
          e.submit(s"x$step", s"SELECT user_id % ${40 + step} AS k, MAX(value) AS mx " +
            "FROM STREAM GROUP BY user_id % " + (40 + step) + " DURATION 400")
          submits += 1
        case 1 => e.kill(s"p${rnd.nextInt(12)}")
        case _ =>
          val lo = rnd.nextInt(800)
          e.processBatch(events.filter(
            col("event_id") >= lo && col("event_id") < lo + 200))
          now += 60
          e.tick()
      }
      val m = e.metrics.snapshot
      assert(m("queries_running") == e.activeQueryIds.size, s"step $step: $m")
      assert(m("queries_received") == submits, s"step $step")
      assert(m("queries_done") + m("queries_killed") + m("queries_failed")
        == m("queries_received") - m("queries_running"), s"step $step: $m")
    }
    val msgs = e.drainResults()
    assert(msgs.nonEmpty)
    assert(msgs.forall(r => r.clip.meta("query_id") == r.queryId))
  }
}
