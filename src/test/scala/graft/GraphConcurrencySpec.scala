package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphIterate

/** Release-on-completion for the iterative-graph caches: every frame an
  * invocation pins belongs to its own [[GraphIterate.Graph]] and is
  * released in finish's finally — there is NO shared registry, so
  * concurrent graph queries cannot evict each other mid-iteration (the
  * round-12 global FIFO-4 failure mode: a third concurrent pin pushed the
  * first query's cached edge repartition out, and every one of its
  * iterations silently fell back to re-scanning scratch parquet).
  *
  * The gate reads the CAPTURED executed plans: cache substitution happens
  * at action time, so an evicted cache manifests as ZERO
  * InMemoryTableScans in that invocation's plan — counting one per
  * iteration proves each concurrent run kept its own cached partitioning
  * for the whole loop. */
class GraphConcurrencySpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = GraftSession.local(8)

  private def forcedShuffledSession(): SparkSession = {
    val s = spark.newSession()
    s.conf.set(GraphIterate.BroadcastMaxNodesKey, "0")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s
  }

  test("concurrent sessions keep their own cached edge partitioning — no eviction, no re-scan fallback") {
    // sequential references on the default (broadcast) path
    val prRef = SparkEntry.queries("op_pagerank")(spark, sfDir).collect().toSeq
    val lpRef = SparkEntry.queries("op_label_prop")(spark, sfDir).collect().toSeq

    val prBefore = GraphIterate.recentPlans("pagerank").size
    val lpBefore = GraphIterate.recentPlans("labelprop").size

    // three concurrent forced-shuffled invocations across three sessions:
    // 2 pagerank graphs pin (edges + odeg) × 2 plus labelprop's edges = 5
    // pins live at once — one past the old FIFO-4 capacity, so the old
    // registry WOULD evict here
    val pool = Executors.newFixedThreadPool(3)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = Seq(
        Future(SparkEntry.queries("op_pagerank")(forcedShuffledSession(), sfDir).collect().toSeq),
        Future(SparkEntry.queries("op_pagerank")(forcedShuffledSession(), sfDir).collect().toSeq),
        Future(SparkEntry.queries("op_label_prop")(forcedShuffledSession(), sfDir).collect().toSeq))
      val Seq(pr1, pr2, lp) = Await.result(Future.sequence(fs), 10.minutes)
      assert(pr1 == prRef && pr2 == prRef,
        "concurrent forced-shuffled pagerank must stay bit-identical")
      assert(lp == lpRef,
        "concurrent forced-shuffled label propagation must stay bit-identical")
    } finally pool.shutdown()

    val prPlans = GraphIterate.recentPlans("pagerank").drop(prBefore)
    val lpPlans = GraphIterate.recentPlans("labelprop").drop(lpBefore)
    assert(prPlans.size == 2 && lpPlans.size == 1,
      s"expected 2 pagerank + 1 labelprop captured plans, got ${prPlans.size}/${lpPlans.size}")
    for (p <- prPlans) {
      assert(!p.contains("BroadcastHashJoin"), s"forced path must not broadcast:\n$p")
      // 6 iterations × (edges ⋈ shares + odeg) — losing the cache would
      // drop every InMemoryTableScan from the action-time plan
      assert("InMemoryTableScan".r.findAllIn(p).size >= 6,
        s"pagerank lost its cached edges mid-iteration (re-scan fallback):\n$p")
    }
    for (p <- lpPlans) {
      assert(!p.contains("BroadcastHashJoin"), s"forced path must not broadcast:\n$p")
      assert("InMemoryTableScan".r.findAllIn(p).size >= 3,
        s"label_prop lost its cached edges mid-iteration (re-scan fallback):\n$p")
    }
  }
}
