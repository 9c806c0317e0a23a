package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Forced-path gates for the iterative-graph graduation
  * (`GraphIterate`): when the node table outgrows a broadcast
  * (`spark.graft.graph.broadcastMaxNodes`, forced to 0 here), each
  * iteration must shuffle ONLY the O(nodes) rank/label table to meet
  * src-partitioned cached edges — and, because every update is integer
  * arithmetic, produce the bit-identical result. The
  * ConnectedComponents treatment (`ConnectedComponentsSpec`'s
  * localMaxEdges=0 rows) applied to op_pagerank / op_label_prop. */
class GraphPathSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = GraftSession.local(4)

  /** Run `body` with the shuffled graph path forced AND every broadcast
    * avenue closed (planner threshold + AQE runtime conversion), so the
    * observed plan is honestly the at-scale shape, not a small-fixture
    * broadcast demotion. */
  private def forcedShuffled[T](body: => T): T = {
    val saved = Seq(
      graft.operators.GraphIterate.BroadcastMaxNodesKey,
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(graft.operators.GraphIterate.BroadcastMaxNodesKey, "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      body
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  for ((q, tag) <- Seq("op_pagerank" -> "pagerank", "op_label_prop" -> "labelprop")) {
    test(s"$q: forced shuffled-table path is bit-identical to the broadcast path") {
      val broadcastRows = SparkEntry.queries(q)(spark, sfDir).collect().toSeq
      val shuffledRows = forcedShuffled {
        SparkEntry.queries(q)(spark, sfDir).collect().toSeq
      }
      assert(shuffledRows == broadcastRows,
        s"$q: integer arithmetic must make both physical paths exact")
    }

    test(s"$q: forced path never broadcasts — only the node table shuffles to cached edges") {
      // the builders are eager (release-on-completion), so gate the
      // captured iteration plan — the returned frame is checkpoint-backed
      val p = forcedShuffled {
        SparkEntry.queries(q)(spark, sfDir)
        graft.operators.GraphIterate.recentPlans(tag).last
      }
      assert(!p.contains("BroadcastHashJoin") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q forced path must not broadcast any join side:\n$p")
      assert(p.contains("ShuffledHashJoin"),
        s"$q forced path: edges ⋈ table must be the hinted shuffle-hash join:\n$p")
      assert(p.contains("InMemoryTableScan"),
        s"$q forced path: edges must come from the src-partitioned cache:\n$p")
    }
  }

  test("op_pagerank: default (broadcast) path still broadcasts — the switch is real") {
    // complements AttributionGraphSpec's broadcast plan gate: same query,
    // same session, flipped only by the conf
    SparkEntry.queries("op_pagerank")(spark, sfDir)
    val p = graft.operators.GraphIterate.recentPlans("pagerank").last
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("ShuffledHashJoin"), p)
  }
}
