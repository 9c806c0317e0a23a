package graft.operators

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared machinery for the iterative-graph operators (`op_pagerank`,
  * `op_label_prop`): scratch-edge materialization and the conf-switched
  * per-iteration join between the static edge list and the O(nodes)
  * rank/label table.
  *
  * Every iteration joins edges (big, static) to a per-node table (small,
  * changing). Two physical shapes, switched by
  * `spark.graft.graph.broadcastMaxNodes` (the `cc.localMaxEdges`
  * treatment — same contract, both paths bit-identical because every
  * rank/label update is integer arithmetic, so sum/argmax order cannot
  * matter; GraphPathSpec proves row identity on the fixture):
  *
  *  - '''broadcast''' (node count ≤ threshold, default 5M ≈ 100–200 MB of
  *    node rows — the practical broadcast ceiling): the node table
  *    broadcasts into the edge scan. Edges never shuffle, the downstream
  *    dst aggregate combines map-side.
  *  - '''shuffled''' (node count past the threshold, or the conf forced
  *    to 0): edges are hash-partitioned by src ONCE and cached — the
  *    cached partitioning survives into every iteration's plan — and each
  *    round shuffle-hash-joins only the O(nodes) table over to meet them.
  *    One edge shuffle total, one node-table shuffle per iteration, never
  *    a nested loop. This is the `op_bucketed_join` lever: on a warehouse
  *    the cached repartition becomes a bucketed edge table and the
  *    no-edge-shuffle property holds across jobs.
  *
  * The node count is measured with ONE column-pruned
  * `approx_count_distinct` scan of the just-written scratch (no shuffle —
  * partial HLLs merge on the driver). The threshold is an
  * order-of-magnitude switch; HLL's ±2% is immaterial to it.
  *
  * Scratch edges land in a per-invocation directory keyed by an MD5 of
  * the dataset path plus a JVM-unique counter, so two concurrent sessions
  * on one fixture (or two fixtures whose paths collide on hashCode) can
  * never clobber each other mid-read; every scratch dir is removed by a
  * JVM shutdown hook. Cached distributed-mode edge frames live in a small
  * bounded registry (oldest unpersisted beyond 4 entries — an evicted
  * frame just recomputes from its scratch parquet). */
object GraphIterate {

  /** Node-table size past which per-iteration joins stop broadcasting the
    * rank/label table and shuffle it to meet src-partitioned cached edges
    * instead. 0 forces the shuffled path (spec/scale harness lever). */
  val BroadcastMaxNodesKey = "spark.graft.graph.broadcastMaxNodes"
  val DefaultBroadcastMaxNodes = 5000000L

  /** Prepared graph: lineage-cut edges plus the chosen join mode. */
  final case class Graph(edges: DataFrame, broadcastMode: Boolean) {

    /** `edges ⋈ tbl` on `edges(srcCol) === tbl(idCol)` — broadcast the
      * node table in broadcast mode; in shuffled mode hint shuffle-hash
      * with the table as build side (cached edges keep their src
      * partitioning, so only the table moves). */
    def joinTable(tbl: DataFrame, srcCol: String, idCol: String): DataFrame =
      if (broadcastMode) edges.join(broadcast(tbl), edges(srcCol) === tbl(idCol))
      else edges.join(tbl.hint("shuffle_hash"), edges(srcCol) === tbl(idCol))
  }

  private val invocation = new AtomicLong(0L)
  private val persisted = new ConcurrentLinkedQueue[DataFrame]()
  private val scratchDirs = new ConcurrentLinkedQueue[String]()
  // lazy so exactly one hook registers, on first use
  private lazy val cleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      scratchDirs.forEach(p =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  /** Cache a small per-node frame reused across iterations (e.g. the
    * out-degree table) through the same bounded registry. */
  def persistBounded(df: DataFrame): DataFrame = {
    val p = df.persist()
    persisted.add(p)
    while (persisted.size > 4) Option(persisted.poll()).foreach(_.unpersist(false))
    p
  }

  /** Materialize `edges` (must expose `src` as its first column and `dst`
    * second) to scratch parquet — a lineage cut, so iterations re-SCAN the
    * edge list instead of recomputing the joins that built it — then pick
    * the join mode from the measured node count vs the conf threshold. */
  def prepare(s: SparkSession, edges: DataFrame, tag: String, datasetDir: String): Graph = {
    cleanupHook
    val scratch =
      s"target/graphscratch/${tag}_${md5hex(datasetDir).take(12)}_${invocation.incrementAndGet()}"
    scratchDirs.add(scratch)
    edges.write.mode("overwrite").parquet(scratch)
    val raw = s.read.parquet(scratch)
    val maxNodes = s.conf.getOption(BroadcastMaxNodesKey).map(_.toLong)
      .getOrElse(DefaultBroadcastMaxNodes)
    val srcCol = raw.columns.head
    val nNodes =
      if (maxNodes <= 0L) Long.MaxValue // forced shuffled path: skip the count
      else raw.agg(approx_count_distinct(col(srcCol))).head().getLong(0)
    if (nNodes <= maxNodes) Graph(raw, broadcastMode = true)
    else Graph(persistBounded(raw.repartition(col(srcCol))), broadcastMode = false)
  }
}
