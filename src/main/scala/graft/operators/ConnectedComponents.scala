package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair graph — the clustering
  * step behind near-duplicate removal (`dd_dup_clusters`).
  *
  * Two interchangeable algorithms behind one contract (labels =
  * `(id, lbl)` with `lbl` = component-minimum node id, one row per node
  * that appears in some pair):
  *
  *  - [[minLabel]]: each node starts as its own label, each round takes
  *    the min label across neighbors (self-loops fold a node's own label
  *    in, so a round is ONE join+groupBy). O(diameter) rounds — the right
  *    default for near-dup graphs, whose components are tiny and dense.
  *  - [[alternatingStars]]: the large-star/small-star alternation
  *    (Kiveris et al., "Connected Components in MapReduce and Beyond",
  *    SoCC'14 — public literature), which contracts paths exponentially
  *    and converges in O(log n) rounds on ANY graph shape. Each star op
  *    is a groupBy-min plus a join (per-group mins are joined back, never
  *    collected — no high-degree skew) and a distinct.
  *
  * [[components]] runs min-label first and switches to the star algorithm
  * only if the graph turns out deeper than
  * `spark.graft.cc.maxPropagationRounds` (default 8) — pathological
  * chain-shaped duplicate graphs pay the heavier per-round cost, everyone
  * else gets the one-shuffle rounds. */
object ConnectedComponents {

  final case class CcResult(labels: DataFrame, rounds: Int, converged: Boolean)

  val MaxPropagationRoundsKey = "spark.graft.cc.maxPropagationRounds"
  val LocalMaxEdgesKey = "spark.graft.cc.localMaxEdges"

  /** `pairs`: two long columns, one row per undirected edge (either
    * orientation, self-pairs ignored). Returns `(id, lbl)`.
    *
    * Small graphs (≤ `spark.graft.cc.localMaxEdges` edges, default 100k ≈
    * 1.6 MB of longs) run driver-side union-find: every distributed round
    * costs a fixed shuffle+action latency that dwarfs the actual work
    * when the edge set is tiny — the same small-side special-casing AQE
    * applies to joins. Near-dup graphs of a healthy corpus are tiny;
    * graphs past the threshold take the iterative distributed paths. */
  def components(pairs: DataFrame): DataFrame = {
    val conf = pairs.sparkSession.conf
    val localMax = conf.getOption(LocalMaxEdgesKey).map(_.toLong).getOrElse(100000L)
    val cols = pairs.columns
    val edges = pairs
      .select(col(cols(0)).as("src"), col(cols(1)).as("dst"))
      .filter(col("src") =!= col("dst"))
      .persist()
    try {
      if (edges.count() <= localMax) localUnionFind(edges)
      else {
        val threshold = conf.getOption(MaxPropagationRoundsKey).map(_.toInt).getOrElse(8)
        val ml = minLabel(edges, threshold)
        if (ml.converged) ml.labels
        else alternatingStars(edges, maxRounds = 50).labels
      }
    } finally edges.unpersist()
  }

  /** Driver-side union-find over a collected edge list — exact same
    * contract (lbl = component-minimum id). Path-halving find, union by
    * tracked minimum. */
  private def localUnionFind(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val es = edges.as[(Long, Long)].collect()
    val parent = new java.util.HashMap[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrDefault(x, x)
      while (p != x) {
        val gp = parent.getOrDefault(p, p)
        parent.put(x, gp) // path halving
        x = gp
        p = parent.getOrDefault(x, x)
      }
      x
    }
    es.foreach { case (a, b) =>
      val ra = find(a)
      val rb = find(b)
      if (ra != rb) {
        // root at the smaller id so the final root IS the component min
        if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
      }
    }
    val nodes = es.iterator.flatMap(e => Iterator(e._1, e._2)).toSet
    nodes.iterator.map(n => (n, find(n))).toSeq.toDF("id", "lbl")
  }

  /** Min-label propagation. Labels only ever decrease, so the label SUM
    * is a monotone convergence witness (equal sums across rounds ⇒
    * fixpoint) — no per-round change-join needed. */
  def minLabel(pairs: DataFrame, maxRounds: Int): CcResult = {
    val cols = pairs.columns
    val undirected = pairs
      .select(col(cols(0)).as("src"), col(cols(1)).as("dst"))
      .filter(col("src") =!= col("dst"))
    val both = undirected.union(undirected.select(col("dst"), col("src")))
    // self-loops fold each node's own label into the neighbor-min
    val edges = both
      .union(both.select(col("src"), col("src").as("dst")).distinct())
      .persist()
    try {
      // localCheckpoint per round (as alternatingStars does): each
      // round's convergence-witness action re-analyzes `labels`' plan,
      // and a persist-only loop would grow that logical plan linearly —
      // deep graphs at maxRounds hit the analyzer long before the data
      // is a problem. Eager localCheckpoint materializes AND truncates
      // lineage; a fault-tolerant deployment points
      // spark.checkpoint.dir at durable storage and swaps checkpoint().
      var labels = edges.select(col("src").as("id"), col("src").as("lbl"))
        .distinct().localCheckpoint(true)
      var prevSum = BigDecimal(-1)
      var converged = false
      var round = 0
      while (!converged && round < maxRounds) {
        val next = edges.join(labels, col("dst") === col("id"))
          .groupBy(col("src"))
          .agg(min(col("lbl")).as("lbl"))
          .select(col("src").as("id"), col("lbl"))
          .localCheckpoint(true)
        // empty pair graph ⇒ sum(lbl) is SQL NULL; treat as 0 so the
        // loop converges to an empty result instead of NPE-ing
        val sumRow = next.agg(sum(col("lbl"))).head()
        val s = if (sumRow.isNullAt(0)) BigDecimal(0) else BigDecimal(sumRow.getLong(0))
        labels = next
        converged = s == prevSum
        prevSum = s
        round += 1
      }
      CcResult(labels, round, converged)
    } finally edges.unpersist()
  }

  /** Large-star/small-star alternation. Edges are kept oriented
    * large→small; a fixpoint of the (large ∘ small) pair is a forest of
    * stars rooted at each component's minimum, read off directly as the
    * label map. */
  def alternatingStars(pairs: DataFrame, maxRounds: Int): CcResult = {
    val cols = pairs.columns

    // large-star: for each node u, hang every STRICTLY LARGER neighbor v
    // off m = min(N(u) ∪ {u})
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u"))
        .agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
    }

    // small-star: edges arrive oriented u > v, so m = min(N⁻(u)); hang
    // every smaller neighbor (and u itself) off m
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy(col("u")).agg(min(col("v")).as("m"))
      e.join(mins, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins.select(col("u"), col("m").as("v")))
        .distinct()
    }

    // (count, hash-sum) fingerprint: cheap edge-set equality witness
    // (decimal sum — a long sum of xxhash64 values overflows under ANSI)
    def fingerprint(e: DataFrame): (Long, BigDecimal) = {
      val r = e.agg(count(lit(1)),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)"))).head()
      (r.getLong(0), if (r.isNullAt(1)) BigDecimal(0) else BigDecimal(r.getDecimal(1)))
    }

    // each round references e ~5× (symmetrize, min-join, unions), so a
    // persist-only loop would grow the LOGICAL plan ~5^round nodes and
    // stall the analyzer long before the data is a problem. localCheckpoint
    // (eager) materializes AND truncates lineage — the standard Spark
    // pattern for iterative graph algorithms; a fault-tolerant deployment
    // points spark.checkpoint.dir at durable storage and swaps in
    // checkpoint() without changing the loop.
    var e = pairs
      .select(greatest(col(cols(0)), col(cols(1))).as("u"),
        least(col(cols(0)), col(cols(1))).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    var prev = fingerprint(e)
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      e = smallStar(largeStar(e)).localCheckpoint(true)
      val fp = fingerprint(e)
      converged = fp == prev
      prev = fp
      round += 1
    }
    // at fixpoint e is node→root; roots label themselves
    val labels = e.select(col("u").as("id"), col("v").as("lbl"))
      .union(e.select(col("v").as("id"), col("v").as("lbl")))
      .distinct()
    CcResult(labels, round, converged)
  }
}
