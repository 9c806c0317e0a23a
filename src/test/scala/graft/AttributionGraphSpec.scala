package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant + plan gates for the round-11 additions: multi-touch
  * attribution (op_attribution), the iterative integer PageRank
  * (op_pagerank) and the schema-evolution reader (src_schema_evolution).
  * The value-level gate is the driver's DuckDB oracle; these pin the
  * algebraic invariants the oracle can't state (conservation, fixed-point
  * determinism, null-fill semantics) and the physical-plan discipline. */
class AttributionGraphSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = GraftSession.local(4)

  private def finalPlan(df: DataFrame): SparkPlan = {
    df.write.format("noop").mode("overwrite").save()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  // ---- op_attribution ----

  test("attribution conserves money: credits sum exactly to purchase cents") {
    val out = SparkEntry.queries("op_attribution")(spark, sfDir)
      .agg(sum(col("credit_cents"))).head.getLong(0)
    val total = graft.sources.Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .agg(sum(round(col("value") * 100, 0).cast("long"))).head.getLong(0)
    assert(out == total,
      s"attributed $out cents but purchases total $total — integer credit must be lossless")
  }

  test("attribution '(none)' bucket is whole conversions, never split credit") {
    val rows = SparkEntry.queries("op_attribution")(spark, sfDir).collect()
    val none = rows.find(_.getString(0) == "(none)")
    none.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        "each untouched conversion contributes exactly one '(none)' touch row")
    }
    val types = rows.map(_.getString(0)).toSet
    assert(types.subsetOf(Set("(none)", "click", "view")), types.toString)
  }

  test("attribution join is user-co-partitioned, never a nested loop") {
    val p = finalPlan(SparkEntry.queries("op_attribution")(spark, sfDir)).toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"conversion-touch join must be an equi-join on user_id:\n$p")
  }

  test("attribution salted path (saltBuckets=4) is bit-identical and joins on the salt") {
    // the hot-user escalation: touches salted by hash(touch_id) mod R,
    // conversions replicated R ways — the hot user's quadratic pair EMIT
    // spreads over R tasks while pairs and credits stay exact
    val base = SparkEntry.queries("op_attribution")(spark, sfDir).collect().toSeq
    spark.conf.set("spark.graft.attribution.saltBuckets", "4")
    try {
      val df = SparkEntry.queries("op_attribution")(spark, sfDir)
      val salted = df.collect().toSeq
      assert(salted == base, "salting must not change a single credited cent")
      val p = finalPlan(df).toString
      assert(p.contains("tsalt") && p.contains("csalt"),
        s"salted path must join on the salt columns:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    } finally spark.conf.unset("spark.graft.attribution.saltBuckets")
  }

  // ---- op_pagerank ----

  /** Driver-side reference: the same 6 damped integer iterations computed
    * with plain Scala maps over the collected sf0.001 edge list. */
  private def referenceRanks(): Seq[(String, Long)] = {
    val t = graft.sources.Tables.load(spark, sfDir, _: String)
    val pairs = t("orders").select(col("o_orderkey"), col("o_custkey"))
      .join(t("lineitem").select(col("l_orderkey"), col("l_suppkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("c"),
        concat(lit("s"), col("l_suppkey")).as("sp"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    val edges = pairs.map { case (c, sp) => (c, sp) } ++
      pairs.map { case (c, sp) => (sp, c) }
    val od = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var r: Map[String, Long] = od.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 6) {
      val inc = scala.collection.mutable.Map.empty[String, Long]
      for ((s, dst) <- edges)
        inc(dst) = inc.getOrElse(dst, 0L) + r(s) / od(s)
      r = inc.map { case (k, v) => k -> (150000L + 85L * v / 100L) }.toMap
    }
    r.toSeq.sortBy { case (id, v) => (-v, id) }.take(20)
  }

  test("pagerank matches the driver-side integer reference bit for bit") {
    val got = SparkEntry.queries("op_pagerank")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == referenceRanks(),
      "distributed 6-iteration integer PageRank must equal the sequential recompute")
  }

  test("pagerank is deterministic across runs and shuffle layouts") {
    val a = SparkEntry.queries("op_pagerank")(spark, sfDir).collect().toSeq
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = SparkEntry.queries("op_pagerank")(spark, sfDir).collect().toSeq
      assert(a == b, "integer arithmetic must make the result layout-independent")
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }

  test("pagerank iterations broadcast the rank table — edges never shuffle for the join") {
    SparkEntry.queries("op_pagerank")(spark, sfDir) // eager builder
    val p = graft.operators.GraphIterate.recentPlans("pagerank").last
    assert(!p.contains("SortMergeJoin"),
      s"the O(nodes) rank table must broadcast into the edge scan:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  // ---- op_cooccur_topk ----

  test("co-occurrence top-k ranks via the bounded heap, not a window sort") {
    val p = finalPlan(SparkEntry.queries("op_cooccur_topk")(spark, sfDir)).toString
    assert(!p.contains("Window"),
      s"per-supplier neighbor ranking must be the topk_min aggregate, not WindowExec:\n$p")
    assert(p.contains("topk_min"), p)
  }

  test("co-occurrence neighbor lists are symmetric and capped at 5") {
    val rows = SparkEntry.queries("op_cooccur_topk")(spark, sfDir).collect()
    val perSupp = rows.groupBy(_.getLong(0))
    assert(perSupp.values.forall(_.length <= 5))
    // rank sequences are 1..n with counts non-increasing
    perSupp.values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to rs.length),
        "ranks must be dense 1..n")
      val counts = sorted.map(_.getLong(3)).toSeq
      assert(counts == counts.sorted(Ordering[Long].reverse),
        "neighbor counts must be non-increasing in rank")
    }
  }

  test("streaming co-occurrence IVM is slice-invariant and equals the batch view") {
    // the incremental delta rule must be arrival-order-free: re-drain the
    // same interactions in 3 slices and 6 slices, compare bit-for-bit,
    // and both must equal the from-scratch batch computation
    val batch = SparkEntry.queries("op_cooccur_topk")(spark, sfDir).collect().toSeq
    val saved = spark.conf.getOption("spark.graft.ssjoin.slices")
    try {
      spark.conf.set("spark.graft.ssjoin.slices", "3")
      val a = SparkEntry.queries("ss_cooccur_maintain")(spark, sfDir).collect().toSeq
      spark.conf.set("spark.graft.ssjoin.slices", "6")
      val b = SparkEntry.queries("ss_cooccur_maintain")(spark, sfDir).collect().toSeq
      assert(a == b, "IVM result must not depend on how the stream is sliced")
      assert(a == batch, "stream-maintained counts must equal the batch join-aggregate")
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.graft.ssjoin.slices", v)
        case None => spark.conf.unset("spark.graft.ssjoin.slices")
      }
    }
  }

  // ---- src_schema_evolution ----

  test("schema evolution: merged read null-fills the missing column and keeps every row") {
    val q = SparkEntry.queries("src_schema_evolution")(spark, sfDir)
    q.collect() // side effect: writes the two drops to scratch
    val scratch = s"target/roundtrip/evolve_${Integer.toHexString(sfDir.hashCode)}"
    val merged = spark.read.option("mergeSchema", "true").parquet(scratch)
    assert(merged.columns.contains("value"), merged.columns.mkString(","))
    assert(merged.columns.contains("v"),
      "directory layer v=1/v=2 must surface as a discovered partition column")
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
    assert(merged.count() == ev.count(), "no rows lost across the schema boundary")
    val v1Nulls = merged.filter(col("v") === 1 && col("value").isNull).count()
    val v1Rows = ev.filter(to_date(col("ts")) <= lit("2024-01-15")).count()
    assert(v1Nulls == v1Rows,
      "every pre-evolution row must read the missing column as null")
  }
}
