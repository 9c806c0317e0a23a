package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.IntervalJoinRewrite

/** IntervalJoinRewrite: the naive inequality-overlap join, written exactly
  * as a user would write it, must (a) keep BNLJ semantics bit-for-bit and
  * (b) stop BEING a BNLJ once the rule is armed. */
class IntervalRewriteSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = GraftSession.local(4)
    // the shared test session may predate the extensions conf — inject the
    // rule at runtime, which is the documented fallback path
    if (!s.experimental.extraOptimizations.contains(IntervalJoinRewrite))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ IntervalJoinRewrite
    s
  }

  /** The user-written plan: intervals joined on overlap alone. */
  private def naiveJoin(): DataFrame = {
    val g = spark.range(2000).select(col("id"),
      (col("id") * 37 % 5000).as("s"),
      (col("id") * 37 % 5000 + col("id") % 400).as("e"))
    val a = g.filter(col("id") % 2 === 0)
      .select(col("id").as("a_id"), col("s").as("a_s"), col("e").as("a_e"))
    val b = g.filter(col("id") % 2 === 1)
      .select(col("id").as("b_id"), col("s").as("b_s"), col("e").as("b_e"))
    a.join(b, col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select(col("a_id"), col("b_id"))
  }

  private def executedPlanStr(df: DataFrame): String = {
    df.write.format("noop").mode("overwrite").save()
    (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
  }

  test("armed: the inequality join compiles to a bucket equi-join, results unchanged") {
    val baseline = naiveJoin().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(baseline.nonEmpty)
    val pNaive = executedPlanStr(naiveJoin())
    assert(pNaive.contains("BroadcastNestedLoopJoin"),
      s"unarmed inequality join should be the nested loop this rule exists to kill:\n$pNaive")
    spark.conf.set(IntervalJoinRewrite.WidthKey, "512")
    try {
      val rewritten = naiveJoin()
      val got = rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == baseline,
        s"rewrite changed results: ${(got -- baseline).take(5)} extra, ${(baseline -- got).take(5)} missing")
      val p = executedPlanStr(rewritten)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"armed rule must remove the nested loop:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
        p.contains("BroadcastHashJoin"), p)
    } finally spark.conf.unset(IntervalJoinRewrite.WidthKey)
  }

  test("degenerate intervals (e < s) and touching endpoints keep exact semantics") {
    import spark.implicits._
    val a = Seq((1L, 10L, 5L), (2L, 0L, 0L), (3L, 100L, 200L))
      .toDF("a_id", "a_s", "a_e") // row 1 is inverted: s=10 > e=5
    val b = Seq((10L, 5L, 10L), (20L, 0L, 0L), (30L, 200L, 300L), (40L, 6L, 9L))
      .toDF("b_id", "b_s", "b_e")
    def pairs(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val join = () => a.join(b, col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select(col("a_id"), col("b_id"))
    val baseline = pairs(join())
    spark.conf.set(IntervalJoinRewrite.WidthKey, "7")
    try assert(pairs(join()) == baseline)
    finally spark.conf.unset(IntervalJoinRewrite.WidthKey)
  }

  test("fuzz: random interval sets match the nested-loop baseline at every width") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    (1 to 8).foreach { trial =>
      // adversarial mix: negative starts, zero-length, inverted (s > e),
      // wide and point intervals, duplicates
      def gen(n: Int, idBase: Long) = (0 until n).map { i =>
        val s0 = rnd.nextInt(4000) - 500L
        val len = rnd.nextInt(5) match {
          case 0 => 0L
          case 1 => -rnd.nextInt(50).toLong // inverted
          case _ => rnd.nextInt(600).toLong
        }
        (idBase + i, s0, s0 + len)
      }
      val a = gen(120, 0).toDF("a_id", "a_s", "a_e")
      val b = gen(150, 1000).toDF("b_id", "b_s", "b_e")
      def pairs() = a.join(b, col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
        .select(col("a_id"), col("b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val baseline = pairs()
      Seq(1L, 7L, 64L, 1000L).foreach { w =>
        spark.conf.set(IntervalJoinRewrite.WidthKey, w.toString)
        try {
          val got = pairs()
          assert(got == baseline,
            s"trial $trial width $w: ${(got -- baseline).size} extra, ${(baseline -- got).size} missing")
        } finally spark.conf.unset(IntervalJoinRewrite.WidthKey)
      }
    }
  }

  test("strict-inequality overlap (a_s < b_e AND b_s < a_e) rewrites and stays exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val a = (0 until 100).map { i =>
      val s0 = rnd.nextInt(2000).toLong; (i.toLong, s0, s0 + rnd.nextInt(300)) }
      .toDF("a_id", "a_s", "a_e")
    val b = (0 until 100).map { i =>
      val s0 = rnd.nextInt(2000).toLong; (1000L + i, s0, s0 + rnd.nextInt(300)) }
      .toDF("b_id", "b_s", "b_e")
    def run() = a.join(b, col("a_s") < col("b_e") && col("b_s") < col("a_e"))
      .select(col("a_id"), col("b_id"))
    val baseline = run().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.conf.set(IntervalJoinRewrite.WidthKey, "256")
    try {
      val df = run()
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == baseline)
      val p = executedPlanStr(run())
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
    } finally spark.conf.unset(IntervalJoinRewrite.WidthKey)
  }

  test("equi-join conditions and non-integral bounds are left untouched") {
    spark.conf.set(IntervalJoinRewrite.WidthKey, "512")
    try {
      import spark.implicits._
      val a = Seq((1L, 1.0, 2.0)).toDF("k", "s", "e")
      val b = Seq((1L, 1.5, 2.5)).toDF("k2", "s2", "e2")
      // double bounds: no rewrite, still correct
      val doubles = a.join(b, col("s") <= col("e2") && col("s2") <= col("e"))
      assert(doubles.count() == 1)
      val pd = executedPlanStr(doubles)
      assert(pd.contains("BroadcastNestedLoopJoin"), pd)
      // equi component present: Spark already hash-joins; rule must not fire
      val equi = a.join(b, col("k") === col("k2") && col("s") <= col("e2"))
      assert(equi.count() == 1)
      val pe = executedPlanStr(equi)
      assert(!pe.contains("__graft_bkt"), pe)
    } finally spark.conf.unset(IntervalJoinRewrite.WidthKey)
  }
}
