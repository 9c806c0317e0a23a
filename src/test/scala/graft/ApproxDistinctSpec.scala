package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.ApproxDistinctRewrite

/** ApproxDistinctRewrite: armed, COUNT(DISTINCT x) plans as one
  * partial+final Theta sketch aggregate; below the sketch's exact
  * threshold the estimate IS the exact count, so fixture-scale results
  * are bit-identical while the exact-distinct plan shape disappears. */
class ApproxDistinctSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = GraftSession.local(4)
    if (!s.experimental.extraOptimizations.contains(ApproxDistinctRewrite))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ ApproxDistinctRewrite
    s
  }

  // 40 groups x <= 250 distinct users each — far below the 4096-entry
  // exact regime, so armed results must EQUAL exact results
  private def fixture(): DataFrame =
    spark.range(50000).select(
      (col("id") % 40).as("grp"),
      (col("id") * 31 % 7919).as("user_id"),
      (col("id") % 2 === 0).as("flag"))

  private def armed[T](body: => T): T = {
    spark.conf.set(ApproxDistinctRewrite.Key, "theta")
    try body finally spark.conf.unset(ApproxDistinctRewrite.Key)
  }

  private def executedPlanStr(df: DataFrame): String = {
    df.write.format("noop").mode("overwrite").save()
    (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
  }

  test("grouped and global count-distinct rewrite to theta, exact below threshold") {
    def grouped() = fixture().groupBy(col("grp"))
      .agg(countDistinct(col("user_id")).as("nd"), count(lit(1)).as("n"))
      .orderBy(col("grp"))
    def global() = fixture().agg(countDistinct(col("user_id")).as("nd"))
    val gBase = grouped().collect().map(_.toSeq).toSeq
    val base = global().head.getLong(0)
    armed {
      // per-group cardinalities sit below the 4096-entry exact regime:
      // bit-identical. The global one (7919 distinct) crosses it — the
      // estimate contract (±~2%) applies, which is the armed trade-off.
      assert(grouped().collect().map(_.toSeq).toSeq == gBase)
      val est = global().head.getLong(0)
      assert(math.abs(est - base) <= base * 0.02,
        s"global estimate $est strayed beyond 2% of exact $base")
      val p = executedPlanStr(grouped())
      assert(p.contains("theta_sketch"), s"armed plan should aggregate a sketch:\n$p")
      assert(!p.toLowerCase.contains("distinct"),
        s"armed plan must lose the exact-distinct phase:\n$p")
      assert(p.contains("partial_theta_sketch") || p.contains("partial"),
        s"the sketch must combine map-side:\n$p")
    }
  }

  test("FILTER clauses ride along; SQL form rewrites too") {
    fixture().createOrReplaceTempView("adr_t")
    def q() = spark.sql(
      """SELECT grp, count(DISTINCT user_id) FILTER (WHERE flag) AS nd_f
        |FROM adr_t GROUP BY grp ORDER BY grp""".stripMargin)
    val base = q().collect().map(_.toSeq).toSeq
    armed {
      assert(q().collect().map(_.toSeq).toSeq == base)
      assert(executedPlanStr(q()).contains("theta_sketch"))
    }
  }

  test("guards: multi-arg count distinct, sum(distinct), and unarmed sessions keep exact plans") {
    def multi() = fixture().groupBy(col("grp"))
      .agg(count_distinct(col("user_id"), col("flag")).as("nd2"))
    def sumD() = fixture().groupBy(col("grp"))
      .agg(sum_distinct(col("user_id")).as("sd"))
    armed {
      assert(!executedPlanStr(multi()).contains("theta_sketch"))
      assert(!executedPlanStr(sumD()).contains("theta_sketch"))
    }
    assert(!executedPlanStr(
      fixture().groupBy(col("grp")).agg(countDistinct(col("user_id"))))
      .contains("theta_sketch"))
  }

  test("tinyint/smallint columns rewrite via an injective int widening, not a crash") {
    // ThetaSketchAgg's inputTypes start at INT; the rewrite runs
    // post-analysis so no type check re-fires — byte/short must be
    // widened (Cast is injective for integrals: exact counts preserved)
    def q() = fixture().select(col("grp"),
        (col("user_id") % 100).cast("tinyint").as("b"),
        (col("user_id") % 1000).cast("smallint").as("sh"))
      .groupBy(col("grp"))
      .agg(countDistinct(col("b")).as("ndb"), countDistinct(col("sh")).as("nds"))
      .orderBy(col("grp"))
    val base = q().collect().map(_.toSeq).toSeq
    armed {
      assert(q().collect().map(_.toSeq).toSeq == base)
      assert(executedPlanStr(q()).contains("theta_sketch"))
    }
  }

  test("mixed exact and distinct aggregates in one Aggregate rewrite only the distinct") {
    def q() = fixture().groupBy(col("grp"))
      .agg(countDistinct(col("user_id")).as("nd"),
        sum(col("user_id")).as("s"), max(col("user_id")).as("m"))
      .orderBy(col("grp"))
    val base = q().collect().map(_.toSeq).toSeq
    armed {
      assert(q().collect().map(_.toSeq).toSeq == base)
      val p = executedPlanStr(q())
      assert(p.contains("theta_sketch") && p.contains("sum") && p.contains("max"))
    }
  }
}
