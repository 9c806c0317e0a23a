package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.ApproxPercentileRewrite

/** ApproxPercentileRewrite: armed, exact percentile()/median() plan as one
  * partial+final KLL sketch aggregate; answers carry the sketch's
  * rank-error contract (validated by RANK, not value equality — the
  * sketch returns an actual data value, Spark's exact path interpolates). */
class ApproxPercentileSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = GraftSession.local(4)
    if (!s.experimental.extraOptimizations.contains(ApproxPercentileRewrite))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ ApproxPercentileRewrite
    s
  }

  // 40 groups x 5000 rows; values are a deterministic scramble of 0..99999
  private def fixture(): DataFrame =
    spark.range(200000).select(
      (col("id") % 40).as("grp"),
      (col("id") * 2654435761L % 100000).cast("double").as("v"),
      (col("id") % 2 === 0).as("flag"))

  private def armed[T](body: => T): T = {
    spark.conf.set(ApproxPercentileRewrite.Key, "kll")
    try body finally spark.conf.unset(ApproxPercentileRewrite.Key)
  }

  private def executedPlanStr(df: DataFrame): String = {
    df.write.format("noop").mode("overwrite").save()
    (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
  }

  /** Fraction of group rows <= est must sit within eps of p. */
  private def assertRank(est: Map[Long, Double], p: Double, eps: Double): Unit = {
    val rows = fixture().collect().map(r => (r.getLong(0), r.getDouble(1)))
    est.foreach { case (g, e) =>
      val vs = rows.filter(_._1 == g).map(_._2)
      val rank = vs.count(_ <= e).toDouble / vs.length
      assert(math.abs(rank - p) <= eps,
        s"group $g: estimate $e sits at rank $rank, wanted $p ± $eps")
    }
  }

  test("grouped percentile and median plan as KLL, estimates rank-accurate") {
    def q() = fixture().groupBy(col("grp"))
      .agg(expr("percentile(v, 0.5D)").as("p50"), expr("median(v)").as("med"))
      .orderBy(col("grp"))
    armed {
      val got = q().collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
      assertRank(got.map(r => r._1 -> r._2).toMap, 0.5, 0.005)
      got.foreach { case (g, p50, med) =>
        assert(p50 == med, s"group $g: median must rewrite identically to p50") }
      val plan = executedPlanStr(q())
      assert(plan.contains("kll_sketch_agg"), s"armed plan should aggregate a KLL sketch:\n$plan")
      assert(!plan.contains("percentile("), s"armed plan must lose the exact percentile:\n$plan")
      assert(plan.contains("partial_kll_sketch_agg") || plan.contains("partial"),
        s"the sketch must combine map-side:\n$plan")
    }
  }

  test("array percentages return the full quantile vector; FILTER rides along incl. empty groups") {
    // flag = even ids, grp = id % 40: ODD groups contain only odd ids, so
    // their filtered slice is EMPTY — exact percentile returns null there,
    // and the rewrite must too (the count-guard around the sketch; an
    // unguarded kll_sketch_get_quantile on the empty buffer would CRASH
    // with KLL_INVALID_INPUT_SKETCH_BUFFER — the upstream hazard this pins)
    def q() = fixture().groupBy(col("grp"))
      .agg(expr("percentile(v, array(0.1D, 0.5D, 0.9D)) FILTER (WHERE flag)").as("ps"))
      .orderBy(col("grp"))
    armed {
      val got = q().collect().map(r => (r.getLong(0), Option(r.getSeq[Double](1))))
      got.foreach { case (g, ps) =>
        if (g % 2 == 1) assert(ps.isEmpty, s"group $g has no flag rows: must be null")
        else {
          val p = ps.get
          assert(p.size == 3 && p(0) <= p(1) && p(1) <= p(2), s"group $g: $p not monotone")
        }
      }
      // rank-check p50 of each non-empty filtered slice
      val rows = fixture().filter(col("flag")).collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      got.collect { case (g, Some(ps)) =>
        val vs = rows.filter(_._1 == g).map(_._2)
        val rank = vs.count(_ <= ps(1)).toDouble / vs.length
        assert(math.abs(rank - 0.5) <= 0.01, s"group $g FILTER slice p50 off: rank $rank")
      }
      assert(executedPlanStr(q()).contains("kll_sketch_agg"))
    }
  }

  test("an all-null value group yields null, exactly like exact percentile") {
    import spark.implicits._
    val df = Seq((1L, Some(5.0)), (1L, Some(7.0)), (2L, None), (2L, None))
      .toDF("grp", "v")
    def q() = df.groupBy(col("grp")).agg(expr("percentile(v, 0.5D)").as("p")).orderBy(col("grp"))
    val exact = q().collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
    armed {
      val got = q().collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
      assert(got.map(_._2.isEmpty) == exact.map(_._2.isEmpty),
        s"null contract diverged: $got vs $exact")
      assert(got(1)._2.isEmpty, "all-null group must be null, not a sketch crash")
    }
  }

  test("NaN contract: all-NaN group returns NaN (no sketch crash); mixed NaN excluded") {
    import spark.implicits._
    val df = Seq(
      (1L, 5.0), (1L, 7.0), (1L, 9.0),                  // finite group
      (2L, Double.NaN), (2L, Double.NaN),                // all-NaN group
      (3L, 1.0), (3L, 2.0), (3L, Double.NaN)             // mixed group
    ).toDF("grp", "v")
    def q() = df.groupBy(col("grp"))
      .agg(expr("percentile(v, 1.0D)").as("p100"),
           expr("percentile(v, array(0.0D, 1.0D))").as("ps"))
      .orderBy(col("grp"))
    // exact path: NaN sorts greatest, so p100 of groups 2 and 3 is NaN
    val exact = q().collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(exact(2L).isNaN && exact(3L).isNaN, s"exact NaN ordering changed: $exact")
    armed {
      val rows = q().collect()
      val got = rows.map(r => (r.getLong(0), r.getDouble(1))).toMap
      assert(got(1L) == 9.0, s"finite group wrong: $got")
      // all-NaN: must answer NaN like exact — and must NOT crash the
      // never-updated sketch buffer (the cnt>0-but-empty-sketch hazard)
      assert(got(2L).isNaN, s"all-NaN group must be NaN: $got")
      val ps2 = rows.find(_.getLong(0) == 2L).get.getSeq[Double](2)
      assert(ps2.length == 2 && ps2.forall(_.isNaN),
        s"all-NaN group array percentages must be all-NaN: $ps2")
      // mixed: documented NaN-EXCLUSION divergence — armed estimates over
      // the finite values only (max finite = 2.0), exact says NaN
      assert(got(3L) == 2.0, s"mixed group must exclude NaN from the sketch: $got")
      assert(executedPlanStr(q()).contains("kll_sketch_agg"))
    }
  }

  test("guards: frequency arg, distinct percentile, non-numeric, and unarmed keep exact plans") {
    def freq() = fixture().groupBy(col("grp"))
      .agg(expr("percentile(v, 0.5D, 2L)").as("p"))
    def dist() = fixture().groupBy(col("grp"))
      .agg(expr("percentile(DISTINCT v, 0.5D)").as("p"))
    armed {
      assert(!executedPlanStr(freq()).contains("kll_sketch_agg"))
      assert(!executedPlanStr(dist()).contains("kll_sketch_agg"))
    }
    assert(!executedPlanStr(
      fixture().groupBy(col("grp")).agg(expr("percentile(v, 0.5D)")))
      .contains("kll_sketch_agg"), "unarmed sessions must never rewrite")
  }

  test("SQL form rewrites; integral inputs widen to double") {
    fixture().select(col("grp"), col("v").cast("long").as("lv"))
      .createOrReplaceTempView("apr_t")
    def q() = spark.sql(
      "SELECT grp, percentile(lv, 0.9D) AS p90 FROM apr_t GROUP BY grp ORDER BY grp")
    armed {
      val got = q().collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      assertRank(got, 0.9, 0.005)
      assert(executedPlanStr(q()).contains("kll_sketch_agg"))
    }
  }
}
