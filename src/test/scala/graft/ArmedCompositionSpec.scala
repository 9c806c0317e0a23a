package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans._
import graft.sources.Tables

/** ALL FIVE armed optimizer rules composed in one session
  * (IntervalJoinRewrite, TopKWindowRewrite, ApproxDistinctRewrite,
  * ApproxPercentileRewrite, TopKFrequentRewrite — the full
  * GraftExtensions injection set). Each rule is A/B'd alone in its own
  * spec; rule-INTERACTION bugs (one rewrite changing the plan shape
  * another one matches on, attribute ids drifting across rewrites) are
  * exactly the class those unit specs can't see. Everything here runs
  * in the sketch-exact regime (cardinalities below the Theta/KLL/
  * frequent-items thresholds, percentile points on data values), so
  * armed results must be BIT-IDENTICAL to unarmed — not tolerance-
  * checked. */
class ArmedCompositionSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = GraftSession.local(4)
    val all = Seq(IntervalJoinRewrite, TopKWindowRewrite, ApproxDistinctRewrite,
      ApproxPercentileRewrite, TopKFrequentRewrite)
    val missing = all.filterNot(s.experimental.extraOptimizations.contains)
    if (missing.nonEmpty)
      s.experimental.extraOptimizations = s.experimental.extraOptimizations ++ missing
    s
  }

  /** Arm every rule at once — the composition under test. */
  private def armedAll[T](body: => T): T = {
    spark.conf.set(ApproxDistinctRewrite.Key, "theta")
    spark.conf.set(ApproxPercentileRewrite.Key, "kll")
    spark.conf.set(TopKFrequentRewrite.Key, "freq")
    spark.conf.set(TopKWindowRewrite.MaxKKey, "100")
    spark.conf.set(IntervalJoinRewrite.WidthKey, "100")
    try body finally {
      spark.conf.unset(ApproxDistinctRewrite.Key)
      spark.conf.unset(ApproxPercentileRewrite.Key)
      spark.conf.unset(TopKFrequentRewrite.Key)
      spark.conf.unset(TopKWindowRewrite.MaxKKey)
      spark.conf.unset(IntervalJoinRewrite.WidthKey)
    }
  }

  private def executedPlanStr(df: DataFrame): String = {
    df.write.format("noop").mode("overwrite").save()
    (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
  }

  private def canon(rows: Array[Row]): Seq[String] =
    rows.map(_.toSeq.map {
      case null => "∅"
      case d: Double => f"$d%.9f"
      case x => x.toString
    }.mkString("|")).sorted.toSeq

  // ---- the combined single query -----------------------------------

  /** 3 segments × 101 rows (ODD count: exact percentile's interpolation
    * index p·(n−1) lands ON a data value at p ∈ {0, .25, .5, .75, 1},
    * where it coincides with KLL's inclusive-rank answer), 31 distinct
    * users (far below Theta's exact threshold), values a deterministic
    * scramble. The coalesce keeps keys non-nullable (Spark marks `%`
    * nullable unconditionally). */
  private def seg(): DataFrame =
    spark.range(303).select(
      concat(lit("s"), coalesce(col("id") % 3, lit(0L))).as("seg"),
      coalesce(col("id") % 31, lit(0L)).as("uid"),
      coalesce((col("id") * 2654435761L) % 1000, lit(0L)).cast("double").as("v"),
      col("id").as("rid"))

  test("one query composing COUNT(DISTINCT) + percentile + count-top-k + window top-N is exact under all-armed") {
    seg().createOrReplaceTempView("ac_seg")
    def q() = spark.sql(
      """WITH freq AS (
        |  SELECT uid, count(*) AS c FROM ac_seg
        |  GROUP BY uid ORDER BY c DESC, uid LIMIT 5
        |), stats AS (
        |  SELECT seg, count(DISTINCT uid) AS nd,
        |         percentile(v, 0.5D) AS p50,
        |         percentile(v, array(0.0D, 0.25D, 1.0D)) AS ps
        |  FROM ac_seg GROUP BY seg
        |), ranked AS (
        |  SELECT seg, rid, v FROM (
        |    SELECT seg, rid, v,
        |           row_number() OVER (PARTITION BY seg ORDER BY v DESC, rid) AS rn
        |    FROM ac_seg) WHERE rn <= 3
        |)
        |SELECT s.seg, s.nd, s.p50, s.ps, r.rid, r.v, f.uid, f.c
        |FROM stats s JOIN ranked r ON s.seg = r.seg CROSS JOIN freq f
        |ORDER BY s.seg, r.rid, f.uid""".stripMargin)
    val exact = canon(q().collect())
    assert(exact.size == 45, s"fixture shape drifted: ${exact.size} rows")
    armedAll {
      val got = canon(q().collect())
      assert(got == exact,
        s"all-armed composition diverged from exact:\n${got.diff(exact).take(3)}\nvs\n${exact.diff(got).take(3)}")
      val plan = executedPlanStr(q())
      assert(plan.contains("theta_sketch"), s"distinct rewrite did not fire:\n$plan")
      assert(plan.contains("kll_sketch_agg"), s"percentile rewrite did not fire:\n$plan")
      assert(plan.contains("approx_top_k"), s"frequent-items rewrite did not fire:\n$plan")
      assert(!plan.contains("Window "), s"window top-N rewrite did not fire:\n$plan")
    }
  }

  // ---- armed-vs-unarmed differential fuzz --------------------------

  private val rnd = new scala.util.Random(20260814L)
  private def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.size))

  private def genPred(): String = pick(Seq(
    s"value > ${rnd.nextInt(400)}",
    s"value <= ${rnd.nextInt(400)}",
    s"event_type = '${pick(Seq("click", "view", "purchase", "scroll"))}'",
    s"event_type <> '${pick(Seq("click", "view"))}'",
    s"event_id >= ${rnd.nextInt(900)}",
    s"value BETWEEN ${rnd.nextInt(200)} AND ${200 + rnd.nextInt(400)}",
    s"user_id % ${2 + rnd.nextInt(7)} = ${rnd.nextInt(2)}",
    "true"))

  /** Query families mixing the armed constructs; percentile points are
    * 0.0/1.0 (min/max — interpolation-free at any n, so armed must be
    * bit-identical). Every query ends in a deterministic ORDER BY. */
  private def genQuery(): String = rnd.nextInt(6) match {
    case 0 => // global distinct + both percentile extremes in ONE aggregate
      s"SELECT count(DISTINCT user_id) AS nd, count(DISTINCT event_type) AS nt, " +
        s"percentile(value, 0.0D) AS p0, percentile(value, 1.0D) AS p1 " +
        s"FROM ev WHERE ${genPred()}"
    case 1 => // grouped distinct + percentile
      s"SELECT event_type, count(DISTINCT user_id) AS nd, " +
        s"percentile(value, array(0.0D, 1.0D)) AS ps, count(*) AS c " +
        s"FROM ev WHERE ${genPred()} GROUP BY event_type ORDER BY event_type"
    case 2 => // frequent-items shape (count-desc top-k with tiebreak)
      s"SELECT event_type, count(*) AS c FROM ev WHERE ${genPred()} " +
        s"GROUP BY event_type ORDER BY c DESC, event_type LIMIT ${1 + rnd.nextInt(4)}"
    case 3 => // window top-N
      s"SELECT event_type, event_id, value FROM (" +
        s"SELECT event_type, event_id, value, row_number() OVER " +
        s"(PARTITION BY event_type ORDER BY value DESC, event_id) AS rn " +
        s"FROM ev WHERE ${genPred()}) WHERE rn <= ${1 + rnd.nextInt(5)} " +
        s"ORDER BY event_type, event_id"
    case 4 => // top-k joined back to per-group stats: two rewrites meet a join
      s"WITH tk AS (SELECT event_type, count(*) AS c FROM ev WHERE ${genPred()} " +
        s"GROUP BY event_type ORDER BY c DESC, event_type LIMIT 3), " +
        s"st AS (SELECT event_type, count(DISTINCT user_id) AS nd, " +
        s"percentile(value, 1.0D) AS p1 FROM ev GROUP BY event_type) " +
        s"SELECT tk.event_type, tk.c, st.nd, st.p1 FROM tk JOIN st " +
        s"ON tk.event_type = st.event_type ORDER BY tk.event_type"
    case 5 => // window top-N feeding a distinct count
      s"SELECT count(DISTINCT user_id) AS nd, percentile(value, 0.0D) AS p0 FROM (" +
        s"SELECT user_id, value, row_number() OVER " +
        s"(PARTITION BY event_type ORDER BY value DESC, event_id) AS rn " +
        s"FROM ev WHERE ${genPred()}) WHERE rn <= 20"
  }

  test("differential fuzz: every armed family composed in one session ≡ unarmed") {
    Tables.load(spark, sfDir, "events").createOrReplaceTempView("ev")
    val n = sys.env.get("GRAFT_FUZZ_N").map(_.toInt).getOrElse(120)
    val cases = (1 to n).map(_ => genQuery())
    val exact = cases.map(q => canon(spark.sql(q).collect()))
    armedAll {
      cases.zip(exact).zipWithIndex.foreach { case ((q, want), i) =>
        val got = canon(spark.sql(q).collect())
        assert(got == want,
          s"fuzz case $i diverged under all-armed:\n$q\n" +
            s"armed-only: ${got.diff(want).take(3)}\nexact-only: ${want.diff(got).take(3)}")
      }
    }
    info(s"$n armed-composition fuzz cases bit-identical to unarmed")
  }

  test("BQL batch path is unchanged by the all-armed session") {
    val ev = Tables.load(spark, sfDir, "events")
    val bqls = Seq(
      "SELECT COUNT(DISTINCT user_id) AS nd FROM STREAM WHERE value > 100",
      "SELECT event_type AS k, COUNT(*) AS cnt FROM STREAM GROUP BY event_type ORDER BY k",
      "SELECT TOP(3, event_type) AS cnt FROM STREAM",
      "SELECT event_id, user_id FROM STREAM WHERE value BETWEEN 100 AND 300 LIMIT 100000")
    val exact = bqls.map(b => canon(graft.bql.Compiler.compile(b)._2(ev).collect()))
    armedAll {
      bqls.zip(exact).foreach { case (b, want) =>
        val got = canon(graft.bql.Compiler.compile(b)._2(ev).collect())
        assert(got == want, s"BQL diverged under all-armed: $b")
      }
    }
  }
}
