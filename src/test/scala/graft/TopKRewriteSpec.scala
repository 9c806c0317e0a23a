package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopKWindowRewrite

/** TopKWindowRewrite: the naive row_number-over-window top-N idiom, written
  * exactly as a user would write it, must (a) stay bit-identical on total
  * orders and (b) stop planning a WindowExec once the rule is armed. */
class TopKRewriteSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = GraftSession.local(4)
    if (!s.experimental.extraOptimizations.contains(TopKWindowRewrite))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ TopKWindowRewrite
    s
  }

  /** 10k events, ~40 groups; doc in ORDER BY makes the order total. */
  private def fixture(): DataFrame = {
    spark.range(10000).select(
      (col("id") % 40).as("grp"),
      (col("id") * 2654435761L % 100000).as("score"),
      col("id").as("row_id"))
  }

  private def naiveTopN(n: Int): DataFrame = {
    val w = Window.partitionBy(col("grp")).orderBy(col("score").desc, col("row_id"))
    fixture().withColumn("rn", row_number().over(w)).filter(col("rn") <= n)
  }

  private def executedPlanStr(df: DataFrame): String = {
    df.write.format("noop").mode("overwrite").save()
    (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
  }

  private def rows(df: DataFrame): Set[(Long, Long, Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet

  private def armed[T](k: Int)(body: => T): T = {
    spark.conf.set(TopKWindowRewrite.MaxKKey, k.toString)
    try body finally spark.conf.unset(TopKWindowRewrite.MaxKKey)
  }

  test("armed: top-3 per group plans as ObjectHashAggregate, no WindowExec, bit-identical") {
    val baseline = rows(naiveTopN(3))
    assert(baseline.size == 40 * 3)
    val pNaive = executedPlanStr(naiveTopN(3))
    assert(pNaive.contains("Window"), s"unarmed plan should keep its window:\n$pNaive")
    armed(100) {
      val df = naiveTopN(3)
      assert(rows(df) == baseline)
      val p = executedPlanStr(naiveTopN(3))
      assert(!p.contains("Window "), s"armed rule must remove the window sort:\n$p")
      assert(p.contains("ObjectHashAggregate") && p.contains("topk_min"), p)
      assert(p.contains("partial_topk_min"),
        s"the heap must combine map-side (partial+final), not hash-to-one-pass:\n$p")
    }
  }

  test("rn = 1 (dedup/top-1 idiom) and rn < N bounds both rewrite") {
    val w = Window.partitionBy(col("grp")).orderBy(col("score"), col("row_id"))
    def top1() = fixture().withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    def ltN() = fixture().withColumn("rn", row_number().over(w)).filter(col("rn") < 3)
    val b1 = rows(top1()); val b2 = rows(ltN())
    armed(100) {
      assert(rows(top1()) == b1 && b1.size == 40)
      assert(rows(ltN()) == b2 && b2.size == 80)
      assert(!executedPlanStr(top1()).contains("Window "))
      assert(!executedPlanStr(ltN()).contains("Window "))
    }
  }

  test("extra filter conjuncts are preserved verbatim") {
    val w = Window.partitionBy(col("grp")).orderBy(col("score").desc, col("row_id"))
    def q() = fixture().withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5 && col("score") % 2 === 0 && col("grp") < 30)
    val baseline = rows(q())
    armed(100) {
      assert(rows(q()) == baseline)
      assert(!executedPlanStr(q()).contains("Window "))
    }
  }

  test("guards: oversized N, rank(), and a descending STRING key all keep their window") {
    armed(4) {
      // N above maxK: no rewrite
      assert(executedPlanStr(naiveTopN(5)).contains("Window "))
      // rank() is not row_number(): no rewrite
      val w = Window.partitionBy(col("grp")).orderBy(col("score"))
      val ranked = fixture().withColumn("rn", rank().over(w)).filter(col("rn") <= 2)
      assert(executedPlanStr(ranked).contains("Window "))
      // descending string key: no order-reversing transform — no rewrite
      val named = fixture().withColumn("name", col("score").cast("string"))
      val wS = Window.partitionBy(col("grp")).orderBy(col("name").desc, col("row_id"))
      val dS = named.withColumn("rn", row_number().over(wS)).filter(col("rn") <= 2)
      assert(executedPlanStr(dS).contains("Window "))
    }
  }

  test("every direction/null-order combination on a nullable key is exact") {
    val nullable = fixture()
      .withColumn("ns", when(col("row_id") % 7 === 0, lit(null)).otherwise(col("score")))
    val orders = Seq(
      col("ns").asc_nulls_first, col("ns").asc_nulls_last,
      col("ns").desc_nulls_first, col("ns").desc_nulls_last)
    orders.foreach { ord =>
      val w = Window.partitionBy(col("grp")).orderBy(ord, col("row_id"))
      def q() = nullable.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      val baseline = q().collect().map(_.toSeq).toSet
      armed(100) {
        assert(q().collect().map(_.toSeq).toSet == baseline, s"order $ord diverged")
        assert(!executedPlanStr(q()).contains("Window "), s"order $ord kept its window")
      }
    }
  }

  test("Long.MinValue under a descending key ranks last, not first (BitwiseNot, no overflow)") {
    import spark.implicits._
    val df = Seq((1L, Long.MinValue, 1L), (1L, 5L, 2L), (1L, Long.MaxValue, 3L), (1L, -3L, 4L))
      .toDF("grp", "score", "row_id")
    val w = Window.partitionBy(col("grp")).orderBy(col("score").desc, col("row_id"))
    def q() = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
    val baseline = q().collect().map(_.toSeq).toSet
    armed(100) {
      assert(q().collect().map(_.toSeq).toSet == baseline)
      assert(!executedPlanStr(q()).contains("Window "))
    }
  }

  test("unarmed sessions never rewrite") {
    val p = executedPlanStr(naiveTopN(2))
    assert(p.contains("Window ") && !p.contains("topk_min"), p)
  }

  test("string asc keys and nullable asc-nulls-first keys rewrite exactly") {
    val df = fixture().withColumn("name",
      concat(lit("u"), lpad(col("score").cast("string"), 6, "0")))
      .withColumn("maybe", when(col("row_id") % 11 === 0, lit(null))
        .otherwise(col("score")))
    val w = Window.partitionBy(col("grp")).orderBy(col("maybe"), col("name"), col("row_id"))
    def q() = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
    val baseline = q().collect().map(_.toSeq).toSet
    armed(100) {
      assert(q().collect().map(_.toSeq).toSet == baseline)
      assert(!executedPlanStr(q()).contains("Window "))
    }
  }

  test("SQL-written top-N (subquery + WHERE rn <= N) rewrites too") {
    fixture().createOrReplaceTempView("topk_sql_fixture")
    def q() = spark.sql(
      """SELECT grp, score, row_id, rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY grp ORDER BY score, row_id) AS rn
        |  FROM topk_sql_fixture) WHERE rn <= 3""".stripMargin)
    val baseline = rows(q())
    armed(100) {
      assert(rows(q()) == baseline && baseline.size == 120)
      val p = executedPlanStr(q())
      assert(!p.contains("Window ") && p.contains("topk_min"), p)
    }
  }

  test("fuzz: random group/score/filter shapes match the window baseline") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 6).foreach { trial =>
      val nGroups = 1 + rnd.nextInt(50)
      val n = 1 + rnd.nextInt(8)
      val desc = rnd.nextBoolean()
      val base = spark.range(3000).select(
        (col("id") % nGroups).as("grp"),
        (col("id") * (2654435761L + trial) % 5000).as("score"),
        col("id").as("row_id"))
      val ord = if (desc) Seq(col("score").desc, col("row_id")) else Seq(col("score"), col("row_id"))
      val w = Window.partitionBy(col("grp")).orderBy(ord: _*)
      def q() = base.withColumn("rn", row_number().over(w)).filter(col("rn") <= n)
      val baseline = rows(q())
      armed(16) {
        val got = rows(q())
        assert(got == baseline, s"trial $trial n=$n desc=$desc: " +
          s"${(got -- baseline).take(3)} extra, ${(baseline -- got).take(3)} missing")
      }
    }
  }
}
