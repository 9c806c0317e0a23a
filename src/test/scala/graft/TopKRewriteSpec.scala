package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopKWindowRewrite

/** TopKWindowRewrite: the naive rank-function-over-window top-N idiom,
  * written exactly as a user would write it, must (a) stay identical to
  * the window result and (b) stop planning a WindowExec once the rule is
  * armed — for all three of row_number()/rank()/dense_rank(), every
  * direction/null-order/type combination, and with ties at the boundary. */
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

  /** Heavy-tie twin: each (grp, score) repeats ~5x, so every small N has
    * ties AT the boundary — the rank()/dense_rank() acid test. */
  private def tieFixture(): DataFrame = {
    spark.range(8000).select(
      (col("id") % 40).as("grp"),
      expr("id div 200").as("score"), // 40 distinct scores, 5 rows per (grp, score)
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
      assert(p.contains("ObjectHashAggregate") && p.contains("window_topk"), p)
      assert(p.contains("partial_window_topk"),
        s"the buffer must combine map-side (partial+final), not hash-to-one-pass:\n$p")
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

  test("rank(): boundary ties are all kept, ranks exact, no WindowExec") {
    Seq(1, 2, 3, 7).foreach { n =>
      val w = Window.partitionBy(col("grp")).orderBy(col("score"), col("row_id"))
      val wTies = Window.partitionBy(col("grp")).orderBy(col("score"))
      // total order (no ties) AND tie-heavy order, both directions
      def qTotal() = fixture().withColumn("rn", rank().over(w)).filter(col("rn") <= n)
      def qTies() = tieFixture().withColumn("rn", rank().over(wTies)).filter(col("rn") <= n)
      def qTiesDesc() = tieFixture().withColumn("rn",
        rank().over(Window.partitionBy(col("grp")).orderBy(col("score").desc)))
        .filter(col("rn") <= n)
      val bTotal = rows(qTotal()); val bTies = rows(qTies()); val bDesc = rows(qTiesDesc())
      // ties straddle the bound: n=2 keeps 5 rows (rank 1 x5), n=7 keeps 10
      assert(bTies.size >= n * 40, s"tie fixture must keep at least n per group")
      armed(100) {
        assert(rows(qTotal()) == bTotal, s"rank n=$n total order diverged")
        assert(rows(qTies()) == bTies, s"rank n=$n ties diverged")
        assert(rows(qTiesDesc()) == bDesc, s"rank n=$n desc ties diverged")
        assert(!executedPlanStr(qTies()).contains("Window "))
      }
    }
  }

  test("dense_rank(): first N distinct keys with all their ties, ranks exact") {
    Seq(1, 2, 5).foreach { n =>
      val wTies = Window.partitionBy(col("grp")).orderBy(col("score"))
      def q() = tieFixture().withColumn("rn", dense_rank().over(wTies)).filter(col("rn") <= n)
      def qDesc() = tieFixture().withColumn("rn",
        dense_rank().over(Window.partitionBy(col("grp")).orderBy(col("score").desc)))
        .filter(col("rn") <= n)
      val b = rows(q()); val bD = rows(qDesc())
      assert(b.size == 40 * n * 5, "dense_rank keeps every tie of the first n keys")
      armed(100) {
        assert(rows(q()) == b, s"dense_rank n=$n diverged")
        assert(rows(qDesc()) == bD, s"dense_rank desc n=$n diverged")
        val p = executedPlanStr(q())
        assert(!p.contains("Window ") && p.contains("window_topk"), p)
      }
    }
  }

  test("rank()/dense_rank() = N (exact-rank slice) re-applies the filter correctly") {
    val wTies = Window.partitionBy(col("grp")).orderBy(col("score"))
    def q() = tieFixture().withColumn("rn", rank().over(wTies)).filter(col("rn") === 6)
    def qd() = tieFixture().withColumn("rn", dense_rank().over(wTies)).filter(col("rn") === 2)
    val b = rows(q()); val bd = rows(qd())
    assert(b.nonEmpty && bd.nonEmpty)
    armed(100) {
      assert(rows(q()) == b)
      assert(rows(qd()) == bd)
      assert(!executedPlanStr(q()).contains("Window "))
    }
  }

  test("guards: oversized N, ntile(), and a map-typed ORDER key keep their window") {
    armed(4) {
      // N above maxK: no rewrite
      assert(executedPlanStr(naiveTopN(5)).contains("Window "))
      // ntile() is not a supported rank function: no rewrite
      val w = Window.partitionBy(col("grp")).orderBy(col("score"))
      val tiled = fixture().withColumn("rn", ntile(4).over(w)).filter(col("rn") <= 2)
      assert(executedPlanStr(tiled).contains("Window "))
      // a map-typed ORDER BY key never reaches the rule: the ANALYZER
      // rejects it (INVALID_ORDERING_TYPE) before optimization — the
      // rule's own isOrderable guard is defense in depth
      val mapped = fixture().withColumn("m", map(col("grp"), col("score")))
      val wM = Window.partitionBy(col("grp")).orderBy(col("m"))
      intercept[Exception] {
        mapped.withColumn("rn", row_number().over(wM)).filter(col("rn") <= 2).collect()
      }
    }
  }

  test("boundary: a Project between the rn filter and the window still rewrites (predicate pushdown normalizes it)") {
    // The rule matches Filter-directly-above-Window only (same scope as
    // InferWindowGroupLimit) — but Catalyst's PushDownPredicates moves
    // the rn conjunct below the intervening Project before the rule
    // runs, so the user's projected-between shape rewrites anyway.
    // Pinned so a refactor that breaks that normalization is noticed.
    val wP = Window.partitionBy(col("grp")).orderBy(col("score"), col("row_id"))
    def projected() = fixture().withColumn("rn", row_number().over(wP))
      .select(col("grp"), (col("score") * 2).as("dscore"), col("rn"))
      .filter(col("rn") <= 2)
    val baseline = projected().collect().map(_.toSeq).toSet
    armed(4) {
      assert(projected().collect().map(_.toSeq).toSet == baseline)
      val pP = executedPlanStr(projected())
      assert(!pP.contains("Window ") && pP.contains("window_topk"), pP)
    }
  }

  test("map-typed PAYLOAD columns ride along (ordering never touches them)") {
    val mapped = fixture().withColumn("m", map(col("grp"), col("score")))
    val w = Window.partitionBy(col("grp")).orderBy(col("score"), col("row_id"))
    def q() = mapped.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    val baseline = q().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getMap[Long, Long](3).toMap, r.getInt(4))).toSet
    armed(100) {
      val got = q().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getMap[Long, Long](3).toMap, r.getInt(4))).toSet
      assert(got == baseline)
      assert(!executedPlanStr(q()).contains("Window "))
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

  test("descending STRING and DATE keys rewrite exactly (all four null-order combos)") {
    val typed = fixture()
      .withColumn("name", when(col("row_id") % 5 === 0, lit(null))
        .otherwise(concat(lit("u"), (col("score") % 50).cast("string"))))
      .withColumn("day", when(col("row_id") % 6 === 0, lit(null))
        .otherwise(date_add(lit("2026-01-01"), (col("score") % 90).cast("int"))))
    Seq(col("name").desc_nulls_first, col("name").desc_nulls_last,
        col("name").asc_nulls_first,
        col("day").desc_nulls_first, col("day").desc_nulls_last)
      .foreach { ord =>
        val w = Window.partitionBy(col("grp")).orderBy(ord, col("row_id"))
        def q() = typed.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        val baseline = q().collect().map(_.toSeq).toSet
        armed(100) {
          assert(q().collect().map(_.toSeq).toSet == baseline, s"order $ord diverged")
          assert(!executedPlanStr(q()).contains("Window "), s"order $ord kept its window")
        }
        // rank() over the same non-total string/date order: tie sets match
        def qr() = typed.withColumn("rn", rank().over(
          Window.partitionBy(col("grp")).orderBy(ord))).filter(col("rn") <= 3)
        val rBase = qr().collect().map(_.toSeq).toSet
        armed(100) {
          assert(qr().collect().map(_.toSeq).toSet == rBase, s"rank over $ord diverged")
        }
      }
  }

  test("NaN scores under a descending double key place exactly as the window sort") {
    import spark.implicits._
    val df = Seq(
      (1L, Double.NaN, 1L), (1L, 5.0, 2L), (1L, Double.PositiveInfinity, 3L),
      (1L, -3.0, 4L), (1L, Double.NaN, 5L), (2L, Double.NaN, 6L), (2L, 1.0, 7L))
      .toDF("grp", "score", "row_id")
    // NaN != NaN under ==; stringify scores so set compare works
    def keyed(df2: DataFrame) = df2.collect()
      .map(r => (r.getLong(0), r.getDouble(1).toString, r.getLong(2), r.getInt(3))).toSet
    Seq(col("score").desc, col("score").asc).foreach { ord =>
      val w = Window.partitionBy(col("grp")).orderBy(ord, col("row_id"))
      def q() = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      val baseline = keyed(q())
      armed(100) {
        assert(keyed(q()) == baseline, s"NaN placement diverged under $ord")
        assert(!executedPlanStr(q()).contains("Window "))
      }
    }
  }

  test("Long.MinValue under a descending key ranks last, not first") {
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

  test("GLOBAL top-N (no PARTITION BY) rewrites away the single-partition window") {
    // the classic trap: row_number() OVER (ORDER BY ...) moves ALL data
    // to one partition (Spark even logs a warning). Armed, the rewrite
    // plans it as a partial+final global aggregate — each map task keeps
    // k rows, one k-vs-k final merge — the aggregate-side analogue of
    // TakeOrderedAndProject, with rank()/dense_rank() tie semantics kept
    val wG = Window.orderBy(col("score"), col("row_id"))
    val wT = Window.orderBy(col("score"))
    def qRn() = fixture().withColumn("rn", row_number().over(wG)).filter(col("rn") <= 5)
    def qRank() = tieFixture().withColumn("rn", rank().over(wT)).filter(col("rn") <= 3)
    val bRn = rows(qRn()); val bRank = rows(qRank())
    assert(bRn.size == 5 && bRank.size >= 3)
    armed(100) {
      assert(rows(qRn()) == bRn)
      assert(rows(qRank()) == bRank)
      val p = executedPlanStr(qRn())
      assert(!p.contains("Window ") && p.contains("partial_window_topk"),
        s"global top-N must plan partial+final, not a one-partition window:\n$p")
    }
  }

  test("unarmed sessions never rewrite") {
    val p = executedPlanStr(naiveTopN(2))
    assert(p.contains("Window ") && !p.contains("window_topk"), p)
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

  test("SQL-written top-N (subquery + WHERE rn <= N) rewrites too, rank() included") {
    fixture().createOrReplaceTempView("topk_sql_fixture")
    def q() = spark.sql(
      """SELECT grp, score, row_id, rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY grp ORDER BY score, row_id) AS rn
        |  FROM topk_sql_fixture) WHERE rn <= 3""".stripMargin)
    def qr() = spark.sql(
      """SELECT grp, score, row_id, rn FROM (
        |  SELECT *, rank() OVER (PARTITION BY grp ORDER BY score, row_id) AS rn
        |  FROM topk_sql_fixture) WHERE rn <= 3""".stripMargin)
    val baseline = rows(q()); val rBaseline = rows(qr())
    armed(100) {
      assert(rows(q()) == baseline && baseline.size == 120)
      assert(rows(qr()) == rBaseline)
      val p = executedPlanStr(q())
      assert(!p.contains("Window ") && p.contains("window_topk"), p)
      assert(!executedPlanStr(qr()).contains("Window "))
    }
  }

  test("fuzz: random group/score/filter shapes match the window baseline for all three functions") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 6).foreach { trial =>
      val nGroups = 1 + rnd.nextInt(50)
      val n = 1 + rnd.nextInt(8)
      val desc = rnd.nextBoolean()
      // tie density: scores collide ~tieMod-fold
      val tieMod = 1 + rnd.nextInt(200)
      val base = spark.range(3000).select(
        (col("id") % nGroups).as("grp"),
        (col("id") * (2654435761L + trial) % 5000 % tieMod).as("score"),
        col("id").as("row_id"))
      val ordTotal = if (desc) Seq(col("score").desc, col("row_id")) else Seq(col("score"), col("row_id"))
      val ordTies = if (desc) Seq(col("score").desc) else Seq(col("score"))
      val wT = Window.partitionBy(col("grp")).orderBy(ordTotal: _*)
      val wK = Window.partitionBy(col("grp")).orderBy(ordTies: _*)
      def qRn() = base.withColumn("rn", row_number().over(wT)).filter(col("rn") <= n)
      def qRank() = base.withColumn("rn", rank().over(wK)).filter(col("rn") <= n)
      def qDense() = base.withColumn("rn", dense_rank().over(wK)).filter(col("rn") <= n)
      val bRn = rows(qRn()); val bRank = rows(qRank()); val bDense = rows(qDense())
      armed(16) {
        assert(rows(qRn()) == bRn, s"trial $trial row_number n=$n desc=$desc diverged")
        assert(rows(qRank()) == bRank, s"trial $trial rank n=$n desc=$desc tieMod=$tieMod diverged")
        assert(rows(qDense()) == bDense, s"trial $trial dense_rank n=$n desc=$desc diverged")
      }
    }
  }
}
