package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.bql.Compiler
import graft.sources.Tables
import graft.streaming.{MultiQueryEngine, ResultKind}

/** Differential fuzz: the SAME generated BQL must produce the SAME result
  * through the batch compiler (`Compiler.compile` over the whole fixture)
  * and the streaming engine (the fixture replayed as micro-batches through
  * `processBatch`, final result on duration timeout). This cross-checks
  * the two execution paths against each other over a much wider query
  * space than the hand-written specs — fusion, partial-merge, and post-agg
  * semantics all sit on the streaming side of the diff.
  *
  * Excluded by construction (documented semantic differences):
  *  - QUANTILE/PMF/CDF: sketch parameters differ between paths (estimates,
  *    tolerance-checked in MultiQueryEngineSpec instead);
  *  - RAW with limit < matches: both paths take an ARBITRARY subset;
  *    the generator always sets the limit above the match count so the
  *    result set is exact;
  *  - SUM/AVG over the double column: float summation order differs
  *    (integer columns are exact in both paths and are what we fuzz).
  */
class DifferentialSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = GraftSession.local(4)
  private lazy val events: DataFrame = Tables.load(spark, sfDir, "events")

  private val rnd = new scala.util.Random(20260812L)

  private def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.size))

  private def genPred(): String = {
    def leaf(): String = pick(Seq(
      s"value > ${rnd.nextInt(400)}",
      s"value <= ${rnd.nextInt(400)}",
      s"user_id % ${2 + rnd.nextInt(7)} == ${rnd.nextInt(2)}",
      s"event_type == '${pick(Seq("click", "view", "purchase", "scroll"))}'",
      s"event_type != '${pick(Seq("click", "view"))}'",
      s"event_id >= ${rnd.nextInt(900)}",
      s"value BETWEEN ${rnd.nextInt(200)} AND ${200 + rnd.nextInt(300)}",
      s"event_type IN ('click', '${pick(Seq("view", "error", "scroll"))}')",
      s"NOT (event_id < ${rnd.nextInt(500)})",
      s"value > ANY (${rnd.nextInt(300)}, ${rnd.nextInt(300)})",
      s"value <= ALL (${100 + rnd.nextInt(300)}, ${100 + rnd.nextInt(300)})",
      s"event_type == ANY ('click', '${pick(Seq("view", "purchase"))}')"))
    rnd.nextInt(3) match {
      case 0 => leaf()
      case 1 => s"${leaf()} AND ${leaf()}"
      case 2 => s"(${leaf()} OR ${leaf()})"
    }
  }

  private def genQuery(): String = {
    val where = if (rnd.nextBoolean()) s" WHERE ${genPred()}" else ""
    rnd.nextInt(5) match {
      case 0 => // RAW, limit above any possible match count → exact set
        s"SELECT event_id, event_type, user_id FROM STREAM$where LIMIT 5000"
      case 1 => // GROUP ALL over integer columns
        s"SELECT COUNT(*) AS cnt, SUM(user_id) AS su, MIN(event_id) AS mn, " +
          s"MAX(event_id) AS mx FROM STREAM$where"
      case 2 => // keyed GROUP BY with the full post-agg chain
        val key = pick(Seq("event_type", "user_id % 10"))
        val having = if (rnd.nextBoolean()) " HAVING cnt > 2" else ""
        val limit = if (rnd.nextBoolean()) " LIMIT 4" else ""
        val cull = if (rnd.nextBoolean()) " CULL au" else ""
        s"SELECT $key AS k, COUNT(*) AS cnt, AVG(user_id) AS au, cnt + 1 AS cnt1 " +
          s"FROM STREAM$where GROUP BY $key$having ORDER BY k$limit$cull"
      case 3 => // COUNT DISTINCT (theta on both paths)
        s"SELECT COUNT(DISTINCT ${pick(Seq("user_id", "event_type"))}) AS nd FROM STREAM$where"
      case 4 => // TOP K on the low-cardinality key (deterministic ties)
        s"SELECT TOP(3, event_type) AS cnt FROM STREAM$where"
    }
  }

  private def canon(rows: Seq[Row]): Seq[String] =
    rows.map { r =>
      (0 until r.length).map { i =>
        r.get(i) match {
          case null => "∅"
          case d: Double => f"$d%.9f"
          case v => v.toString
        }
      }.mkString("|")
    }.sorted

  private def batchResult(bql: String): Seq[Row] =
    Compiler.compile(bql)._2(events).collect().toSeq

  private def streamResult(bql: String, nBatches: Int): Seq[Row] = {
    var now = 1000000L
    val e = new MultiQueryEngine(spark, () => now)
    // clause order is LIMIT DURATION CULL — splice DURATION accordingly
    val withDur =
      if (bql.contains(" CULL ")) bql.replace(" CULL ", " DURATION 100000 CULL ")
      else s"$bql DURATION 100000"
    assert(e.submit("q", withDur).isRight, s"submit failed: $withDur")
    val per = 1000 / nBatches
    (0 until nBatches).foreach { i =>
      val hi = if (i == nBatches - 1) Int.MaxValue else (i + 1) * per
      e.processBatch(events.filter(
        col("event_id") >= i * per && col("event_id") < hi))
    }
    now += 200000
    e.tick()
    val rs = e.drainResults()
    assert(rs.map(_.kind) == Seq(ResultKind.Complete), s"kinds ${rs.map(_.kind)} for $bql")
    // Clip records are Maps; rebuild comparable rows in schema order via
    // the raw row list the engine presented
    rs.head.clip.records.map(m => Row.fromSeq(m.toSeq.sortBy(_._1).map(_._2)))
  }

  private def batchCanon(bql: String): Seq[String] = {
    val df = Compiler.compile(bql)._2(events)
    val names = df.columns.sorted
    canon(df.select(names.map(col): _*).collect().toSeq)
  }

  test("FILTER(list, mask) keeps positionally-selected elements (B3)") {
    import spark.implicits._
    val df = Seq((1L, Seq("a", "b", "c"), Seq(true, false, true))).toDF("id", "l", "m")
    val got = Compiler.compile("SELECT id, FILTER(l, m) AS kept FROM STREAM")._2(df)
      .collect().head.getSeq[String](1)
    assert(got == Seq("a", "c"))
    // null elements survive when their mask is true; null masks drop
    val got2 = Compiler.compile("SELECT FILTER(l, m) AS kept FROM STREAM")._2(
      Seq((Seq("a", null, "c"), Seq[java.lang.Boolean](true, true, null))).toDF("l", "m"))
      .collect().head.getSeq[String](0)
    assert(got2 == Seq("a", null))
  }

  test("quantified comparisons (B3 ANY/ALL) match their boolean expansion") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id").collect().map(_.getLong(0)).toSet
    val any = Compiler.compile(
      "SELECT event_id FROM STREAM WHERE value > ANY (150, 250) LIMIT 5000")._2(events)
    assert(ids(any) == ids(events.filter(col("value") > 150 || col("value") > 250)))
    val all = Compiler.compile(
      "SELECT event_id FROM STREAM WHERE value > ALL (150, 250) LIMIT 5000")._2(events)
    assert(ids(all) == ids(events.filter(col("value") > 150 && col("value") > 250)))
    assert(ids(all) != ids(any), "fixture must distinguish ANY from ALL")
    // literal-list quantifiers expand to plain comparisons → pushdown
    val plan = any.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(value,"),
      s"literal ANY must push to the scan:\n$plan")
    // list-typed field still works through exists()
    import spark.implicits._
    val lf = Seq((5L, Seq(1.0, 9.0)), (6L, Seq(1.0, 2.0))).toDF("event_id", "xs")
    val gotAny = Compiler.compile(
      "SELECT event_id FROM STREAM WHERE 3 < ANY xs LIMIT 10")._2(lf)
      .collect().map(_.getLong(0)).toSeq
    assert(gotAny == Seq(5L))
  }

  /** Found by this fuzz: an aliased expression group key
    * (`SELECT user_id % 10 AS k … GROUP BY user_id % 10`) must rename the
    * key's aggregate output — recomputing it post-agg fails to resolve
    * because the pre-agg columns are gone. */
  test("aliased expression group key resolves on both paths") {
    val bql = "SELECT user_id % 10 AS k, COUNT(*) AS cnt FROM STREAM " +
      "GROUP BY user_id % 10 ORDER BY k"
    val want = batchCanon(bql)
    assert(want.size == 10)
    val df = Compiler.compile(bql)._2(events)
    assert(df.columns.contains("k") && !df.columns.contains("expr_0"))
    assert(canon(streamResult(bql, 4)) == want)
  }

  /** Lateral (explode) queries take the engine's solo path with the
    * explode applied per micro-batch — the per-batch exploded partials
    * must fold to exactly the batch plan's answer. */
  test("LATERAL VIEW explode: streaming (3 batches) == batch") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("arr", org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType))))
    val tokens = Seq("a", "b", "c", "d")
    val rows = (0 until 30).map { i =>
      Row(i.toLong, (0 to i % 4).map(j => tokens((i + j) % 4)))
    }
    val df = spark.createDataFrame(rows.asJava, schema)
    val bql = "SELECT x, COUNT(*) AS cnt FROM STREAM LATERAL VIEW EXPLODE(arr) AS x " +
      "WHERE x != 'd' GROUP BY x ORDER BY x"
    val names = Seq("cnt", "x")
    val want = canon(Compiler.compile(bql)._2(df)
      .select(names.map(col): _*).collect().toSeq)
    var now = 1000000L
    val e = new MultiQueryEngine(spark, () => now)
    assert(e.submit("q", s"$bql DURATION 100000").isRight)
    (0 until 3).foreach(i => e.processBatch(
      df.filter(col("event_id") % 3 === i)))
    now += 200000
    e.tick()
    val rs = e.drainResults()
    assert(rs.map(_.kind) == Seq(ResultKind.Complete), s"kinds ${rs.map(_.kind)}")
    val got = canon(rs.head.clip.records.map(m =>
      Row.fromSeq(m.toSeq.sortBy(_._1).map(_._2))))
    assert(got == want, s"streaming $got vs batch $want")
  }

  // depth tunable for one-off deep sweeps: GRAFT_FUZZ_N=300 sbt test
  private val fuzzN = sys.env.getOrElse("GRAFT_FUZZ_N", "60").toInt

  test(s"$fuzzN random queries: streaming (4 batches) == batch, column-for-column") {
    var checked = 0
    (1 to fuzzN).foreach { i =>
      val bql = genQuery()
      val want = batchCanon(bql)
      val got = canon(streamResult(bql, 4))
      assert(got == want,
        s"MISMATCH #$i for: $bql\n  batch=${want.take(5)}\n  stream=${got.take(5)}")
      checked += 1
    }
    assert(checked == fuzzN)
  }

  /** Cumulative (ALL) windows emit per batch; after the full replay the
    * LAST emission must equal the one-shot batch aggregate. */
  test("cumulative RECORD window's final emission equals the batch result") {
    val shapes = Seq(
      "SELECT COUNT(*) AS cnt, SUM(user_id) AS su FROM STREAM WHERE value > 100",
      "SELECT event_type AS k, COUNT(*) AS cnt FROM STREAM GROUP BY event_type ORDER BY k",
      "SELECT COUNT(DISTINCT user_id) AS nd FROM STREAM")
    shapes.foreach { bql =>
      val want = batchCanon(bql)
      var now = 1000000L
      val e = new MultiQueryEngine(spark, () => now)
      assert(e.submit("w", s"$bql WINDOWING EVERY(1, RECORD, ALL)").isRight)
      val per = 250
      (0 until 4).foreach { i =>
        e.processBatch(events.filter(
          col("event_id") >= i * per && col("event_id") < (i + 1) * per))
        now += 10
      }
      val wins = e.drainResults().filter(_.kind == ResultKind.Window)
      assert(wins.nonEmpty, s"no window emissions for $bql")
      val last = canon(wins.last.clip.records.map(m =>
        Row.fromSeq(m.toSeq.sortBy(_._1).map(_._2))))
      assert(last == want, s"cumulative drift for: $bql\n  want=$want\n  got=$last")
    }
  }

  /** bql_windowed differential: EVERY(n, RECORD, WINDOW) resets state per
    * window, so with batches sized exactly to the window each emission
    * must equal the BATCH plan applied to just that slice — the sliced
    * twin of the cumulative test above, proving the reset path (not only
    * the merge path) agrees with batch semantics. */
  test("sliced RECORD window: every emission equals the batch plan over its slice") {
    val shapes = Seq(
      "SELECT event_type AS k, COUNT(*) AS cnt, SUM(user_id) AS su FROM STREAM " +
        "GROUP BY event_type ORDER BY k",
      // NOTE: no WHERE here — RECORD windows count records ENTERING the
      // aggregation (post-filter), so a filter would decouple window
      // closes from the 250-record slices this test aligns batches to
      "SELECT COUNT(*) AS cnt, MIN(event_id) AS mn, MAX(event_id) AS mx FROM STREAM",
      "SELECT COUNT(DISTINCT user_id) AS nd FROM STREAM")
    shapes.foreach { bql =>
      var now = 1000000L
      val e = new MultiQueryEngine(spark, () => now)
      assert(e.submit("w", s"$bql WINDOWING EVERY(250, RECORD, WINDOW)").isRight)
      val per = 250
      val slices = (0 until 4).map(i => events.filter(
        col("event_id") >= i * per && col("event_id") < (i + 1) * per))
      slices.foreach { s => e.processBatch(s); now += 10 }
      val wins = e.drainResults().filter(_.kind == ResultKind.Window)
      assert(wins.size == 4, s"expected 4 sliced emissions for $bql, got ${wins.size}")
      wins.zip(slices).zipWithIndex.foreach { case ((w, s), i) =>
        val df = Compiler.compile(bql)._2(s)
        val want = canon(df.select(df.columns.sorted.map(col): _*).collect().toSeq)
        val got = canon(w.clip.records.map(m =>
          Row.fromSeq(m.toSeq.sortBy(_._1).map(_._2))))
        assert(got == want, s"window $i drift for: $bql\n  want=$want\n  got=$got")
      }
    }
  }

  /** The TIME twin of the cumulative-RECORD differential, through the
    * same full text→AST→engine path: EVERY(n, TIME, ALL) closes windows
    * off the engine CLOCK (processBatch/tick), not record counts, and the
    * cumulative state must still converge to the one-shot batch result. */
  test("cumulative TIME window's final emission equals the batch result") {
    val shapes = Seq(
      "SELECT COUNT(*) AS cnt, SUM(user_id) AS su FROM STREAM WHERE value > 100",
      "SELECT event_type AS k, COUNT(*) AS cnt FROM STREAM GROUP BY event_type ORDER BY k",
      "SELECT COUNT(DISTINCT user_id) AS nd FROM STREAM")
    shapes.foreach { bql =>
      val want = batchCanon(bql)
      var now = 1000000L
      val e = new MultiQueryEngine(spark, () => now)
      assert(e.submit("w", s"$bql WINDOWING EVERY(100, TIME, ALL)").isRight)
      val per = 250
      (0 until 4).foreach { i =>
        e.processBatch(events.filter(
          col("event_id") >= i * per && col("event_id") < (i + 1) * per))
        now += 100 // cross the window boundary: the close must come from
        e.tick()   // the clock tick, data or no data
      }
      val wins = e.drainResults().filter(_.kind == ResultKind.Window)
      assert(wins.size == 4, s"one TIME close per tick for $bql, got ${wins.size}")
      val last = canon(wins.last.clip.records.map(m =>
        Row.fromSeq(m.toSeq.sortBy(_._1).map(_._2))))
      assert(last == want, s"cumulative TIME drift for: $bql\n  want=$want\n  got=$last")
    }
  }

  /** And the sliced twin: EVERY(n, TIME, WINDOW) resets state per close,
    * so with one batch fed per clock window each emission must equal the
    * batch plan over exactly that slice — proving the TIME reset path
    * agrees with batch semantics, not only the cumulative merge path. */
  test("sliced TIME window: every emission equals the batch plan over its slice") {
    val shapes = Seq(
      "SELECT event_type AS k, COUNT(*) AS cnt, SUM(user_id) AS su FROM STREAM " +
        "GROUP BY event_type ORDER BY k",
      "SELECT COUNT(*) AS cnt, MIN(event_id) AS mn, MAX(event_id) AS mx FROM STREAM",
      "SELECT COUNT(DISTINCT user_id) AS nd FROM STREAM")
    shapes.foreach { bql =>
      var now = 1000000L
      val e = new MultiQueryEngine(spark, () => now)
      assert(e.submit("w", s"$bql WINDOWING EVERY(100, TIME, WINDOW)").isRight)
      val per = 250
      val slices = (0 until 4).map(i => events.filter(
        col("event_id") >= i * per && col("event_id") < (i + 1) * per))
      slices.foreach { s => e.processBatch(s); now += 100; e.tick() }
      val wins = e.drainResults().filter(_.kind == ResultKind.Window)
      assert(wins.size == 4, s"expected 4 sliced TIME emissions for $bql, got ${wins.size}")
      wins.zip(slices).zipWithIndex.foreach { case ((w, s), i) =>
        val df = Compiler.compile(bql)._2(s)
        val want = canon(df.select(df.columns.sorted.map(col): _*).collect().toSeq)
        val got = canon(w.clip.records.map(m =>
          Row.fromSeq(m.toSeq.sortBy(_._1).map(_._2))))
        assert(got == want, s"TIME window $i drift for: $bql\n  want=$want\n  got=$got")
      }
    }
  }

  test("batch-count invariance: 1 batch == 7 batches for stateful shapes") {
    (1 to 15).foreach { _ =>
      val bql = genQuery()
      val a = canon(streamResult(bql, 1))
      val b = canon(streamResult(bql, 7))
      assert(a == b, s"batch-count sensitivity for: $bql")
    }
  }
}
