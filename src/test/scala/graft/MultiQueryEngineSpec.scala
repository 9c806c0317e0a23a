package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.streaming.{MultiQueryEngine, ResultKind}

/** Streaming multi-query runtime semantics (SURVEY.md §2.B B13–B17):
  * batch-replay of the events fixture through processBatch with an
  * injected clock — the Structured-Streaming analog of the reference's
  * FixedClock harness (BulletSparkTest.scala:58). */
class MultiQueryEngineSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = GraftSession.local(4)

  private var now: Long = 0L
  private def newEngine(maxEmits: Int = Int.MaxValue, intervalMs: Long = 1000L) = {
    now = 1000000L
    new MultiQueryEngine(spark, () => now, maxEmits, intervalMs)
  }

  private def events: DataFrame = Tables.load(spark, sfDir, "events")

  /** Spark ACTIONS (QueryExecutions) completed while `body` runs — the
    * fusion unit of account. Raw job counts would over-count under AQE,
    * which runs one action as several jobs (one per query stage). */
  private def countActions(body: => Unit): Int = {
    val n = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ns: Long): Unit =
        n.incrementAndGet()
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit =
        n.incrementAndGet()
    }
    spark.listenerManager.register(listener)
    try {
      body
      org.apache.spark.graftshim.MetricsBridge.waitListenerBus(spark.sparkContext)
      n.get()
    } finally spark.listenerManager.unregister(listener)
  }
  private def batches(n: Int): Seq[DataFrame] = {
    val total = 1000
    val per = total / n
    (0 until n).map(i => events.filter(
      col("event_id") >= i * per && col("event_id") < (i + 1) * per))
  }

  test("RAW limit-k completes at k (B4)") {
    val e = newEngine()
    assert(e.submit("q1", "SELECT event_id, event_type FROM STREAM LIMIT 5").isRight)
    e.processBatch(batches(4).head)
    val rs = e.drainResults()
    assert(rs.map(_.kind) == Seq(ResultKind.Complete))
    assert(rs.head.clip.records.size == 5)
    assert(e.activeQueryIds.isEmpty)
  }

  test("pipeline scalar verbs route through the streaming engine (LANGID/QUALITY/TOKENS)") {
    import spark.implicits._
    val e = newEngine()
    // a documents-shaped micro-batch: the engine is schema-agnostic, so
    // the curation-gate query runs over any stream carrying `text`
    val docs = Seq(
      (1L, "the fast merge join group the the a"),
      (2L, "data value row data table column"),
      (3L, null.asInstanceOf[String]),
      (4L, "spark query stream spark")).toDF("doc_id", "text")
    assert(e.submit("vq1",
      "SELECT COUNT(*) AS n FROM STREAM WHERE TOKENS(text) >= 4 DURATION 50").isRight)
    assert(e.submit("vq2",
      "SELECT doc_id, LANGID(text) AS l FROM STREAM WHERE QUALITY(text) >= 1 " +
        "LIMIT 10 DURATION 50").isRight)
    e.processBatch(docs)
    now += 100 // past DURATION → terminal emits
    e.processBatch(docs.limit(0))
    val rs = e.drainResults()
    val byId = rs.groupBy(_.queryId)
    // TOKENS >= 4: docs 1 (8), 2 (6), 4 (4) — null text counts 1 like empty
    val n = byId("vq1").last.clip.records.head("n").asInstanceOf[Long]
    assert(n == 3L, s"got $n")
    // QUALITY >= 1 keeps all (uniqueness or stopwords hold everywhere
    // except... null/empty scores 1 via uniqueness) — and LANGID argmax
    // routes doc 2 to 'es', doc 4 to 'zh'
    val recs = byId("vq2").last.clip.records
    val langs = recs.map(r => r("doc_id").asInstanceOf[Long] -> r("l")).toMap
    assert(langs(2L) == "es" && langs(4L) == "zh", s"got $langs")
  }

  test("cumulative GROUP ALL count across batches (B5 + ALL window)") {
    val e = newEngine()
    e.submit("q2", "SELECT COUNT(*) AS cnt FROM STREAM WINDOWING EVERY(1, RECORD, ALL)")
    val bs = batches(4)
    bs.foreach { b => e.processBatch(b); now += 10 }
    val rs = e.drainResults()
    assert(rs.size == 4)
    val counts = rs.map(_.clip.records.head("cnt").asInstanceOf[Long])
    assert(counts == Seq(250L, 500L, 750L, 1000L), s"got $counts")
  }

  test("tumbling RECORD window resets state (B13 WINDOW include)") {
    val e = newEngine()
    e.submit("q3", "SELECT COUNT(*) AS cnt FROM STREAM WINDOWING EVERY(250, RECORD, WINDOW)")
    batches(4).foreach { b => e.processBatch(b); now += 10 }
    val counts = e.drainResults().map(_.clip.records.head("cnt").asInstanceOf[Long])
    assert(counts == Seq(250L, 250L, 250L, 250L), s"got $counts")
  }

  test("TIME window closes at batch boundary after interval (B13)") {
    val e = newEngine()
    e.submit("q4", "SELECT COUNT(*) AS cnt FROM STREAM WINDOWING EVERY(30, TIME, ALL)")
    val bs = batches(4)
    e.processBatch(bs(0)) // t=0: window open
    now += 35
    e.processBatch(bs(1)) // t=35: >= 30ms → emit
    val rs = e.drainResults()
    assert(rs.size == 1)
    assert(rs.head.clip.records.head("cnt").asInstanceOf[Long] == 500L)
  }

  test("duration timeout emits final + COMPLETE (B14)") {
    val e = newEngine()
    e.submit("q5", "SELECT COUNT(*) AS cnt FROM STREAM DURATION 50")
    e.processBatch(batches(4).head)
    assert(e.drainResults().isEmpty)
    now += 60
    e.processBatch(batches(4)(1))
    val rs = e.drainResults()
    assert(rs.map(_.kind) == Seq(ResultKind.Complete))
    assert(rs.head.clip.records.head("cnt").asInstanceOf[Long] == 500L)
    assert(e.activeQueryIds.isEmpty)
  }

  test("tick() times out queries with no data flowing (B14)") {
    val e = newEngine()
    e.submit("q6", "SELECT COUNT(*) AS cnt FROM STREAM DURATION 50")
    now += 100
    e.tick()
    assert(e.drainResults().map(_.kind) == Seq(ResultKind.Complete))
  }

  test("external KILL signal (B17)") {
    val e = newEngine()
    e.submit("q7", "SELECT COUNT(*) AS cnt FROM STREAM")
    e.kill("q7")
    val rs = e.drainResults()
    assert(rs.map(_.kind) == Seq(ResultKind.Kill))
    assert(e.activeQueryIds.isEmpty)
  }

  test("parse error goes to the error channel (B16)") {
    val e = newEngine()
    assert(e.submit("q8", "SELEKT broken FROM").isLeft)
    val rs = e.drainResults()
    assert(rs.map(_.kind) == Seq(ResultKind.Fail))
    assert(e.activeQueryIds.isEmpty)
  }

  test("rate limit kills the query (B15)") {
    val e = newEngine(maxEmits = 1, intervalMs = 1000000L)
    e.submit("q9", "SELECT COUNT(*) AS cnt FROM STREAM WINDOWING EVERY(1, RECORD, ALL)")
    val bs = batches(4)
    e.processBatch(bs(0)) // emit 1: ok
    e.processBatch(bs(1)) // emit 2: breach → FAIL + removed
    val kinds = e.drainResults().map(_.kind)
    assert(kinds == Seq(ResultKind.Window, ResultKind.Window, ResultKind.Fail))
    assert(e.activeQueryIds.isEmpty)
  }

  test("COUNT DISTINCT merges theta sketches across batches (B6)") {
    val e = newEngine()
    e.submit("q10", "SELECT COUNT(DISTINCT user_id) AS nu FROM STREAM DURATION 1000")
    batches(4).foreach(e.processBatch)
    now += 2000
    e.tick()
    val rs = e.drainResults()
    val exact = events.select(countDistinct(col("user_id"))).head().getLong(0)
    assert(rs.head.clip.records.head("nu").asInstanceOf[Long] == exact)
  }

  test("BQL SET sizes the streaming sketch state (B6 + SET)") {
    val e = newEngine()
    // lgk=4 → 16 nominal entries, far below the 1000 distinct event_ids:
    // the tiny sketch must ESTIMATE; the default (lgk=12, 4096 entries)
    // answers exactly. Different answers from the two queries over the
    // same batches prove the SET text reached the state's sketch builder.
    e.submit("small", "SET spark.graft.bql.theta.lgk = 4; " +
      "SELECT COUNT(DISTINCT event_id) AS n FROM STREAM DURATION 1000")
    e.submit("dflt", "SELECT COUNT(DISTINCT event_id) AS n FROM STREAM DURATION 1000")
    batches(4).foreach(e.processBatch)
    now += 2000
    e.tick()
    val rs = e.drainResults().map(m => m.queryId -> m.clip.records).toMap
    val exact = 1000L
    assert(rs("dflt").head("n").asInstanceOf[Long] == exact)
    val est = rs("small").head("n").asInstanceOf[Long]
    // estimation-mode RSE at 16 entries is 1/sqrt(16) = 25%; 3·RSE band
    assert(est != exact, "16-entry sketch answered exactly — SET ignored?")
    assert(math.abs(est - exact).toDouble / exact < 0.75, s"estimate $est")
    // a bad knob value is a parse/validate error on the B16 channel
    assert(e.submit("bad", "SET spark.graft.bql.theta.lgk = 99; " +
      "SELECT COUNT(DISTINCT event_id) AS n FROM STREAM").isLeft)
    assert(e.drainResults().map(_.kind) == Seq(ResultKind.Fail))
    // session-conf fallback (batch-path precedence parity): a state built
    // with no per-query SET reads the knob off the conf accessor
    val qNoSet = graft.bql.Parser.parse("SELECT COUNT(DISTINCT event_id) AS n FROM STREAM")
    val st = graft.streaming.QueryState.forQuery(qNoSet,
      k => if (k == graft.bql.Compiler.ThetaLgkKey) Some("4") else None)
    st.update(events)
    val viaConf = st.present(spark).head.getLong(0)
    assert(viaConf != exact && math.abs(viaConf - exact).toDouble / exact < 0.75,
      s"conf-sized sketch answered $viaConf")
  }

  test("TOP K merges counts across batches (B8)") {
    val e = newEngine()
    e.submit("q11", "SELECT TOP(3, event_type) AS cnt FROM STREAM DURATION 1000")
    batches(4).foreach(e.processBatch)
    now += 2000
    e.tick()
    val got = e.drainResults().head.clip.records
      .map(r => (r("event_type").toString, r("cnt").asInstanceOf[Long]))
    val exact = events.groupBy(col("event_type")).count()
      .orderBy(col("count").desc, col("event_type")).limit(3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exact)
  }

  test("QUANTILE merges KLL sketches across batches (B7)") {
    val e = newEngine()
    e.submit("q12", "SELECT QUANTILE(value, 0.5) AS med FROM STREAM DURATION 1000")
    batches(4).foreach(e.processBatch)
    now += 2000
    e.tick()
    val med = e.drainResults().head.clip.records
      .find(_("quantile") == 0.5).get("med").asInstanceOf[Double]
    val exact = events.agg(expr("percentile(value, 0.5)")).head().getDouble(0)
    assert(math.abs(med - exact) / math.abs(exact) < 0.05, s"median $med vs exact $exact")
  }

  test("PMF/CDF distribution across batches matches exact bins (B7)") {
    val e = newEngine()
    e.submit("pm1", "SELECT PMF(value, 100, 250, 400) AS mass FROM STREAM DURATION 1000")
    e.submit("pm2", "SELECT CDF(value, 100, 250, 400) AS cum FROM STREAM DURATION 1000")
    batches(4).foreach(e.processBatch)
    now += 2000
    e.tick()
    val rs = e.drainResults().map(m => m.queryId -> m.clip.records).toMap
    val vs = events.select("value").collect().map(_.getDouble(0))
    val exactPmf = Seq(
      vs.count(_ < 100).toLong, vs.count(v => v >= 100 && v < 250).toLong,
      vs.count(v => v >= 250 && v < 400).toLong, vs.count(_ >= 400).toLong)
    val gotPmf = rs("pm1").sortBy(_("bin").asInstanceOf[Int]).map(_("mass").asInstanceOf[Long])
    // sketch estimates: within 2% of n per bin (n=1000, sketch is exact
    // at this size in practice; allow slack for the interval convention)
    gotPmf.zip(exactPmf).foreach { case (g, x) =>
      assert(math.abs(g - x) <= 20, s"pmf got $gotPmf want $exactPmf")
    }
    val exactCdf = Seq(100.0, 250.0, 400.0).map(p => vs.count(_ <= p).toLong)
    val gotCdf = rs("pm2").sortBy(_("point").asInstanceOf[Double]).map(_("cum").asInstanceOf[Long])
    gotCdf.zip(exactCdf).foreach { case (g, x) =>
      assert(math.abs(g - x) <= 20, s"cdf got $gotCdf want $exactCdf")
    }
  }

  test("GROUP BY with HAVING/ORDER through the streaming state (B5+B9+B11)") {
    val e = newEngine()
    e.submit("q13",
      "SELECT event_type, COUNT(*) AS cnt, AVG(user_id) AS au FROM STREAM " +
        "GROUP BY event_type HAVING cnt > 150 ORDER BY cnt DESC, event_type DURATION 1000")
    batches(4).foreach(e.processBatch)
    now += 2000
    e.tick()
    val got = e.drainResults().head.clip.records
      .map(r => (r("event_type").toString, r("cnt").asInstanceOf[Long], r("au").asInstanceOf[Double]))
    val exact = events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), avg(col("user_id")).as("au"))
      .filter(col("cnt") > 150)
      .orderBy(col("cnt").desc, col("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == exact)
  }

  test("concurrent queries over one shared batch stream (A5 multi-query)") {
    val e = newEngine()
    e.submit("qa", "SELECT COUNT(*) AS cnt FROM STREAM WHERE event_type == 'click' WINDOWING EVERY(1, RECORD, ALL)")
    e.submit("qb", "SELECT COUNT(*) AS cnt FROM STREAM WHERE event_type == 'view' WINDOWING EVERY(1, RECORD, ALL)")
    e.submit("qc", "SELECT event_id FROM STREAM WHERE value > 499 LIMIT 3")
    batches(2).foreach { b => e.processBatch(b); now += 10 }
    val rs = e.drainResults()
    val clicks = events.filter(col("event_type") === "click").count()
    val views = events.filter(col("event_type") === "view").count()
    val qaLast = rs.filter(_.queryId == "qa").last.clip.records.head("cnt")
    val qbLast = rs.filter(_.queryId == "qb").last.clip.records.head("cnt")
    assert(qaLast == clicks && qbLast == views)
  }

  test("metrics track the query lifecycle (A10)") {
    val e = newEngine()
    e.submit("m1", "SELECT COUNT(*) AS cnt FROM STREAM DURATION 50")
    e.submit("m2", "SELECT COUNT(*) AS cnt FROM STREAM")
    e.submit("m3", "not bql at all")
    e.kill("m2")
    now += 100
    e.tick()
    val m = e.metrics.snapshot
    assert(m("queries_received") == 3L)
    assert(m("queries_done") == 1L)
    assert(m("queries_killed") == 1L)
    assert(m("queries_failed") == 1L)
    assert(m("queries_running") == 0L)
  }

  test("result sinks receive every published message (A7)") {
    val e = newEngine()
    val sink = new graft.streaming.MemoryResultSink
    e.addSink(sink)
    e.submit("s1", "SELECT event_id FROM STREAM LIMIT 3")
    e.processBatch(batches(4).head)
    assert(sink.messages.map(_.kind) == Seq(ResultKind.Complete))
    assert(sink.messages.head.clip.asJson.contains("\"records\""))
  }

  test("TIME window emits on tick with no data flowing (B13)") {
    val e = newEngine()
    e.submit("t1", "SELECT COUNT(*) AS cnt FROM STREAM WINDOWING EVERY(30, TIME, ALL)")
    e.processBatch(batches(4).head)
    now += 50
    e.tick() // no data batch, but the window is due
    val rs = e.drainResults()
    assert(rs.map(_.kind) == Seq(ResultKind.Window))
    assert(rs.head.clip.records.head("cnt").asInstanceOf[Long] == 250L)
  }

  test("control-plane stream submits and kills queries (A1/A4)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ctrl = MemoryStream[(String, String, String)]
    val e = new MultiQueryEngine(spark)
    val q = e.attachControl(ctrl.toDF().toDF("action", "query_id", "bql"), triggerMs = 50L)
    try {
      ctrl.addData(("submit", "c1", "SELECT COUNT(*) AS cnt FROM STREAM"))
      q.processAllAvailable()
      assert(e.activeQueryIds == Seq("c1"))
      ctrl.addData(("kill", "c1", ""))
      q.processAllAvailable()
      assert(e.activeQueryIds.isEmpty)
      assert(e.drainResults().map(_.kind) == Seq(ResultKind.Kill))
    } finally q.stop()
  }

  test("empty batches are harmless for every state type") {
    val e = newEngine()
    e.submit("e1", "SELECT COUNT(*) AS cnt FROM STREAM WINDOWING EVERY(1, RECORD, ALL)")
    e.submit("e2", "SELECT COUNT(DISTINCT user_id) AS nu FROM STREAM")
    e.submit("e3", "SELECT QUANTILE(value, 0.5) AS m FROM STREAM")
    e.submit("e4", "SELECT TOP(3, event_type) AS cnt FROM STREAM")
    e.submit("e5", "SELECT event_id FROM STREAM LIMIT 5")
    val empty = events.filter(col("event_id") < 0)
    e.processBatch(empty)
    assert(e.drainResults().isEmpty) // no records -> no RECORD-window emits
    assert(e.activeQueryIds.size == 5)
    e.processBatch(batches(4).head) // engine still healthy afterwards
    assert(e.drainResults().nonEmpty)
  }

  test("TOP K fuses with a same-key GROUP BY and stays exact (B8 fusion)") {
    val e = newEngine()
    e.submit("f1", "SELECT TOP(3, event_type) AS cnt FROM STREAM DURATION 1000")
    e.submit("f2", "SELECT event_type, COUNT(*) AS cnt FROM STREAM " +
      "WHERE value > 250 GROUP BY event_type ORDER BY event_type DURATION 1000")
    // prove the fusion (not just agreement): the two keyed queries must
    // share ONE groupBy job per batch — the under-cap fused path's single
    // probe collect. Unfused they would cost a job each.
    val acts = countActions { batches(4).foreach(e.processBatch) }
    assert(acts == 4, s"expected 1 fused groupBy action per batch, saw $acts over 4 batches")
    now += 2000
    e.tick()
    val rs = e.drainResults().map(m => m.queryId -> m.clip.records).toMap
    val topExact = events.groupBy(col("event_type")).count()
      .orderBy(col("count").desc, col("event_type")).limit(3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rs("f1").map(r => (r("event_type").toString, r("cnt").asInstanceOf[Long])) == topExact)
    val grpExact = events.filter(col("value") > 250)
      .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("event_type")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rs("f2").map(r => (r("event_type").toString, r("cnt").asInstanceOf[Long])) == grpExact)
  }

  /** Mixed sketch types — Theta COUNT DISTINCT, KLL QUANTILE, KLL PMF,
    * plain global GROUP — are all GlobalCombinable, so ANY number of them
    * must ride ONE shared aggregate job per batch (the 100 TB property:
    * job count is O(distinct shapes), not O(queries)). */
  test("mixed Theta/KLL/global-GROUP queries fuse into one aggregate job per batch") {
    val e = newEngine()
    e.submit("m1", "SELECT COUNT(DISTINCT user_id) AS nu FROM STREAM DURATION 1000")
    e.submit("m2", "SELECT QUANTILE(value, 0.5) AS q FROM STREAM DURATION 1000")
    e.submit("m3", "SELECT COUNT(*) AS cnt, SUM(value) AS sv FROM STREAM " +
      "WHERE value > 100 DURATION 1000")
    e.submit("m4", "SELECT PMF(value, 50) AS n FROM STREAM DURATION 1000")
    val acts = countActions { batches(4).foreach(e.processBatch) }
    assert(acts == 4, s"expected 1 fused global action per batch, saw $acts over 4 batches")
    now += 2000
    e.tick()
    val rs = e.drainResults().map(m => m.queryId -> m.clip.records).toMap
    // each fused query must still be EXACT vs the batch plan (1000 rows is
    // far below both sketches' exact thresholds)
    val nuExact = events.select(countDistinct(col("user_id"))).head().getLong(0)
    assert(rs("m1").head("nu").asInstanceOf[Long] == nuExact)
    val medianExact = events.select(col("value")).orderBy(col("value"))
      .collect().map(_.getDouble(0)).apply(499) // inclusive rank ceil(0.5*1000)=500th
    assert(rs("m2").head("q").asInstanceOf[Double] == medianExact)
    val (cntExact, svExact) = {
      val r = events.filter(col("value") > 100)
        .agg(count(lit(1)), sum(col("value"))).head()
      (r.getLong(0), r.getDouble(1))
    }
    assert(rs("m3").head("cnt").asInstanceOf[Long] == cntExact)
    assert(math.abs(rs("m3").head("sv").asInstanceOf[Double] - svExact) < 1e-6)
    val below50 = events.filter(col("value") < 50).count()
    assert(rs("m4").map(r => r("n").asInstanceOf[Long]).sum == 1000L)
    assert(rs("m4").head("n").asInstanceOf[Long] == below50)
  }

  test("equality-routed families answer many queries with one groupBy job per shape") {
    // the categorize scenario: 12 queries, every WHERE `user_id == <v>`,
    // two aggregate shapes → 2 routing-family actions per batch, O(1) in
    // query count (the generic fused tier would carry 12 when() columns)
    val e = newEngine()
    val uids = (0 until 6).map(i => i * 7L)
    uids.zipWithIndex.foreach { case (u, i) =>
      e.submit(s"c$i", s"SELECT COUNT(*) AS cnt, SUM(value) AS sv FROM STREAM " +
        s"WHERE user_id == $u DURATION 1000")
      e.submit(s"d$i", s"SELECT COUNT(DISTINCT event_type) AS ne FROM STREAM " +
        s"WHERE user_id == $u DURATION 1000")
    }
    // 2 family actions per batch + 2 one-off empty-agg rows (user ids
    // 21/28/35 match nothing; the empty row is cached per shape)
    val acts = countActions { batches(4).foreach(e.processBatch) }
    assert(acts == 10, s"expected 2 routed-family actions per batch " +
      s"(+2 cached empty-agg rows), saw $acts over 4 batches")
    now += 2000
    e.tick()
    val rs = e.drainResults().map(m => m.queryId -> m.clip.records).toMap
    // every routed query must be EXACT vs the solo batch plan — including
    // user ids matching zero rows (lifecycle on an empty family slot)
    uids.zipWithIndex.foreach { case (u, i) =>
      val exact = events.filter(col("user_id") === u)
        .agg(count(lit(1)), sum(col("value")), countDistinct(col("event_type"))).head()
      assert(rs(s"c$i").head("cnt").asInstanceOf[Long] == exact.getLong(0),
        s"routed count for user $u")
      val sv = rs(s"c$i").head("sv")
      if (exact.getLong(0) == 0L) assert(sv == null || sv == 0.0)
      else assert(math.abs(sv.asInstanceOf[Double] - exact.getDouble(1)) < 1e-6)
      assert(rs(s"d$i").head("ne").asInstanceOf[Long] == exact.getLong(2),
        s"routed distinct for user $u")
    }
  }

  test("detaching a query mid-stream leaves its routing family exact") {
    val e = newEngine()
    (0 until 4).foreach(i => e.submit(s"k$i",
      s"SELECT COUNT(*) AS cnt FROM STREAM WHERE user_id == ${i * 11} DURATION 1000"))
    val bs = batches(4)
    bs.take(2).foreach(e.processBatch)
    e.kill("k1") // detach mid-stream; family shrinks under the index
    bs.drop(2).foreach(e.processBatch)
    // a late attach joins the family for the remaining batches only
    e.submit("k9", "SELECT COUNT(*) AS cnt FROM STREAM WHERE user_id == 0 DURATION 1000")
    e.processBatch(bs.head)
    now += 2000
    e.tick()
    val rs = e.drainResults().map(m => m.queryId -> m.clip.records).toMap
    val exact0 = events.filter(col("user_id") === 0).count()
    assert(rs("k0").head("cnt").asInstanceOf[Long] ==
      exact0 + events.filter(col("user_id") === 0 && col("event_id") < 250).count(),
      "k0 saw all 4 batches + the replayed first")
    assert(!rs.contains("k1") || rs("k1").isEmpty, "killed query publishes no final count")
    assert(rs("k9").head("cnt").asInstanceOf[Long] ==
      events.filter(col("user_id") === 0 && col("event_id") < 250).count(),
      "late-attached query counts only its own batches")
  }

  test("COMPUTATION post-agg flows through streaming present (B10)") {
    val e = newEngine()
    e.submit("cp1", "SELECT event_type, COUNT(*) AS cnt, cnt * 2 AS double_cnt FROM STREAM " +
      "GROUP BY event_type ORDER BY event_type DURATION 10")
    e.processBatch(batches(2).head)
    now += 100
    e.tick()
    val recs = e.drainResults().head.clip.records
    assert(recs.nonEmpty)
    assert(recs.forall(r =>
      r("double_cnt").asInstanceOf[Long] == 2 * r("cnt").asInstanceOf[Long]))
  }

  test("checkpoint/restore resumes mid-query with identical results (A9)") {
    val bs = batches(4)
    // continuous run for reference
    val ref = newEngine()
    ref.submit("ck1", "SELECT COUNT(DISTINCT user_id) AS nu FROM STREAM DURATION 1000")
    ref.submit("ck2", "SELECT event_type, COUNT(*) AS cnt FROM STREAM GROUP BY event_type " +
      "ORDER BY event_type DURATION 1000")
    bs.foreach(ref.processBatch)
    now += 2000
    ref.tick()
    val want = ref.drainResults().map(m => (m.queryId, m.clip.records)).toMap

    // checkpointed run: 2 batches, snapshot, new engine, restore, 2 batches
    val e1 = newEngine()
    e1.submit("ck1", "SELECT COUNT(DISTINCT user_id) AS nu FROM STREAM DURATION 1000")
    e1.submit("ck2", "SELECT event_type, COUNT(*) AS cnt FROM STREAM GROUP BY event_type " +
      "ORDER BY event_type DURATION 1000")
    bs.take(2).foreach(e1.processBatch)
    val ckpt = e1.checkpoint()
    val e2 = new MultiQueryEngine(spark, () => now)
    e2.restore(ckpt)
    assert(e2.activeQueryIds == Seq("ck1", "ck2"))
    bs.drop(2).foreach(e2.processBatch)
    now += 2000
    e2.tick()
    val got = e2.drainResults().map(m => (m.queryId, m.clip.records)).toMap
    assert(got("ck1") == want("ck1"))
    assert(got("ck2") == want("ck2"))
  }

  /** >MaxGroups*4 distinct keys with heavy count ties: the fused keyed job
    * must keep each query the exact survivor set it would keep solo
    * (own-count-desc, key-asc TakeOrdered into the capped map). */
  test("fused keyed GROUP BY == solo beyond the group cap (B5 fusion)") {
    // 2500 groups (> MaxGroups*4 = 2000); key i occurs 1 + (i % 10) times
    // so ties abound and the deterministic tiebreaker is load-bearing
    val df = spark.range(2500).select(
      col("id").as("grp"),
      explode(sequence(lit(1), lit(1) + (col("id") % 10).cast("int"))).as("x"))
    val bql = "SELECT grp, COUNT(*) AS cnt FROM STREAM GROUP BY grp " +
      "ORDER BY cnt DESC, grp DURATION 1000"
    def run(ids: String*): Map[String, Seq[Map[String, Any]]] = {
      val e = newEngine()
      ids.foreach(id => assert(e.submit(id, bql).isRight))
      e.processBatch(df)
      now += 2000
      e.tick()
      e.drainResults().map(m => m.queryId -> m.clip.records).toMap
    }
    val solo = run("s1")("s1")
    val fused = run("f1", "f2")
    assert(fused("f1") == solo, "fused f1 != solo")
    assert(fused("f2") == solo, "fused f2 != solo")
    // and both match the exact top-MaxGroups survivor contract
    val exact = df.groupBy(col("grp")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("grp")).limit(500).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(solo.map(r => (r("grp").asInstanceOf[Long], r("cnt").asInstanceOf[Long])) == exact)
  }

  /** Adversarial round-2 case: two fused queries with DISJOINT hot keys.
    * A sum-ordered shared cut would let the hot query's groups evict the
    * quiet query's heavy groups; per-query selection must not. */
  test("fused keyed GROUP BY with disjoint hot keys stays per-query exact") {
    // side a: 1250 groups with counts 1..10; side b: 1250 disjoint groups
    // with count 40 each — b's groups dominate any cross-query total
    val a = spark.range(1250).select(
      col("id").as("grp"), lit("a").as("side"),
      explode(sequence(lit(1), lit(1) + (col("id") % 10).cast("int"))).as("x"))
    val b = spark.range(1250).select(
      (col("id") + 10000).as("grp"), lit("b").as("side"),
      explode(sequence(lit(1), lit(40))).as("x"))
    val df = a.unionByName(b)
    val bqlA = "SELECT grp, COUNT(*) AS cnt FROM STREAM WHERE side == 'a' " +
      "GROUP BY grp ORDER BY cnt DESC, grp DURATION 1000"
    val bqlB = "SELECT grp, COUNT(*) AS cnt FROM STREAM WHERE side == 'b' " +
      "GROUP BY grp ORDER BY cnt DESC, grp DURATION 1000"
    def run(qs: (String, String)*): Map[String, Seq[Map[String, Any]]] = {
      val e = newEngine()
      qs.foreach { case (id, q) => assert(e.submit(id, q).isRight) }
      e.processBatch(df)
      now += 2000
      e.tick()
      e.drainResults().map(m => m.queryId -> m.clip.records).toMap
    }
    val soloA = run("sa" -> bqlA)("sa")
    val soloB = run("sb" -> bqlB)("sb")
    val fused = run("fa" -> bqlA, "fb" -> bqlB)
    assert(fused("fa") == soloA, "quiet query lost groups to the hot query")
    assert(fused("fb") == soloB, "hot query drifted under fusion")
    // the quiet query keeps its own top groups: counts 10 and 9 present
    val counts = fused("fa").map(_("cnt").asInstanceOf[Long])
    assert(counts.take(125).forall(_ == 10L), s"expected count-10 head, got ${counts.take(5)}")
  }

  /** Reference reactive windows emit PER chunk of N records, not per
    * batch (`FilterStreamingTest.scala:241-275`): one batch carrying 3N
    * matching records must produce 3 Window clips of N records each. */
  test("reactive RECORD window emits one clip per N records in a single batch (B13)") {
    val e = newEngine()
    e.submit("rw1", "SELECT event_id FROM STREAM WINDOWING EVERY(100, RECORD, WINDOW)")
    e.processBatch(batches(2).head) // 500 records → 5 windows of 100
    val rs = e.drainResults()
    assert(rs.map(_.kind) == Seq.fill(5)(ResultKind.Window), s"got ${rs.map(_.kind)}")
    assert(rs.forall(_.clip.records.size == 100))
    assert(rs.forall(_.clip.meta("records") == 100))
    // each chunk carries DISTINCT records — the buffer drains, not re-emits
    val ids = rs.flatMap(_.clip.records.map(_("event_id")))
    assert(ids.distinct.size == 500)
    assert(e.activeQueryIds == Seq("rw1"), "reactive queries never RAW-complete")
  }

  test("reactive RECORD window carries leftover records to the next batch") {
    val e = newEngine()
    e.submit("rw2", "SELECT event_id FROM STREAM WINDOWING EVERY(150, RECORD, WINDOW)")
    e.processBatch(batches(4).head) // 250 records → 1 window, 100 buffered
    assert(e.drainResults().map(_.clip.records.size) == Seq(150))
    e.processBatch(batches(4)(1)) // +250 → 350 buffered → 2 windows, 50 left
    assert(e.drainResults().map(_.clip.records.size) == Seq(150, 150))
  }

  test("window clip meta reports the window's OPEN time and record count") {
    val e = newEngine()
    val submitAt = now
    e.submit("wm1", "SELECT COUNT(*) AS cnt FROM STREAM WINDOWING EVERY(30, TIME, WINDOW)")
    e.processBatch(batches(4).head) // 250 records into the open window
    now += 35
    e.processBatch(batches(4)(1)) // 250 more, then the window closes
    val m = e.drainResults().head.clip.meta
    // pre-reset values: the window opened at submit and saw 500 records —
    // NOT window_start == emit time / records == 0
    assert(m("window_start") == submitAt, s"got ${m("window_start")} want $submitAt")
    assert(m("records") == 500L, s"got ${m("records")}")
  }

  test("tick-path window clip meta matches the data path") {
    val e = newEngine()
    val submitAt = now
    e.submit("wm2", "SELECT COUNT(*) AS cnt FROM STREAM WINDOWING EVERY(30, TIME, ALL)")
    e.processBatch(batches(4).head)
    now += 35
    e.tick() // window closes with no data flowing
    val m = e.drainResults().head.clip.meta
    assert(m("window_start") == submitAt)
    assert(m("records") == 250L)
  }

  test("tick-only TIME-window emitter cannot evade the rate limit (B15)") {
    val e = newEngine(maxEmits = 1, intervalMs = 1000000L)
    e.submit("rl1", "SELECT COUNT(*) AS cnt FROM STREAM WINDOWING EVERY(10, TIME, ALL)")
    e.processBatch(batches(4).head)
    now += 15
    e.tick() // emit 1: ok
    now += 15
    e.tick() // emit 2: breach → FAIL + removed, even with no data batches
    val kinds = e.drainResults().map(_.kind)
    assert(kinds == Seq(ResultKind.Window, ResultKind.Window, ResultKind.Fail))
    assert(e.activeQueryIds.isEmpty)
  }

  /** The fused fast path collects the shared aggregate UNORDERED; a query
    * whose capped map is already near the cap must instead take its own
    * count-ordered slice, or limit() row order silently picks its
    * survivors. Batch 1 fills 400 groups; batch 2 brings 300 new ones
    * (under MaxGroups, so the old code always took the unordered path). */
  test("fused keyed GROUP BY == solo when the map is near-cap (order-safe fast path)") {
    val b1 = spark.range(400).select(col("id").as("grp"), lit(1).as("x"))
    val b2 = spark.range(300).select(
      (col("id") + 1000).as("grp"),
      explode(sequence(lit(1), (col("id") + 1).cast("int"))).as("x"))
    val bql = "SELECT grp, COUNT(*) AS cnt FROM STREAM GROUP BY grp " +
      "ORDER BY cnt DESC, grp DURATION 1000"
    def run(ids: String*): Map[String, Seq[Map[String, Any]]] = {
      val e = newEngine()
      ids.foreach(id => assert(e.submit(id, bql).isRight))
      e.processBatch(b1)
      e.processBatch(b2)
      now += 2000
      e.tick()
      e.drainResults().map(m => m.queryId -> m.clip.records).toMap
    }
    val solo = run("nc_s")("nc_s")
    val fused = run("nc_a", "nc_b")
    assert(fused("nc_a") == solo, "near-cap fused query diverged from solo")
    assert(fused("nc_b") == solo)
    // the 100 remaining slots go to batch-2's heaviest groups
    val newGroups = solo.filter(_("grp").asInstanceOf[Long] >= 1000)
    assert(newGroups.size == 100)
    assert(newGroups.map(_("cnt").asInstanceOf[Long]).min == 201L)
  }

  /** The fused over-cap slice must cut at each state's OWN per-batch
    * candidate cap (TopK keeps max(k*16, 1024), not the group cap). */
  test("fused TOP K over the group cap == solo (per-state candidate cap)") {
    val df = spark.range(2500).select(
      col("id").as("grp"),
      explode(sequence(lit(1), lit(1) + (col("id") % 37).cast("int"))).as("x"))
    val topBql = "SELECT TOP(10, grp) AS cnt FROM STREAM DURATION 1000"
    val grpBql = "SELECT grp, COUNT(*) AS cnt FROM STREAM GROUP BY grp " +
      "ORDER BY cnt DESC, grp DURATION 1000"
    def run(qs: (String, String)*): Map[String, Seq[Map[String, Any]]] = {
      val e = newEngine()
      qs.foreach { case (id, q) => assert(e.submit(id, q).isRight) }
      e.processBatch(df)
      now += 2000
      e.tick()
      e.drainResults().map(m => m.queryId -> m.clip.records).toMap
    }
    val soloTop = run("ts" -> topBql)("ts")
    val fused = run("tf" -> topBql, "gf" -> grpBql)
    assert(fused("tf") == soloTop, "fused TOP K candidate set diverged from solo")
  }

  /** RAW queries share ONE scan per batch (fused `when(pred, struct)`
    * columns + early-stopping driver drain) — each must still get exactly
    * its own matching records, projection, and completion. */
  test("fused RAW queries each get their own records and projection (B4 fusion)") {
    val e = newEngine()
    e.submit("ra", "SELECT event_id, event_type FROM STREAM WHERE event_type == 'click' LIMIT 5")
    e.submit("rb", "SELECT event_id, value FROM STREAM WHERE value > 100 LIMIT 7")
    e.submit("rc", "SELECT event_id FROM STREAM LIMIT 3") // no predicate
    e.processBatch(batches(2).head)
    val rs = e.drainResults()
    assert(rs.map(_.kind).toSet == Set(ResultKind.Complete))
    val byId = rs.map(m => m.queryId -> m.clip.records).toMap
    assert(byId("ra").size == 5)
    assert(byId("ra").forall(_("event_type") == "click"))
    assert(byId("ra").head.keySet == Set("event_id", "event_type"))
    assert(byId("rb").size == 7)
    assert(byId("rb").forall(_("value").asInstanceOf[Double] > 100))
    assert(byId("rb").head.keySet == Set("event_id", "value"))
    assert(byId("rc").size == 3)
    assert(e.activeQueryIds.isEmpty)
  }

  test("fused RAW with a rare predicate takes what the batch has") {
    val e = newEngine()
    e.submit("rr1", "SELECT event_id FROM STREAM WHERE event_id == 7 LIMIT 10")
    e.submit("rr2", "SELECT event_id FROM STREAM LIMIT 4")
    e.processBatch(batches(2).head) // only one row has event_id == 7
    val rs = e.drainResults()
    assert(rs.map(_.queryId) == Seq("rr2")) // rr1 is still collecting
    assert(e.activeQueryIds == Seq("rr1"))
    e.processBatch(batches(2)(1)) // no more matches arrive
    assert(e.drainResults().isEmpty)
    now += 10
    e.kill("rr1")
  }

  test("fused reactive RAW windows drain per chunk through the shared scan") {
    val e = newEngine()
    e.submit("fr1", "SELECT event_id FROM STREAM WINDOWING EVERY(100, RECORD, WINDOW)")
    e.submit("fr2", "SELECT event_id FROM STREAM WHERE event_type == 'click' " +
      "WINDOWING EVERY(50, RECORD, WINDOW)")
    e.processBatch(batches(2).head)
    val rs = e.drainResults()
    val w1 = rs.filter(_.queryId == "fr1")
    assert(w1.size == 5 && w1.forall(_.clip.records.size == 100))
    val w2 = rs.filter(_.queryId == "fr2")
    assert(w2.nonEmpty && w2.forall(_.clip.records.size == 50))
    val clicks = events.filter(col("event_id") < 500 && col("event_type") === "click").count()
    assert(w2.size == clicks / 50)
  }

  /** A5 parallel mode: un-fusable solo queries run their Spark jobs on a
    * thread pool; results must match the serial path exactly. */
  test("parallel solo mode matches serial results (A5 parallel filter)") {
    // distinct key signatures so nothing fuses: each is a solo keyed job
    val qs = Seq(
      "p1" -> "SELECT event_type, COUNT(*) AS cnt FROM STREAM GROUP BY event_type ORDER BY event_type DURATION 1000",
      "p2" -> "SELECT user_id % 7 AS k, COUNT(*) AS cnt FROM STREAM GROUP BY user_id % 7 ORDER BY k DURATION 1000",
      "p3" -> "SELECT user_id % 11 AS k, MAX(value) AS mx FROM STREAM GROUP BY user_id % 11 ORDER BY k DURATION 1000",
      "p4" -> "SELECT event_id % 5 AS k, AVG(value) AS av FROM STREAM WHERE value > 100 GROUP BY event_id % 5 ORDER BY k DURATION 1000")
    def run(parallelism: Int): Map[String, Seq[Map[String, Any]]] = {
      now = 1000000L
      val e = new MultiQueryEngine(spark, () => now, soloParallelism = parallelism)
      qs.foreach { case (id, bql) => assert(e.submit(id, bql).isRight) }
      batches(2).foreach(e.processBatch)
      now += 2000
      e.tick()
      e.drainResults().map(m => m.queryId -> m.clip.records).toMap
    }
    val serial = run(1)
    val parallel = run(4)
    qs.foreach { case (id, _) =>
      assert(parallel(id) == serial(id), s"parallel diverged for $id")
    }
  }

  test("structured streaming attach via MemoryStream (A2/A7)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Double)]
    val e = new MultiQueryEngine(spark) // real clock for the streaming path
    e.submit("sq1", "SELECT COUNT(*) AS cnt FROM STREAM WINDOWING EVERY(1, RECORD, ALL)")
    val df = mem.toDF().toDF("event_id", "event_type", "value")
    val q = e.attach(df, triggerMs = 50L)
    try {
      mem.addData((1L, "click", 1.0), (2L, "view", 2.0))
      q.processAllAvailable()
      mem.addData((3L, "click", 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val counts = e.drainResults().filter(_.kind == ResultKind.Window)
      .map(_.clip.records.head("cnt").asInstanceOf[Long])
    assert(counts.nonEmpty && counts.last == 3L, s"got $counts")
  }

  test("LATERAL VIEW query runs solo beside fused RAW queries (B2 explode)") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("arr", org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType))))
    val df = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(1L, Seq("a", "b")),
      org.apache.spark.sql.Row(2L, Seq("a"))).asJava, schema)
    val e = newEngine()
    // two plain RAW queries take the fused shared-scan path; the lateral
    // query must NOT join them — its rows are exploded, theirs are not
    e.submit("ra", "SELECT id FROM STREAM LIMIT 100")
    e.submit("rb", "SELECT id FROM STREAM WHERE id >= 0 LIMIT 100")
    e.submit("lx", "SELECT x, COUNT(*) AS cnt FROM STREAM LATERAL VIEW EXPLODE(arr) AS x " +
      "GROUP BY x WINDOWING EVERY(1, RECORD, ALL)")
    e.processBatch(df)
    val rs = e.drainResults()
    val lat = rs.filter(r => r.queryId == "lx" && r.kind == ResultKind.Window)
    assert(lat.size == 1, s"lateral window clips: ${lat.size}")
    val got = lat.head.clip.records
      .map(m => m("x").asInstanceOf[String] -> m("cnt").asInstanceOf[Long]).toMap
    assert(got == Map("a" -> 2L, "b" -> 1L), s"got $got")
    // the fused RAW pair must be unaffected: no error clips, both still
    // buffering toward their limit
    assert(!rs.exists(_.kind == ResultKind.Fail), s"unexpected FAIL: $rs")
    assert(e.activeQueryIds.contains("ra") && e.activeQueryIds.contains("rb"))
  }

  test("checkpoint/restore rebuilds the lateral stage from the BQL text (A9 + explode)") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("arr", org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType))))
    val df = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(1L, Seq("a", "b")),
      org.apache.spark.sql.Row(2L, Seq("a", "c")),
      org.apache.spark.sql.Row(3L, Seq("a"))).asJava, schema)
    val bql = "SELECT x, COUNT(*) AS cnt FROM STREAM LATERAL VIEW EXPLODE(arr) AS x " +
      "GROUP BY x ORDER BY x DURATION 1000"
    val e1 = newEngine()
    e1.submit("lk", bql)
    e1.processBatch(df.filter(col("id") === 1))
    val ckpt = e1.checkpoint()
    val e2 = new MultiQueryEngine(spark, () => now)
    e2.restore(ckpt)
    e2.processBatch(df.filter(col("id") >= 2))
    now += 2000
    e2.tick()
    val rs = e2.drainResults()
    assert(rs.map(_.kind) == Seq(ResultKind.Complete), s"kinds ${rs.map(_.kind)}")
    val got = rs.head.clip.records
      .map(m => m("x").asInstanceOf[String] -> m("cnt").asInstanceOf[Long]).toMap
    assert(got == Map("a" -> 3L, "b" -> 1L, "c" -> 1L),
      s"restored engine must keep exploding per batch: $got")
  }

  test("runtime analysis errors fail only the offending query (B16 runtime channel)") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("arr", org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType))))
    val df = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(1L, Seq("a", "b"))).asJava, schema)
    val e = newEngine()
    e.submit("ok", "SELECT id FROM STREAM LIMIT 1")
    // parses fine, dies at analysis: the field does not exist
    e.submit("bad", "SELECT nope FROM STREAM WHERE nope > 1 LIMIT 5")
    // parses fine, dies in lateralStage: alias shadows a stream field
    e.submit("clash", "SELECT id FROM STREAM LATERAL VIEW EXPLODE(arr) AS id LIMIT 5")
    e.processBatch(df)
    val rs = e.drainResults()
    val fails = rs.filter(_.kind == ResultKind.Fail).map(_.queryId).toSet
    assert(fails == Set("bad", "clash"), s"failed: $fails")
    val clashMsg = rs.find(r => r.queryId == "clash" && r.kind == ResultKind.Fail).get
      .clip.meta("errors").asInstanceOf[Seq[_]].mkString
    assert(clashMsg.contains("collides"), s"clear collision message, got: $clashMsg")
    // the healthy query completed with its record, untouched by the failures
    val ok = rs.find(_.queryId == "ok").get
    assert(ok.kind == ResultKind.Complete && ok.clip.records.size == 1)
    assert(e.activeQueryIds.isEmpty)
  }

  test("COUNT DISTINCT over an exploded alias merges across batches (B6 + explode)") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("arr", org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType))))
    val df = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(1L, Seq("a", "b")),
      org.apache.spark.sql.Row(2L, Seq("b", "c")),
      org.apache.spark.sql.Row(3L, Seq("d"))).asJava, schema)
    var sawFinal = false
    val e = newEngine()
    e.submit("cd", "SELECT COUNT(DISTINCT x) AS nd FROM STREAM " +
      "LATERAL VIEW EXPLODE(arr) AS x DURATION 50")
    e.processBatch(df.filter(col("id") <= 2))
    e.processBatch(df.filter(col("id") === 3))
    now += 100
    e.tick()
    e.drainResults().foreach { r =>
      if (r.kind == ResultKind.Complete) {
        sawFinal = true
        assert(r.clip.records.head("nd") == 4L, s"distinct exploded tokens: ${r.clip.records}")
      }
    }
    assert(sawFinal, "query must complete with a final clip")
  }
}
