package graft

import org.apache.spark.graftshim.MetricsBridge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.DataProducer
import graft.streaming._

/** A test producer loadable by classname (A3). */
class SpecProducer extends DataProducer {
  override def stream(spark: SparkSession, config: Map[String, String]): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", config.getOrElse("graft.producer.rowsPerSecond", "5"))
      .load()
      .select(col("value").as(config.getOrElse("graft.producer.idColumn", "event_id")))
}

/** Deployment-surface runtime: metrics on Spark's metrics system (A10),
  * transport-bridged CLIP/FEEDBACK channels (A7 deployable), classname
  * producer seam (A3), and self-recovering attach (A9). */
class RuntimeOpsSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = GraftSession.local(4)

  private var now: Long = 0L
  private def newEngine() = {
    now = 1000000L
    new MultiQueryEngine(spark, () => now)
  }
  private def events = graft.sources.Tables.load(spark, sfDir, "events")
  private def batch(n: Int) = events.filter(col("event_id") < n)

  // ---- A10: metrics on the Spark metrics system ----

  test("engine metrics are readable back through the Spark metrics system (A10)") {
    val e = newEngine()
    e.metrics.registerWithSpark("GraftEngineSpec")
    try {
      e.submit("m1", "SELECT event_id FROM STREAM LIMIT 3")
      e.submit("m2", "SELECT COUNT(*) AS c FROM STREAM")
      e.submit("m3", "not bql")
      e.processBatch(batch(100)) // m1 completes
      e.kill("m2")
      val g = MetricsBridge.gaugeValues("GraftEngineSpec")
      assert(g("queries_received") == 3L)
      assert(g("queries_done") == 1L)
      assert(g("queries_killed") == 1L)
      assert(g("queries_failed") == 1L)
      assert(g("queries_running") == 0L)
      assert(g("records_processed") == 103L) // m1 took 3, m2 aggregated all 100
    } finally e.metrics.deregisterFromSpark()
  }

  // ---- deployable result/feedback transport ----

  test("transport bridge publishes CLIP on completion (A7)") {
    val e = newEngine()
    val t = new InMemoryTransport
    new TransportBridge(e, t)
    e.submit("t1", "SELECT event_id FROM STREAM LIMIT 3")
    e.processBatch(batch(100))
    val clips = t.poll("graft.clips")
    assert(clips.map(_._1) == Seq("t1"))
    val Array(kind, json) = clips.head._2.split('\t')
    assert(kind == "Complete")
    assert(json.contains("\"records\"") && json.contains("\"query_id\":\"t1\""))
  }

  test("KILL feedback loops into engine.kill; submit feedback registers (A7/B17)") {
    val e = newEngine()
    val t = new InMemoryTransport
    val bridge = new TransportBridge(e, t)
    e.submit("t2", "SELECT COUNT(*) AS c FROM STREAM")
    t.send("graft.feedback", "t2", "kill\tt2")
    t.send("graft.feedback", "x", "garbage with no tabs") // must not throw
    t.send("graft.feedback", "t3", "submit\tt3\tSELECT COUNT(*) AS c FROM STREAM")
    bridge.pump()
    assert(e.activeQueryIds == Seq("t3"))
    val kinds = t.poll("graft.clips").map(_._2.split('\t').head)
    assert(kinds.contains("Kill"))
  }

  test("file transport carries clips and feedback across engine instances (A7)") {
    val root = java.nio.file.Files.createTempDirectory("graftft").toString
    // "process 1": engine publishing over the file transport
    val e1 = newEngine()
    new TransportBridge(e1, new FileTransport(root))
    e1.submit("f1", "SELECT event_id FROM STREAM LIMIT 2")
    e1.processBatch(batch(50))
    // "process 2": an independent transport handle on the same directory
    val t2 = new FileTransport(root)
    val clips = t2.poll("graft.clips")
    assert(clips.map(_._1) == Seq("f1"))
    assert(clips.head._2.startsWith("Complete\t"))
    assert(t2.poll("graft.clips").isEmpty, "poll must drain")
    // feedback written by the second handle reaches the first engine
    t2.send("graft.feedback", "f2", "submit\tf2\tSELECT COUNT(*) AS c FROM STREAM")
    val b1 = new TransportBridge(e1, new FileTransport(root))
    b1.pump()
    assert(e1.activeQueryIds == Seq("f2"))
    // ordering: many messages drain oldest-first
    (1 to 20).foreach(i => t2.send("ord", s"k$i", s"p$i"))
    assert(t2.poll("ord").map(_._1) == (1 to 20).map("k" + _))
  }

  test("file transport delivers each message to exactly one concurrent consumer") {
    val root = java.nio.file.Files.createTempDirectory("graftftc").toString
    val producer = new FileTransport(root)
    (1 to 200).foreach(i => producer.send("c", s"k$i", s"p$i"))
    // two consumers racing on the same channel: the claim-by-rename step
    // must partition the messages with no loss, no dup, and no throw
    val c1 = new FileTransport(root)
    val c2 = new FileTransport(root)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val f1 = pool.submit(new java.util.concurrent.Callable[Seq[(String, String)]] {
        override def call() = (1 to 10).flatMap(_ => c1.poll("c"))
      })
      val f2 = pool.submit(new java.util.concurrent.Callable[Seq[(String, String)]] {
        override def call() = (1 to 10).flatMap(_ => c2.poll("c"))
      })
      val got1 = f1.get()
      val got2 = f2.get()
      val all = got1 ++ got2
      assert(all.size == 200, s"lost or duplicated: got ${all.size}")
      assert(all.map(_._1).toSet == (1 to 200).map("k" + _).toSet)
    } finally pool.shutdown()
    assert(producer.poll("c").isEmpty)
  }

  test("socket transport submits, kills, and drains CLIPs over a real socket (A7)") {
    val server = new SocketTransportServer()
    try {
      // "driver process": engine bridged over a socket client
      val e = newEngine()
      val bridge = new TransportBridge(e, new SocketTransport("localhost", server.port))
      // "frontend process": an independent client on the same broker
      val frontend = new SocketTransport("localhost", server.port)
      frontend.send("graft.feedback", "s1", "submit\ts1\tSELECT event_id FROM STREAM LIMIT 2")
      frontend.send("graft.feedback", "s2", "submit\ts2\tSELECT COUNT(*) AS c FROM STREAM")
      bridge.pump()
      assert(e.activeQueryIds.sorted == Seq("s1", "s2"))
      e.processBatch(batch(50)) // s1 completes
      frontend.send("graft.feedback", "s2", "kill\ts2")
      bridge.pump()
      val clips = frontend.poll("graft.clips")
      val byKind = clips.map(_._2.split('\t').head)
      assert(clips.map(_._1).toSet == Set("s1", "s2"))
      assert(byKind.contains("Complete") && byKind.contains("Kill"))
      assert(frontend.poll("graft.clips").isEmpty, "poll must drain")
      frontend.close()
    } finally server.close()
  }

  test("socket frames carry tab/newline/multi-byte payloads verbatim") {
    val server = new SocketTransportServer()
    val c = new SocketTransport("localhost", server.port)
    try {
      // a CLIP is JSON that can embed anything — framing is length-
      // delimited, so only channel/key have charset restrictions
      val nasty = "line1\nline2\tcol2\t{\"k\":\"v\\n\"}é中文 end"
      c.send("ch", "k1", nasty)
      c.send("ch", "k2", "")
      val got = c.poll("ch")
      assert(got == Seq(("k1", nasty), ("k2", "")), s"got $got")
    } finally { c.close(); server.close() }
  }

  test("socket client reconnects transparently across a server restart") {
    // The probe-then-rebind dance can lose its ephemeral port to a
    // concurrently-running test between close and rebind (SO_REUSEADDR
    // covers TIME_WAIT, not a live LISTEN) — retry the whole sequence on
    // a fresh port rather than flake.
    def attempt(): Unit = {
      val probe = new java.net.ServerSocket(0)
      val port = probe.getLocalPort
      probe.close()
      val s1 = new SocketTransportServer(port)
      val client = new SocketTransport("localhost", port, maxRetries = 60)
      client.send("ch", "k1", "p1")
      assert(client.poll("ch") == Seq(("k1", "p1")))
      s1.close()
      // restart the broker on the same port; the client's next verbs must
      // ride the retry loop onto the fresh connection with no caller action
      val s2 = new SocketTransportServer(port)
      try {
        client.send("ch", "k2", "p2")
        // the reconnect contract is AT-LEAST-ONCE out: a send retried
        // after a lost ack may duplicate — the drained channel must
        // contain k2 and nothing else
        val got = client.poll("ch")
        assert(got.nonEmpty && got.forall(_ == ("k2", "p2")), s"got $got")
      } finally { client.close(); s2.close() }
    }
    // under a loaded host the restart window can also lose the port to a
    // concurrent test or starve the retry budget — any failure retries
    // the whole sequence on a fresh port rather than flake
    val ok = (1 to 3).exists { i =>
      try { attempt(); true }
      catch { case e: Throwable if i < 3 => false }
    }
    assert(ok)
  }

  test("socket transport chaos soak: concurrent senders and pollers, no loss, no frame tearing") {
    val server = new SocketTransportServer()
    val nSenders = 4
    val perSender = 250
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nSenders + 2)
    try {
      // 4 producer threads share ONE client handle (frame interleaving
      // stress) while 2 consumer threads race on separate connections.
      val shared = new SocketTransport("localhost", server.port)
      val latch = new java.util.concurrent.CountDownLatch(nSenders)
      (0 until nSenders).foreach { s =>
        pool.execute(() => {
          (0 until perSender).foreach { i =>
            shared.send("soak", s"k$s-$i", s"payload\twith\ttabs\nand newlines $s $i")
          }
          latch.countDown()
        })
      }
      val drained = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]
      val consumers = (1 to 2).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = {
            val c = new SocketTransport("localhost", server.port)
            try {
              var idle = 0
              while (idle < 10 || latch.getCount > 0) {
                val got = c.poll("soak")
                if (got.isEmpty) { idle += 1; Thread.sleep(5) } else { idle = 0 }
                got.foreach(drained.add)
              }
            } finally c.close()
          }
        })
      }
      consumers.foreach(_.get())
      shared.close()
      import scala.jdk.CollectionConverters._
      val all = drained.asScala.toVector
      assert(all.size == nSenders * perSender, s"lost or duplicated: ${all.size}")
      assert(all.map(_._1).toSet ==
        (for (s <- 0 until nSenders; i <- 0 until perSender) yield s"k$s-$i").toSet)
      // payload integrity through tabs/newlines and concurrent framing
      assert(all.forall { case (k, p) =>
        val Array(s, i) = k.drop(1).split('-')
        p == s"payload\twith\ttabs\nand newlines $s $i"
      })
    } finally { pool.shutdownNow(); server.close() }
  }

  // ---- A3: classname-config producer seam ----

  test("producer loads by classname config and applies its config (A3)") {
    val df = DataProducer.produce(spark, Map(
      DataProducer.ClassKey -> "graft.SpecProducer",
      "graft.producer.idColumn" -> "my_id"))
    assert(df.isStreaming)
    assert(df.columns.toSeq == Seq("my_id"))
  }

  test("producer seam rejects bad config with a useful error (A3)") {
    val miss = intercept[IllegalArgumentException](DataProducer.load(Map.empty))
    assert(miss.getMessage.contains(DataProducer.ClassKey))
    val notFound = intercept[IllegalArgumentException](
      DataProducer.load(Map(DataProducer.ClassKey -> "no.such.Clazz")))
    assert(notFound.getMessage.contains("not found"))
    val wrongType = intercept[IllegalArgumentException](
      DataProducer.load(Map(DataProducer.ClassKey -> "java.lang.String")))
    assert(wrongType.getMessage.contains("does not implement"))
  }

  test("built-in JSON DSL producer chains connector and converter (A3)") {
    val dir = java.nio.file.Files.createTempDirectory("graftdsl")
    java.nio.file.Files.write(dir.resolve("a.json"),
      "{\"id\": 1, \"kind\": \"x\"}\n{\"id\": 2, \"kind\": \"y\"}\n"
        .getBytes("UTF-8"))
    val df = DataProducer.produce(spark, Map(
      DataProducer.ClassKey -> "graft.sources.JsonDslProducer",
      "graft.producer.path" -> dir.toString,
      "graft.producer.recordSchema" -> "id BIGINT, kind STRING"))
    assert(df.isStreaming)
    assert(df.columns.toSeq == Seq("id", "kind"))
    // run the converted stream to prove the chain parses real payloads
    val q = df.writeStream.format("memory").queryName("dsl_out").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("dsl_out").orderBy("id").collect()
      assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
      assert(rows.map(_.getString(1)).toSeq == Seq("x", "y"))
    } finally q.stop()
  }

  // ---- A9: self-recovering attach ----

  test("attach(recoveryDir) restores mid-query state after a restart (A9)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graftrec").toString

    // run 1: count 2 records, checkpoint per batch, then die
    val e1 = new MultiQueryEngine(spark)
    e1.submit("rq", "SELECT COUNT(*) AS cnt FROM STREAM WINDOWING EVERY(1, RECORD, ALL)")
    val mem1 = MemoryStream[(Long, String, Double)]
    val q1 = e1.attach(mem1.toDF().toDF("event_id", "event_type", "value"),
      triggerMs = 50L, recoveryDir = Some(dir))
    try {
      mem1.addData((1L, "a", 1.0), (2L, "b", 2.0))
      q1.processAllAvailable()
    } finally q1.stop()
    val firstCounts = e1.drainResults().filter(_.kind == ResultKind.Window)
      .map(_.clip.records.head("cnt").asInstanceOf[Long])
    assert(firstCounts.nonEmpty && firstCounts.last == 2L)

    // run 2: fresh engine, same dir — the query and its count resume
    val e2 = new MultiQueryEngine(spark)
    val mem2 = MemoryStream[(Long, String, Double)]
    val q2 = e2.attach(mem2.toDF().toDF("event_id", "event_type", "value"),
      triggerMs = 50L, recoveryDir = Some(dir))
    try {
      assert(e2.activeQueryIds == Seq("rq"), "restore did not happen on attach")
      mem2.addData((3L, "c", 3.0))
      q2.processAllAvailable()
    } finally q2.stop()
    val counts = e2.drainResults().filter(_.kind == ResultKind.Window)
      .map(_.clip.records.head("cnt").asInstanceOf[Long])
    assert(counts.nonEmpty && counts.last == 3L,
      s"resumed count should continue from the checkpoint, got $counts")
  }

  test("production topology: live attach + socket bridge, submit to CLIP over the wire") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val server = new SocketTransportServer()
    val e = new MultiQueryEngine(spark)
    val bridge = new TransportBridge(e, new SocketTransport("localhost", server.port))
    val frontend = new SocketTransport("localhost", server.port)
    val mem = MemoryStream[(Long, String, Double)]
    // the deploy wiring from the README: feedback drains at batch start
    val q = e.attach(mem.toDF().toDF("event_id", "event_type", "value"),
      triggerMs = 50L, onBatch = () => bridge.pump())
    try {
      frontend.send("graft.feedback", "tq", "submit\ttq\tSELECT event_id FROM STREAM LIMIT 3")
      mem.addData((1L, "a", 1.0), (2L, "b", 2.0))
      q.processAllAvailable() // batch 1: admission; batch 2 needs data
      mem.addData((3L, "c", 3.0), (4L, "d", 4.0))
      q.processAllAvailable()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var clips = Seq.empty[(String, String)]
      while (!clips.exists(_._2.startsWith("Complete")) && System.nanoTime() < deadline) {
        clips = clips ++ frontend.poll("graft.clips")
        if (!clips.exists(_._2.startsWith("Complete"))) { mem.addData((9L, "x", 0.0)); q.processAllAvailable() }
      }
      assert(clips.nonEmpty && clips.forall(_._1 == "tq"))
      assert(clips.exists(_._2.startsWith("Complete")),
        s"RAW limit must complete over the wire; got kinds ${clips.map(_._2.takeWhile(_ != '\t'))}")
    } finally { q.stop(); frontend.close(); server.close() }
  }

  // ---- flatMapGroupsWithState custom state (funnel detection) ----

  test("funnel state carries stage progress across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val hits = graft.streaming.StatefulOps.funnel(
      mem.toDS(), Seq("click", "view", "purchase"))
    val q = hits.writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      // key 1 progresses one stage per batch; key 2 skips "view"
      mem.addData((1L, "click", 100L), (2L, "click", 100L), (1L, "scroll", 110L))
      q.processAllAvailable()
      mem.addData((1L, "view", 200L), (2L, "purchase", 200L))
      q.processAllAvailable()
      assert(spark.table("funnel_out").isEmpty, "no funnel complete yet")
      mem.addData((1L, "purchase", 300L), (1L, "click", 310L))
      q.processAllAvailable()
      val out = spark.table("funnel_out")
        .as[graft.streaming.StatefulOps.FunnelHit].collect().toSeq
      assert(out == Seq(graft.streaming.StatefulOps.FunnelHit(1L, 300L, 200L)),
        s"got $out")
    } finally q.stop()
  }

  test("streaming dedup drops in-horizon duplicates and re-admits after watermark eviction") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val mem = MemoryStream[(String, Timestamp)]
    val deduped = graft.streaming.StatefulOps.streamingDedup(
      mem.toDF().toDF("text", "ts"), "text", "ts", "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("sdedup_out")
      .outputMode("append").start()
    try {
      mem.addData(("doc a", ts(0)), ("doc b", ts(0)))
      q.processAllAvailable()
      // dup inside the horizon → dropped; the t+20 row pushes the
      // watermark to t+10, past "doc a"'s state
      mem.addData(("doc a", ts(1)), ("doc c", ts(20)))
      q.processAllAvailable()
      // state for "doc a" evicted → the same content re-admits
      mem.addData(("doc a", ts(21)))
      q.processAllAvailable()
      val out = spark.table("sdedup_out")
        .collect().map(r => (r.getString(0), r.getTimestamp(1))).toSet
      assert(out == Set(
        ("doc a", ts(0)), ("doc b", ts(0)), ("doc c", ts(20)), ("doc a", ts(21))),
        s"got $out")
    } finally q.stop()
  }

  test("funnel emits one hit per completed pass and restarts (batch mode)") {
    import spark.implicits._
    val ds = Seq(
      (7L, "click", 1L), (7L, "view", 2L), (7L, "purchase", 3L),
      (7L, "click", 10L), (7L, "other", 11L), (7L, "view", 12L), (7L, "purchase", 13L),
      (8L, "view", 1L), (8L, "purchase", 2L) // never clicked: no hit
    ).toDS()
    val out = graft.streaming.StatefulOps.funnel(ds, Seq("click", "view", "purchase"))
      .collect().sortBy(_.completedAt).toSeq
    assert(out == Seq(
      graft.streaming.StatefulOps.FunnelHit(7L, 3L, 2L),
      graft.streaming.StatefulOps.FunnelHit(7L, 13L, 3L)), s"got $out")
  }

  test("funnel idle TTL drops stalled state so the store stays bounded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val hits = graft.streaming.StatefulOps.funnel(
      mem.toDS(), Seq("click", "purchase"), idleTtlMs = Some(1L))
    // NOTE: no processAllAvailable here — under ProcessingTimeTimeout the
    // engine keeps constructing (empty) batches to fire due timeouts, so
    // that call never quiesces. Poll the progress counters instead.
    val q = hits.writeStream.format("memory").queryName("funnel_ttl_out")
      .outputMode("append").start()
    def waitForInputRows(n: Long): Unit = {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var seen = 0L
      while (seen < n && System.nanoTime() < deadline) {
        seen = Option(q.lastProgress).map(_ => q.recentProgress.map(_.numInputRows).sum).getOrElse(0L)
        if (seen < n) Thread.sleep(20)
      }
      assert(seen >= n, s"timed out waiting for $n input rows, saw $seen")
    }
    try {
      mem.addData((1L, "click", 100L))
      waitForInputRows(1)
      // the 1 ms TTL lapses; the engine's continuous timeout batches drop
      // key 1's state well within this window
      Thread.sleep(1000)
      mem.addData((1L, "purchase", 300L))
      waitForInputRows(2)
      Thread.sleep(300) // let the purchase batch commit to the sink
      // key 1's click progress must be gone: its purchase alone is no hit
      assert(spark.table("funnel_ttl_out").isEmpty,
        "state survived its TTL: funnel completed from expired progress")
    } finally q.stop()
  }

  test("restore keeps queries_running equal to the live set (A9 gauge)") {
    val e1 = newEngine()
    e1.submit("g1", "SELECT COUNT(*) AS c FROM STREAM")
    e1.submit("g2", "SELECT COUNT(*) AS c FROM STREAM")
    val ckpt = e1.checkpoint()

    val e2 = newEngine()
    e2.submit("g2", "SELECT COUNT(*) AS c FROM STREAM") // overlaps the snapshot
    e2.submit("g3", "SELECT COUNT(*) AS c FROM STREAM") // absent from it
    e2.restore(ckpt)
    assert(e2.activeQueryIds == Seq("g1", "g2", "g3"))
    assert(e2.metrics.queriesRunning.get == 3L,
      "gauge must not double-count replaced ids")
    // restoring the SAME snapshot again must not drift the gauge either
    e2.restore(ckpt)
    assert(e2.metrics.queriesRunning.get == 3L)
  }
}
