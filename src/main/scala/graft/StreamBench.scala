package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.MultiQueryEngine

/** Streaming-throughput bench (not driver-run; feeds BASELINE.md):
  * batch-replay of sf0.1 events through the multi-query engine with
  * 1 / 10 / 100 concurrent queries, reporting sustained records/s and
  * per-batch latency. */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ad-hoc conf overrides for A/B runs: conf:key=value args
    // (ScaleCheck's convention; sbt-client env does not reach the fork)
    args.filter(_.startsWith("conf:")).foreach { a =>
      val Array(k, v) = a.stripPrefix("conf:").split("=", 2)
      spark.conf.set(k, v)
    }

    val events = Tables.load(spark, sfDir, "events").cache()
    val total = events.count()
    val nBatches = 10
    val per = total / nBatches

    def queriesFor(n: Int): Seq[(String, String)] = (0 until n).map { i =>
      val bql = i % 3 match {
        case 0 => s"SELECT COUNT(*) AS cnt FROM STREAM WHERE user_id % 50 == ${i % 50} " +
          "WINDOWING EVERY(1000000000, RECORD, ALL)"
        case 1 => s"SELECT event_type, COUNT(*) AS cnt, AVG(value) AS av FROM STREAM " +
          s"WHERE value > ${i % 100} GROUP BY event_type"
        case 2 => "SELECT COUNT(DISTINCT user_id) AS nu FROM STREAM"
      }
      (s"q$i", bql)
    }

    // RAW fusion drive: selective predicates so no query completes inside
    // the run — every batch exercises the shared fused scan
    def rawQueriesFor(n: Int): Seq[(String, String)] = (0 until n).map { i =>
      (s"r$i", s"SELECT event_id, event_type FROM STREAM " +
        s"WHERE user_id % 997 == ${i % 997} LIMIT 100000")
    }

    // pure global-combinable set: every query fuses into the one shared
    // aggregate job — isolates the fused-agg plan-size scaling
    def globQueriesFor(n: Int): Seq[(String, String)] = (0 until n).map { i =>
      (s"g$i", s"SELECT COUNT(*) AS cnt, SUM(user_id) AS su FROM STREAM " +
        s"WHERE user_id % 50 == ${i % 50} WINDOWING EVERY(1000000000, RECORD, ALL)")
    }

    // mixed SKETCH workload: Theta distinct, KLL quantile/PMF, plain
    // aggregates, keyed GROUP BY and TOP K on the same key. The fusion
    // contract at 100 TB: Spark actions per batch is O(distinct shapes)
    // (here 2 — one fused global aggregate + one fused event_type groupBy),
    // never O(queries), whatever sketch each query carries.
    def mixQueriesFor(n: Int): Seq[(String, String)] = (0 until n).map { i =>
      val bql = i % 6 match {
        case 0 => s"SELECT COUNT(DISTINCT user_id) AS nu FROM STREAM WHERE value > ${i % 100}"
        case 1 => s"SELECT QUANTILE(value, 0.5) AS q FROM STREAM WHERE user_id % 50 == ${i % 50}"
        case 2 => s"SELECT PMF(value, 50) AS n FROM STREAM WHERE user_id % 25 == ${i % 25}"
        case 3 => s"SELECT COUNT(*) AS cnt, SUM(value) AS sv FROM STREAM WHERE value > ${i % 100}"
        case 4 => s"SELECT event_type, COUNT(*) AS cnt FROM STREAM " +
          s"WHERE value > ${i % 100} GROUP BY event_type"
        case 5 => s"SELECT TOP(3, event_type) AS cnt FROM STREAM WHERE user_id % 50 == ${i % 50}"
      }
      (s"m$i", bql)
    }

    // equality-ROUTED workload (the reference QueryManager.categorize
    // scenario): n heterogeneous queries, every one `user_id == <some id>`
    // — the many-tenant pattern. Three aggregate shapes → three routing
    // families → 3 family groupBy jobs per batch, whatever n is; without
    // the index each query contributes its own when(pred) column to the
    // fused scan (still 1 job, but O(n) columns per record).
    def eqQueriesFor(n: Int): Seq[(String, String)] = (0 until n).map { i =>
      val uid = (i * 37) % 1000
      val bql = i % 3 match {
        case 0 => s"SELECT COUNT(*) AS cnt, SUM(value) AS sv FROM STREAM WHERE user_id == $uid"
        case 1 => s"SELECT COUNT(DISTINCT event_type) AS ne FROM STREAM WHERE user_id == $uid"
        case 2 => s"SELECT QUANTILE(value, 0.5) AS q FROM STREAM WHERE user_id == $uid"
      }
      (s"e$i", bql)
    }

    /** Spark actions completed while `body` runs (QueryExecutions, not
      * jobs — AQE splits one action into several jobs). */
    def countActions(body: => Unit): Int = {
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

    // admission / emit latency (BASELINE.md protocol rows): wall time from
    // submit() to the end of the first batch that applies the queries, and
    // from a TIME-window close decision to the result being drained. The
    // reference's anchors are >=2 batch intervals to admit and >=1 to emit
    // (QueryDataUnioning.scala:56, JoinStreaming.scala:120-128) — ours are
    // sub-batch because submit is a synchronous parse+compile and windows
    // close in the same tick that observes them.
    def latDrive(n: Int): Unit = {
      var fakeNow = 0L
      val engine = new MultiQueryEngine(spark, clock = () => fakeNow)
      val batch = events.filter(col("event_id") < per)
      batch.count() // warm the scan
      val t0 = System.nanoTime()
      (0 until n).foreach(i => engine.submit(s"l$i",
        s"SELECT event_type, COUNT(*) AS cnt, AVG(value) AS av FROM STREAM " +
          s"WHERE user_id % 50 == ${i % 50} GROUP BY event_type " +
          "WINDOWING EVERY(1000, TIME, WINDOW)"))
      val submitMs = (System.nanoTime() - t0) / 1e6
      val t1 = System.nanoTime()
      engine.processBatch(batch)
      val admitMs = (System.nanoTime() - t1) / 1e6
      fakeNow += 1500 // every window is now past its 1000 ms close point
      val t2 = System.nanoTime()
      engine.tick()
      val emitted = engine.drainResults().size
      val emitMs = (System.nanoTime() - t2) / 1e6
      require(emitted >= n, s"expected >=$n window clips, got $emitted")
      println(f"""{"mode":"lat","queries":$n,"submit_ms":$submitMs%.1f,"first_batch_ms":$admitMs%.1f,"window_emit_ms":$emitMs%.1f}""")
    }

    // socket-transport control/result plane drive: 4 senders × n CLIP-sized
    // frames through the broker, then a poll drain — round-trip msgs/s for
    // BASELINE.md. A control plane moves O(queries) messages per batch, so
    // 10k+ msgs/s means the transport never gates the engine loop.
    def socketDrive(n: Int): Unit = {
      import graft.streaming.{SocketTransport, SocketTransportServer}
      val server = new SocketTransportServer()
      val payload = """{"meta":{"query":"q0","seq":1},"records":[{"cnt":12345}]}""" * 4
      try {
        val senders = 4
        val t0 = System.nanoTime()
        val ts = (0 until senders).map { s =>
          val t = new Thread(() => {
            val c = new SocketTransport("127.0.0.1", server.port)
            try (0 until n / senders).foreach(i => c.send("clips", s"k$s-$i", payload))
            finally c.close()
          })
          t.start(); t
        }
        ts.foreach(_.join())
        val sendSec = (System.nanoTime() - t0) / 1e9
        val c = new SocketTransport("127.0.0.1", server.port)
        val t1 = System.nanoTime()
        var got = 0
        while (got < (n / senders) * senders) got += c.poll("clips").size
        val pollSec = (System.nanoTime() - t1) / 1e9
        c.close()
        println(f"""{"socket_msgs":$n,"send_per_sec":${n / sendSec}%.0f,"poll_per_sec":${n / pollSec}%.0f,"payload_bytes":${payload.length}}""")
      } finally server.close()
    }

    // args: plain counts ("1 10 100") use the mixed query set; "rawN"
    // uses N concurrent RAW queries; "globN" N pure global aggregates;
    // "mixN" N mixed Theta/KLL/group/topk sketch queries (also reports
    // actions per batch — the O(shapes) fusion evidence); "eqN" N
    // equality-routed queries (the categorize index drive); "latN"
    // measures admission/emit latency with N queries; "socketN" drives
    // N messages through the socket transport broker
    val plain = args.filterNot(_.startsWith("conf:"))
    val counts = if (plain.nonEmpty) plain.toSeq else Seq("1", "10", "100")
    counts.filter(_.startsWith("socket")).foreach(s => socketDrive(s.drop(6).toInt))
    counts.filter(_.startsWith("lat")).foreach(s => latDrive(s.drop(3).toInt))
    val results = counts.filterNot(s => s.startsWith("socket") || s.startsWith("lat")).map { spec =>
      val engine = new MultiQueryEngine(spark)
      val qs =
        if (spec.startsWith("raw")) rawQueriesFor(spec.drop(3).toInt)
        else if (spec.startsWith("glob")) globQueriesFor(spec.drop(4).toInt)
        else if (spec.startsWith("mix")) mixQueriesFor(spec.drop(3).toInt)
        else if (spec.startsWith("eq")) eqQueriesFor(spec.drop(2).toInt)
        else queriesFor(spec.toInt)
      qs.foreach { case (id, bql) => engine.submit(id, bql) }
      // modulo slicing: equivalent to range slicing on the dense sf
      // fixtures (uniform nBatches-way split) and still correct on the
      // id-SHIFTED ScaleCheck replicas (point SPARK_GRAFT_SF_DIR at
      // /tmp/graft_scale_8x for a production-sized 80k-rows/batch run),
      // where range slicing would silently drop every shifted copy
      val batches = (0 until nBatches).map(b =>
        events.filter(pmod(col("event_id"), lit(nBatches)) === b))
      batches.head.count() // warm
      var acts = 0
      val t0 = System.nanoTime()
      acts = countActions { batches.foreach(engine.processBatch) }
      val sec = (System.nanoTime() - t0) / 1e9
      val recsPerSec = total / sec
      (spec, sec, recsPerSec, sec / nBatches, acts.toDouble / nBatches)
    }
    results.foreach { case (spec, sec, rps, perBatch, actsPerBatch) =>
      println(f"""{"queries":"$spec","total_sec":$sec%.2f,"records_per_sec":$rps%.0f,"sec_per_batch":$perBatch%.3f,"actions_per_batch":$actsPerBatch%.1f}""")
    }
    spark.stop()
  }
}
