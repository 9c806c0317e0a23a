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
    // "socketN" drives N messages through the socket transport broker
    val counts = if (args.nonEmpty) args.toSeq else Seq("1", "10", "100")
    counts.filter(_.startsWith("socket")).foreach(s => socketDrive(s.drop(6).toInt))
    val results = counts.filterNot(_.startsWith("socket")).map { spec =>
      val engine = new MultiQueryEngine(spark)
      val qs =
        if (spec.startsWith("raw")) rawQueriesFor(spec.drop(3).toInt)
        else if (spec.startsWith("glob")) globQueriesFor(spec.drop(4).toInt)
        else queriesFor(spec.toInt)
      qs.foreach { case (id, bql) => engine.submit(id, bql) }
      val batches = (0 until nBatches).map(b => events.filter(
        col("event_id") >= b * per && col("event_id") < (b + 1) * per))
      batches.head.count() // warm
      val t0 = System.nanoTime()
      batches.foreach(engine.processBatch)
      val sec = (System.nanoTime() - t0) / 1e9
      val recsPerSec = total / sec
      (spec, sec, recsPerSec, sec / nBatches)
    }
    results.foreach { case (spec, sec, rps, perBatch) =>
      println(f"""{"queries":"$spec","total_sec":$sec%.2f,"records_per_sec":$rps%.0f,"sec_per_batch":$perBatch%.3f}""")
    }
    spark.stop()
  }
}
