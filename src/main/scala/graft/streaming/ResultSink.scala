package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable

/** Engine metrics (A10) — the counters the reference exposes as Codahale
  * gauges on Spark's metrics REST
  * (`/root/reference/src/main/scala/com/yahoo/bullet/spark/utils/BulletSparkMetrics.scala:14-103`).
  * Atomics for the hot emit path; [[registerWithSpark]] publishes them as
  * gauges on `SparkEnv`'s metricsSystem so the standard scrape surfaces
  * (REST `/metrics/json`, JMX, graphite) see them. */
final class EngineMetrics {
  val queriesReceived = new AtomicLong
  val queriesRunning = new AtomicLong
  val queriesDone = new AtomicLong
  val queriesKilled = new AtomicLong
  val queriesFailed = new AtomicLong
  val recordsProcessed = new AtomicLong
  val resultsEmitted = new AtomicLong

  def snapshot: Map[String, Long] = Map(
    "queries_received" -> queriesReceived.get,
    "queries_running" -> queriesRunning.get,
    "queries_done" -> queriesDone.get,
    "queries_killed" -> queriesKilled.get,
    "queries_failed" -> queriesFailed.get,
    "records_processed" -> recordsProcessed.get,
    "results_emitted" -> resultsEmitted.get)

  private var source: Option[org.apache.spark.graftshim.GraftMetricsSource] = None

  /** Register these counters as a Codahale Source named `name` on the
    * running Spark metrics system (A10 parity with the reference's
    * BulletSparkMetricsSource). Gauges read the atomics live. */
  def registerWithSpark(name: String = "GraftEngine"): Unit = synchronized {
    if (source.isEmpty) {
      val gauges = Map[String, () => Long](
        "queries_received" -> (() => queriesReceived.get),
        "queries_running" -> (() => queriesRunning.get),
        "queries_done" -> (() => queriesDone.get),
        "queries_killed" -> (() => queriesKilled.get),
        "queries_failed" -> (() => queriesFailed.get),
        "records_processed" -> (() => recordsProcessed.get),
        "results_emitted" -> (() => resultsEmitted.get))
      val s = new org.apache.spark.graftshim.GraftMetricsSource(name, gauges)
      org.apache.spark.graftshim.MetricsBridge.register(s)
      source = Some(s)
    }
  }

  /** Deregister (tests / engine teardown). */
  def deregisterFromSpark(): Unit = synchronized {
    source.foreach(org.apache.spark.graftshim.MetricsBridge.remove)
    source = None
  }
}

/** Result publication (A7) — the reference publishes CLIP messages to the
  * result PubSub and FEEDBACK to the loop channel from `foreachRDD`
  * (`ResultEmitter.scala:19-30`). Our engine's driver is the single point
  * of truth, so publication is a driver-side callback; implementations
  * adapt to any transport (Kafka producer, HTTP, files). */
trait ResultSink {
  def publish(m: ResultMessage): Unit
}

/** In-memory sink for tests and embedding. */
final class MemoryResultSink extends ResultSink {
  private val buf = mutable.ArrayBuffer.empty[ResultMessage]
  override def publish(m: ResultMessage): Unit = synchronized { buf += m }
  def messages: Seq[ResultMessage] = synchronized(buf.toList)
}

/** Console sink (debug parity with writeStream.format("console")). */
final class ConsoleResultSink extends ResultSink {
  override def publish(m: ResultMessage): Unit =
    // scalastyle:off println
    println(s"[graft:${m.kind}] ${m.clip.asJson}")
  // scalastyle:on println
}
