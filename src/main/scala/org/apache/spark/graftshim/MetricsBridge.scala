package org.apache.spark.graftshim

import com.codahale.metrics.{Gauge, MetricRegistry}

import org.apache.spark.SparkEnv
import org.apache.spark.metrics.source.Source

/** Codahale `Source` exposing engine gauges on Spark's metricsSystem, so
  * the counters show up on the standard metrics surface (REST
  * `/metrics/json`, JMX, graphite — whatever the deployment's
  * `metrics.properties` sinks are). The reference does exactly this for
  * its accumulators
  * (`/root/reference/src/main/scala/org/apache/spark/BulletSparkMetricsSource.scala:42-55`).
  *
  * Lives under `org.apache.spark` because `metrics.source.Source` and
  * `MetricsSystem` are `private[spark]` — same access technique as the
  * reference, and the same reason `graftshim.ColumnBridge` exists for
  * `private[sql]`. */
class GraftMetricsSource(name: String, gauges: Map[String, () => Long]) extends Source {
  private val registry = new MetricRegistry
  gauges.foreach { case (n, f) =>
    registry.register(MetricRegistry.name(n), new Gauge[Long] {
      override def getValue: Long = f()
    })
  }
  override def sourceName: String = name
  override def metricRegistry: MetricRegistry = registry
}

object MetricsBridge {
  /** Register on the running SparkEnv's metrics system. */
  def register(source: GraftMetricsSource): Unit =
    SparkEnv.get.metricsSystem.registerSource(source)

  def remove(source: GraftMetricsSource): Unit =
    SparkEnv.get.metricsSystem.removeSource(source)

  /** Drain the async listener bus — lets tests/benches assert on
    * listener-observed job counts deterministically (`listenerBus` is
    * `private[spark]`, hence the shim). */
  def waitListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

  /** Read a registered source back THROUGH the metrics system (not the
    * object you happen to hold) — what a scraper sees. */
  def gaugeValues(name: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    SparkEnv.get.metricsSystem.getSourcesByName(name).flatMap {
      case s: Source =>
        s.metricRegistry.getGauges.asScala.toMap.map { case (k, g) =>
          k -> g.getValue.asInstanceOf[Long]
        }
    }.toMap
  }
}
