package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.slf4j.LoggerFactory

/** Skew guard for LSH-style bucket joins (`dd_minhash_lsh`, `dd_simhash`).
  *
  * A banded/chunked candidate join generates C(B,2) pairs for a bucket of B
  * docs: one degenerate bucket (boilerplate shingles, near-empty docs, a
  * popular simhash chunk) makes a single reducer quadratic at corpus scale
  * while every uniform-scale benchmark stays green. The guard bounds that
  * blast radius at the posting-list stage: each bucket's (already sorted,
  * so deterministic) doc list is truncated to `spark.graft.lsh.maxBucket`
  * entries, bounding per-bucket pair work at C(cap,2) regardless of skew.
  *
  * Truncation is never silent. The same plan node records three observed
  * metrics (`lsh_skew_<op>`: hot_buckets, entries_dropped,
  * candidate_pairs) via `Dataset.observe` — zero extra jobs, computed in
  * the pass that builds the postings — and a session-registered
  * `QueryExecutionListener` WARNs with the op name and counts whenever an
  * action ran a truncating plan. A deployment that would rather split hot
  * buckets than drop their tail can raise the cap and pre-filter stop
  * shingles; the metrics tell it when that matters.
  */
object HotBuckets {
  val MaxBucketKey = "spark.graft.lsh.maxBucket"
  val DefaultMaxBucket = 1000

  private val log = LoggerFactory.getLogger(getClass)
  private val registered = ConcurrentHashMap.newKeySet[SparkSession]()

  def maxBucket(s: SparkSession): Int =
    s.conf.get(MaxBucketKey, DefaultMaxBucket.toString).toInt

  /** Cap each bucket's posting list at `cap` entries, observing the damage.
    * `listCol` must be sorted (caller uses `sort_array`) so the kept prefix
    * is deterministic under any partitioning. */
  def capObserve(postings: DataFrame, listCol: String, cap: Int, op: String): DataFrame = {
    ensureListener(postings.sparkSession)
    val n = size(col(listCol))
    val kept = least(n, lit(cap))
    postings
      .observe(s"lsh_skew_$op",
        sum(when(n > cap, 1L).otherwise(0L)).as("hot_buckets"),
        sum(when(n > cap, (n - cap).cast("long")).otherwise(0L)).as("entries_dropped"),
        sum((kept.cast("long") * (kept - 1) / 2).cast("long")).as("candidate_pairs"))
      .withColumn(listCol, slice(col(listCol), 1, cap))
  }

  private def ensureListener(s: SparkSession): Unit =
    if (registered.add(s)) s.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.foreach {
          case (name, m: Row) if name.startsWith("lsh_skew_") && !m.isNullAt(0) =>
            val (hot, dropped, pairs) =
              (m.getAs[Long]("hot_buckets"), m.getAs[Long]("entries_dropped"),
                m.getAs[Long]("candidate_pairs"))
            if (hot > 0)
              log.warn(s"$name: $hot hot bucket(s) truncated to cap, " +
                s"$dropped posting entries dropped, $pairs candidate pairs generated " +
                s"(raise $MaxBucketKey or stop-shingle-filter to widen)")
            else log.debug(s"$name: no hot buckets, $pairs candidate pairs")
          case _ => ()
        }
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    })
}
