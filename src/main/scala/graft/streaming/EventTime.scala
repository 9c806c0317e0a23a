package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowing extension (SURVEY.md §2.C: the reference is
  * processing-time only — windows close on wall clock at batch boundaries;
  * event time, watermarks and late-data handling do not exist there).
  *
  * These are thin, typed wrappers over Structured Streaming's built-in
  * event-time machinery — watermark-tracked state, late-data drop, and
  * window-close emission are all handled by Spark's state store, which is
  * exactly what we want at 100 TB (RocksDB-backed state, incremental
  * checkpointing, no driver involvement in the hot path). */
object EventTime {

  /** Tumbling event-time aggregation: one row per (window, keys...) when
    * the watermark passes window end (append mode) or incrementally
    * (update mode). */
  def tumbling(
      df: DataFrame,
      tsCol: String,
      windowLength: String,
      watermarkDelay: String,
      keys: Seq[Column],
      aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLength) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Sliding event-time aggregation. */
  def sliding(
      df: DataFrame,
      tsCol: String,
      windowLength: String,
      slide: String,
      watermarkDelay: String,
      keys: Seq[Column],
      aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLength, slide) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Event-time session windows (gap-based), Spark built-in. */
  def sessions(
      df: DataFrame,
      tsCol: String,
      gap: String,
      watermarkDelay: String,
      keys: Seq[Column],
      aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
}
