package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed streaming state via `flatMapGroupsWithState` — the (c)/(d)
  * tier of the extension ladder: used only where Spark's built-in windows
  * genuinely cannot express the semantics. Session windows are built-in
  * (`EventTime.sessions`); ORDERED-pattern detection across micro-batches
  * is not — completing a funnel requires remembering how far each key got,
  * which is exactly a `GroupState`.
  *
  * Scale shape: state is O(1) per key (stage index + first-stage
  * timestamp), partitioned by key across executors in Spark's state store
  * (RocksDB-backed in production), no driver involvement. */
object StatefulOps {

  /** Funnel progress for one key: next stage to match + when the funnel
    * opened. */
  case class FunnelProgress(stage: Int, startTs: Long)

  /** A completed funnel: key, completion event time, open-to-complete
    * duration. */
  case class FunnelHit(key: Long, completedAt: Long, durationMs: Long)

  /** Detect `stages` occurring in order (other events interleave freely)
    * per key, across micro-batches. Emits one [[FunnelHit]] per completed
    * pass and restarts the funnel. Input: (key, eventType, tsMs); events
    * are ordered by ts within each batch (cross-batch disorder follows
    * arrival, the reference's processing-time contract). Works identically
    * on a batch Dataset (single group pass). */
  def funnel(
      ds: Dataset[(Long, String, Long)],
      stages: Seq[String]): Dataset[FunnelHit] = {
    import ds.sparkSession.implicits._
    require(stages.nonEmpty, "funnel needs at least one stage")

    def step(key: Long, events: Iterator[(Long, String, Long)],
        state: GroupState[FunnelProgress]): Iterator[FunnelHit] = {
      var cur = state.getOption.getOrElse(FunnelProgress(0, 0L))
      val hits = Vector.newBuilder[FunnelHit]
      events.toSeq.sortBy(_._3).foreach { case (_, tpe, ts) =>
        if (tpe == stages(cur.stage)) {
          val opened = if (cur.stage == 0) ts else cur.startTs
          if (cur.stage == stages.size - 1) {
            hits += FunnelHit(key, ts, ts - opened)
            cur = FunnelProgress(0, 0L)
          } else cur = FunnelProgress(cur.stage + 1, opened)
        }
      }
      state.update(cur)
      hits.result().iterator
    }

    ds.groupByKey(_._1)
      .flatMapGroupsWithState[FunnelProgress, FunnelHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(step)
  }
}
