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
object StatefulOps extends Serializable {

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
  /** @param idleTtlMs processing-time TTL after which a stalled funnel's
    *        state is dropped — bounds the state store on an unbounded key
    *        space (user ids never stop arriving, most never finish the
    *        funnel). A key seen again after expiry simply restarts at
    *        stage 0. `None` (the default) retains state FOREVER — only
    *        appropriate for bounded key spaces or batch execution.
    *        Engine-level caveat: a `Some` TTL uses ProcessingTimeTimeout,
    *        under which Spark's micro-batch loop always schedules another
    *        (possibly empty) batch to fire due timeouts — so
    *        `processAllAvailable()` never quiesces on such a query; drive
    *        it with a real trigger interval instead. Batch execution
    *        ignores timeouts either way. */
  def funnel(
      ds: Dataset[(Long, String, Long)],
      stages: Seq[String],
      idleTtlMs: Option[Long] = None): Dataset[FunnelHit] = {
    import ds.sparkSession.implicits._
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(idleTtlMs.forall(_ > 0), "idleTtlMs must be positive")

    def step(key: Long, events: Iterator[(Long, String, Long)],
        state: GroupState[FunnelProgress]): Iterator[FunnelHit] = {
      if (state.hasTimedOut) {
        state.remove()
        return Iterator.empty
      }
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
      // batch runs the whole group in one pass and never times out; its
      // GroupState may reject timeout calls, which is fine to ignore
      idleTtlMs.foreach { ttl =>
        try state.setTimeoutDuration(ttl) catch {
          case _: UnsupportedOperationException | _: IllegalStateException => ()
        }
      }
      hits.result().iterator
    }

    val timeoutConf =
      if (idleTtlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[FunnelProgress, FunnelHit](
        OutputMode.Append(), timeoutConf)(step)
  }

  /** First-completion funnel state for one user (see `ss_funnel`):
    * earliest view, earliest click strictly after it, earliest purchase
    * strictly after that — the same stage anchors as the batch
    * `op_funnel` query, folded incrementally. */
  case class PathState(seq: Int, tv: Option[Long], tc: Option[Long], tp: Option[Long])

  /** Per-batch emission of the current first-path state (max-seq row per
    * user is the final answer). Stage times in epoch micros; later
    * stages null while the user is stalled — the drop-off signal. */
  case class PathRow(user_id: Long, seq: Int, view_us: Long,
      click_us: Option[Long], purchase_us: Option[Long])

  /** Streaming first-completion funnel: fold (user, eventType, tsUs)
    * events in event-time order into the 3-stage anchor chain. Exactly
    * the batch conditional-min semantics — a same-timestamp click never
    * matches its view (strict >), whatever the within-batch processing
    * order — so the drained max-seq frame equals the batch funnel
    * row-for-row. Input batches must be time-contiguous ascending (a
    * replayed log is); O(1) state per user. */
  def funnelFirstPath(ds: Dataset[(Long, String, Long)]): Dataset[PathRow] = {
    import ds.sparkSession.implicits._
    def step(key: Long, rows: Iterator[(Long, String, Long)],
        state: GroupState[PathState]): Iterator[PathRow] = {
      var cur = state.getOption.getOrElse(PathState(0, None, None, None))
      rows.toSeq.sortBy(_._3).foreach { case (_, tpe, ts) =>
        tpe match {
          case "view" if cur.tv.isEmpty => cur = cur.copy(tv = Some(ts))
          case "click" if cur.tv.exists(ts > _) && cur.tc.isEmpty =>
            cur = cur.copy(tc = Some(ts))
          case "purchase" if cur.tc.exists(ts > _) && cur.tp.isEmpty =>
            cur = cur.copy(tp = Some(ts))
          case _ => ()
        }
      }
      cur = cur.copy(seq = cur.seq + 1)
      state.update(cur)
      cur.tv.iterator.map(v => PathRow(key, cur.seq, v, cur.tc, cur.tp))
    }
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[PathState, PathRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(step)
  }

  /** Open SCD2 run for one user (see `ss_scd2_maintain`): the state that
    * lets history building close runs across micro-batch boundaries. */
  case class Scd2State(seq: Int, tpe: String, vfUs: Long, n: Long)

  /** One SCD2 history row: closed rows (closed=1) are emitted exactly
    * once when the run ends; the still-open run re-emits per batch with
    * the seq counter, and the max-seq open row per user is the final
    * open-ended interval. */
  case class Scd2Row(user_id: Long, seq: Int, closed: Int, event_type: String,
      valid_from_us: Long, valid_to_us: Option[Long], n_events: Long)

  /** Incremental SCD2 / history-build: fold the time-ordered event stream
    * into per-user validity runs — consecutive same-type events extend
    * the open run; a type change closes it (valid_to = the new run's
    * start, the batch lead() contract) and opens the next. O(1) state
    * per user; drained closed rows + max-seq open rows equal the batch
    * gaps-and-islands build exactly. Input: (userId, tsUs, eventId,
    * eventType), batches time-contiguous ascending. */
  def scd2Maintain(ds: Dataset[(Long, Long, Long, String)]): Dataset[Scd2Row] = {
    import ds.sparkSession.implicits._
    def step(key: Long, rows: Iterator[(Long, Long, Long, String)],
        state: GroupState[Scd2State]): Iterator[Scd2Row] = {
      var cur = state.getOption
      val out = Vector.newBuilder[Scd2Row]
      rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, us, _, tpe) =>
        cur match {
          case Some(open) if open.tpe == tpe =>
            cur = Some(open.copy(n = open.n + 1))
          case Some(open) =>
            out += Scd2Row(key, open.seq, 1, open.tpe, open.vfUs, Some(us), open.n)
            cur = Some(Scd2State(open.seq, tpe, us, 1L))
          case None =>
            cur = Some(Scd2State(0, tpe, us, 1L))
        }
      }
      cur = cur.map(o => o.copy(seq = o.seq + 1))
      cur.foreach(state.update)
      cur.foreach(o => out += Scd2Row(key, o.seq, 0, o.tpe, o.vfUs, None, o.n))
      out.result().iterator
    }
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[Scd2State, Scd2Row](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(step)
  }

  /** Last seen event for one user (see `ss_transitions`): the O(1) state
    * that lets consecutive-pair extraction cross micro-batch boundaries. */
  case class LastEvent(us: Long, eid: Long, tpe: String)

  /** Streaming consecutive-pair extraction: per user (ordered by event
    * time, event_id tie-break), emit one (src, dst) row per adjacent
    * event pair — the Markov-transition feed, maintained live. The
    * boundary pair between micro-batches comes out of the remembered
    * last event, so the drained pair multiset equals the batch lead()
    * extraction exactly. Input: (userId, tsUs, eventId, eventType),
    * batches time-contiguous ascending. */
  def transitionPairs(ds: Dataset[(Long, Long, Long, String)]): Dataset[(String, String)] = {
    import ds.sparkSession.implicits._
    def step(key: Long, rows: Iterator[(Long, Long, Long, String)],
        state: GroupState[LastEvent]): Iterator[(String, String)] = {
      var prev = state.getOption
      val out = Vector.newBuilder[(String, String)]
      rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, us, eid, tpe) =>
        prev.foreach(p => out += ((p.tpe, tpe)))
        prev = Some(LastEvent(us, eid, tpe))
      }
      prev.foreach(state.update)
      out.result().iterator
    }
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[LastEvent, (String, String)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(step)
  }

  /** One emitted row of the streaming EWMA drift monitor — the same frame
    * and flag semantics as the batch op (`op_anomaly_ewma`,
    * queries/OperatorQueries.scala): truncated integer EWMA over the last
    * 8 daily counts (weights 128..1, denominator 256 - 2^(8-min(rn,8))),
    * spike when 4·c·den > 5·num, dip when 5·c·den < 4·num, both gated on
    * rn >= 3 warm-up days. All-integer, so streaming ≡ batch bit-exactly. */
  case class EwmaRow(event_type: String, day: String, c: Long,
      ewma_num: Long, ewma_den: Long, spike: Int, dip: Int)

  /** Monitor state for one key: days seen so far + the last up-to-8 daily
    * counts, most recent first — O(1) per key in the state store. */
  case class EwmaState(rn: Int, prev: List[Long])

  /** Streaming EWMA drift monitor over a dense per-key daily-count feed
    * (key, day "yyyy-MM-dd", count). Input days must arrive in order per
    * key across micro-batches (a daily metrics feed is); within a batch
    * rows are sorted by day before folding. Emits exactly one row per
    * input row (append mode), so the drained sink equals the batch
    * monitor's full series. */
  def ewmaMonitor(ds: Dataset[(String, String, Long)]): Dataset[EwmaRow] = {
    import ds.sparkSession.implicits._
    def step(key: String, rows: Iterator[(String, String, Long)],
        state: GroupState[EwmaState]): Iterator[EwmaRow] = {
      var cur = state.getOption.getOrElse(EwmaState(0, Nil))
      val out = Vector.newBuilder[EwmaRow]
      rows.toSeq.sortBy(_._2).foreach { case (_, day, c) =>
        val padded = cur.prev.padTo(8, 0L)
        val num = (1 to 8).map(k => padded(k - 1) * (1L << (8 - k))).sum
        val den = 256L - (1L << (8 - math.min(cur.rn, 8)))
        val spike = if (cur.rn >= 3 && 4 * c * den > 5 * num) 1 else 0
        val dip = if (cur.rn >= 3 && 5 * c * den < 4 * num) 1 else 0
        out += EwmaRow(key, day, c, num, den, spike, dip)
        cur = EwmaState(cur.rn + 1, (c :: cur.prev).take(8))
      }
      state.update(cur)
      out.result().iterator
    }
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[EwmaState, EwmaRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(step)
  }

  /** One point on a maintained Pareto frontier (see `ss_skyline_maintain`):
    * emitted with the per-key batch sequence number so the drained sink's
    * latest emission per key IS the final frontier. */
  case class SkyRow(lang: String, seq: Int, doc_id: Long, x: Long, y: Long)

  /** Frontier state for one key: batch counter + the current
    * non-dominated set. O(|frontier|) per key — the whole point of
    * incremental skyline maintenance is that this set is tiny relative
    * to the stream. */
  case class SkyState(seq: Int, frontier: List[(Long, Long, Long)])

  /** Exact 2-D skyline of a point set under STRICT domination (q kills p
    * iff qx>=px, qy>=py and one strict) with duplicate maximal points
    * kept — the same contract as the batch op_skyline query. One sort +
    * sweep, O(n log n). */
  private[graft] def skylineOf(pts: Seq[(Long, Long, Long)]): List[(Long, Long, Long)] = {
    val out = List.newBuilder[(Long, Long, Long)]
    var best = Long.MinValue
    pts.groupBy(_._2).toSeq.sortBy(-_._1).foreach { case (_, ps) =>
      val my = ps.map(_._3).max
      if (my > best) { out ++= ps.filter(_._3 == my); best = my }
    }
    out.result()
  }

  /** Incremental Pareto-frontier maintenance: each micro-batch's points
    * fold into the per-key frontier (domination is transitive, so
    * dropping dominated points early never changes the final skyline —
    * incremental ≡ batch exactly). Emits the full current frontier per
    * batch tagged with a seq number; the final frontier is the max-seq
    * emission per key. Input: (key, id, x, y). */
  def skylineMaintain(ds: Dataset[(String, Long, Long, Long)]): Dataset[SkyRow] = {
    import ds.sparkSession.implicits._
    def step(key: String, rows: Iterator[(String, Long, Long, Long)],
        state: GroupState[SkyState]): Iterator[SkyRow] = {
      val cur = state.getOption.getOrElse(SkyState(0, Nil))
      val pts = cur.frontier ++ rows.map(r => (r._2, r._3, r._4))
      val next = SkyState(cur.seq + 1, skylineOf(pts))
      state.update(next)
      next.frontier.iterator.map { case (id, x, y) =>
        SkyRow(key, next.seq, id, x, y)
      }
    }
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[SkyState, SkyRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(step)
  }

  /** Cohort-retention state for one user (see `ss_retention_maintain`):
    * first-seen day + every distinct active day (epoch days). The days
    * set is needed in full because a LATE earlier day re-bases the
    * cohort, changing which stored days land on the 0/1/3/7 deltas —
    * O(distinct active days) per user, the calendar-bounded analogue of
    * the skyline twin's O(|frontier|). */
  case class RetentionState(seq: Int, days: Set[Int])

  /** Per-batch emission of one user's retention row: cohort day + which
    * of the 0/1/3/7 deltas the user has hit so far (max-seq row per user
    * is the final answer). */
  case class RetentionRow(user_id: Long, seq: Int, c: Int,
      d0: Boolean, d1: Boolean, d3: Boolean, d7: Boolean)

  /** Incremental cohort retention: fold (user, activeEpochDay) arrivals
    * into the per-user (min day, distinct days) state — exactly the
    * batch min/DISTINCT algebra, so the drained max-seq frame reproduces
    * op_retention's matrix after the harness-side rollup. */
  def retentionMaintain(ds: Dataset[(Long, Int)]): Dataset[RetentionRow] = {
    import ds.sparkSession.implicits._
    def step(key: Long, rows: Iterator[(Long, Int)],
        state: GroupState[RetentionState]): Iterator[RetentionRow] = {
      val cur = state.getOption.getOrElse(RetentionState(0, Set.empty))
      val next = RetentionState(cur.seq + 1, cur.days ++ rows.map(_._2))
      state.update(next)
      val c = next.days.min
      Iterator.single(RetentionRow(key, next.seq, c,
        next.days(c), next.days(c + 1), next.days(c + 3), next.days(c + 7)))
    }
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[RetentionState, RetentionRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(step)
  }

  /** Forward-fill state for one user (see `ss_gap_fill`): the last
    * non-null reading — O(1), the smallest possible enrichment state. */
  case class FillState(last: Option[Double])

  /** One forward-filled event, emitted exactly once as it arrives. */
  case class FillRow(event_id: Long, user_id: Long,
      v: Option[Double], filled: Option[Double])

  /** Streaming per-key forward fill (gap imputation in flight): each
    * user's last known reading carries across micro-batch boundaries in
    * GroupState, so every event emits with its imputed value the moment
    * it arrives — exactly the batch `last_value IGNORE NULLS` window
    * semantics over a time-ordered replay. Input: (user, tsUs, eventId,
    * reading or None). */
  def gapFill(ds: Dataset[(Long, Long, Long, Option[Double])]): Dataset[FillRow] = {
    import ds.sparkSession.implicits._
    def step(key: Long, rows: Iterator[(Long, Long, Long, Option[Double])],
        state: GroupState[FillState]): Iterator[FillRow] = {
      var last = state.getOption.flatMap(_.last)
      val out = rows.toSeq.sortBy(r => (r._2, r._3)).map { case (_, _, eid, v) =>
        if (v.isDefined) last = v
        FillRow(eid, key, v, last)
      }
      state.update(FillState(last))
      out.iterator
    }
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[FillState, FillRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(step)
  }

  private val SevenDaysUs = 7L * 24 * 3600 * 1000000L
  private val TwoDaysUs = 2L * 24 * 3600 * 1000000L

  /** Live-attribution state for one user (see `ss_attribution`): the
    * click/view touches still inside any future conversion's 7-day
    * lookback. Touches older than (latest seen ts − 7d) can never credit
    * again and are evicted on arrival — O(touches per user per week),
    * the same bound the watermarked stream-stream join holds. */
  case class TouchState(touches: List[(Long, Long, String)])

  /** One credited (conversion, touch) pair — or the whole-conversion
    * `(none)` row for an untouched purchase — emitted exactly once the
    * moment the purchase arrives. */
  case class CreditRow(touch_type: String, conv_id: Long, credit: Long)

  /** Streaming multi-touch attribution: each purchase credits the
    * user's click/view touches of the preceding 7 days LINEARLY in
    * integer cents the moment it arrives — base = cents div n to every
    * touch, remainder to the latest touch by (ts, event_id), untouched
    * purchases to an explicit `(none)` row — exactly the batch
    * op_attribution credit algebra, so the drained per-pair rows
    * aggregate to the batch report bit-for-bit and money conserves to
    * the cent at every micro-batch boundary. Input: (user, tsUs,
    * eventId, eventType, cents).
    *
    * ORDERING CONTRACT: crediting at arrival is exact for feeds that are
    * event-time-ordered PER USER across micro-batches (in-batch disorder
    * is repaired by the per-batch sort). A purchase processed before a
    * touch that event-time-precedes it credits without that touch — in
    * the extreme, an out-of-order purchase lands on `(none)`
    * (AttributionLateSpec pins the divergence). When the feed cannot
    * guarantee per-user ordering, use [[attributionBuffered]] — the
    * watermark-delayed graduation that trades crediting latency for
    * exactness under bounded reordering. */
  def attributionLive(
      ds: Dataset[(Long, Long, Long, String, Long)]): Dataset[CreditRow] = {
    import ds.sparkSession.implicits._
    def step(key: Long, rows: Iterator[(Long, Long, Long, String, Long)],
        state: GroupState[TouchState]): Iterator[CreditRow] = {
      var touches = state.getOption.map(_.touches).getOrElse(Nil)
      val out = List.newBuilder[CreditRow]
      rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, us, eid, tpe, cents) =>
        touches = touches.filter(_._1 >= us - SevenDaysUs)
        tpe match {
          case "click" | "view" => touches = (us, eid, tpe) :: touches
          case "purchase" =>
            // strict tts < cts: a same-instant touch never credits
            val cand = touches.filter(t => t._1 < us)
            if (cand.isEmpty) out += CreditRow("(none)", eid, cents)
            else {
              val n = cand.size
              val base = cents / n
              val rem = cents - base * n
              val latest = cand.maxBy(t => (t._1, t._2))
              cand.foreach { t =>
                out += CreditRow(t._3, eid, base + (if (t == latest) rem else 0L))
              }
            }
          case _ => ()
        }
      }
      state.update(TouchState(touches))
      out.result().iterator
    }
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[TouchState, CreditRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(step)
  }

  /** Buffered-attribution state for one user: live touches (7-day
    * lookback, watermark-evicted) plus purchases held until the watermark
    * passes their event time — O(events per user per (7d + lateness)). */
  case class AttrBufState(touches: List[(Long, Long, String)],
      pending: List[(Long, Long, Long)])

  /** Watermark-buffered attribution — [[attributionLive]]'s graduation
    * for feeds WITHOUT a per-user event-time ordering guarantee: each
    * purchase is held in GroupState until the event-time watermark
    * (max seen ts − `lateness`) passes its timestamp, then credits from
    * the full touch window — so any touch arriving within the lateness
    * horizon lands BEFORE the purchases it event-time-precedes, and the
    * result equals the batch op_attribution algebra under arbitrary
    * bounded reordering (AttributionLateSpec feeds a purchase-before-
    * touch slice order and proves it). The trade is crediting latency:
    * every credit emits `lateness` after the purchase's event time
    * reaches the stream frontier — the standard watermark contract, the
    * same one the stream-stream join twin holds. Touches evict once the
    * watermark proves no unflushed purchase can reach back to them
    * (tts + 7d < watermark). Events later than the watermark itself are
    * DROPPED — by watermark definition, exactly the bound chosen — and,
    * so the bound is observable rather than silent, each dropped event
    * emits an explicit `("(late_dropped)", event_id, cents)` row next to
    * the credit rows (the ss_dq_alerts pattern): a dropped touch carries
    * credit 0 (touches move no money), a dropped purchase its full cents,
    * so money still conserves over the emitted frame — credited +
    * late-dropped = total purchase cents. Count the `(late_dropped)` rows
    * to see how much the lateness bound bit in a given run
    * (AttributionLateSpec feeds one too-late touch and asserts the
    * counter).
    *
    * Input: (user, tsUs, eventId, eventType, cents); `lateness` is a
    * Spark duration string (e.g. "1 hour"). Emission fires on the
    * EventTimeTimeout no-data batch if no row for the key arrives. */
  def attributionBuffered(
      ds: Dataset[(Long, Long, Long, String, Long)],
      lateness: String): Dataset[CreditRow] = {
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.functions.{col, lit, timestamp_micros}
    // Late rows must REACH the fold to be counted: Spark's stateful
    // operator silently discards input older than the watermark when the
    // child output carries the watermarked attribute (and analysis
    // REQUIRES one for EventTimeTimeout). So after declaring the real
    // watermark — whose EventTimeWatermark node upstream keeps advancing
    // the global watermark from the true event times — the watermarked
    // column is swapped for a FAR-FUTURE decoy carrying the same
    // watermark METADATA: the analyzer sees a watermarked column, the
    // operator's late-row predicate (decoy < watermark) never fires, and
    // lateness classification moves into the fold where it can emit the
    // observable "(late_dropped)" row instead of bumping an operator
    // metric nobody reads.
    val decoyMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong(org.apache.spark.sql.catalyst.plans.logical
        .EventTimeWatermark.delayKey, 0L).build()
    val FarFutureUs = 253402300799000000L // 9999-12-31, decoy only
    val withTs = ds.toDF("user", "us", "eid", "tpe", "cents")
      .withColumn("evt", timestamp_micros(col("us")))
      .withWatermark("evt", lateness)
      .select(col("user"), col("us"), col("eid"), col("tpe"), col("cents"),
        timestamp_micros(lit(FarFutureUs)).as("evt", decoyMeta))
      .as[(Long, Long, Long, String, Long, java.sql.Timestamp)]
    def step(key: Long,
        rows: Iterator[(Long, Long, Long, String, Long, java.sql.Timestamp)],
        state: GroupState[AttrBufState]): Iterator[CreditRow] = {
      var st = state.getOption.getOrElse(AttrBufState(Nil, Nil))
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val out = List.newBuilder[CreditRow]
      rows.foreach { case (_, us, eid, tpe, cents, _) =>
        tpe match {
          // later than the watermark: flushes that should have seen this
          // event may already have fired — dropping is the bound's
          // definition; the marker row makes the drop observable
          case "click" | "view" | "purchase" if us < wmUs =>
            out += CreditRow("(late_dropped)", eid,
              if (tpe == "purchase") cents else 0L)
          case "click" | "view" => st = st.copy(touches = (us, eid, tpe) :: st.touches)
          case "purchase" => st = st.copy(pending = (cents, eid, us) :: st.pending)
          case _ => () // sentinel/unknown types only advance the watermark
        }
      }
      val (ripe, hold) = st.pending.partition(_._3 <= wmUs)
      ripe.sortBy(p => (p._3, p._2)).foreach { case (cents, eid, cts) =>
        // strict tts < cts: a same-instant touch never credits (the batch rule)
        val cand = st.touches.filter(t => t._1 < cts && t._1 >= cts - SevenDaysUs)
        if (cand.isEmpty) out += CreditRow("(none)", eid, cents)
        else {
          val n = cand.size
          val base = cents / n
          val rem = cents - base * n
          val latest = cand.maxBy(t => (t._1, t._2))
          cand.foreach { t =>
            out += CreditRow(t._3, eid, base + (if (t == latest) rem else 0L))
          }
        }
      }
      st = AttrBufState(st.touches.filter(_._1 + SevenDaysUs >= wmUs), hold)
      state.update(st)
      if (hold.nonEmpty) {
        // fire when the watermark passes the earliest held purchase; the
        // timestamp must exceed the current watermark (ceil + clamp)
        val dueMs = (hold.map(_._3).min + 999L) / 1000L
        state.setTimeoutTimestamp(math.max(dueMs, state.getCurrentWatermarkMs() + 1L))
      }
      out.result().iterator
    }
    withTs.groupByKey(_._1)
      .flatMapGroupsWithState[AttrBufState, CreditRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(step)
  }

  /** Sequence-mining state for one user (see `ss_top_paths`): the last
    * two event types plus whether the gap between them stayed inside
    * the 2-day session rule — O(1), the transitionPairs shape one
    * element deeper. */
  case class PathMineState(prev2: Option[String], prev1: Option[String],
      lastUs: Long, withinSession: Boolean)

  /** Live 3-event session-path extraction: emits (e1, e2, e3) the
    * moment the third event arrives, iff both gaps stayed within the
    * 2-day session rule — the batch lead/lead window semantics with
    * triples crossing micro-batch boundaries out of the remembered
    * state. Input: (user, tsUs, eventId, eventType). */
  def pathTriples(
      ds: Dataset[(Long, Long, Long, String)]): Dataset[(String, String, String)] = {
    import ds.sparkSession.implicits._
    def step(key: Long, rows: Iterator[(Long, Long, Long, String)],
        state: GroupState[PathMineState]): Iterator[(String, String, String)] = {
      var cur = state.getOption.getOrElse(PathMineState(None, None, Long.MinValue, false))
      val out = List.newBuilder[(String, String, String)]
      rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, us, _, tpe) =>
        val gapOk = cur.prev1.isDefined && us - cur.lastUs <= TwoDaysUs
        for (p2 <- cur.prev2; p1 <- cur.prev1 if cur.withinSession && gapOk)
          out += ((p2, p1, tpe))
        cur = PathMineState(cur.prev1, Some(tpe), us, gapOk)
      }
      state.update(cur)
      out.result().iterator
    }
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[PathMineState, (String, String, String)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(step)
  }

  /** Live table-profile state for one hash bucket (see
    * `ss_profile_maintain`): scalar moments plus one serialized theta
    * sketch per NDV column — O(sketch) state however many rows stream
    * through, the mergeable-summary shape that profiles an unbounded
    * ingest without ever rescanning it. Sketch size is CAPPED (lgk 16
    * default → ≤ ~520 KB serialized), because the state AND every
    * per-batch snapshot carry the sketch bytes: an uncapped sketch grows
    * linearly with per-bucket NDV until its nominal capacity, and the
    * first cut (lgk 20) went super-linear at the 64x octave (97.6 vs
    * linear 64) purely from serializing multi-MB still-growing sketches
    * every micro-batch. Below ~65k distinct per bucket-sketch the lgk-16
    * sketch is exact — which covers the driver fixtures at every oracle
    * SF, so the twin still shares op_profile's exact-count oracle; past
    * capacity it returns estimates with bounded state, exactly the
    * op_profile_sketch regime story. `spark.graft.profile.lgk` raises
    * the cap when a deployment wants a wider exact window. */
  case class ProfileState(seq: Long, n: Long, nulls: Long,
      minQ: Long, maxQ: Long, sumQ: Long,
      skOk: Array[Byte], skPk: Array[Byte], skRf: Array[Byte])

  /** One per-bucket profile snapshot (emitted every micro-batch; the
    * drain keeps each bucket's max-seq row and theta-unions the buckets). */
  case class ProfileRow(bucket: Int, seq: Long, n: Long, nulls: Long,
      min_q: Long, max_q: Long, sum_q: Long,
      sk_ok: Array[Byte], sk_pk: Array[Byte], sk_rf: Array[Byte])

  private[graft] val DefaultProfileLgk = 16

  private def thetaAdd(prev: Array[Byte],
      add: org.apache.datasketches.theta.UpdateSketch, lgk: Int): Array[Byte] = {
    val u = org.apache.datasketches.theta.SetOperation.builder()
      .setLogNominalEntries(lgk).buildUnion()
    if (prev.nonEmpty) u.union(org.apache.datasketches.memory.Memory.wrap(prev))
    u.union(add.compact())
    u.getResult.toByteArray
  }

  /** Streaming single-pass table profile (ANALYZE maintained live): each
    * hash bucket folds count / null-count / min / max / sum plus a theta
    * sketch per NDV column, all order-insensitive commutative merges —
    * so the drained per-bucket snapshots roll up to the batch profile
    * exactly, whatever order or batching the rows arrived in. Input:
    * (bucket, orderkey, partkey, returnflag, shipdateIsNull, qty). */
  def profileMaintain(
      ds: Dataset[(Int, Long, Long, String, Boolean, Long)],
      lgk: Int = DefaultProfileLgk): Dataset[ProfileRow] = {
    import ds.sparkSession.implicits._
    def step(key: Int, rows: Iterator[(Int, Long, Long, String, Boolean, Long)],
        state: GroupState[ProfileState]): Iterator[ProfileRow] = {
      val cur = state.getOption.getOrElse(ProfileState(0L, 0L, 0L,
        Long.MaxValue, Long.MinValue, 0L, Array.empty, Array.empty, Array.empty))
      def newSk() = org.apache.datasketches.theta.UpdateSketch.builder()
        .setLogNominalEntries(lgk).build()
      val (ok, pk, rf) = (newSk(), newSk(), newSk())
      var (n, nulls, minQ, maxQ, sumQ) =
        (cur.n, cur.nulls, cur.minQ, cur.maxQ, cur.sumQ)
      rows.foreach { case (_, okey, pkey, flag, shipNull, qty) =>
        n += 1
        if (shipNull) nulls += 1
        if (qty < minQ) minQ = qty
        if (qty > maxQ) maxQ = qty
        sumQ += qty
        ok.update(okey); pk.update(pkey); rf.update(flag)
      }
      val next = ProfileState(cur.seq + 1, n, nulls, minQ, maxQ, sumQ,
        thetaAdd(cur.skOk, ok, lgk), thetaAdd(cur.skPk, pk, lgk),
        thetaAdd(cur.skRf, rf, lgk))
      state.update(next)
      Iterator.single(ProfileRow(key, next.seq, next.n, next.nulls,
        next.minQ, next.maxQ, next.sumQ, next.skOk, next.skPk, next.skRf))
    }
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[ProfileState, ProfileRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(step)
  }

  /** Live correlation-moments state for one hash bucket (see
    * `ss_corr_maintain`): row count plus the nine exact integer moment
    * sums, kept as arbitrary-precision integers (decimal strings in the
    * encoded state — squared cents overflow a long within one fixture
    * octave, and floats would make the fold order-dependent). O(1) per
    * bucket. */
  case class CorrState(seq: Long, n: Long, sums: Array[String])

  /** One per-bucket moments snapshot; the drain keeps each bucket's
    * max-seq row, decimal-sums across buckets, and applies the SAME
    * fixed corr double tree as the batch op. */
  case class CorrMomentsRow(bucket: Int, seq: Long, n: Long,
      sx: String, sy: String, sz: String, sxx: String, syy: String,
      szz: String, sxy: String, sxz: String, syz: String)

  /** Streaming correlation-matrix maintenance: each bucket folds the
    * nine moment sums exactly, so the drained snapshots aggregate to the
    * identical sums the batch op's one-pass aggregate produces, and the
    * shared fixed double tree then yields bit-identical corr_micro
    * values. The hot loop is allocation-free: per-row products are plain
    * long arithmetic (exact — inputs are bounded fixture-scale ints)
    * accumulated in long partials that FLUSH to the arbitrary-precision
    * totals before they could overflow (Long.MaxValue/2 guard), so the
    * BigInt cost is O(flushes), not O(rows) — the first cut paid ~18
    * BigInt allocations per row and went super-linear from GC pressure
    * at the 32x octave (48.5 vs linear 32). Exactness is unchanged:
    * every partial is flushed exactly, overflow is structurally
    * unreachable between flushes. Input: (bucket, x, yCents, zCents). */
  def corrMaintain(ds: Dataset[(Int, Long, Long, Long)]): Dataset[CorrMomentsRow] = {
    import ds.sparkSession.implicits._
    def step(key: Int, rows: Iterator[(Int, Long, Long, Long)],
        state: GroupState[CorrState]): Iterator[CorrMomentsRow] = {
      val cur = state.getOption.getOrElse(CorrState(0L, 0L, Array.fill(9)("0")))
      var n = cur.n
      val tot = cur.sums.map(BigInt(_))
      val part = new Array[Long](9)
      def flush(i: Int): Unit = { tot(i) += BigInt(part(i)); part(i) = 0L }
      // overflow-exact long add: on two's-complement overflow, flush the
      // partial to the BigInt total first (0 + v always fits)
      def add(i: Int, v: Long): Unit = {
        val s = part(i) + v
        if (((part(i) ^ s) & (v ^ s)) < 0) { flush(i); part(i) = v }
        else part(i) = s
      }
      // product that stays exact past long range (rare path only)
      def addProd(i: Int, a: Long, b: Long): Unit =
        try add(i, Math.multiplyExact(a, b))
        catch { case _: ArithmeticException => tot(i) += BigInt(a) * BigInt(b) }
      rows.foreach { case (_, x, y, z) =>
        n += 1
        add(0, x); add(1, y); add(2, z)
        addProd(3, x, x); addProd(4, y, y); addProd(5, z, z)
        addProd(6, x, y); addProd(7, x, z); addProd(8, y, z)
      }
      (0 until 9).foreach(flush)
      val next = CorrState(cur.seq + 1, n, tot.map(_.toString))
      state.update(next)
      val s = next.sums
      Iterator.single(CorrMomentsRow(key, next.seq, next.n,
        s(0), s(1), s(2), s(3), s(4), s(5), s(6), s(7), s(8)))
    }
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[CorrState, CorrMomentsRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(step)
  }

  /** Right-to-be-forgotten enforcement state for one user (see
    * `ss_forget_enforce`): the (event-time, event-id) of the user's first
    * deletion request — O(1), absent until the user opts out. */
  case class ForgetState(fts: Long, fid: Long)

  /** One retained (not suppressed) event. */
  case class RetainedRow(event_id: Long, user_id: Long, event_type: String)

  /** Live right-to-be-forgotten enforcement: from a user's first deletion
    * request onward (the request row included), none of their events leave
    * the pipeline — the in-flight half of the op_forget_users compliance
    * cascade (which purges history; this stops NEW data at the door, so
    * the next batch purge has nothing to find). "First" is by
    * (event-time, event-id), matching the batch predicate
    * `(ts, id) < (first-request ts, id)` exactly; rows are processed in
    * that order within each micro-batch, so intra-batch disorder cannot
    * leak a post-request event. Cross-batch the contract is the gap-fill
    * one: emission is append-only, so a request arriving in a LATER batch
    * than an event it should have suppressed cannot recall it — exact for
    * per-user event-time-ordered feeds (what the harness replays), the
    * tradeoff every watermarkless live enforcer makes. State is O(1) per
    * opted-out user, hash-partitioned across executors.
    * Input: (user, tsUs, eventId, eventType, isRequest). */
  def forgetEnforce(
      ds: Dataset[(Long, Long, Long, String, Boolean)]): Dataset[RetainedRow] = {
    import ds.sparkSession.implicits._
    def step(key: Long, rows: Iterator[(Long, Long, Long, String, Boolean)],
        state: GroupState[ForgetState]): Iterator[RetainedRow] = {
      var cur = state.getOption
      val out = List.newBuilder[RetainedRow]
      def before(us: Long, id: Long, f: ForgetState): Boolean =
        us < f.fts || (us == f.fts && id < f.fid)
      rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, us, id, tpe, isReq) =>
        if (isReq && cur.forall(before(us, id, _)))
          cur = Some(ForgetState(us, id))
        if (cur.forall(before(us, id, _)))
          out += RetainedRow(id, key, tpe)
      }
      cur.foreach(state.update)
      out.result().iterator
    }
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[ForgetState, RetainedRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(step)
  }

  /** Streaming exact dedup — the live-ingest twin of the batch `dd_exact`
    * query: drop any record whose content hash was already seen inside
    * the watermark horizon. Built on Spark's
    * `dropDuplicatesWithinWatermark`, so per-hash state is evicted once
    * the event-time watermark passes it — bounded state on an unbounded
    * stream, where a plain `dropDuplicates` key set grows forever. The
    * horizon is the semantic contract: a duplicate arriving further than
    * `delay` after the watermark has moved on is treated as new content
    * (the same tradeoff every windowed deduper makes).
    *
    * State is hash-partitioned across executors by the 8-byte content
    * hash (the wide content column itself never enters the state store). */
  def streamingDedup(
      df: org.apache.spark.sql.DataFrame,
      contentCol: String,
      eventTimeCol: String,
      delay: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, xxhash64}
    df.withColumn("__content_h", xxhash64(col(contentCol)))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("__content_h")
      .drop("__content_h")
  }
}
