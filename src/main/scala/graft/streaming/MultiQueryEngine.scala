package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, sum, when}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.bql.{Ast, BqlParseException, Compiler, Parser}

/** The multi-query streaming runtime — Bullet's defining capability,
  * re-expressed Spark-first.
  *
  * The reference maintains the live query set with `updateStateByKey`, then
  * per batch collects it to the driver and broadcasts it into a
  * mapPartitions nested-loop over records
  * (`/root/reference/src/main/scala/com/yahoo/bullet/spark/QueryDataUnioning.scala:38-58`,
  * `FilterStreaming.scala:43-67`). Our design collapses that: the registry
  * IS driver state (queries attach/detach between micro-batches, same
  * batch-boundary admission semantics, SURVEY.md §3.2), and each active
  * query's *compiled Catalyst plan* runs over the shared micro-batch
  * DataFrame — so per-record work is whole-stage-codegen'd filter/agg
  * instead of interpreted per-record Querier calls, and each query's
  * executor→driver traffic is a bounded partial (see [[QueryState]]).
  *
  * Lifecycle semantics implemented here (SURVEY.md §2.B):
  *  - B13 windows: TIME (processing-time, closed at batch boundaries — the
  *    reference's exact behavior) and RECORD count windows; `ALL`
  *    (cumulative) vs `WINDOW` (reset) include modes.
  *  - B14 duration: wall-clock query lifetime; final result + COMPLETE.
  *  - B15 rate limiting: max emits per interval; breach → FAIL + KILL.
  *  - B16 error channel: parse/validation errors emit a FAIL clip, never
  *    execute.
  *  - B17 signals: external kill() tears down state and emits KILL.
  */
final class MultiQueryEngine(
    spark: SparkSession,
    clock: () => Long = () => System.currentTimeMillis(),
    rateLimitMaxEmits: Int = Int.MaxValue,
    rateLimitIntervalMs: Long = 1000L,
    soloParallelism: Int = 1) {

  private final class Live(
      val id: String,
      val bql: String,
      val query: Ast.Query,
      val state: QueryState,
      val submittedAt: Long) {
    val filter: Option[org.apache.spark.sql.Column] = query.where.map(Compiler.column)
    /** LATERAL VIEW stage (B2 explode surface): cardinality-changing, so
      * the query is forced down the solo path — it can never contribute a
      * conditional column to a fused shared-scan job. */
    val pre: Option[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame] =
      query.lateral.map(Compiler.lateralStage)
    var windowStart: Long = submittedAt
    var windowRecords: Long = 0L
    var emitsInInterval: Int = 0
    var intervalStart: Long = submittedAt
    var batchesSeen: Long = 0L
    /** Equality-routing key (the reference `QueryManager.categorize`
      * capability, fused-engine form): a WHERE of exactly
      * `<expr> == <literal>` routes this query into a per-(expr,
      * agg-shape) FAMILY answered by one groupBy job — see
      * [[fuseEqualityFamily]]. The literal is stringified for row
      * matching (Long 5 and the column's Int 5 must meet), so doubles
      * stay out (their string forms diverge across widths). */
    val eqRoute: Option[(Ast.Expr, Any)] = {
      def routable(v: Any): Boolean = v match {
        case _: String | _: Long | _: Int | _: Boolean => true
        case _ => false
      }
      if (pre.isDefined) None
      else query.where match {
        case Some(Ast.Binary("==", e, Ast.Lit(v))) if routable(v) =>
          Some((e, v))
        case Some(Ast.Binary("==", Ast.Lit(v), e)) if routable(v) =>
          Some((e, v))
        case _ => None
      }
    }
    /** Aggregate-shape signature for family matching: two queries fuse
      * into one routed job only if their partial aggregate columns are
      * textually identical (computed once — Column rendering is not
      * free at 100 queries × batches). */
    lazy val aggSignature: String = state match {
      case g: GlobalCombinable => g.partialAggCols(None).mkString(";")
      case _ => ""
    }
  }

  private val live = TrieMap.empty[String, Live]

  /** Empty-input aggregate rows per agg signature (see
    * [[fuseEqualityFamily]]) — tiny (one row per distinct fused shape). */
  private val emptyAggRows = TrieMap.empty[String, org.apache.spark.sql.Row]

  /** One pool for the engine's lifetime (A5 parallel solo mode), created
    * lazily on first use — per-batch pool churn would pay thread
    * creation/teardown every second. Daemon threads: the engine has no
    * close() and an idle pool must not pin the JVM. */
  private lazy val soloPool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newFixedThreadPool(
      soloParallelism,
      (r: Runnable) => {
        val t = new Thread(r, "graft-solo-worker")
        t.setDaemon(true)
        t
      })

  val results = new ConcurrentLinkedQueue[ResultMessage]()
  val metrics = new EngineMetrics
  private var sinks: List[ResultSink] = Nil

  def activeQueryIds: Seq[String] = live.keys.toSeq.sorted

  /** Register a result sink (A7): every emitted message is published to
    * each sink from the driver emit path. */
  def addSink(sink: ResultSink): Unit = synchronized { sinks ::= sink }

  /** Submit a BQL query (A1/A4: admission is effective at the next batch
    * boundary, like the reference's two-batch admission). Parse errors go
    * to the result channel (B16) and return Left. */
  def submit(id: String, bql: String): Either[String, Unit] =
    try {
      val q = Parser.parse(bql)
      // batch-path parity for SET: the two bql.* knobs stay query-local
      // (read off q.settings by QueryState below), every other allowed
      // key gets Spark SQL SET stickiness in the session conf
      q.settings.foreach { case (k, v) =>
        if (k != Compiler.ThetaLgkKey && k != Compiler.KllKKey) spark.conf.set(k, v)
      }
      val now = clock()
      // a live id cannot be silently replaced — the old query would
      // vanish with no terminal signal (no COMPLETE/KILL/FAIL), breaking
      // the lifecycle accounting. Duplicates go to the error channel;
      // kill() first to re-issue. (restore() is the sanctioned replace
      // path: checkpointed state IS the same query.)
      if (live.putIfAbsent(id, new Live(id, bql, q,
          QueryState.forQuery(q, k => spark.conf.getOption(k)), now)).isDefined) {
        metrics.queriesReceived.incrementAndGet()
        metrics.queriesFailed.incrementAndGet()
        emit(id, ResultKind.Fail, Clip(
          Map("query_id" -> id, "errors" -> Seq(s"query id $id is already running")), Seq.empty))
        Left(s"query id $id is already running")
      } else {
        metrics.queriesReceived.incrementAndGet()
        metrics.queriesRunning.incrementAndGet()
        Right(())
      }
    } catch {
      case e: BqlParseException =>
        metrics.queriesReceived.incrementAndGet()
        metrics.queriesFailed.incrementAndGet()
        emit(id, ResultKind.Fail, Clip(
          Map("query_id" -> id, "errors" -> Seq(e.getMessage)), Seq.empty))
        Left(e.getMessage)
    }

  /** External KILL signal (B17). */
  def kill(id: String): Unit =
    live.remove(id).foreach { _ =>
      metrics.queriesRunning.decrementAndGet()
      metrics.queriesKilled.incrementAndGet()
      emit(id, ResultKind.Kill, Clip(Map("query_id" -> id, "signal" -> "KILL"), Seq.empty))
    }

  private def emit(id: String, kind: ResultKind.Value, clip: Clip): Unit = {
    val m = ResultMessage(id, kind, clip)
    results.add(m)
    metrics.resultsEmitted.incrementAndGet()
    sinks.foreach { s =>
      try s.publish(m) catch { case _: Exception => () } // sink failure must not kill the DAG
    }
  }

  private def presentClip(l: Live, kind: ResultKind.Value, extraMeta: Map[String, Any]): Unit = {
    val rows = l.state.present(spark)
    emit(l.id, kind, Clip.ofRows(
      Map("query_id" -> l.id, "emitted_at" -> clock()) ++ extraMeta, rows))
  }

  /** Rate-limit check (B15): emits counted per interval. Returns true if
    * the query must be killed. */
  private def noteEmitAndCheckRate(l: Live): Boolean = {
    val now = clock()
    if (now - l.intervalStart >= rateLimitIntervalMs) {
      l.intervalStart = now
      l.emitsInInterval = 0
    }
    l.emitsInInterval += 1
    l.emitsInInterval > rateLimitMaxEmits
  }

  /** Emit one Window clip and enforce the B15 rate contract — shared by
    * the data path and [[tick]] so an empty-batch-only emitter cannot
    * evade the kill. Returns false if the query was killed. */
  private def emitWindowChecked(l: Live, records: Seq[org.apache.spark.sql.Row],
      meta: Map[String, Any]): Boolean = {
    emit(l.id, ResultKind.Window, Clip.ofRows(
      Map("query_id" -> l.id, "emitted_at" -> clock()) ++ meta, records))
    if (noteEmitAndCheckRate(l)) {
      live.remove(l.id)
      metrics.queriesRunning.decrementAndGet()
      metrics.queriesKilled.incrementAndGet()
      emit(l.id, ResultKind.Fail, Clip(
        Map("query_id" -> l.id, "errors" -> Seq("rate limit exceeded"), "signal" -> "KILL"),
        Seq.empty))
      false
    } else true
  }

  /** Process one micro-batch for every live query. Called from
    * `foreachBatch` (streaming) or directly (tests / batch replay).
    *
    * Queries whose state is [[GlobalCombinable]] (GROUP ALL, COUNT
    * DISTINCT, QUANTILE — filters included) are FUSED into one Spark
    * aggregate job over the shared batch: each query contributes
    * `when(pred, …)`-conditioned aggregate columns, so 1000 such queries
    * cost one scan + 1000 aggregate columns instead of 1000 jobs. The
    * rest (RAW collects, keyed group-bys) run per query. */
  def processBatch(batch: DataFrame): Unit = {
    if (live.isEmpty) return
    val cached = batch.persist()
    try {
      // lateral (explode) queries change row cardinality before their
      // filter, so they are split out ONCE here and never enter any
      // fusion tier — the invariant lives in this single partition, not
      // in per-tier guards a future tier could forget
      val (lateralSolo, all) = live.values.toSeq.sortBy(_.id).partition(_.pre.isDefined)
      val (globalFusable, rest) = all.partition(_.state match {
        case gs: GroupState => gs.isGlobal
        case _: ThetaState | _: KllState => true
        case _ => false
      })
      // keyed queries (group-bys, top-k) sharing identical key
      // expressions fuse per signature
      val (keyedGroups, solo) = rest.partition(_.state.isInstanceOf[KeyedCombinable])
      val bySig = keyedGroups.groupBy(_.state.asInstanceOf[KeyedCombinable].keySignature)
      val (fusedKeyed, soloKeyed) = bySig.values.toSeq.partition(_.size >= 2)

      // equality ROUTING INDEX (reference QueryManager.categorize,
      // FilterStreaming.scala:105-121, re-expressed for a fused engine):
      // global-combinable queries whose WHERE is `<expr> == <literal>`
      // and whose aggregate shape is identical form per-(expr, shape)
      // families; each family is answered by ONE isin-filtered
      // groupBy(expr) job — per-record cost is one hash probe + one
      // group update, O(1) in family size, where the generic fused path
      // pays a `when(pred)` column per query. Everything else falls
      // through to the generic fused tier unchanged.
      // each family is one more batch scan, so tiny families are not
      // worth splitting off the generic one-scan fused job; route only
      // past spark.graft.eqRouting.minFamily queries (0 disables)
      val minFamily = spark.conf
        .get("spark.graft.eqRouting.minFamily", "4").toInt
      val (routed, unrouted) =
        if (minFamily <= 0) (Seq.empty[Live], globalFusable)
        else globalFusable.partition(_.eqRoute.isDefined)
      val families = routed.groupBy(l => (l.eqRoute.get._1, l.aggSignature))
      val (bigFams, soloFams) =
        families.values.toSeq.partition(_.size >= math.max(2, minFamily))
      bigFams.sortBy(_.head.id).foreach(f => fuseEqualityFamily(f, cached))
      val globalRemainder = unrouted ++ soloFams.flatten
      if (globalRemainder.size >= 2) fuseGlobal(globalRemainder, cached)
      else globalRemainder.foreach(l => guarded(l)(processOne(l, cached)))
      fusedKeyed.foreach(group => fuseKeyed(group, cached))
      val (raws, plainSolo) =
        (soloKeyed.flatten ++ solo).partition(_.state.isInstanceOf[RawState])
      if (raws.size >= 2) fuseRaw(raws.sortBy(_.id), cached)
      else raws.foreach(l => guarded(l)(processOne(l, cached)))
      // un-fusable queries (distinct keyed shapes) each need their own
      // Spark job; with soloParallelism > 1 those jobs run concurrently
      // on a pool — the analog of the reference's A5 parallel filter mode
      // (thread pool over queries, off by default). Safe because each
      // query's Live/state is touched by exactly one task and the shared
      // surfaces (results queue, metrics, sinks) are concurrent.
      val solos = (plainSolo ++ lateralSolo).sortBy(_.id)
      if (soloParallelism > 1 && solos.size > 1) {
        solos.map(l => soloPool.submit(new Runnable {
          override def run(): Unit = guarded(l)(processOne(l, cached))
        })).foreach(_.get())
      } else solos.foreach(l => guarded(l)(processOne(l, cached)))
    } finally {
      cached.unpersist()
    }
  }

  /** One groupBy job for an equality-routed family: queries identical
    * up to the routed literal (same key expression, same aggregate
    * shape — the many-tenant pattern, "MY value's count"). The batch is
    * filtered to the family's literal set (one codegen'd hash-set probe
    * per record) and grouped by the key expression, so each record
    * updates exactly its own query's partials; every query then merges
    * its literal's row (offset 1 — column 0 is the route key), and a
    * literal with no group advances lifecycle with zero records, exactly
    * the solo path on an empty match. Result rows are bounded by the
    * family's distinct literals — driver-safe at any batch size. */
  private def fuseEqualityFamily(ls: Seq[Live], cached: DataFrame): Unit =
    try {
      val keyExpr = Compiler.column(ls.head.eqRoute.get._1)
      val cols = ls.head.state.asInstanceOf[GlobalCombinable].partialAggCols(None)
      val lits = ls.map(_.eqRoute.get._2).distinct
      // isin literals are coerced by Catalyst against the key expression
      // (a long literal matches a double column exactly as `==` would);
      // the same numeric tolerance is mirrored in the driver-side row
      // routing below
      val rows = cached
        .filter(keyExpr.isin(lits: _*))
        .groupBy(keyExpr.as("__graft_route"))
        .agg(cols.head, cols.tail: _*)
        .collect()
      // normalized routing key: a Number's identity is the pair
      // (doubleValue, longValue) — Long 5 and the column's Int 5 meet,
      // exactly the `==` coercion isin applied upstream. Map lookup
      // keeps the driver-side distribution O(family) instead of
      // O(family × result rows) at 1k+ routed queries per family.
      def normKey(v: Any): Any = v match {
        case x: Number => (x.doubleValue, x.longValue)
        case x => x
      }
      val byKey = rows.iterator
        .filter(_.get(0) != null)
        .map(r => normKey(r.get(0)) -> r).toMap
      // a literal with no group must see EXACTLY what the generic fused
      // tier shows a zero-match query: the aggregate over empty input
      // (count 0 / null sums / empty sketches) — NOT a skipped merge,
      // which would leave a GROUP ALL state record-less. The empty-agg
      // row depends only on the aggregate shape, so it is computed once
      // per signature per engine (a one-row action over an empty scan).
      lazy val emptyRow = emptyAggRows.getOrElseUpdate(ls.head.aggSignature, {
        import org.apache.spark.sql.functions.{lit => lt}
        val agg = cached.filter(lt(false)).agg(cols.head, cols.tail: _*)
        // re-shape to the grouped row layout (route key at 0), keeping a
        // schema-ful Row — merge paths read row.schema for field names
        agg.select(lt(null).cast("string").as("__graft_route") +:
          agg.columns.map(agg.col): _*).head()
      })
      ls.foreach { l =>
        guarded(l) {
          val row = byKey.getOrElse(normKey(l.eqRoute.get._2), emptyRow)
          lifecycle(l,
            l.state.asInstanceOf[GlobalCombinable].mergeCombined(row, 1))
        }
      }
    } catch {
      // family job failed as a whole: per-query fallback, same rule as
      // the generic fused tiers
      case _: Exception => ls.foreach(l => guarded(l)(processOne(l, cached)))
    }

  /** One aggregate job for all global-combinable queries. */
  private def fuseGlobal(ls: Seq[Live], cached: DataFrame): Unit =
    try {
      val offsets = ls.scanLeft(0)(_ + _.state.asInstanceOf[GlobalCombinable].partialWidth)
      val cols = ls.flatMap(l =>
        l.state.asInstanceOf[GlobalCombinable].partialAggCols(l.filter))
      val row = cached.agg(cols.head, cols.tail: _*).head()
      ls.zip(offsets).foreach { case (l, off) =>
        guarded(l) {
          lifecycle(l, l.state.asInstanceOf[GlobalCombinable].mergeCombined(row, off))
        }
      }
    } catch {
      // fused job failed as a whole (e.g. one bad column): fall back to
      // per-query processing so one query's error stays its own
      case _: Exception => ls.foreach(l => guarded(l)(processOne(l, cached)))
    }

  /** One groupBy job for queries sharing a GROUP BY key signature.
    *
    * Over-cap survivor selection must match the solo path EXACTLY — per
    * query, not in aggregate. The solo path ([[GroupState.update]] /
    * [[TopKState.update]]) takes each batch's groups ordered by the
    * query's OWN matched count (group key as deterministic tiebreaker),
    * and insertion order decides which groups enter the capped driver map.
    * A shared cut ordered by any cross-query total can evict a quiet
    * query's heavy groups when it is fused with a hotter query whose hot
    * keys are disjoint. So: one shared scan+groupBy job computes every
    * query's partial columns; if the batch stays under the group cap the
    * single collected result feeds every query (merge is commutative under
    * the cap); over the cap, each query takes its own TakeOrdered slice of
    * the persisted fused aggregate — N tiny sorts over one shared
    * aggregation instead of N scans of the raw batch.
    *
    * Value columns are re-aliased to generated `__graft_q<i>_<j>` names so
    * a user alias can never collide with engine columns (merging is
    * positional; [[KeyedCombinable.mergeCombinedKeyed]] renames to its own
    * schema). */
  private def fuseKeyed(ls: Seq[Live], cached: DataFrame): Unit =
    try {
      val states = ls.map(_.state.asInstanceOf[KeyedCombinable])
      val keyCols = states.head.keyColumns
      val nKeys = keyCols.size
      val widths = states.map(_.partialWidth)
      val offsets = widths.scanLeft(nKeys)(_ + _)
      val cols = ls.zipWithIndex.flatMap { case (l, qi) =>
        l.state.asInstanceOf[KeyedCombinable].partialAggCols(l.filter).zipWithIndex
          .map { case (c, ci) => c.as(s"__graft_q${qi}_$ci") }
      }
      val agg = cached.groupBy(keyCols: _*).agg(cols.head, cols.tail: _*)
      val persisted = agg.persist()
      try {
        // fast-path probe: ONE unordered collect can feed every query
        // whose state can absorb all probe groups order-independently
        // (uncapped TopK maps always; capped group maps only with room
        // for every probe group — limit() row order is nondeterministic,
        // so a near-cap map must not let it pick the survivors)
        val probe = persisted.limit(QueryState.MaxGroups + 1).collect().toSeq
        val underCap = probe.size <= QueryState.MaxGroups
        val keyTiebreak = (0 until nKeys).map(i => col(persisted.columns(i)))
        ls.zipWithIndex.zip(offsets).foreach { case ((l, qi), off) =>
          val st = l.state.asInstanceOf[KeyedCombinable]
          if (underCap && st.canAbsorbUnordered(probe.size)) {
            guarded(l)(lifecycle(l, st.mergeCombinedKeyed(probe, nKeys, off)))
          } else {
            // ordered per-query slice, identical to solo: own count desc,
            // group key asc, cut at the state's OWN per-batch candidate
            // cap; zero-count groups sort last and are skipped at merge —
            // same survivor set as the solo groupBy over the pre-filtered
            // batch. A per-query sort failure falls back to that query's
            // solo path — it must NOT escalate to the outer catch, which
            // would double-merge already-fed queries.
            val collected =
              try {
                val ownN = col(s"__graft_q${qi}_${widths(qi) - 1}")
                Some(persisted.orderBy(ownN.desc +: keyTiebreak: _*)
                  .limit(st.batchCandidateCap).collect().toSeq)
              } catch { case _: Exception => None }
            collected match {
              case Some(rows) =>
                guarded(l)(lifecycle(l, st.mergeCombinedKeyed(rows, nKeys, off)))
              case None => guarded(l)(processOne(l, cached))
            }
          }
        }
      } finally {
        persisted.unpersist()
      }
    } catch {
      case _: Exception => ls.foreach(l => guarded(l)(processOne(l, cached)))
    }

  /** One shared pass for all RAW queries (B4). Each query contributes a
    * `when(pred, struct(projection))` column over the cached batch; rows
    * matching no query are filtered out on the executors; each partition
    * truncates per query at its remaining budget (so a broad query can
    * contribute at most budget rows per partition, never the whole
    * partition); and the driver streams partitions ONLY until every
    * budget is filled — with small limits the first partition usually
    * satisfies everything, so 100 RAW queries cost one narrow scan
    * instead of 100 limit-collect jobs.
    *
    * Row choice within the batch is arbitrary, exactly like the solo
    * path's unordered `limit(k)` (Bullet RAW takes any k matching
    * records). */
  private def fuseRaw(ls: Seq[Live], cached: DataFrame): Unit = {
    val states = ls.map(_.state.asInstanceOf[RawState])
    val budgets = states.map(_.remainingBudget)
    val want = ls.zip(budgets).filter(_._2 > 0)
    // a full buffer still sees the batch's lifecycle (windows, duration)
    ls.zip(budgets).filter(_._2 <= 0)
      .foreach { case (l, _) => guarded(l)(lifecycle(l, 0L)) }
    // Catalyst analysis of an n-struct select is superlinear in n; chunking
    // keeps each shared job's plan bounded (k jobs of <=128 queries beat
    // one k*128-column job on driver time, and both beat per-query jobs)
    want.grouped(128).foreach(chunk => fuseRawJob(chunk, cached))
  }

  private def fuseRawJob(want: Seq[(Live, Int)], cached: DataFrame): Unit = {
    if (want.isEmpty) return
    try {
      val n = want.size
      val caps = want.map(_._2).toArray
      val structCols = want.zipWithIndex.map { case ((l, _), i) =>
        val s = org.apache.spark.sql.functions.struct(
          Compiler.rawProjectionCols(l.query, cached): _*)
        l.filter.map(p => when(p, s)).getOrElse(s).as(s"__graft_raw_$i")
      }
      val preds = want.map(_._1.filter)
      val narrowed =
        if (preds.forall(_.isDefined)) cached.filter(preds.flatten.reduce(_ || _))
        else cached
      val selected = narrowed.select(structCols: _*)
      // RDD-level truncation: .rdd rows are already external, so no
      // per-batch construction of a 100-struct output encoder
      val pruned = selected.rdd.mapPartitions { it =>
        val taken = new Array[Int](n)
        it.filter { row =>
          var keep = false
          var i = 0
          while (i < n) {
            if (taken(i) < caps(i) && !row.isNullAt(i)) { taken(i) += 1; keep = true }
            i += 1
          }
          keep
        }
      }
      val got = Array.fill(n)(Vector.newBuilder[org.apache.spark.sql.Row])
      val counts = new Array[Int](n)
      var unfilled = n
      val iter = pruned.toLocalIterator
      while (unfilled > 0 && iter.hasNext) {
        val row = iter.next()
        var i = 0
        while (i < n) {
          if (counts(i) < caps(i) && !row.isNullAt(i)) {
            got(i) += row.getStruct(i)
            counts(i) += 1
            if (counts(i) == caps(i)) unfilled -= 1
          }
          i += 1
        }
      }
      want.zipWithIndex.foreach { case ((l, _), i) =>
        guarded(l)(lifecycle(l, l.state.asInstanceOf[RawState].offer(got(i).result())))
      }
    } catch {
      // shared job failed before any state was fed (offers happen last):
      // every wanting query falls back to its own solo pass
      case _: Exception =>
        want.foreach { case (l, _) => guarded(l)(processOne(l, cached)) }
    }
  }

  private def guarded(l: Live)(body: => Unit): Unit =
    try body
    catch {
      case e: Exception =>
        if (live.remove(l.id).isDefined) {
          metrics.queriesRunning.decrementAndGet()
          metrics.queriesFailed.incrementAndGet()
          emit(l.id, ResultKind.Fail, Clip(
            Map("query_id" -> l.id, "errors" -> Seq(String.valueOf(e.getMessage))), Seq.empty))
        }
    }

  private def processOne(l: Live, batch: DataFrame): Unit = {
    val base = l.pre.map(_(batch)).getOrElse(batch)
    val filtered = l.filter.map(base.filter).getOrElse(base)
    val consumed = l.state.update(filtered)
    lifecycle(l, consumed)
  }

  private def lifecycle(l: Live, consumed: Long): Unit = {
    val now = clock()
    l.batchesSeen += 1
    l.windowRecords += consumed
    metrics.recordsProcessed.addAndGet(consumed)

    // RAW completion (B4): limit reached → final result + COMPLETE.
    if (l.state.isDone) {
      finish(l, now); return
    }
    // duration (B14)
    val expired = l.query.durationMs.exists(d => now - l.submittedAt >= d)
    if (expired) {
      finish(l, now); return
    }
    // windows (B13). Reactive RECORD windows on RAW queries emit one clip
    // PER window-sized chunk of records — a batch carrying 3N records
    // produces 3 Window clips, each with its own N records, matching the
    // reference's per-record reactive emission
    // (`FilterStreamingTest.scala:241-275`). Aggregate states close
    // windows at batch boundaries (their content cannot be split
    // retroactively): one emit per batch, like the reference's
    // batch-granular non-reactive windows.
    l.query.window.foreach { w =>
      (l.state, w.unit) match {
        case (rs: RawState, Ast.RecordUnit) if rs.isReactive =>
          var alive = true
          while (alive && rs.buffered >= w.every) {
            val chunk = rs.drainWindow(w.every.toInt)
            // meta carries the window's OPEN time — capture before the
            // clock reset, so it is never the emit instant
            val meta = Map("window_start" -> l.windowStart, "records" -> chunk.size)
            l.windowStart = now
            l.windowRecords = rs.buffered.toLong
            alive = emitWindowChecked(l, chunk, meta)
          }
        case _ =>
          val shouldEmit = w.unit match {
            case Ast.TimeUnit => now - l.windowStart >= w.every
            case Ast.RecordUnit => l.windowRecords >= w.every
          }
          if (shouldEmit) closeWindow(l, w, now)
      }
    }
  }

  /** Close one non-reactive window — shared by the data path and [[tick]]
    * so both report identical metadata and both enforce the B15 rate
    * contract. Meta is captured BEFORE the clock/state reset: window_start
    * is the window's open time and records the count it actually saw. */
  private def closeWindow(l: Live, w: Ast.WindowSpec, now: Long): Unit = {
    val rows = l.state.present(spark)
    val meta = Map("window_start" -> l.windowStart, "records" -> l.windowRecords)
    l.windowStart = now
    l.windowRecords = 0L
    if (!w.includeAll) l.state.reset()
    emitWindowChecked(l, rows, meta)
  }

  private def finish(l: Live, now: Long): Unit = {
    live.remove(l.id)
    metrics.queriesRunning.decrementAndGet()
    metrics.queriesDone.incrementAndGet()
    presentClip(l, ResultKind.Complete, Map("signal" -> "COMPLETE", "finished_at" -> now))
  }

  /** Close out expired queries and due TIME windows even when no data
    * arrives (the reference's timeout path runs in the state stage each
    * batch regardless of data, `QueryDataUnioning.scala:71-73`). */
  def tick(): Unit = {
    val now = clock()
    live.values.toSeq.sortBy(_.id).foreach { l =>
      if (l.query.durationMs.exists(d => now - l.submittedAt >= d)) finish(l, now)
      else l.query.window.foreach { w =>
        if (w.unit == Ast.TimeUnit && now - l.windowStart >= w.every)
          closeWindow(l, w, now)
      }
    }
  }

  /** Attach to a streaming Dataset (A2/A7): one shared stream consumed by
    * every registered query via foreachBatch.
    *
    * With `recoveryDir` set, attach is self-recovering (A9, the analog of
    * the reference's `StreamingContext.getOrCreate` resume,
    * `BulletSparkStreamingBaseJob.scala:30-38`): any snapshot found in the
    * directory is restored BEFORE the stream starts (checkpointed queries
    * merge over already-registered ids), and every processed batch
    * atomically rewrites the snapshot — kill the process at any point and
    * the next attach resumes each query's state mid-stream. */
  /** @param onBatch per-batch-tick hook, run BEFORE the batch so applied
    *        feedback (e.g. `TransportBridge.pump()`) admits/kills at the
    *        batch boundary — the reference's admission semantics. Without
    *        this seam a transport-bridged deployment has no place to drain
    *        feedback: `attach` owns the foreachBatch loop. */
  def attach(stream: DataFrame, triggerMs: Long = 1000L,
      recoveryDir: Option[String] = None,
      onBatch: () => Unit = () => ()): StreamingQuery = {
    recoveryDir.foreach(restoreFromDir)
    stream.writeStream
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (df: DataFrame, _: Long) =>
        onBatch()
        processBatch(df)
        tick()
        recoveryDir.foreach(checkpointToDir)
      }
      .start()
  }

  private def ckptFile(dir: String) = new java.io.File(dir, "graft.ckpt")

  /** Restore from `dir`'s snapshot if one exists; returns whether it did. */
  def restoreFromDir(dir: String): Boolean = {
    val f = ckptFile(dir)
    if (f.isFile) { restore(java.nio.file.Files.readAllBytes(f.toPath)); true }
    else false
  }

  /** Atomically (write-temp + rename) persist [[checkpoint]] to `dir`. */
  def checkpointToDir(dir: String): Unit = {
    val d = new java.io.File(dir)
    d.mkdirs()
    val tmp = new java.io.File(d, "graft.ckpt.tmp")
    java.nio.file.Files.write(tmp.toPath, checkpoint())
    java.nio.file.Files.move(tmp.toPath, ckptFile(dir).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Control-plane stream (A1/A4/A8): `(action, query_id, bql)` records
    * arriving over any transport-backed source; `action` ∈ submit|kill.
    * Control volume is tiny (the reference coalesces it to ≤10 partitions
    * for the same reason, `QueryDataUnioning.scala:29-32`), so a driver
    * collect per batch is the right shape; admission takes effect at the
    * next data batch — the reference's batch-boundary semantics. */
  def attachControl(control: DataFrame, triggerMs: Long = 1000L): StreamingQuery =
    control.writeStream
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.select("action", "query_id", "bql").coalesce(1).collect().foreach { r =>
          Option(r.getString(0)).map(_.toLowerCase) match {
            case Some("submit") => submit(r.getString(1), r.getString(2))
            case Some("kill") => kill(r.getString(1))
            case _ => ()
          }
        }
      }
      .start()

  /** Checkpoint the whole engine (A9): every live query's BQL, lifecycle
    * clocks and incremental state. The reference restarts from Spark
    * checkpoints (`BulletSparkStreamingBaseJob.scala:30-38`); our state is
    * driver-held and O(sketch) per query, so a snapshot is a small blob a
    * deployment writes wherever it keeps checkpoints. */
  def checkpoint(): Array[Byte] =
    SerUtil.write(live.values.toList.sortBy(_.id).map { l =>
      (l.id, l.bql, l.submittedAt, l.windowStart, l.windowRecords,
        l.emitsInInterval, l.intervalStart, l.batchesSeen, l.state.snapshot())
    })

  /** Restore queries + state from [[checkpoint]] bytes. Merge semantics:
    * checkpointed queries REPLACE any currently-registered query with the
    * same id (their state is authoritative) and leave other registered
    * queries running; the `queries_running` gauge counts only genuinely
    * new registrations, so it always equals the live query count. */
  def restore(bytes: Array[Byte]): Unit =
    SerUtil.read[List[(String, String, Long, Long, Long, Int, Long, Long, Array[Byte])]](bytes)
      .foreach { case (id, bql, submittedAt, wStart, wRecs, emits, iStart, batches, stateBytes) =>
        val q = Parser.parse(bql)
        val l = new Live(id, bql, q,
          QueryState.forQuery(q, k => spark.conf.getOption(k)), submittedAt)
        l.windowStart = wStart
        l.windowRecords = wRecs
        l.emitsInInterval = emits
        l.intervalStart = iStart
        l.batchesSeen = batches
        l.state.restore(stateBytes)
        if (live.put(id, l).isEmpty) metrics.queriesRunning.incrementAndGet()
      }

  /** Drain accumulated results (test/driver convenience). */
  def drainResults(): Seq[ResultMessage] = {
    val out = Vector.newBuilder[ResultMessage]
    var m = results.poll()
    while (m != null) { out += m; m = results.poll() }
    out.result()
  }
}
