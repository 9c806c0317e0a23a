package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.ZOrder
import graft.sources.Tables

/** Operators Spark has no single built-in for, composed Spark-first
  * (SURVEY.md §2.C is "absent from the reference; ours from Spark" — these
  * three go beyond it: the temporal/range alignment ops a training-data
  * pipeline needs).
  *
  * Scale notes: all three are one-shuffle shapes. The as-of join and
  * sessionization are a single hash-partition by key + in-partition sort
  * (Spark's SortMergeJoin layout), never an all-pairs product; the range
  * join broadcasts the tiny bucket table.
  */
object OperatorQueries {

  private def ev(s: SparkSession, d: String): DataFrame = Tables.load(s, d, "events")

  /** ONE definition of the data-quality rule set shared by the report
    * (op_dq_rules) and the quarantine pass (op_dq_quarantine) — the two
    * cannot drift apart. Each entry: (rule name, VIOLATION predicate). */
  private[queries] object DqRules {
    val all: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "qty_le_45" -> (col("l_quantity") > 45),
      "price_le_80k" -> (col("l_extendedprice") > 80000),
      "discount_le_008" -> (col("l_discount") > 0.08),
      "flag_domain" -> !col("l_returnflag").isin("A", "N", "R"))
  }

  val defs: Seq[QueryDef] = Seq(

    // AS-OF JOIN: for each click, the most recent view of the same user at
    // or before the click (DuckDB has native ASOF JOIN as the oracle).
    // Spark-first: one window pass — partition by user, order by time,
    // running last-non-null view id. One shuffle, no join materialized.
    QueryDef("op_asof_join", Some(
      """SELECT c.event_id, v.event_id AS prev_view_id
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON c.user_id = v.user_id AND v.ts <= c.ts
        |ORDER BY c.event_id""".stripMargin)) { (s, d) =>
      val e = ev(s, d).filter(col("event_type").isin("click", "view"))
      // order views before clicks at identical ts: ASOF v.ts <= c.ts is
      // inclusive, so a same-timestamp view must precede the click.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), when(col("event_type") === "view", 0).otherwise(1), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("prev_view_id",
          last(when(col("event_type") === "view", col("event_id")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("prev_view_id"))
        .orderBy(col("event_id"))
    },

    // NEAREST-event join — the bidirectional sibling of the as-of join:
    // each click matched to the closest view of the same user in EITHER
    // direction (sensor/feature alignment where "most recent" is the
    // wrong rule near a boundary). One user-keyed sort serves two window
    // frames (backward last-view, forward first-view); the nearer side
    // wins, ties and same-timestamp views resolve to the backward side
    // deterministically (views order before clicks at equal ts, matching
    // the as-of join's inclusive convention). Microsecond-integer deltas,
    // so the comparison is exact on both engines. Scale: the whole plan
    // rides ONE hash exchange on user_id — the high-cardinality timeline
    // key — exactly like op_asof_join/op_scd2.
    QueryDef("j_asof_nearest", Some(
      """WITH e AS (SELECT * FROM events WHERE event_type IN ('click','view')),
        |o AS (SELECT event_id, event_type, epoch_us(ts) AS tus,
        |    last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id
        |            ORDER BY ts, CASE WHEN event_type = 'view' THEN 0 ELSE 1 END, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_id,
        |    last_value(CASE WHEN event_type = 'view' THEN epoch_us(ts) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id
        |            ORDER BY ts, CASE WHEN event_type = 'view' THEN 0 ELSE 1 END, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_ts,
        |    first_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id
        |            ORDER BY ts, CASE WHEN event_type = 'view' THEN 0 ELSE 1 END, event_id
        |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_id,
        |    first_value(CASE WHEN event_type = 'view' THEN epoch_us(ts) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id
        |            ORDER BY ts, CASE WHEN event_type = 'view' THEN 0 ELSE 1 END, event_id
        |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_ts
        |  FROM e)
        |SELECT event_id,
        |  CASE WHEN prev_id IS NOT NULL
        |         AND (next_id IS NULL OR tus - prev_ts <= next_ts - tus)
        |       THEN prev_id ELSE next_id END AS nearest_view_id,
        |  CASE WHEN prev_id IS NOT NULL
        |         AND (next_id IS NULL OR tus - prev_ts <= next_ts - tus)
        |       THEN tus - prev_ts ELSE next_ts - tus END AS delta_us
        |FROM o WHERE event_type = 'click' ORDER BY event_id""".stripMargin)) { (s, d) =>
      val e = ev(s, d).filter(col("event_type").isin("click", "view"))
      val ord = Seq(col("ts"),
        when(col("event_type") === "view", 0).otherwise(1), col("event_id"))
      val wb = Window.partitionBy(col("user_id")).orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy(col("user_id")).orderBy(ord: _*)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val vId = when(col("event_type") === "view", col("event_id"))
      val vTs = when(col("event_type") === "view", unix_micros(col("ts")))
      val scored = e
        .withColumn("tus", unix_micros(col("ts")))
        .withColumn("prev_id", last(vId, ignoreNulls = true).over(wb))
        .withColumn("prev_ts", last(vTs, ignoreNulls = true).over(wb))
        .withColumn("next_id", first(vId, ignoreNulls = true).over(wf))
        .withColumn("next_ts", first(vTs, ignoreNulls = true).over(wf))
        .filter(col("event_type") === "click")
      val prevWins = col("prev_id").isNotNull &&
        (col("next_id").isNull ||
          col("tus") - col("prev_ts") <= col("next_ts") - col("tus"))
      scored.select(col("event_id"),
          when(prevWins, col("prev_id")).otherwise(col("next_id")).as("nearest_view_id"),
          when(prevWins, col("tus") - col("prev_ts"))
            .otherwise(col("next_ts") - col("tus")).as("delta_us"))
        .orderBy(col("event_id"))
    },

    // RANGE JOIN: events banded into value ranges from a small bucket dim
    // (broadcast nested-loop on a non-equi predicate — the small side
    // ships to every executor, the fact side streams through).
    QueryDef("op_range_join", Some(
      """WITH buckets AS (
        |  SELECT 0 AS b_id, 0.0 AS lo, 100.0 AS hi UNION ALL
        |  SELECT 1, 100.0, 250.0 UNION ALL
        |  SELECT 2, 250.0, 400.0 UNION ALL
        |  SELECT 3, 400.0, 1e9)
        |SELECT b_id, count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM events JOIN buckets ON value >= lo AND value < hi
        |GROUP BY b_id ORDER BY b_id""".stripMargin)) { (s, d) =>
      val buckets = s.createDataFrame(Seq(
        (0, 0.0, 100.0), (1, 100.0, 250.0), (2, 250.0, 400.0), (3, 400.0, 1e9)))
        .toDF("b_id", "lo", "hi")
      ev(s, d)
        .join(broadcast(buckets), col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy(col("b_id"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_v"))
        .orderBy(col("b_id"))
    },

    // SESSIONIZATION: gap-based sessions per user (new session when > 2
    // days since the previous event — sized to the fixture's inter-event
    // gaps). Two window passes over one key-partitioned sort; session
    // stats per (user, session).
    QueryDef("op_sessionize", Some(
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN ts - lag(ts) OVER w <= INTERVAL 2 DAY THEN 0 ELSE 1 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |  s AS (
        |  SELECT user_id,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM g)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin)) { (s, d) =>
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, d)
        .withColumn("new_s",
          // exact microsecond interval — matches the oracle's `ts - lag(ts)
          // <= INTERVAL 2 DAY` even for sub-second timestamps
          when(unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser)) <= 172800000000L, 0)
            .otherwise(1))
        .withColumn("session_id", sum(col("new_s")).over(cum).cast(LongType))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy(col("user_id"), col("session_id"))
    },

    // FULL OUTER JOIN — the one outer-join shape the suite lacked
    // (inner/left/semi/anti live in CoreQueries). Both sides are filtered
    // so each contributes unmatched rows; the aggregated orders side
    // makes the join key unique per side, so coalesced custkey is a total
    // ORDER BY. Scale: both sides shuffle on the key (full outer cannot
    // broadcast — preserved rows exist on BOTH sides); AQE handles skew.
    QueryDef("j_full_outer", Some(
      """SELECT coalesce(c.c_custkey, o.custkey) AS custkey,
        |  c.c_acctbal, o.n_big_orders
        |FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal < 1000) c
        |FULL OUTER JOIN (
        |  SELECT o_custkey AS custkey, count(*) AS n_big_orders
        |  FROM orders WHERE o_totalprice > 150000 GROUP BY o_custkey) o
        |ON c.c_custkey = o.custkey
        |ORDER BY custkey""".stripMargin)) { (s, d) =>
      val c = Tables.load(s, d, "customer")
        .filter(col("c_acctbal") < 1000)
        .select(col("c_custkey"), col("c_acctbal"))
      val o = Tables.load(s, d, "orders")
        .filter(col("o_totalprice") > 150000)
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).as("n_big_orders"))
      c.join(o, col("c_custkey") === col("custkey"), "full_outer")
        .select(coalesce(col("c_custkey"), col("custkey")).as("custkey"),
          col("c_acctbal"), col("n_big_orders"))
        .orderBy(col("custkey"))
    },

    // PIVOT: long→wide reshaping (per-language doc counts fanned across
    // sources). The value list is EXPLICIT — `.pivot(col)` without values
    // runs a distinct scan over the corpus just to learn the columns, an
    // extra pass a 100 TB pipeline never wants. With the list bound,
    // Catalyst compiles a two-stage aggregate (count per (lang, source),
    // then pivotfirst per lang) — both stages map-side combined, so each
    // exchange carries one row per key per task, never corpus rows.
    // Counts are null-coalesced to 0 to match the FILTER-aggregate
    // relational form.
    QueryDef("op_pivot", Some(
      """SELECT lang,
        |  count(*) FILTER (WHERE source = 'src0') AS src0,
        |  count(*) FILTER (WHERE source = 'src1') AS src1,
        |  count(*) FILTER (WHERE source = 'src2') AS src2,
        |  count(*) FILTER (WHERE source = 'src3') AS src3
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)) { (s, d) =>
      val sources = Seq("src0", "src1", "src2", "src3")
      val p = Tables.load(s, d, "documents")
        .groupBy(col("lang"))
        .pivot("source", sources)
        .agg(count(lit(1)))
      p.select(col("lang") +: sources.map(v => coalesce(col(v), lit(0L)).as(v)): _*)
        .orderBy(col("lang"))
    },

    // UNPIVOT (melt): wide→long reshaping, the inverse op — numeric part
    // attributes stacked into (key, attr, val) rows. Spark's native
    // `unpivot` keeps this a zero-shuffle codegen'd projection (each row
    // fans out locally); the ORDER BY exists for the oracle only.
    QueryDef("op_unpivot", Some(
      """SELECT p_partkey, attr, val FROM (
        |  SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part)
        |ORDER BY p_partkey, attr""".stripMargin)) { (s, d) =>
      Tables.load(s, d, "part")
        .unpivot(
          ids = Array(col("p_partkey")),
          values = Array(col("p_retailprice"), col("p_size").cast(DoubleType).as("p_size")),
          variableColumnName = "attr",
          valueColumnName = "val")
        .orderBy(col("p_partkey"), col("attr"))
    },

    // SALTED JOIN (graft.operators.SkewJoin) driver-checkable: the manual
    // skew mitigation for hot keys AQE cannot split (hot on BOTH sides).
    // The fact side gets a deterministic salt in [0,8), the dim side is
    // replicated once per salt, and the join key becomes (key, salt) — a
    // hot order key spreads over 8 reducers instead of one. Salting must
    // be semantically invisible: the oracle is the PLAIN join + aggregate,
    // so any duplicate/dropped row from the salt plumbing fails the hash
    // compare. merge-hinted so the demonstration exercises the shuffle
    // path (at this SF Catalyst would otherwise broadcast the dim side
    // and no exchange would carry the salt at all); the plan gate asserts
    // the salt is in the exchange keys. l_quantity is integral-valued —
    // BIGINT cast makes the sum exact on both engines.
    QueryDef("op_salted_join", Some(
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)) { (s, d) =>
      val fact = Tables.load(s, d, "lineitem")
        .select(col("l_orderkey").as("k"), col("l_quantity"))
      val dim = Tables.load(s, d, "orders")
        .select(col("o_orderkey").as("k"), col("o_orderstatus")).hint("merge")
      graft.operators.SkewJoin.saltedJoin(fact, dim, "k", 8)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(LongType)).as("qty"))
        .orderBy(col("o_orderstatus"))
    },

    // CDC COMPACTION / latest-state upsert: collapse an event log to one
    // current row per key (the materialize-the-snapshot step every
    // incremental pipeline runs before serving). Spark-first: `max_by`
    // keyed on (ts, event_id) — an ALGEBRAIC aggregate, so the compaction
    // is partial+final: each mapper combines its rows down to ONE row per
    // key before the exchange, so the shuffle carries keys, not the log.
    // The row_number()-over-ORDER-BY formulation the oracle uses ships
    // EVERY event through the exchange and sorts whole partitions just to
    // discard all but rank 1. (Struct-payload max_by buffers aren't
    // hash-aggregable, so Spark picks SortAggregate — the sort is
    // mapper-local over rows it already holds; the map-side combine is
    // what survives 100 TB.) Timestamps exported as epoch micros (fixture
    // is µs-aligned; asserted tie-free per user).
    QueryDef("op_cdc_upsert", Some(
      """SELECT user_id, event_id AS last_event_id, event_type AS last_type,
        |  value AS last_value, epoch_us(ts) AS last_ts_us
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin)) { (s, d) =>
      ev(s, d)
        .groupBy(col("user_id"))
        .agg(max_by(
          struct(col("event_id"), col("event_type"), col("value"), col("ts")),
          struct(col("ts"), col("event_id"))).as("last"))
        .select(col("user_id"),
          col("last.event_id").as("last_event_id"),
          col("last.event_type").as("last_type"),
          col("last.value").as("last_value"),
          unix_micros(col("last.ts")).as("last_ts_us"))
        .orderBy(col("user_id"))
    },

    // FUNNEL: per-user staged conversion (first view → first click AFTER
    // that view → first purchase AFTER that click), the event-analytics
    // op behind every "where do users drop off" question. Each stage is
    // one conditional min aggregate joined back on the key — three
    // groupBys and two joins ALL partitioned on user_id, so after the
    // first exchange the rest are co-partitioned (no second corpus
    // shuffle shape; the stage frames are one row per user). A
    // sort-within-user formulation would work in one pass but pays a
    // per-key full sort; conditional mins are algebraic and map-side
    // combined. LEFT joins keep users who stall mid-funnel (null later
    // stages) — the drop-off signal itself.
    QueryDef("op_funnel", Some(OperatorQueries.funnelSql)) { (s, d) =>
      val e = ev(s, d).select(col("user_id"), col("event_type"), col("ts"))
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("tv"))
      val c = e.filter(col("event_type") === "click")
        .join(v, Seq("user_id"))
        .filter(col("ts") > col("tv"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("tc"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id"))
        .filter(col("ts") > col("tc"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("tp"))
      v.join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select(col("user_id"), unix_micros(col("tv")).as("view_us"),
          unix_micros(col("tc")).as("click_us"), unix_micros(col("tp")).as("purchase_us"))
        .orderBy(col("user_id"))
    },

    // EVENT-TRANSITION MATRIX: (event_type → next event_type) counts per
    // user timeline — the Markov-chain dataset prep for sequence modeling
    // (and the sanity check behind "what actually follows a signup").
    // One key-partitioned sort for the lead() window (same exchange shape
    // as sessionize), then the pair counts collapse to |types|² keys —
    // the second aggregate exchange carries ~25 rows per task regardless
    // of corpus size. Tie-free order (asserted on the fixture) makes
    // lead() deterministic; event_id breaks any future tie.
    QueryDef("op_transitions", Some(OperatorQueries.transitionsSql)) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev(s, d)
        .select(col("event_type").as("src"),
          lead(col("event_type"), 1).over(w).as("dst"))
        .filter(col("dst").isNotNull)
        .groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("src"), col("dst"))
    },

    // SCD2 / HISTORY BUILD: collapse each user's event stream into
    // validity intervals — consecutive same-type runs become one
    // [valid_from, valid_to) row, the last run open-ended (NULL). The
    // gaps-and-islands pattern: the difference of two row_numbers (one
    // over the timeline, one over the per-type timeline) is constant
    // exactly within a consecutive run. Scale shape: every window and
    // the run aggregate are partitioned on user_id — ONE exchange shape;
    // the second window (lead for the interval end) runs over the RUNS
    // frame, one row per run, not per event. Deterministic: per-user ts
    // are tie-free (asserted), event_id breaks any future tie.
    QueryDef("op_scd2", Some(OperatorQueries.scd2Sql)) { (s, d) =>
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val byUserType = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val runs = ev(s, d)
        .select(col("user_id"), col("event_type"), col("ts"),
          (row_number().over(byUser) - row_number().over(byUserType)).as("grp"))
        .groupBy(col("user_id"), col("event_type"), col("grp"))
        .agg(min(col("ts")).as("vf"), count(lit(1)).as("n_events"))
      val byStart = Window.partitionBy(col("user_id")).orderBy(col("vf"))
      runs
        .select(col("user_id"), col("event_type"),
          unix_micros(col("vf")).as("valid_from_us"),
          unix_micros(lead(col("vf"), 1).over(byStart)).as("valid_to_us"),
          col("n_events"))
        .orderBy(col("user_id"), col("valid_from_us"))
    },

    // ROLLING RANGE WINDOW: per-event trailing-1-hour activity (count +
    // exact decimal sum) — the time-range window frame the analytic
    // suite lacked (wf_analytic is row-framed). Ordering column is epoch
    // SECONDS as a BIGINT so Spark's rangeBetween and the oracle's RANGE
    // BETWEEN share one integer frame definition; the frame is a value
    // range, so same-second rows land in the same frame regardless of
    // intra-second order — no tie nondeterminism. One exchange (hash by
    // user) + one in-partition sort; the sum is decimal-exact on both
    // engines, cast to double only at output.
    QueryDef("wf_rolling_range", Some(
      """SELECT event_id, n_1h, CAST(s_1h AS DOUBLE) AS sum_1h FROM (
        |  SELECT event_id,
        |    count(*) OVER w AS n_1h,
        |    sum(CAST(value AS DECIMAL(18,2))) OVER w AS s_1h
        |  FROM (SELECT event_id, user_id, value, epoch_us(ts) // 1000000 AS sec FROM events)
        |  WINDOW w AS (PARTITION BY user_id ORDER BY sec
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW))
        |ORDER BY event_id""".stripMargin)) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
        .rangeBetween(-3600, 0)
      ev(s, d)
        .select(col("event_id"), col("user_id"), col("value"),
          (unix_micros(col("ts")) / 1000000L).cast(LongType).as("sec"))
        .select(col("event_id"),
          count(lit(1)).over(w).as("n_1h"),
          sum(col("value").cast(DecimalType(18, 2))).over(w).cast(DoubleType).as("sum_1h"))
        .orderBy(col("event_id"))
    },

    // Cohort retention — the product-analytics staple over an event log:
    // users cohorted by first-seen day, retention = distinct users with
    // ANY activity exactly d days later (d in 0/1/3/7), next to the
    // cohort's size. Scale shape: the cohort assignment is an algebraic
    // MIN per user (map-side combined), the activity join rides the same
    // user_id key (co-partitioned with the cohort frame), the per-user
    // (cohort, delta) pairs dedupe in one hash exchange, and the final
    // matrix is |days| x |deltas| keys with the tiny per-cohort sizes
    // frame joined back broadcast. No windows, no per-user sort — every
    // reduction is algebraic, so a hot user (10% of the log) folds
    // map-side exactly like op_cdc_upsert.
    QueryDef("op_retention", Some(OperatorQueries.retentionSql)) { (s, d) =>
      val e = Tables.load(s, d, "events").select(col("user_id"), to_date(col("ts")).as("day"))
      val f = e.groupBy(col("user_id")).agg(min(col("day")).as("c"))
      val coh = f.groupBy(col("c")).agg(count(lit(1)).as("n_cohort"))
      e.join(f, Seq("user_id"))
        .select(col("user_id"), col("c"), datediff(col("day"), col("c")).cast(LongType).as("d"))
        .distinct()
        .filter(col("d").isin(0L, 1L, 3L, 7L))
        .groupBy(col("c"), col("d"))
        .agg(count(lit(1)).as("n_retained"))
        .join(broadcast(coh), Seq("c"))
        .select(date_format(col("c"), "yyyy-MM-dd").as("cohort_day"),
          col("d"), col("n_retained"), col("n_cohort"))
        .orderBy(col("cohort_day"), col("d"))
    },

    // Per-key forward fill (gap filling) — the imputation pass for
    // sparse per-entity readings: carry each user's last known value
    // forward across events where the reading is missing ('scroll'
    // events stand in for the missing-measurement rows). One user-keyed
    // ordered window (`last(..., ignoreNulls)` over an unbounded-
    // preceding frame) — the op_scd2 shape: a single hash exchange on
    // user_id, the per-user timeline sorted once within its task. No
    // float arithmetic (values are copied, not computed), so the double
    // column hash-compares exactly.
    QueryDef("op_gap_fill", Some(OperatorQueries.gapFillSql)) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, d, "events")
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("event_type") =!= "scroll", col("value")).as("v"))
        .withColumn("filled", last(col("v"), ignoreNulls = true).over(w))
        .select(col("event_id"), col("user_id"), col("v"), col("filled"))
        .orderBy(col("event_id"))
    },

    // Bucketed-layout co-located join — the storage-side lever for
    // REPEATED fact-fact joins at 100 TB: write both sides bucketed (and
    // in-bucket sorted) on the join key once, and every subsequent join
    // on that key satisfies its distribution requirement from the LAYOUT
    // — zero hash exchange for the join, and (because HashPartitioning
    // on a key subset satisfies the agg's clustering too) zero exchange
    // for the downstream per-order aggregate either; the only exchange
    // left in the whole plan is the output ORDER BY's range partition.
    // A daily pipeline joining the same two 10 TB tables pays the
    // bucketed write once and saves the double shuffle every run
    // thereafter. The bucketed copies are created once per (session,
    // fixture dir) — the warm/timed bench protocol measures the join,
    // not the one-time layout write. Plan-gated in PlanSpec (merge-hint
    // forces the SMJ path so a broadcast cannot hide the property).
    QueryDef("op_bucketed_join", Some(
      """SELECT o.o_orderkey, o.o_orderstatus, count(*) AS n_items,
        |  CAST(sum(l.l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_totalprice > 300000
        |GROUP BY o.o_orderkey, o.o_orderstatus
        |ORDER BY o.o_orderkey""".stripMargin)) { (s, d) =>
      val tag = java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(d).toLong & 0xffffffffL)
      val nb = s.conf.get("spark.graft.bucketedJoin.buckets", "8").toInt
      def ensure(short: String, src: String, key: String): String = {
        val tbl = s"graft_bkt_${short}_${tag}_$nb"
        if (!s.catalog.tableExists(tbl)) {
          Tables.load(s, d, src)
            .write.mode("overwrite")
            .option("path", s"/tmp/graft_bucketed/$tbl")
            .bucketBy(nb, key).sortBy(key)
            .saveAsTable(tbl)
        }
        tbl
      }
      val li = s.table(ensure("li", "lineitem", "l_orderkey"))
        .select(col("l_orderkey"), col("l_quantity"))
      val ord = s.table(ensure("ord", "orders", "o_orderkey"))
        .filter(col("o_totalprice") > 300000)
        .select(col("o_orderkey"), col("o_orderstatus"))
      li.hint("merge").join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity")).cast(LongType).as("sum_qty"))
        .orderBy(col("o_orderkey"))
    },

    // Table profiling — the ANALYZE/data-quality pass a pipeline runs
    // before trusting a new drop: row count, per-column NDV, null
    // counts, and value ranges in ONE scan. NDV here is exact
    // count-distinct (Spark expands multi-distinct into one Expand +
    // two-phase aggregate — still a single source scan); the
    // sketch-based scale variant is the same query with
    // theta_sketch_agg columns (b6_theta_distinct's machinery) when
    // corpus-exact NDV stops being worth the expand. Every output is
    // integer (l_quantity is integer-valued; the CAST makes the
    // double→long exact), so the profile hash-matches DuckDB.
    QueryDef("op_profile", Some(profileSql)) { (s, d) =>
      Tables.load(s, d, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("ndv_orderkey"),
        countDistinct(col("l_partkey")).as("ndv_partkey"),
        countDistinct(col("l_returnflag")).as("ndv_returnflag"),
        (count(lit(1)) - count(col("l_shipdate"))).as("nulls_shipdate"),
        min(col("l_quantity")).cast(LongType).as("min_qty"),
        max(col("l_quantity")).cast(LongType).as("max_qty"),
        sum(col("l_quantity")).cast(LongType).as("sum_qty"))
    },

    // The SKETCH profile — op_profile's corpus-scale variant made real:
    // NDV via Theta sketches instead of exact count-distinct, so the
    // whole profile is ONE partial+final aggregate with no Expand and
    // no distinct exchange — mergeable O(sketch) state per column, the
    // shape that profiles 100 TB in a single pass (and whose per-day
    // partials roll up without rescanning, b6_theta_merge-style).
    // lgNominalEntries=20 keeps the sketch in its exact regime for the
    // fixture cardinalities (Theta retains every hash until ~1M
    // distinct), so the DuckDB count-distinct oracle matches exactly;
    // at true corpus scale the same plan returns estimates.
    QueryDef("op_profile_sketch", Some(
      """SELECT count(*) AS n_rows,
        |  count(DISTINCT l_orderkey) AS ndv_orderkey,
        |  count(DISTINCT l_partkey) AS ndv_partkey,
        |  CAST(min(l_quantity) AS BIGINT) AS min_qty,
        |  CAST(max(l_quantity) AS BIGINT) AS max_qty
        |FROM lineitem""".stripMargin)) { (s, d) =>
      Tables.load(s, d, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        expr("theta_sketch_estimate(theta_sketch_agg(l_orderkey, 20))").as("ndv_orderkey"),
        expr("theta_sketch_estimate(theta_sketch_agg(l_partkey, 20))").as("ndv_partkey"),
        min(col("l_quantity")).cast(LongType).as("min_qty"),
        max(col("l_quantity")).cast(LongType).as("max_qty"))
    },

    // Data-quality rule pass — the expectations check a pipeline runs on
    // every new drop before it reaches training: N declarative rules
    // evaluated in ONE scan (conditional counts combine map-side; adding
    // a rule adds a column, never a pass), reported as violations +
    // parts-per-million per rule. Rules here are a representative mix of
    // range, threshold, and domain checks — including one that PASSES
    // (flag_domain, 0 violations), because a DQ report that can only
    // show failures is a DQ report nobody trusts. The ppm is integer
    // division, so the whole report hash-compares exactly.
    QueryDef("op_dq_rules", Some(
      """WITH s AS (SELECT count(*) AS n_rows,
        |    count(*) FILTER (WHERE l_quantity > 45) AS v_qty,
        |    count(*) FILTER (WHERE l_extendedprice > 80000) AS v_price,
        |    count(*) FILTER (WHERE l_discount > 0.08) AS v_disc,
        |    count(*) FILTER (WHERE l_returnflag NOT IN ('A', 'N', 'R')) AS v_flag
        |  FROM lineitem)
        |SELECT rule, n_violations, n_rows,
        |  (1000000 * n_violations) // n_rows AS ppm
        |FROM (
        |  SELECT 'qty_le_45' AS rule, v_qty AS n_violations, n_rows FROM s
        |  UNION ALL SELECT 'price_le_80k', v_price, n_rows FROM s
        |  UNION ALL SELECT 'discount_le_008', v_disc, n_rows FROM s
        |  UNION ALL SELECT 'flag_domain', v_flag, n_rows FROM s)
        |ORDER BY rule""".stripMargin)) { (s, d) =>
      val rules = DqRules.all
      val wide = Tables.load(s, d, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        rules.map { case (n, p) => count(when(p, 1)).as(s"v_$n") }: _*)
      wide
        .select(explode(array(rules.map { case (n, _) =>
          struct(lit(n).as("rule"), col(s"v_$n").as("n_violations"),
            col("n_rows").as("n_rows"))
        }: _*)).as("r"))
        .select(col("r.rule").as("rule"), col("r.n_violations").as("n_violations"),
          col("r.n_rows").as("n_rows"),
          expr("(1000000 * r.n_violations) div r.n_rows").as("ppm"))
        .orderBy(col("rule"))
    },

    // Right-to-be-forgotten cascade (GDPR/CCPA deletion): given a
    // tombstone set of customers (every 97th key stands in for the
    // deletion-request table), purge them AND every dependent row —
    // their orders, and those orders' lineitems — reporting per-table
    // before/after/purged counts, the audit artifact a compliance run
    // must produce. Scale shape: the tombstone set is small by nature
    // (requests, not corpus), so both cascade levels are BROADCAST
    // semi/anti joins — the fact tables stream through unshuffled and
    // the doomed-orders key set (tombstone-bounded) broadcasts into the
    // lineitem pass; counts are map-side-combining aggregates. At 100 TB
    // the same plan rewrites files in place (purged = anti-join output);
    // if the request set ever outgrows broadcast, AQE's runtime bloom
    // filter (see GraftSession) prefilters the scan before a shuffled
    // anti join. All-integer output → exact hash compare.
    QueryDef("op_forget_users", Some(
      """WITH t AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
        |do_ AS (SELECT o_orderkey FROM orders
        |        WHERE o_custkey IN (SELECT c_custkey FROM t)),
        |c AS (SELECT count(*) AS nb,
        |        count(*) FILTER (WHERE c_custkey % 97 = 0) AS np FROM customer),
        |o AS (SELECT count(*) AS nb,
        |        count(*) FILTER (WHERE o_custkey IN (SELECT c_custkey FROM t)) AS np
        |      FROM orders),
        |l AS (SELECT count(*) AS nb,
        |        count(*) FILTER (WHERE l_orderkey IN (SELECT o_orderkey FROM do_)) AS np
        |      FROM lineitem)
        |SELECT tbl, rows_before, rows_before - rows_purged AS rows_after, rows_purged
        |FROM (
        |  SELECT 'customer' AS tbl, nb AS rows_before, np AS rows_purged FROM c
        |  UNION ALL SELECT 'orders', nb, np FROM o
        |  UNION ALL SELECT 'lineitem', nb, np FROM l)
        |ORDER BY tbl""".stripMargin)) { (s, d) =>
      val cust = Tables.load(s, d, "customer")
      val orders = Tables.load(s, d, "orders")
      val li = Tables.load(s, d, "lineitem")
      val tomb = cust.filter(col("c_custkey") % 97 === 0).select(col("c_custkey"))
      val doomedOrders = orders
        .join(broadcast(tomb), col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_orderkey"))
      def report(name: String, df: DataFrame, purged: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("rows_before"))
          .crossJoin(broadcast(purged.agg(count(lit(1)).as("rows_purged"))))
          .select(lit(name).as("tbl"), col("rows_before"),
            (col("rows_before") - col("rows_purged")).as("rows_after"),
            col("rows_purged"))
      val oPurged = orders.join(broadcast(tomb),
        col("o_custkey") === col("c_custkey"), "left_semi")
      val lPurged = li.join(broadcast(doomedOrders),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      report("customer", cust, tomb)
        .union(report("orders", orders, oPurged))
        .union(report("lineitem", li, lPurged))
        .orderBy(col("tbl"))
    },

    // Z-order (Morton) layout key — the multi-dimensional clustering
    // step behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleaving the
    // bits of two dimensions gives ONE sort key that keeps both dims
    // locally clustered, so file/row-group min-max stats prune 2-D box
    // predicates that a single-column sort can only prune on its lead
    // column. This query is the key computation (pure codegen bit
    // arithmetic, zero shuffles — the ORDER BY is oracle determinism
    // only); ZOrderSpec writes the actual layout and measures the
    // per-file bounding-area win vs a single-column sort. Dim squash:
    // custkey wraps mod 2^16 (equality/short-range locality survives the
    // wrap at fixture scale), totalprice bin-scales by 16 which keeps
    // the full fixture range inside 16 bits order-preservingly.
    QueryDef("op_zorder_layout", Some(
      s"""WITH g AS (SELECT o_orderkey, o_custkey % 65536 AS x,
         |    least(65535, CAST(floor(o_totalprice / 16) AS BIGINT)) AS y
         |  FROM orders)
         |SELECT o_orderkey, x, y, ${ZOrder.oracleSql("x", "y")} AS zval
         |FROM g ORDER BY o_orderkey""".stripMargin)) { (s, d) =>
      Tables.load(s, d, "orders")
        .select(col("o_orderkey"),
          (col("o_custkey") % 65536).as("x"),
          least(lit(65535L), floor(col("o_totalprice") / 16).cast(LongType)).as("y"))
        .select(col("o_orderkey"), col("x"), col("y"),
          ZOrder.zval16(col("x"), col("y")).as("zval"))
        .orderBy(col("o_orderkey"))
    },

    // Interval-overlap join — the temporal alignment op behind ad
    // attribution, A/B exposure windows, and sensor fusion: pair every
    // even-id event's activity interval [ts, ts+value seconds] with every
    // odd-id interval it overlaps. The naive plan is an inequality-only
    // join (a_s <= b_e AND b_s <= a_e) which Spark can only execute as a
    // BroadcastNestedLoopJoin — O(|A|·|B|) and a cluster-killer at scale.
    // The scale-safe shape: explode each interval onto the fixed-width
    // time buckets it covers (width >= max interval length ⇒ at most 2
    // buckets per row, a bounded row-local explode), EQUI-join on the
    // bucket, then keep a pair only in its CANONICAL bucket — the one
    // containing the later start, which both intervals provably cover —
    // so no distinct/dedup pass is ever needed. One hash exchange per
    // side on the bucket key, overlap checked post-join; PlanSpec gates
    // the plan against nested-loop/cartesian fallback. All-integer epoch
    // seconds end to end → exact hash compare.
    QueryDef("j_interval_overlap", Some(
      """WITH g AS (SELECT event_id,
        |    CAST(epoch_ms(date_trunc('second', ts)) / 1000 AS BIGINT) AS s0,
        |    CAST(epoch_ms(date_trunc('second', ts)) / 1000 AS BIGINT)
        |      + CAST(floor(value) AS BIGINT) AS e0
        |  FROM events),
        |a AS (SELECT event_id AS a_id, s0 AS a_s, e0 AS a_e FROM g WHERE event_id % 2 = 0),
        |b AS (SELECT event_id AS b_id, s0 AS b_s, e0 AS b_e FROM g WHERE event_id % 2 = 1)
        |SELECT a_id, b_id, greatest(a_s, b_s) AS ov_start,
        |  least(a_e, b_e) - greatest(a_s, b_s) AS ov_len
        |FROM a JOIN b ON a_s <= b_e AND b_s <= a_e
        |ORDER BY a_id, b_id""".stripMargin)) { (s, d) =>
      val width = 600L // > max interval length (value <= ~328 s) ⇒ <= 2 buckets
      val g = ev(s, d).select(col("event_id"),
        unix_timestamp(col("ts")).as("s0"),
        (unix_timestamp(col("ts")) + floor(col("value")).cast(LongType)).as("e0"))
      val a = g.filter(col("event_id") % 2 === 0)
        .select(col("event_id").as("a_id"), col("s0").as("a_s"), col("e0").as("a_e"))
        .withColumn("bkt", explode(sequence(expr(s"a_s div $width"), expr(s"a_e div $width"))))
      val b = g.filter(col("event_id") % 2 === 1)
        .select(col("event_id").as("b_id"), col("s0").as("b_s"), col("e0").as("b_e"))
        .withColumn("bkt", explode(sequence(expr(s"b_s div $width"), expr(s"b_e div $width"))))
      a.join(b, Seq("bkt"))
        .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e") &&
          col("bkt") === expr(s"greatest(a_s, b_s) div $width"))
        .select(col("a_id"), col("b_id"),
          greatest(col("a_s"), col("b_s")).as("ov_start"),
          (least(col("a_e"), col("b_e")) - greatest(col("a_s"), col("b_s"))).as("ov_len"))
        .orderBy(col("a_id"), col("b_id"))
    },

    // Join-size PRE-FLIGHT — the planner-support op behind "should this
    // join broadcast, shuffle, or be refused": estimate |A ⋈ B| from
    // per-side sketch state WITHOUT running the join. Each side
    // contributes one pass (row count + Theta sketch of its key, lgk=17
    // — exact to 131k distinct, mergeable estimate beyond); the matched
    // key count comes from theta_intersection on the two sketches and
    // the size estimate is the textbook uniform-multiplicity formula
    // |K∩|·(rowsA/kA)·(rowsB/kB). At 100 TB these per-side sketches are
    // the persisted daily artifacts (b6_theta_merge), so the pre-flight
    // costs KBs of sketch algebra, not a scan — the B5 cardinality-cap
    // guard generalized to two-sided join planning. `actual_rows` (the
    // real join, run here so the oracle can grade the estimate against
    // truth at fixture scale) is the validation column, not part of the
    // production pre-flight. Exact at oracle scale; floor-discretized
    // single-division doubles keep the hash stable.
    QueryDef("op_join_estimate", Some(
      """WITH a AS (SELECT count(*) AS rows_a, count(DISTINCT o_orderkey) AS ka FROM orders),
        |b AS (SELECT count(*) AS rows_b, count(DISTINCT l_orderkey) AS kb FROM lineitem),
        |i AS (SELECT count(*) AS k_both FROM
        |  (SELECT DISTINCT o_orderkey FROM orders
        |   INTERSECT SELECT DISTINCT l_orderkey FROM lineitem)),
        |j AS (SELECT count(*) AS actual_rows FROM orders
        |      JOIN lineitem ON o_orderkey = l_orderkey)
        |SELECT rows_a, ka, rows_b, kb, k_both,
        |  CAST(floor(k_both * (CAST(rows_a AS DOUBLE) / ka)
        |                     * (CAST(rows_b AS DOUBLE) / kb)) AS BIGINT) AS est_rows,
        |  actual_rows
        |FROM a, b, i, j""".stripMargin)) { (s, d) =>
      val orders = Tables.load(s, d, "orders")
      val li = Tables.load(s, d, "lineitem")
      val a = orders.agg(count(lit(1)).as("rows_a"),
        expr("theta_sketch_agg(o_orderkey, 17)").as("ta"))
      val b = li.agg(count(lit(1)).as("rows_b"),
        expr("theta_sketch_agg(l_orderkey, 17)").as("tb"))
      val actual = orders.select(col("o_orderkey"))
        .join(li.select(col("l_orderkey")), col("o_orderkey") === col("l_orderkey"))
        .agg(count(lit(1)).as("actual_rows"))
      a.crossJoin(broadcast(b)).crossJoin(broadcast(actual))
        .select(col("rows_a"),
          expr("theta_sketch_estimate(ta)").as("ka"),
          col("rows_b"),
          expr("theta_sketch_estimate(tb)").as("kb"),
          expr("theta_sketch_estimate(theta_intersection(ta, tb))").as("k_both"),
          col("actual_rows"))
        .select(col("rows_a"), col("ka"), col("rows_b"), col("kb"), col("k_both"),
          floor(col("k_both") * (col("rows_a").cast(DoubleType) / col("ka"))
            * (col("rows_b").cast(DoubleType) / col("kb"))).cast(LongType).as("est_rows"),
          col("actual_rows"))
    },

    // Pearson correlation matrix — the feature-selection pre-flight
    // (drop one of every collinear pair before training). Float
    // summation is order-dependent, so NO double ever enters an
    // aggregate: each measure is scaled to an exact integer (quantity is
    // integer-valued; price/discount are 2-decimal → cents via
    // floor(v*100+0.5), exact because v*100 sits within ulps of the
    // integer), all 9 moment sums accumulate as DECIMAL(38,0) (sums of
    // squared cents overflow a long at sf0.1 — decimal is exact and
    // order-free; DuckDB's BIGINT sums promote to HUGEINT, same
    // property), and the corr formula is a FIXED tree of double ops over
    // those exact sums — identical in both engines, floor-discretized to
    // micros. One partial+final aggregate, one scan, |pairs| output rows.
    QueryDef("op_corr", Some(corrSql)) { (s, d) =>
      val dec = DecimalType(38, 0)
      val x = col("l_quantity").cast(LongType).cast(dec)
      val y = floor(col("l_extendedprice") * 100 + 0.5).cast(LongType).cast(dec)
      val z = floor(col("l_discount") * 100 + 0.5).cast(LongType).cast(dec)
      val sums = Tables.load(s, d, "lineitem").agg(
        count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"), sum(z).as("sz"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(z * z).as("szz"),
        sum(x * y).as("sxy"), sum(x * z).as("sxz"), sum(y * z).as("syz"))
      corrReport(sums)
    },

    // DQ QUARANTINE — the actionable half of op_dq_rules: materialize the
    // failing rows themselves, each tagged with the comma-joined sorted
    // list of rules it violates, so the pipeline can route them to a
    // quarantine table instead of silently training on them. Same rule
    // set as the report (one definition would drift-proof them further,
    // but the report aggregates and this filters — the oracle pins both
    // to identical predicates). One codegen scan + pushdown-friendly
    // disjunction filter; output is violation-sized, not corpus-sized.
    QueryDef("op_dq_quarantine", Some(
      """SELECT l_orderkey, l_linenumber,
        |  array_to_string(list_sort(
        |    [r FOR r IN [
        |      CASE WHEN l_quantity > 45 THEN 'qty_le_45' END,
        |      CASE WHEN l_extendedprice > 80000 THEN 'price_le_80k' END,
        |      CASE WHEN l_discount > 0.08 THEN 'discount_le_008' END,
        |      CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 'flag_domain' END]
        |     IF r IS NOT NULL]), ',') AS violated
        |FROM lineitem
        |WHERE l_quantity > 45 OR l_extendedprice > 80000 OR l_discount > 0.08
        |   OR l_returnflag NOT IN ('A','N','R')
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)) { (s, d) =>
      val rules = DqRules.all
      val tags = array(rules.map { case (n, p) => when(p, lit(n)) }: _*)
      Tables.load(s, d, "lineitem")
        .filter(rules.map(_._2).reduce(_ || _))
        .select(col("l_orderkey"), col("l_linenumber"),
          concat_ws(",", array_sort(filter(tags, x => x.isNotNull))).as("violated"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // Partition DIFF — the incremental-recompute planner: fingerprint
    // every day partition of two snapshots with an ORDER-FREE sum of
    // per-row hashes, and reprocess only the days whose fingerprints
    // moved. At 100 TB this is what turns "daily full rebuild" into
    // "touch the 3 changed days": each side is one map-side-combining
    // aggregate over (day, row-hash) — commutative integer sums make the
    // fingerprint independent of row order, partitioning, and merge
    // order. Snapshot B is simulated as A with ~1% of rows modified
    // (every 97th event's value bumped), standing in for the late-data /
    // correction feed; the hash is the md5-prefix integer (cross-engine
    // exact, the fn_feature_hash trick widened to 8 hex digits), so both
    // engines fingerprint identically. All-integer output.
    QueryDef("op_diff_partitions", Some(
      """WITH rh AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
        |    ((strpos('0123456789abcdef', substr(h,1,1))-1)*268435456
        |    +(strpos('0123456789abcdef', substr(h,2,1))-1)*16777216
        |    +(strpos('0123456789abcdef', substr(h,3,1))-1)*1048576
        |    +(strpos('0123456789abcdef', substr(h,4,1))-1)*65536
        |    +(strpos('0123456789abcdef', substr(h,5,1))-1)*4096
        |    +(strpos('0123456789abcdef', substr(h,6,1))-1)*256
        |    +(strpos('0123456789abcdef', substr(h,7,1))-1)*16
        |    +(strpos('0123456789abcdef', substr(h,8,1))-1)) AS rh,
        |    ((strpos('0123456789abcdef', substr(h2,1,1))-1)*268435456
        |    +(strpos('0123456789abcdef', substr(h2,2,1))-1)*16777216
        |    +(strpos('0123456789abcdef', substr(h2,3,1))-1)*1048576
        |    +(strpos('0123456789abcdef', substr(h2,4,1))-1)*65536
        |    +(strpos('0123456789abcdef', substr(h2,5,1))-1)*4096
        |    +(strpos('0123456789abcdef', substr(h2,6,1))-1)*256
        |    +(strpos('0123456789abcdef', substr(h2,7,1))-1)*16
        |    +(strpos('0123456789abcdef', substr(h2,8,1))-1)) AS rh2
        |  FROM (SELECT ts,
        |      md5(concat(CAST(event_id AS VARCHAR), '|', CAST(floor(value * 100 + 0.5) AS BIGINT))) AS h,
        |      md5(concat(CAST(event_id AS VARCHAR), '|',
        |        CAST(floor(value * 100 + 0.5) AS BIGINT)
        |          + CASE WHEN event_id % 97 = 0 THEN 100 ELSE 0 END)) AS h2
        |    FROM events))
        |SELECT day, CAST(sum(rh) AS BIGINT) AS fp_a, CAST(sum(rh2) AS BIGINT) AS fp_b,
        |  CASE WHEN sum(rh) = sum(rh2) THEN 0 ELSE 1 END AS changed
        |FROM rh GROUP BY day ORDER BY day""".stripMargin)) { (s, d) =>
      def hexInt(h: org.apache.spark.sql.Column) =
        conv(substring(h, 1, 8), 16, 10).cast(LongType)
      val cents = floor(col("value") * 100 + 0.5).cast(LongType)
      val e = ev(s, d).select(
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        hexInt(md5(concat(col("event_id").cast("string"), lit("|"),
          cents.cast("string")))).as("rh"),
        hexInt(md5(concat(col("event_id").cast("string"), lit("|"),
          (cents + when(col("event_id") % 97 === 0, 100L).otherwise(0L)).cast("string")))).as("rh2"))
      e.groupBy(col("day"))
        .agg(sum(col("rh")).as("fp_a"), sum(col("rh2")).as("fp_b"))
        .select(col("day"), col("fp_a"), col("fp_b"),
          when(col("fp_a") === col("fp_b"), 0).otherwise(1).as("changed"))
        .orderBy(col("day"))
    },

    // GLOBAL TOTAL-ORDER RANK — the curriculum-ordering primitive: assign
    // every document its exact position under a corpus-wide order
    // (shortest-first here — the standard length-curriculum for training;
    // swap the key for any quality score). The naive plans both fail at
    // scale: `row_number() OVER (ORDER BY ...)` is ONE reducer sorting the
    // corpus, and RDD zipWithIndex leaves the declarative plan entirely.
    // This is the canonical two-pass distributed ranking instead — the
    // same physical shape as Spark's own global orderBy (range partition,
    // sort within range), with the rank recovered declaratively:
    //   1. per-RANGE-BUCKET counts, the buckets cut at KLL quantiles of
    //      the sort key (deterministic, data-derived, balanced — the
    //      fn_quantile_bin machinery with nb = parallelism, a conf that
    //      scales with the cluster: spark.graft.rank.buckets, default 32);
    //   2. bucket counts collect to the driver (nb rows — a bounded
    //      artifact), cumulative offsets fold back as a map literal;
    //   3. within-bucket row_number + offset = the exact global rank.
    // The within-bucket window sorts 1/nb of the corpus per task — not
    // the low-cardinality-window anti-pattern but the SAME per-partition
    // sort a global orderBy runs; ties across a cut boundary stay in one
    // bucket (bucket = |cuts < key|), so no rank depends on boundary
    // placement, and the output is a pure function of the data.
    QueryDef("op_global_rank", Some(
      """SELECT doc_id, n_chars,
        |  row_number() OVER (ORDER BY n_chars, doc_id) AS rank
        |FROM documents ORDER BY doc_id""".stripMargin)) { (s, d) =>
      val nb = s.conf.get("spark.graft.rank.buckets", "32").toInt
      val docs = Tables.load(s, d, "documents").select(col("doc_id"), col("n_chars"))
      val cuts: Seq[Double] =
        if (nb < 2) Seq.empty
        else {
          val qs = (1 until nb).map(i => s"${i.toDouble / nb}D").mkString(", ")
          val row = docs.agg(expr("kll_sketch_get_quantile_double(" +
            s"kll_sketch_agg_double(CAST(n_chars AS DOUBLE), 65535), array($qs))").as("qs"))
            .head
          if (row.isNullAt(0)) Seq.empty else row.getSeq[Double](0)
        }
      // nb < 2 (or an empty corpus: null quantiles) degrades to the
      // one-bucket plan — a single global sort partition, still correct
      val bucketed =
        if (cuts.isEmpty) docs.withColumn("b", lit(0))
        else docs.withColumn("b",
          size(filter(array(cuts.map(lit): _*), c => c < col("n_chars"))))
      val counts = bucketed.groupBy(col("b")).count()
        .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
      val offsets = (0 until nb).scanLeft(0L)((acc, i) => acc + counts.getOrElse(i, 0L))
      val offMap = map((0 until nb).flatMap(i => Seq(lit(i), lit(offsets(i)))): _*)
      val w = Window.partitionBy(col("b")).orderBy(col("n_chars"), col("doc_id"))
      bucketed
        .withColumn("rank", element_at(offMap, col("b")) + row_number().over(w))
        .select(col("doc_id"), col("n_chars"), col("rank").cast(LongType).as("rank"))
        .orderBy(col("doc_id"))
    },

    // MULTI-TOUCH ATTRIBUTION — the marketing-analytics shape a clickstream
    // warehouse runs daily: credit each purchase to the click/view touches
    // that preceded it within a 7-day lookback, linearly. All money moves
    // as integer cents so the result is a pure function of the data:
    // each touch gets cents div n, the LATEST touch (ts, then event_id,
    // both descending — a total order) absorbs the remainder, and
    // conversions with no touches land in an explicit '(none)' bucket, so
    // credit_cents sums EXACTLY to total purchase cents — the invariant
    // AttributionSpec pins. Scale: the conversion↔touch join co-partitions
    // both sides on user_id (one exchange each, range predicate as the
    // SMJ post-filter — per-user event counts bound the pair blowup), the
    // remainder window clusters on conv_id, and the final aggregate is
    // 3 rows. Hot users: the pair SET is quadratic in the hot share by
    // semantics (every conversion sees every lookback touch), so the plan
    // risk is one task EMITTING the hot user's whole pair set; with
    // spark.graft.attribution.saltBuckets = R > 1 the touch side is
    // salted by hash(touch_id) mod R and the (small) conversion side
    // replicated R ways, joining on (user_id, salt) — the hot user's
    // emit spreads over R tasks, pairs and credits bit-identical
    // (AttributionGraphSpec forces the path and proves it). Default off:
    // AQE skew-join splitting already sub-partitions a skewed SMJ side.
    QueryDef("op_attribution", Some(OperatorQueries.attributionSql)) { (s, d) =>
      val e = ev(s, d)
      val conv = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("conv_id"), col("user_id"),
          col("ts").as("cts"),
          round(col("value") * 100, 0).cast(LongType).as("cents"))
      val touch = e.filter(col("event_type").isin("click", "view"))
        .select(col("user_id").as("t_user"), col("event_id").as("touch_id"),
          col("event_type").as("touch_type"), col("ts").as("tts"))
      val saltB = s.conf.getOption("spark.graft.attribution.saltBuckets")
        .map(_.toInt).getOrElse(0)
      val timePred = col("tts") < col("cts") &&
        col("tts") >= col("cts") - expr("INTERVAL 7 DAYS")
      val tch = (if (saltB <= 1)
          conv.join(touch, col("user_id") === col("t_user") && timePred)
        else {
          val saltedTouch = touch.withColumn("tsalt",
            pmod(xxhash64(col("touch_id")), lit(saltB)).cast(IntegerType))
          val convR = conv.withColumn("csalt",
            explode(array((0 until saltB).map(lit): _*)))
          convR.join(saltedTouch,
            col("user_id") === col("t_user") &&
              col("csalt") === col("tsalt") && timePred)
        })
        .select(col("conv_id"), col("cents"), col("touch_id"),
          col("touch_type"), col("tts"))
      val byConv = Window.partitionBy(col("conv_id"))
      val ranked = tch
        .withColumn("rn", row_number().over(
          byConv.orderBy(col("tts").desc, col("touch_id").desc)))
        .withColumn("nt", count(lit(1)).over(byConv))
      val cred = ranked.select(col("touch_type"), col("conv_id"),
        (expr("cents div nt") + when(col("rn") === 1,
          col("cents") - expr("cents div nt") * col("nt"))
          .otherwise(lit(0L))).as("credit"))
      val attr = cred.groupBy(col("touch_type"))
        .agg(count(lit(1)).as("n_touches"),
          countDistinct(col("conv_id")).as("n_conversions"),
          sum(col("credit")).cast(LongType).as("credit_cents"))
      val none = conv
        .join(tch.select(col("conv_id")).distinct(), Seq("conv_id"), "left_anti")
        .agg(count(lit(1)).as("n_touches"), count(lit(1)).as("n_conversions"),
          sum(col("cents")).cast(LongType).as("credit_cents"))
        .select(lit("(none)").as("touch_type"), col("n_touches"),
          col("n_conversions"), col("credit_cents"))
        .filter(col("n_touches") > 0)
      attr.unionByName(none).orderBy(col("touch_type"))
    },

    // PAGERANK — iterative graph computation as repeated declarative
    // passes, the operator class (fixed-point iteration) nothing else in
    // the inventory exercises. Graph: the undirected trade network
    // (customer c<->supplier s for every order line), walked 6 damped
    // steps. Everything is INTEGER arithmetic in parts-per-million —
    // share = rank div outdeg, next = 150000 + (85 * Σshares) div 100 —
    // so the fixed-iteration result is bit-identical to the oracle's
    // unrolled recomputation: no float summation order, no convergence
    // epsilon. Scale plan per iteration: the O(nodes) rank table joins
    // edges BROADCAST (edges never shuffle), and the dst aggregate ships
    // only map-combined partial sums — O(nodes) per partition. Edges
    // materialize ONCE to scratch parquet (lineage cut; 6 linear scans,
    // not 6 recomputes of the orders⋈lineitem distinct); the out-degree
    // table is computed once and cached, not re-derived per iteration.
    // When the rank table outgrows a broadcast
    // (spark.graft.graph.broadcastMaxNodes, GraphIterate's conf), edges
    // are instead src-partitioned and cached once and each iteration
    // shuffle-hash-joins only the rank table over to them — bit-identical
    // by integer arithmetic (GraphPathSpec forces the path and proves it).
    QueryDef("op_pagerank", Some {
      val iters = 6
      val steps = (1 to iters).map { i =>
        s"""pr$i AS (
           |  SELECT e.dst AS id,
           |    150000 + (85 * CAST(sum(p.r // d.od) AS BIGINT)) // 100 AS r
           |  FROM pr${i - 1} p
           |  JOIN odeg d ON d.src = p.id
           |  JOIN edges e ON e.src = p.id
           |  GROUP BY e.dst)""".stripMargin
      }.mkString(",\n")
      s"""WITH pairs AS (
         |  SELECT DISTINCT 'c' || o_custkey AS c, 's' || l_suppkey AS sp
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         |edges AS (SELECT c AS src, sp AS dst FROM pairs
         |          UNION ALL SELECT sp AS src, c AS dst FROM pairs),
         |odeg AS (SELECT src, CAST(count(*) AS BIGINT) AS od
         |         FROM edges GROUP BY src),
         |pr0 AS (SELECT src AS id, CAST(1000000 AS BIGINT) AS r FROM odeg),
         |$steps
         |SELECT id, r AS rank_ppm FROM pr$iters
         |ORDER BY rank_ppm DESC, id LIMIT 20""".stripMargin
    }) { (s, d) =>
      import graft.operators.GraphIterate
      val iters = 6
      val pairs = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.load(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("l_orderkey") === col("o_orderkey"))
        // distinct on the two LONG keys, concat AFTER: the dedup exchange
        // carries 16 bytes/row instead of two strings, and the hash-agg
        // compares longs (the prefixed concat is injective, so
        // distinct-then-concat ≡ concat-then-distinct)
        .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
        .distinct()
        .select(concat(lit("c"), col("ck")).as("c"),
          concat(lit("s"), col("sk")).as("sp"))
      val g = GraphIterate.prepare(s,
        pairs.select(col("c").as("src"), col("sp").as("dst"))
          .unionByName(pairs.select(col("sp").as("src"), col("c").as("dst"))),
        "pagerank", d)
      val odeg = g.pin(
        g.edges.groupBy(col("src")).agg(count(lit(1)).as("od")))
      var rank = odeg.select(col("src").as("id"), lit(1000000L).as("r"))
      for (_ <- 1 to iters) {
        val shares = rank.join(odeg.withColumnRenamed("src", "id"), "id")
          .select(col("id"), expr("r div od").as("share"))
        rank = g.joinTable(shares, "src", "id")
          .groupBy(col("dst")).agg(sum(col("share")).as("inc"))
          .select(col("dst").as("id"),
            (lit(150000L) + expr("(85 * inc) div 100")).as("r"))
      }
      g.finish(rank.select(col("id"), col("r").as("rank_ppm"))
        .orderBy(col("rank_ppm").desc, col("id")).limit(20))
    },

    // CO-OCCURRENCE TOP-K — item-item collaborative filtering, the
    // "customers who bought X also bought Y" mining pass: suppliers
    // ranked by how many customers they share. The classic scale shape:
    // one distinct pass to (customer, supplier), a per-customer
    // self-join (bounded by the per-customer item count — cap it at
    // ingest for power-law users; here the supplier dim bounds it), a
    // pair-count aggregate, and a BOUNDED-HEAP top-5 per supplier
    // (topk_min partial+final — each map task ships <= 5 neighbors per
    // supplier, never the full neighbor list; the b8_topk_grouped
    // machinery, not a window sort). Counts are integers, tiebreak is
    // (count desc, neighbor asc) — deterministic on both engines.
    QueryDef("op_cooccur_topk", Some(
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |co AS (
        |  SELECT a.s AS sa, b.s AS sb, CAST(count(*) AS BIGINT) AS n_common
        |  FROM pairs a JOIN pairs b ON a.c = b.c AND a.s < b.s
        |  GROUP BY a.s, b.s),
        |sym AS (SELECT sa AS s, sb AS nb, n_common FROM co
        |        UNION ALL SELECT sb AS s, sa AS nb, n_common FROM co),
        |r AS (SELECT s, nb, n_common,
        |        row_number() OVER (PARTITION BY s
        |                           ORDER BY n_common DESC, nb) AS rnk
        |      FROM sym)
        |SELECT s AS supp, rnk, nb AS neighbor, n_common
        |FROM r WHERE rnk <= 5 ORDER BY supp, rnk""".stripMargin)) { (s, d) =>
      import graft.functions.topk_min
      val pairs = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.load(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .distinct()
      val b = pairs.select(col("c").as("c2"), col("s").as("s2"))
      val co = pairs.join(b, col("c") === col("c2") && col("s") < col("s2"))
        .groupBy(col("s").as("sa"), col("s2").as("sb"))
        .agg(count(lit(1)).as("n_common"))
      val sym = co.select(col("sa").as("s"), col("sb").as("nb"), col("n_common"))
        .unionByName(co.select(col("sb").as("s"), col("sa").as("nb"), col("n_common")))
      sym.groupBy(col("s"))
        .agg(topk_min(struct((-col("n_common")).as("ncnt"),
          col("nb").as("nb"), col("n_common").as("n_common")), 5).as("tk"))
        .select(col("s"), posexplode(col("tk")).as(Seq("pos", "st")))
        .select(col("s").as("supp"), (col("pos") + 1).as("rnk"),
          col("st.nb").as("neighbor"), col("st.n_common").as("n_common"))
        .orderBy(col("supp"), col("rnk"))
    },

    // LEAD-LAG ANALYSIS: covariance of the click and purchase daily
    // series at lags -3..+3 — "do purchases follow clicks, and by how
    // many days?", the cross-series diagnostic behind attribution
    // lookback windows. Everything integer-exact: the covariance
    // NUMERATOR n·Σxy − Σx·Σy is exact over each lag's overlap window
    // (the Pearson denominator needs a sqrt, so the normalized value is
    // deliberately left to the consumer — the numerator's sign and
    // relative magnitude carry the lead-lag signal). Scale: the only
    // corpus pass is the daily conditional-count aggregate (map-side
    // combined); the lag join runs on the |days|-row dense frame with
    // the 7-row lag table broadcast — post-aggregate frames only.
    QueryDef("op_lag_cov", Some(
      """WITH b AS (SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi FROM events),
        |cal AS (SELECT CAST(unnest(generate_series(lo::TIMESTAMP, hi::TIMESTAMP,
        |                                           INTERVAL 1 DAY)) AS DATE) AS day, lo FROM b),
        |daily AS (SELECT CAST(ts AS DATE) AS day,
        |    count(*) FILTER (WHERE event_type = 'click') AS x,
        |    count(*) FILTER (WHERE event_type = 'purchase') AS y
        |  FROM events GROUP BY 1),
        |dense AS (SELECT CAST(c.day - c.lo AS INT) AS i,
        |    CAST(COALESCE(d.x, 0) AS BIGINT) AS x,
        |    CAST(COALESCE(d.y, 0) AS BIGINT) AS y
        |  FROM cal c LEFT JOIN daily d ON d.day = c.day),
        |lags AS (SELECT CAST(unnest(range(-3, 4)) AS INT) AS lag),
        |j AS (SELECT l.lag, a.x, bb.y
        |  FROM lags l CROSS JOIN dense a
        |  JOIN dense bb ON bb.i = a.i + l.lag),
        |agg AS (SELECT lag, count(*) AS n_days,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy
        |  FROM j GROUP BY lag)
        |SELECT lag, n_days, sxy, sx, sy,
        |  n_days * sxy - sx * sy AS cov_num
        |FROM agg ORDER BY lag""".stripMargin)) { (s, d) =>
      val events = ev(s, d)
      val daily = events.groupBy(to_date(col("ts")).as("day"))
        .agg(count(when(col("event_type") === "click", 1)).as("x"),
          count(when(col("event_type") === "purchase", 1)).as("y"))
      val cal = events
        .agg(min(to_date(col("ts"))).as("lo"), max(to_date(col("ts"))).as("hi"))
        .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"), col("lo"))
      val dense = cal.join(daily, Seq("day"), "left")
        .select(datediff(col("day"), col("lo")).as("i"),
          coalesce(col("x"), lit(0L)).as("x"),
          coalesce(col("y"), lit(0L)).as("y"))
      val lags = s.range(-3, 4).select(col("id").cast(IntegerType).as("lag"))
      dense.select(col("i").as("ia"), col("x"))
        .crossJoin(broadcast(lags))
        .join(dense.select(col("i").as("ib"), col("y")),
          col("ib") === col("ia") + col("lag"))
        .groupBy(col("lag"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"))
        .select(col("lag"), col("n_days"), col("sxy"), col("sx"), col("sy"),
          (col("n_days") * col("sxy") - col("sx") * col("sy")).as("cov_num"))
        .orderBy(col("lag"))
    },

    // COMMUNITY DETECTION: synchronous label propagation over the same
    // customer↔supplier trade network as op_pagerank — 3 unrolled rounds
    // where every node adopts its neighbors' MOST FREQUENT label, ties
    // to the lexicographically smallest. Fixed rounds + a total tie
    // order make sync LP fully deterministic, so the oracle recomputes
    // every round as an unrolled CTE and the assignment hash-matches —
    // no convergence epsilon, no run-to-run drift (the classic async-LP
    // failure mode). Completes the iterative-graph class: CC finds
    // components, PageRank ranks, LP finds dense subgroups. Scale plan
    // per round (op_pagerank's shape): edges materialize once to scratch
    // and NEVER shuffle — the O(nodes) label table broadcasts in, the
    // (dst, lbl) count combines map-side, and the per-node argmax is
    // min(struct(-c, lbl)) — an aggregate, not a window. When labels
    // outgrow a broadcast (spark.graft.graph.broadcastMaxNodes), edges
    // are src-partitioned and cached once and each round shuffle-hash-
    // joins only the label table to them (GraphIterate; GraphPathSpec
    // forces the path and proves bit-identity).
    QueryDef("op_label_prop", Some {
      val rounds = 3
      val steps = (1 to rounds).map { i =>
        s"""cnt$i AS (
           |  SELECT e.dst AS id, l.lbl, count(*) AS c
           |  FROM lab${i - 1} l JOIN edges e ON e.src = l.id
           |  GROUP BY 1, 2),
           |lab$i AS (
           |  SELECT id, lbl FROM (
           |    SELECT id, lbl,
           |      row_number() OVER (PARTITION BY id ORDER BY c DESC, lbl) AS rn
           |    FROM cnt$i) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH pairs AS (
         |  SELECT DISTINCT 'c' || o_custkey AS c, 's' || l_suppkey AS sp
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         |edges AS (SELECT c AS src, sp AS dst FROM pairs
         |          UNION ALL SELECT sp AS src, c AS dst FROM pairs),
         |lab0 AS (SELECT DISTINCT src AS id, src AS lbl FROM edges),
         |$steps
         |SELECT id, lbl AS community FROM lab$rounds
         |ORDER BY id""".stripMargin
    }) { (s, d) =>
      import graft.operators.GraphIterate
      val rounds = 3
      val pairs = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.load(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("l_orderkey") === col("o_orderkey"))
        // distinct on the two LONG keys, concat AFTER: the dedup exchange
        // carries 16 bytes/row instead of two strings, and the hash-agg
        // compares longs (the prefixed concat is injective, so
        // distinct-then-concat ≡ concat-then-distinct)
        .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
        .distinct()
        .select(concat(lit("c"), col("ck")).as("c"),
          concat(lit("s"), col("sk")).as("sp"))
      val g = GraphIterate.prepare(s,
        pairs.select(col("c").as("src"), col("sp").as("dst"))
          .unionByName(pairs.select(col("sp").as("src"), col("c").as("dst"))),
        "labelprop", d)
      var labels = g.edges.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("lbl"))
      for (_ <- 1 to rounds) {
        labels = g.joinTable(labels, "src", "id")
          .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("c"))
          .groupBy(col("dst"))
          .agg(min(struct((-col("c")).as("nc"), col("lbl").as("lbl"))).as("m"))
          .select(col("dst").as("id"), col("m.lbl").as("lbl"))
      }
      g.finish(
        labels.select(col("id"), col("lbl").as("community")).orderBy(col("id")))
    },

    // TIME TRAVEL / point-in-time census: rebuild the SCD2 state history
    // (op_scd2's gaps-and-islands intervals) and answer "how many users
    // were in each state AS OF t" for 8 evenly-spaced snapshot times —
    // the warehouse time-travel query pattern over a history table.
    // Spark-first trick: NO interval join at all. Snapshot times form an
    // arithmetic grid (lo + i·step), so each validity interval knows the
    // exact probe indices it covers by integer math — i from
    // ceil((vf-lo)/step) to floor((vt-lo-1)/step) — and a sequence()
    // explode emits one (probe, user, state) row per covered snapshot.
    // The oracle cross-joins probes × intervals with the containment
    // predicate; the two must agree exactly. Scale: the history build is
    // op_scd2's one-exchange shape, the explode fans out at most
    // |probes| rows per interval, the census aggregate is
    // |probes|×|types| keys map-side combined, and the global (lo, step)
    // frame is a broadcast 1-row cross join.
    QueryDef("op_time_travel", Some(
      """WITH r AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    - row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS grp
        |  FROM events),
        |i AS (
        |  SELECT user_id, event_type, min(ts) AS vf
        |  FROM r GROUP BY user_id, event_type, grp),
        |h AS (
        |  SELECT user_id, event_type, epoch_us(vf) AS vf_us,
        |    epoch_us(lead(vf) OVER (PARTITION BY user_id ORDER BY vf)) AS vt_us
        |  FROM i),
        |b AS (SELECT min(epoch_us(ts)) AS lo,
        |        (max(epoch_us(ts)) - min(epoch_us(ts))) // 8 AS step FROM events),
        |p AS (SELECT unnest(range(0, 8)) AS probe_i FROM b),
        |t AS (SELECT probe_i, lo + probe_i * step AS probe_us FROM p CROSS JOIN b)
        |SELECT t.probe_i, t.probe_us, h.event_type,
        |  count(*) AS n_users
        |FROM h JOIN t ON h.vf_us <= t.probe_us
        |  AND (h.vt_us IS NULL OR t.probe_us < h.vt_us)
        |GROUP BY t.probe_i, t.probe_us, h.event_type
        |ORDER BY probe_i, event_type""".stripMargin)) { (s, d) =>
      val events = ev(s, d)
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val byUserType = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val intervals = events
        .select(col("user_id"), col("event_type"), col("ts"),
          (row_number().over(byUser) - row_number().over(byUserType)).as("grp"))
        .groupBy(col("user_id"), col("event_type"), col("grp"))
        .agg(min(col("ts")).as("vf"))
        .select(col("user_id"), col("event_type"),
          unix_micros(col("vf")).as("vf_us"),
          unix_micros(lead(col("vf"), 1)
            .over(Window.partitionBy(col("user_id")).orderBy(col("vf")))).as("vt_us"))
      val bounds = events.agg(
          min(unix_micros(col("ts"))).as("lo"),
          max(unix_micros(col("ts"))).as("hi"))
        .select(col("lo"), expr("(hi - lo) div 8").as("step"))
      // covered probe indices by integer math: ceil-div for the first,
      // strict-upper floor-div for the last; clamp to the 0..7 grid
      intervals.crossJoin(broadcast(bounds))
        .withColumn("i_lo",
          greatest(expr("CAST((vf_us - lo + step - 1) div step AS INT)"), lit(0)))
        .withColumn("i_hi",
          least(coalesce(expr("CAST((vt_us - lo - 1) div step AS INT)"), lit(7)), lit(7)))
        .filter(col("i_lo") <= col("i_hi"))
        .select(col("event_type"), col("lo"), col("step"),
          explode(expr("sequence(i_lo, i_hi)")).as("probe_i"))
        .groupBy(col("probe_i"), (col("lo") + col("probe_i") * col("step")).as("probe_us"),
          col("event_type"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("probe_i"), col("event_type"))
    },

    // Multi-objective curation: the per-language Pareto frontier of
    // documents on (length, vocabulary richness) — "keep every doc no
    // other doc beats on BOTH axes", the skyline operator of the
    // curation literature. Exact integer axes (n_chars, distinct-token
    // count), so the whole frontier is oracle-checkable. A point
    // survives iff no point of the same lang has x' > x with y' >= y
    // (strictly-greater-x max via a RANGE .. 1 PRECEDING frame) nor
    // x' = x with y' > y (same-x max). Scale shape: the naive skyline is
    // one window per lang — |lang| = 5 partitions would serialize 100 TB
    // through 5 sorts. Instead phase 1 computes the skyline per
    // (lang, 32-way doc_id bucket) — domination is transitive, so a doc
    // dominated inside its bucket is dominated globally and the bucket
    // skyline is a SUPERSET of the global one — and phase 2 re-runs the
    // same window per lang over only the ~|skyline|·32 survivors. The
    // oracle computes the global frontier directly; the two plans must
    // agree exactly.
    QueryDef("op_skyline", Some(OperatorQueries.skylineSql)) { (s, d) =>
      def skyline(df: DataFrame, parts: org.apache.spark.sql.Column*): DataFrame = {
        val byX = Window.partitionBy(parts: _*).orderBy(col("n_chars").desc)
          .rangeBetween(Window.unboundedPreceding, -1)
        val eqX = Window.partitionBy(parts :+ col("n_chars"): _*)
        df.withColumn("m_gt", max(col("n_distinct")).over(byX))
          .withColumn("m_eq", max(col("n_distinct")).over(eqX))
          .filter((col("m_gt").isNull || col("n_distinct") > col("m_gt")) &&
            col("n_distinct") === col("m_eq"))
          .drop("m_gt", "m_eq")
      }
      val points = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          size(array_distinct(split(col("text"), " "))).cast(LongType).as("n_distinct"))
      val local = skyline(
        points.withColumn("bucket", pmod(crc32(col("doc_id").cast(StringType)), lit(32))),
        col("lang"), col("bucket"))
      skyline(local.drop("bucket"), col("lang"))
        .select(col("doc_id"), col("lang"), col("n_chars"), col("n_distinct"))
        .orderBy(col("lang"), col("doc_id"))
    },

    // Sequential-pattern mining: the top-25 3-event-type paths users take
    // WITHIN a session (op_sessionize's 2-day gap rule) — the journey
    // report behind funnel design, one level up from op_transitions'
    // pairwise Markov counts. Spark-first trick: instead of re-shuffling
    // on (user, session_id) for the triple window, everything runs in ONE
    // window partition (user_id, ordered ts/event_id) — the session
    // boundary is enforced by also leading the new-session flag: a triple
    // counts only if the 2nd and 3rd events are continuations (b1=0,
    // b2=0). One exchange + one in-partition sort total; the aggregate is
    // |types|³ keys at most, map-side combined; the top-25 is a
    // TakeOrderedAndProject bounded heap. Tie-free total order:
    // (n_paths DESC, e1, e2, e3).
    QueryDef("op_top_paths", Some(OperatorQueries.topPathsSql)) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev(s, d)
        .withColumn("new_s",
          // exact microsecond interval — matches the oracle's `ts - lag(ts)
          // <= INTERVAL 2 DAY` even if timestamps gain sub-second parts
          // (cast-to-seconds would floor each side independently)
          when(unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) <= 172800000000L, 0)
            .otherwise(1))
        .select(col("event_type").as("e1"),
          lead(col("event_type"), 1).over(w).as("e2"),
          lead(col("event_type"), 2).over(w).as("e3"),
          lead(col("new_s"), 1).over(w).as("b1"),
          lead(col("new_s"), 2).over(w).as("b2"))
        .filter(col("e3").isNotNull && col("b1") === 0 && col("b2") === 0)
        .groupBy(col("e1"), col("e2"), col("e3"))
        .agg(count(lit(1)).as("n_paths"))
        .orderBy(col("n_paths").desc, col("e1"), col("e2"), col("e3"))
        .limit(25)
    },

    // TIME-SERIES ANOMALY DETECTION — the drift monitor a pipeline runs
    // over its daily ingest metrics: per event_type daily counts on a
    // DENSE calendar (generated sequence × distinct types, both
    // broadcast-sized — absent days are real zeros, not missing rows, or
    // every lag distance lies), then an 8-day trailing EWMA with
    // POWER-OF-TWO weights 2^7..2^0 over lags 1..8. Everything stays in
    // BIGINT — ewma_num is the weighted sum, ewma_den = 256 - 2^(8-min(rn,8))
    // the weight mass actually present — so spike (count > 5/4 × EWMA) and
    // dip (count < 4/5 × EWMA) are integer cross-multiplications, exact and
    // DuckDB-hash-identical; no float ever appears. Scale: the daily
    // aggregate is the only corpus exchange (partial+final on
    // (type, day)); the window partitions are per-type series of length
    // |days| — thousands of rows per metric, never per-event.
    QueryDef("op_anomaly_ewma", Some(OperatorQueries.anomalyEwmaSql)) { (s, d) =>
      val events = ev(s, d)
      val daily = events
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val cal = events.agg(min(to_date(col("ts"))).as("lo"),
          max(to_date(col("ts"))).as("hi"))
        .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
      val grid = events.select(col("event_type")).distinct()
        .crossJoin(broadcast(cal))
      val dense = grid.join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
          coalesce(col("c"), lit(0L)).as("c"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val num = (1 to 8)
        .map(k => coalesce(lag(col("c"), k).over(w), lit(0L)) * lit(1L << (8 - k)))
        .reduce(_ + _)
      dense
        .withColumn("rn", row_number().over(w) - 1)
        .withColumn("num", num)
        .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("c"), col("num").cast(LongType).as("ewma_num"),
          expr("CAST(256 - shiftleft(1, 8 - least(rn, 8)) AS BIGINT)").as("ewma_den"),
          expr("CAST(CASE WHEN rn >= 3 AND 4 * c * (256 - shiftleft(1, 8 - least(rn, 8))) > 5 * num" +
            " THEN 1 ELSE 0 END AS INT)").as("spike"),
          expr("CAST(CASE WHEN rn >= 3 AND 5 * c * (256 - shiftleft(1, 8 - least(rn, 8))) < 4 * num" +
            " THEN 1 ELSE 0 END AS INT)").as("dip"))
        .orderBy(col("event_type"), col("day"))
    },

    // TRIANGLE COUNTING / local clustering coefficients — the subgraph-
    // counting class of graph analytics (CC finds components, PageRank
    // ranks, LP finds groups; triangles measure local density). Graph:
    // the MUTUAL top-5 co-occurrence k-NN graph over suppliers (edge iff
    // each endpoint ranks the other in its top-5 shared-customer
    // neighbors, op_cooccur_topk's ranking with the same (count DESC, nb)
    // total tiebreak) — the graph a curation pipeline actually builds,
    // and SPARSE BY CONSTRUCTION: mutual-kNN degree is ≤ k at any corpus
    // size, so wedge work is bounded by k²·|nodes|/2 — no density
    // threshold to tune, no quadratic blowup on a dense corpus (a fixed
    // co-occurrence cutoff makes this fixture's graph COMPLETE). Output:
    // per node, degree, triangle count, and the local clustering
    // coefficient in integer ppm (2·10⁶·tri div deg·(deg−1)) — all
    // integer, hash-exact. Plan: the kNN ranking is the bounded-heap
    // topk_min shape; edges (≤ k·|nodes| rows) materialize once via
    // localCheckpoint and close triangles through two self-joins on the
    // canonical a<b<c orientation — each triangle enumerated exactly
    // once; Catalyst broadcasts the tiny edge frame. For general
    // (unbounded-degree) graphs the refinement is degree-ordered
    // orientation, which bounds wedges by arboricity — unnecessary here
    // because the k-NN construction already bounds the degree.
    QueryDef("op_triangles", Some(trianglesSql)) { (s, d) =>
      val pairs = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.load(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .distinct()
      val b = pairs.select(col("c").as("c2"), col("s").as("s2"))
      val co = pairs.join(b, col("c") === col("c2") && col("s") < col("s2"))
        .groupBy(col("s").as("sa"), col("s2").as("sb"))
        .agg(count(lit(1)).as("n_common"))
      triangleClosure(co)
    }
  )

  /** kNN → mutual-edge → triangle closure over a `(sa, sb, n_common)`
    * co-occurrence frame — shared by op_triangles (which aggregates the
    * counts from scratch) and ss_triangles_maintain (which reads them
    * from the IVM-maintained store). Input is output-sized (≤ |pairs|
    * co-occurrence keys), the closure is bounded by k²·|nodes|/2. */
  private[queries] def triangleClosure(co: DataFrame): DataFrame = {
    import graft.functions.topk_min
    val sym = co.select(col("sa").as("s"), col("sb").as("nb"), col("n_common"))
      .unionByName(co.select(col("sb").as("s"), col("sa").as("nb"), col("n_common")))
    val knn = sym.groupBy(col("s"))
      .agg(topk_min(struct((-col("n_common")).as("ncnt"),
        col("nb").as("nb")), 5).as("tk"))
      .select(col("s"), explode(col("tk")).as("st"))
      .select(col("s"), col("st.nb").as("nb"))
    // mutual edges, canonical u < v; eager localCheckpoint cuts the
    // co-occurrence lineage so the three triangle scans re-read k·|S|
    // edge rows, not three recomputes of the counting pass
    val edges = knn.alias("ka").join(knn.alias("kb"),
        col("ka.s") === col("kb.nb") && col("ka.nb") === col("kb.s") &&
          col("ka.s") < col("ka.nb"))
      .select(col("ka.s").as("u"), col("ka.nb").as("v"))
      .localCheckpoint(true)
    val deg = edges.select(col("u").as("x"))
      .unionByName(edges.select(col("v").as("x")))
      .groupBy(col("x")).agg(count(lit(1)).as("deg"))
    val tri = edges
      .join(edges.select(col("u").as("b2"), col("v").as("c2x")),
        col("v") === col("b2"))
      .join(edges.select(col("u").as("a3"), col("v").as("c3x")),
        col("u") === col("a3") && col("c2x") === col("c3x"))
      .select(col("u").as("ta"), col("v").as("tb"), col("c2x").as("tc"))
    val tcnt = tri.select(col("ta").as("x"))
      .unionByName(tri.select(col("tb").as("x")))
      .unionByName(tri.select(col("tc").as("x")))
      .groupBy(col("x")).agg(count(lit(1)).as("n_tri"))
    deg.join(tcnt.withColumnRenamed("x", "xx"), col("x") === col("xx"), "left")
      .select(col("x").as("supp"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("deg") >= 2,
          expr("(2000000 * coalesce(n_tri, 0)) div (deg * (deg - 1))"))
          .otherwise(lit(0L)).as("coeff_ppm"))
      .orderBy(col("supp"))
  }

  /** ONE oracle for the single-pass table profile, shared by the batch op
    * (op_profile) and its streaming maintenance twin
    * (ss_profile_maintain) — the twin's per-bucket theta sketches stay in
    * the exact regime at fixture NDVs, so both check against the
    * identical exact-count SQL. (Lazy: referenced from `defs`.) */
  private[queries] lazy val profileSql: String =
    """SELECT count(*) AS n_rows,
      |  count(DISTINCT l_orderkey) AS ndv_orderkey,
      |  count(DISTINCT l_partkey) AS ndv_partkey,
      |  count(DISTINCT l_returnflag) AS ndv_returnflag,
      |  count(*) - count(l_shipdate) AS nulls_shipdate,
      |  CAST(min(l_quantity) AS BIGINT) AS min_qty,
      |  CAST(max(l_quantity) AS BIGINT) AS max_qty,
      |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
      |FROM lineitem""".stripMargin

  /** ONE oracle for the correlation-matrix report, shared by the batch op
    * (op_corr) and its streaming maintenance twin (ss_corr_maintain) —
    * the twin folds the identical nine exact integer moment sums (as
    * arbitrary-precision integers in GroupState), so both reach the same
    * fixed double tree and check against the identical SQL. (Lazy:
    * referenced from `defs`.) */
  private[queries] lazy val corrSql: String =
    """WITH s AS (SELECT count(*) AS n,
      |    sum(CAST(l_quantity AS BIGINT)) AS sx,
      |    sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS sy,
      |    sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS sz,
      |    sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
      |    sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
      |      * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS syy,
      |    sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)
      |      * CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS szz,
      |    sum(CAST(l_quantity AS BIGINT)
      |      * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS sxy,
      |    sum(CAST(l_quantity AS BIGINT)
      |      * CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS sxz,
      |    sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
      |      * CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS syz
      |  FROM lineitem)
      |SELECT pair, CAST(floor(1000000 *
      |    (CAST(n AS DOUBLE) * spq - sp * sq)
      |    / sqrt((CAST(n AS DOUBLE) * spp - sp * sp)
      |         * (CAST(n AS DOUBLE) * sqq - sq * sq))) AS BIGINT) AS corr_micro
      |FROM (
      |  SELECT 'qty_price' AS pair, CAST(sx AS DOUBLE) AS sp, CAST(sy AS DOUBLE) AS sq,
      |    CAST(sxx AS DOUBLE) AS spp, CAST(syy AS DOUBLE) AS sqq, CAST(sxy AS DOUBLE) AS spq, n FROM s
      |  UNION ALL SELECT 'qty_disc', CAST(sx AS DOUBLE), CAST(sz AS DOUBLE),
      |    CAST(sxx AS DOUBLE), CAST(szz AS DOUBLE), CAST(sxz AS DOUBLE), n FROM s
      |  UNION ALL SELECT 'price_disc', CAST(sy AS DOUBLE), CAST(sz AS DOUBLE),
      |    CAST(syy AS DOUBLE), CAST(szz AS DOUBLE), CAST(syz AS DOUBLE), n FROM s)
      |ORDER BY pair""".stripMargin

  /** The corr final formula — ONE fixed tree of double ops from the exact
    * moment sums frame (columns n, sx..syz) to the three corr_micro rows,
    * shared by op_corr and ss_corr_maintain so the two cannot diverge in
    * the one place float determinism is load-bearing. */
  private[queries] def corrReport(sums: DataFrame): DataFrame = {
    def corrRow(pair: String, sp: String, sq: String, spp: String,
        sqq: String, spq: String) =
      struct(lit(pair).as("pair"),
        floor(lit(1000000) *
          (col("n").cast(DoubleType) * col(spq).cast(DoubleType)
            - col(sp).cast(DoubleType) * col(sq).cast(DoubleType))
          / sqrt((col("n").cast(DoubleType) * col(spp).cast(DoubleType)
              - col(sp).cast(DoubleType) * col(sp).cast(DoubleType))
            * (col("n").cast(DoubleType) * col(sqq).cast(DoubleType)
              - col(sq).cast(DoubleType) * col(sq).cast(DoubleType))))
          .cast(LongType).as("corr_micro"))
    sums
      .select(explode(array(
        corrRow("qty_price", "sx", "sy", "sxx", "syy", "sxy"),
        corrRow("qty_disc", "sx", "sz", "sxx", "szz", "sxz"),
        corrRow("price_disc", "sy", "sz", "syy", "szz", "syz"))).as("r"))
      .select(col("r.pair").as("pair"), col("r.corr_micro").as("corr_micro"))
      .orderBy(col("pair"))
  }

  /** ONE oracle for the mutual-kNN triangle report, shared by the batch
    * op (op_triangles) and the IVM-maintained twin
    * (ss_triangles_maintain). (Lazy: referenced from `defs`.) */
  private[queries] lazy val trianglesSql: String =
    """WITH pairs AS (
      |  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      |co AS (
      |  SELECT a.s AS sa, b.s AS sb, CAST(count(*) AS BIGINT) AS n_common
      |  FROM pairs a JOIN pairs b ON a.c = b.c AND a.s < b.s
      |  GROUP BY a.s, b.s),
      |sym AS (SELECT sa AS s, sb AS nb, n_common FROM co
      |        UNION ALL SELECT sb AS s, sa AS nb, n_common FROM co),
      |knn AS (SELECT s, nb FROM (
      |    SELECT s, nb, row_number() OVER (PARTITION BY s
      |      ORDER BY n_common DESC, nb) AS rnk FROM sym) WHERE rnk <= 5),
      |edges AS (
      |  SELECT a.s AS u, a.nb AS v FROM knn a JOIN knn b
      |    ON a.s = b.nb AND a.nb = b.s AND a.s < a.nb),
      |deg AS (SELECT x AS supp, CAST(count(*) AS BIGINT) AS deg FROM (
      |    SELECT u AS x FROM edges UNION ALL SELECT v FROM edges) GROUP BY x),
      |tri AS (
      |  SELECT e1.u AS a, e1.v AS b, e2.v AS c3
      |  FROM edges e1 JOIN edges e2 ON e2.u = e1.v
      |  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v),
      |tcnt AS (SELECT x AS supp, CAST(count(*) AS BIGINT) AS n_tri FROM (
      |    SELECT a AS x FROM tri UNION ALL SELECT b FROM tri
      |    UNION ALL SELECT c3 FROM tri) GROUP BY x)
      |SELECT d.supp, d.deg, COALESCE(t.n_tri, 0) AS n_tri,
      |  CASE WHEN d.deg >= 2
      |    THEN (2000000 * COALESCE(t.n_tri, 0)) // (d.deg * (d.deg - 1))
      |    ELSE 0 END AS coeff_ppm
      |FROM deg d LEFT JOIN tcnt t ON t.supp = d.supp
      |ORDER BY d.supp""".stripMargin

  /** ONE oracle for the multi-touch attribution report, shared by the
    * batch op (op_attribution) and its streaming twin (ss_attribution) —
    * the live fold credits each purchase the moment it arrives with the
    * identical integer algebra (base = cents div n, remainder to the
    * latest (ts, event_id) touch), so both are checked against the
    * identical SQL. (Lazy: referenced from `defs`, which initializes
    * first.) */
  private[queries] lazy val attributionSql: String =
    """WITH conv AS (
      |  SELECT event_id AS conv_id, user_id, ts AS cts,
      |         CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |tch AS (
      |  SELECT c.conv_id, c.cents, t.event_id AS touch_id,
      |         t.event_type AS touch_type, t.ts AS tts
      |  FROM conv c JOIN events t ON t.user_id = c.user_id
      |  WHERE t.event_type IN ('click', 'view')
      |    AND t.ts < c.cts AND t.ts >= c.cts - INTERVAL 7 DAY),
      |r AS (
      |  SELECT conv_id, cents, touch_type,
      |    row_number() OVER (PARTITION BY conv_id
      |                       ORDER BY tts DESC, touch_id DESC) AS rn,
      |    count(*) OVER (PARTITION BY conv_id) AS nt
      |  FROM tch),
      |cred AS (
      |  SELECT touch_type, conv_id,
      |    cents // nt + CASE WHEN rn = 1
      |      THEN cents - (cents // nt) * nt ELSE 0 END AS credit
      |  FROM r),
      |attr AS (
      |  SELECT touch_type, CAST(count(*) AS BIGINT) AS n_touches,
      |    count(DISTINCT conv_id) AS n_conversions,
      |    CAST(sum(credit) AS BIGINT) AS credit_cents
      |  FROM cred GROUP BY touch_type),
      |none AS (
      |  SELECT '(none)' AS touch_type, CAST(count(*) AS BIGINT) AS n_touches,
      |    CAST(count(*) AS BIGINT) AS n_conversions,
      |    CAST(sum(cents) AS BIGINT) AS credit_cents
      |  FROM conv c
      |  WHERE NOT EXISTS (SELECT 1 FROM tch t WHERE t.conv_id = c.conv_id)
      |  HAVING count(*) > 0)
      |SELECT * FROM attr UNION ALL SELECT * FROM none
      |ORDER BY touch_type""".stripMargin

  /** ONE oracle for the top session paths, shared by the batch op
    * (op_top_paths) and its streaming twin (ss_top_paths) — the
    * remembered-last-two fold emits the identical triple multiset, so
    * both are checked against the identical SQL. (Lazy: referenced from
    * `defs`, which initializes first.) */
  private[queries] lazy val topPathsSql: String =
    """WITH x AS (SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN ts - lag(ts) OVER w <= INTERVAL 2 DAY THEN 0 ELSE 1 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |tri AS (SELECT event_type AS e1,
      |    lead(event_type, 1) OVER w AS e2, lead(event_type, 2) OVER w AS e3,
      |    lead(new_s, 1) OVER w AS b1, lead(new_s, 2) OVER w AS b2
      |  FROM x WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT e1, e2, e3, count(*) AS n_paths
      |FROM tri WHERE e3 IS NOT NULL AND b1 = 0 AND b2 = 0
      |GROUP BY e1, e2, e3
      |ORDER BY n_paths DESC, e1, e2, e3 LIMIT 25""".stripMargin

  /** ONE oracle for the per-user forward fill, shared by the batch op
    * (op_gap_fill) and its streaming twin (ss_gap_fill) — the per-user
    * last-known-value fold is the window's running last_value exactly,
    * so both are checked against the identical SQL. (Lazy: referenced
    * from `defs`, which initializes first.) */
  private[queries] lazy val gapFillSql: String =
    """SELECT event_id, user_id, v,
      |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
      |FROM (SELECT event_id, user_id, ts,
      |        CASE WHEN event_type <> 'scroll' THEN value END AS v
      |      FROM events)
      |ORDER BY event_id""".stripMargin

  /** ONE oracle for the cohort-retention matrix, shared by the batch op
    * (op_retention) and its streaming maintenance twin
    * (ss_retention_maintain) — the per-user (first-day, active-days)
    * fold reproduces the min/distinct algebra exactly, so both are
    * checked against the identical SQL. (Lazy: referenced from `defs`,
    * which initializes first.) */
  private[queries] lazy val retentionSql: String =
    """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS c FROM events GROUP BY user_id),
      |a AS (SELECT DISTINCT e.user_id, f.c,
      |        date_diff('day', f.c, CAST(e.ts AS DATE)) AS d
      |      FROM events e JOIN f USING (user_id)),
      |coh AS (SELECT c, count(*) AS n_cohort FROM f GROUP BY c)
      |SELECT strftime(a.c, '%Y-%m-%d') AS cohort_day, a.d, count(*) AS n_retained,
      |  any_value(coh.n_cohort) AS n_cohort
      |FROM a JOIN coh USING (c)
      |WHERE a.d IN (0, 1, 3, 7)
      |GROUP BY a.c, a.d ORDER BY cohort_day, d""".stripMargin

  /** ONE oracle for the SCD2 history build, shared by the batch op
    * (op_scd2) and its streaming maintenance twin (ss_scd2_maintain) —
    * the incremental run fold closes intervals at exactly the batch
    * lead() boundaries, so both check against the identical SQL.
    * (Lazy: referenced from `defs`.) */
  private[queries] lazy val scd2Sql: String =
    """WITH r AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |    - row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS grp
      |  FROM events),
      |i AS (
      |  SELECT user_id, event_type, min(ts) AS vf, count(*) AS n_events
      |  FROM r GROUP BY user_id, event_type, grp)
      |SELECT user_id, event_type, epoch_us(vf) AS valid_from_us,
      |  epoch_us(lead(vf) OVER (PARTITION BY user_id ORDER BY vf)) AS valid_to_us,
      |  n_events
      |FROM i ORDER BY user_id, valid_from_us""".stripMargin

  /** ONE oracle for the event-transition matrix, shared by the batch op
    * (op_transitions) and its streaming twin (ss_transitions) — the
    * remembered-last-event fold emits the identical pair multiset, so
    * both check against the same SQL. (Lazy: referenced from `defs`.) */
  private[queries] lazy val transitionsSql: String =
    """SELECT event_type AS src, next_type AS dst, count(*) AS n FROM (
      |  SELECT event_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      |  FROM events)
      |WHERE next_type IS NOT NULL
      |GROUP BY src, dst ORDER BY src, dst""".stripMargin

  /** ONE oracle for the first-completion funnel, shared by the batch op
    * (op_funnel) and its streaming twin (ss_funnel) — the keyed fold is
    * bit-equivalent to the conditional-min chain, so both are checked
    * against the identical SQL. (Lazy: referenced from `defs`, which
    * initializes first.) */
  private[queries] lazy val funnelSql: String =
    """WITH v AS (SELECT user_id, min(ts) AS tv FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(e.ts) AS tc FROM events e
      |  JOIN v ON e.user_id = v.user_id AND e.ts > v.tv
      |  WHERE e.event_type = 'click' GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(e.ts) AS tp FROM events e
      |  JOIN c ON e.user_id = c.user_id AND e.ts > c.tc
      |  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
      |SELECT v.user_id, epoch_us(tv) AS view_us,
      |  epoch_us(tc) AS click_us, epoch_us(tp) AS purchase_us
      |FROM v LEFT JOIN c ON v.user_id = c.user_id
      |LEFT JOIN p ON v.user_id = p.user_id
      |ORDER BY v.user_id""".stripMargin

  /** ONE oracle for the document Pareto frontier, shared by the batch op
    * (op_skyline) and its streaming maintenance twin (ss_skyline_maintain)
    * — incremental frontier folding is exact (domination is transitive),
    * so both are checked against the identical SQL. (Lazy: referenced
    * from `defs`, which initializes first.) */
  private[queries] lazy val skylineSql: String =
    """WITH p AS (SELECT doc_id, lang, n_chars,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
      |  FROM documents),
      |sk AS (SELECT *,
      |    max(n_distinct) OVER (PARTITION BY lang ORDER BY n_chars DESC
      |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m_gt,
      |    max(n_distinct) OVER (PARTITION BY lang, n_chars) AS m_eq
      |  FROM p)
      |SELECT doc_id, lang, n_chars, n_distinct
      |FROM sk WHERE (m_gt IS NULL OR n_distinct > m_gt) AND n_distinct = m_eq
      |ORDER BY lang, doc_id""".stripMargin

  /** ONE oracle for the EWMA drift monitor, shared by the batch op
    * (op_anomaly_ewma) and its streaming twin (ss_anomaly_ewma) — the two
    * monitors are integer-exact and must agree bit-for-bit, so they are
    * checked against the identical SQL. (Lazy: referenced from `defs`,
    * which initializes first.) */
  private[queries] lazy val anomalyEwmaSql: String =
      """WITH b AS (SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi FROM events),
        |cal AS (SELECT CAST(unnest(generate_series(lo::TIMESTAMP, hi::TIMESTAMP,
        |                                           INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        |types AS (SELECT DISTINCT event_type FROM events),
        |daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
        |          FROM events GROUP BY 1, 2),
        |dense AS (SELECT t.event_type, g.day, CAST(COALESCE(d.c, 0) AS BIGINT) AS c
        |          FROM types t CROSS JOIN cal g
        |          LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = g.day),
        |x AS (SELECT event_type, day, c,
        |        row_number() OVER w - 1 AS rn,
        |        COALESCE(lag(c, 1) OVER w, 0) * 128 + COALESCE(lag(c, 2) OVER w, 0) * 64 +
        |        COALESCE(lag(c, 3) OVER w, 0) * 32  + COALESCE(lag(c, 4) OVER w, 0) * 16 +
        |        COALESCE(lag(c, 5) OVER w, 0) * 8   + COALESCE(lag(c, 6) OVER w, 0) * 4 +
        |        COALESCE(lag(c, 7) OVER w, 0) * 2   + COALESCE(lag(c, 8) OVER w, 0) AS num
        |      FROM dense WINDOW w AS (PARTITION BY event_type ORDER BY day))
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, c,
        |  CAST(num AS BIGINT) AS ewma_num,
        |  CAST(256 - (1 << (8 - LEAST(rn, 8))) AS BIGINT) AS ewma_den,
        |  CAST(CASE WHEN rn >= 3 AND 4 * c * (256 - (1 << (8 - LEAST(rn, 8)))) > 5 * num
        |       THEN 1 ELSE 0 END AS INT) AS spike,
        |  CAST(CASE WHEN rn >= 3 AND 5 * c * (256 - (1 << (8 - LEAST(rn, 8)))) < 4 * num
        |       THEN 1 ELSE 0 END AS INT) AS dip
        |FROM x ORDER BY event_type, day""".stripMargin
}
