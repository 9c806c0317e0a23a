package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
          when(col("ts").cast(LongType) - lag(col("ts"), 1).over(byUser).cast(LongType) <= 172800, 0)
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
    }
  )
}
