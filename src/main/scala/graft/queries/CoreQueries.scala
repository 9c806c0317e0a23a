package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** The Bullet operator surface (SURVEY.md §2.B, B1–B12) plus the relational
  * capabilities §2.C mandates (joins, set ops, rollup/cube, analytic
  * windows), each expressed as a declarative DataFrame plan so Catalyst gets
  * to push filters to parquet, prune columns, broadcast small sides and run
  * whole-stage codegen — the properties that carry these plans to 100 TB.
  *
  * Reference semantics cited per query; see SURVEY.md §2 for the full map.
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Order-independent double aggregate: sum in decimal (exact), cast the
    * final value to double. decimal->double is deterministic, so Spark and
    * the DuckDB oracle produce bit-identical floats regardless of partial
    * aggregation order. (Plain double sums are order-dependent in the last
    * ulp; decimal outputs above precision 18 degrade to float in the
    * driver's pandas bridge — this pattern avoids both.) */
  private def sumDec(c: Column, scale: Int = 2): Column = {
    // scaled-long fast path: round to the same HALF_UP integer the decimal
    // cast would produce, sum exactly in longs (fits: |x|*10^s * 600k rows
    // << 2^63), convert once. Bit-identical to the decimal sum for values
    // carrying <= `scale` true decimal digits; computed expressions with
    // longer expansions keep the decimal path (see sumDecExact).
    val f = math.pow(10, scale)
    sum(round(c * f, 0).cast(LongType)).cast(DoubleType) / f
  }

  /** Decimal-cast sum for computed expressions whose exact decimal
    * expansion exceeds `scale` digits (rounding must happen on the exact
    * double expansion, as DuckDB does). */
  private def sumDecExact(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Deterministic average: exact decimal sum as double, divided by count. */
  private def avgDec(c: Column, scale: Int = 4): Column = {
    val f = math.pow(10, scale)
    sum(round(c * f, 0).cast(LongType)).cast(DoubleType) / f / count(c)
  }

  val defs: Seq[QueryDef] = Seq(

    // ----- B1: filter (reference: Querier filter stage, FilterStreaming.scala:121) -----
    QueryDef("b1_filter_eq", Some(
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'click' ORDER BY event_id""".stripMargin)) { (s, d) =>
      t(s, d, "events")
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("value"))
        .orderBy(col("event_id"))
    },

    QueryDef("b1_filter_compound", Some(
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 20
        |  AND l_returnflag IN ('A','R')
        |  AND NOT (l_discount < 0.02)
        |  AND l_shipdate >= TIMESTAMP '1995-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)) { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_quantity").between(10, 20)
          && col("l_returnflag").isin("A", "R")
          && !(col("l_discount") < 0.02)
          && col("l_shipdate") >= to_timestamp(lit("1995-01-01")))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // ----- B2+B3: projection with expression library (Projection COPY mode ≈ withColumn) -----
    QueryDef("b2_project_expr", Some(
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1 - l_discount) AS revenue,
        |  lower(l_returnflag) AS rf,
        |  CASE WHEN l_quantity >= 30 THEN 'high' WHEN l_quantity >= 15 THEN 'mid' ELSE 'low' END AS qty_band,
        |  abs(l_discount - l_tax) >= 0.03 AS spread
        |FROM lineitem WHERE l_linenumber = 1
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)) { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_linenumber") === 1)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          lower(col("l_returnflag")).as("rf"),
          when(col("l_quantity") >= 30, "high")
            .when(col("l_quantity") >= 15, "mid")
            .otherwise("low").as("qty_band"),
          (abs(col("l_discount") - col("l_tax")) >= 0.03).as("spread"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // Dynamic-schema tail: BulletRecord map fields ≈ JSON props column
    // (SURVEY §1.2; reference record.typedGet on runtime-typed fields).
    QueryDef("b3_expr_json", Some(
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |  upper(event_type) AS et,
        |  length(event_type) AS et_len,
        |  event_type IS NOT NULL AS has_type
        |FROM events WHERE event_type LIKE '%c%'
        |ORDER BY event_id""".stripMargin)) { (s, d) =>
      t(s, d, "events")
        .filter(col("event_type").like("%c%"))
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k"),
          upper(col("event_type")).as("et"),
          length(col("event_type")).as("et_len"),
          col("event_type").isNotNull.as("has_type"))
        .orderBy(col("event_id"))
    },

    // ----- B4: RAW limit-k (reference Raw aggregation; completes at k) -----
    QueryDef("b4_raw_limit", Some(
      """SELECT event_id, event_type FROM events ORDER BY event_id LIMIT 100""")) { (s, d) =>
      t(s, d, "events")
        .select(col("event_id"), col("event_type"))
        .orderBy(col("event_id"))
        .limit(100)
    },

    // ----- B5: GROUP BY + COUNT/SUM/MIN/MAX/AVG (partial+final via HashAggregateExec) -----
    QueryDef("b5_group_agg", Some(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(l_quantity) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)) { (s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sumDec(col("l_quantity")).as("sum_qty"),
          sumDec(col("l_extendedprice")).as("sum_price"),
          sumDecExact(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
          avgDec(col("l_quantity")).as("avg_qty"),
          avgDec(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // GROUP ALL (reference GroupAll(operations)): global aggregates, no keys.
    QueryDef("b5_group_all", Some(
      """SELECT count(*) AS cnt,
        |  count(DISTINCT l_suppkey) AS n_supp,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship
        |FROM lineitem""".stripMargin)) { (s, d) =>
      t(s, d, "lineitem")
        .agg(
          count(lit(1)).as("cnt"),
          countDistinct(col("l_suppkey")).as("n_supp"),
          sumDec(col("l_quantity")).as("sum_qty"),
          min(col("l_shipdate")).as("min_ship"),
          max(col("l_shipdate")).as("max_ship"))
    },

    // ----- B6: COUNT DISTINCT, exact path -----
    QueryDef("b6_count_distinct", Some(
      """SELECT count(DISTINCT user_id) AS n_users FROM events""")) { (s, d) =>
      t(s, d, "events").agg(countDistinct(col("user_id")).as("n_users"))
    },

    // ----- B7: DISTRIBUTION / QUANTILE, exact path (sketch path in SketchQueries) -----
    QueryDef("b7_quantile", Some(
      """SELECT CAST(p AS DOUBLE) AS p, round(v, 3) AS v FROM (
        |  SELECT 0.1 AS p, quantile_cont(l_extendedprice, 0.1) AS v FROM lineitem
        |  UNION ALL SELECT 0.25, quantile_cont(l_extendedprice, 0.25) FROM lineitem
        |  UNION ALL SELECT 0.5,  quantile_cont(l_extendedprice, 0.5)  FROM lineitem
        |  UNION ALL SELECT 0.75, quantile_cont(l_extendedprice, 0.75) FROM lineitem
        |  UNION ALL SELECT 0.9,  quantile_cont(l_extendedprice, 0.9)  FROM lineitem
        |) ORDER BY p""".stripMargin)) { (s, d) =>
      val probs = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
      // Exact quantiles by distributed sort + rank selection instead of
      // the `percentile()` aggregate: percentile buffers every value
      // into one final-merge map — profiled as a 1.47 s SINGLE-TASK job
      // (583 k distinct values leave pre-aggregation nothing to fold).
      // Here the only O(n) passes are a count and a parallel range sort;
      // the driver touches exactly the ≤ 2·|probs| ranked rows. The
      // interpolation reproduces Percentile.getPercentile bit-for-bit:
      // pos = p·(n−1), (hi−pos)·v_lo + (pos−lo)·v_hi on doubles, and
      // decimal(12,2) → double preserves order (all values < 2^53).
      val vals = t(s, d, "lineitem")
        .select(col("l_extendedprice").cast("double").as("v"))
      val n = vals.count()
      val positions = probs.map(p => p * (n - 1))
      val rankSet = positions
        .flatMap(pos => Seq(math.floor(pos).toLong, math.ceil(pos).toLong)).toSet
      val picked = vals.orderBy(col("v")).rdd.zipWithIndex()
        .filter { case (_, i) => rankSet(i) }
        .collect().map { case (r, i) => i -> r.getDouble(0) }.toMap
      val quantiles = probs.zip(positions).map { case (p, pos) =>
        val (lo, hi) = (math.floor(pos).toLong, math.ceil(pos).toLong)
        val v = if (lo == hi) picked(lo)
          else (hi - pos) * picked(lo) + (pos - lo) * picked(hi)
        (p, v)
      }
      import s.implicits._
      quantiles.toDF("p", "v")
        .select(col("p"), round(col("v"), 3).as("v"))
        .orderBy(col("p"))
    },

    // B7 PMF/CDF shape: fixed-width bins + cumulative counts. The running
    // sum is a broadcast range-join of the tiny bucket aggregate against
    // itself — NOT an unpartitioned window, which would drag the rows
    // through a single-partition WindowExec (the post-agg set is small,
    // but the single-partition plan shape is the wrong habit at scale).
    QueryDef("b7_pmf_cdf", Some(
      """SELECT CAST(floor(value / 50) AS BIGINT) AS bucket, count(*) AS pmf,
        |  CAST(sum(count(*)) OVER (ORDER BY floor(value / 50)) AS BIGINT) AS cdf
        |FROM events GROUP BY floor(value / 50) ORDER BY bucket""".stripMargin)) { (s, d) =>
      val agg = t(s, d, "events")
        .groupBy(floor(col("value") / 50).cast(LongType).as("bucket"))
        .agg(count(lit(1)).as("pmf"))
      agg.join(
          broadcast(agg.select(col("bucket").as("b2"), col("pmf").as("p2"))),
          col("b2") <= col("bucket"))
        .groupBy(col("bucket"), col("pmf"))
        .agg(sum(col("p2")).cast(LongType).as("cdf"))
        .orderBy(col("bucket"))
    },

    // ----- B8: TOP K (exact path; FreqItems sketch path in SketchQueries) -----
    QueryDef("b8_topk", Some(
      """SELECT user_id, count(*) AS cnt FROM events
        |GROUP BY user_id ORDER BY cnt DESC, user_id LIMIT 10""".stripMargin)) { (s, d) =>
      t(s, d, "events")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("user_id"))
        .limit(10)
    },

    // ----- B9–B12: post-aggregation chain: HAVING → COMPUTATION → ORDER BY → CULLING -----
    QueryDef("b9_post_agg_chain", Some(
      """SELECT l_suppkey, cnt, avg_qty FROM (
        |  SELECT l_suppkey, count(*) AS cnt,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(l_quantity) AS avg_qty,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS hidden_sum
        |  FROM lineitem GROUP BY l_suppkey
        |) WHERE cnt > 500 AND hidden_sum > 0
        |ORDER BY cnt DESC, l_suppkey""".stripMargin)) { (s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(
          count(lit(1)).as("cnt"),
          avgDec(col("l_quantity")).as("avg_qty"),
          sumDec(col("l_extendedprice")).as("hidden_sum"))
        .filter(col("cnt") > 500 && col("hidden_sum") > 0)      // HAVING
        .orderBy(col("cnt").desc, col("l_suppkey"))             // ORDER BY
        .drop("hidden_sum")                                     // CULLING
    },

    // ----- B13 (batch analog): tumbling TIME window over event time -----
    QueryDef("b13_window_tumbling", Some(
      """SELECT date_trunc('hour', ts) AS wstart, count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY date_trunc('hour', ts) ORDER BY wstart""".stripMargin)) { (s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("cnt"), sumDec(col("value")).as("sum_value"))
        .select(col("w.start").as("wstart"), col("cnt"), col("sum_value"))
        .orderBy(col("wstart"))
    },

    // ----- §2.C joins: broadcast inner (dim tables ship to every executor, no shuffle of the fact side) -----
    QueryDef("j_broadcast_inner", Some(
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)) { (s, d) =>
      t(s, d, "orders")
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), sumDec(col("o_totalprice")).as("revenue"))
        .orderBy(col("c_mktsegment"))
    },

    QueryDef("j_left_outer", Some(
      """SELECT c_custkey, count(o_orderkey) AS n FROM customer
        |LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)) { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("o_custkey") === col("c_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n"))
        .orderBy(col("c_custkey"))
    },

    QueryDef("j_semi", Some(
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin)) { (s, d) =>
      val orders = t(s, d, "orders").filter(col("o_totalprice") > 100000)
      t(s, d, "customer")
        .join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    QueryDef("j_anti", Some(
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin)) { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // Multiway star join: fact table joined to a chain of broadcast dims.
    QueryDef("j_multiway_star", Some(
      """SELECT r_name, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)) { (s, d) =>
      t(s, d, "orders")
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_orders"), sumDec(col("o_totalprice")).as("revenue"))
        .orderBy(col("r_name"))
    },

    // ----- §2.C set operations -----
    QueryDef("set_union", Some(
      """SELECT c_nationkey AS nk FROM customer
        |UNION SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin)) { (s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("nk"))
        .union(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .distinct()
        .orderBy(col("nk"))
    },

    QueryDef("set_intersect", Some(
      """SELECT o_orderkey AS k FROM orders
        |INTERSECT SELECT l_orderkey FROM lineitem ORDER BY k""".stripMargin)) { (s, d) =>
      t(s, d, "orders").select(col("o_orderkey").as("k"))
        .intersect(t(s, d, "lineitem").select(col("l_orderkey").as("k")))
        .orderBy(col("k"))
    },

    QueryDef("set_except", Some(
      """SELECT o_orderkey AS k FROM orders
        |EXCEPT SELECT l_orderkey FROM lineitem ORDER BY k""".stripMargin)) { (s, d) =>
      t(s, d, "orders").select(col("o_orderkey").as("k"))
        .except(t(s, d, "lineitem").select(col("l_orderkey").as("k")))
        .orderBy(col("k"))
    },

    // ----- §2.C grouping sets -----
    QueryDef("rollup_agg", Some(
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)) { (s, d) =>
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), sumDec(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    QueryDef("cube_agg", Some(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)) { (s, d) =>
      t(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    },

    // Explicit GROUPING SETS — the general form rollup/cube are special
    // cases of: two DISJOINT single-column sets (per-status and
    // per-priority marginals in one pass), which neither rollup nor cube
    // can express. One shuffle total: Spark expands the sets map-side
    // (each input row feeds every set's partial aggregate), so the
    // exchange carries pre-combined partials exactly like a plain
    // groupBy — no per-set rescan of the fact table, which is the whole
    // point at 100 TB. grouping_id disambiguates which set a row
    // belongs to (both engines use the SQL-standard bit vector).
    QueryDef("op_grouping_sets", Some(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)) { (s, d) =>
      t(s, d, "orders")
        .groupingSets(Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"), sumDec(col("o_totalprice")).as("total"),
          grouping_id().cast(LongType).as("gid"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // ----- §2.C analytic window functions -----
    QueryDef("wf_analytic", Some(
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |  row_number() OVER w AS rn,
        |  rank() OVER w AS rnk,
        |  lag(c_custkey) OVER w AS prev_key,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_bal
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_mktsegment, rn""".stripMargin)) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, d, "customer")
        .select(
          col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          lag(col("c_custkey"), 1).over(w).as("prev_key"),
          sum(col("c_acctbal").cast(DecimalType(18, 2)))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast(DoubleType).as("running_bal"))
        .orderBy(col("c_mktsegment"), col("rn"))
    },

    // The REST of the analytic-window surface in one oracle-backed query:
    // dense_rank / lead / ntile / percent_rank / cume_dist / first_value /
    // nth_value over the same total per-segment order as wf_analytic.
    // percent_rank and cume_dist are exact rationals ((rank-1)/(n-1),
    // rn/n) evaluated as one IEEE division each — bit-identical
    // cross-engine; the total order (unique tiebreak) makes the default
    // RANGE frame equal to ROWS, so first/nth_value are frame-unambiguous.
    // Scale: one shuffle on the LOW-cardinality segment key; a real
    // pipeline with a hot segment pre-aggregates or buckets first (the
    // op_bucketed_join lever) — the window itself is the semantics here.
    QueryDef("wf_analytic_full", Some(
      """SELECT c_mktsegment, c_custkey,
        |  dense_rank() OVER w AS drnk,
        |  lead(c_custkey) OVER w AS next_key,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS prank,
        |  cume_dist() OVER w AS cdist,
        |  first_value(c_custkey) OVER w AS top_key,
        |  nth_value(c_custkey, 3) OVER w AS third_key
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_mktsegment, c_acctbal DESC, c_custkey""".stripMargin)) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, d, "customer")
        .select(
          col("c_mktsegment"), col("c_custkey"),
          dense_rank().over(w).as("drnk"),
          lead(col("c_custkey"), 1).over(w).as("next_key"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("prank"),
          cume_dist().over(w).as("cdist"),
          first_value(col("c_custkey")).over(w).as("top_key"),
          nth_value(col("c_custkey"), 3).over(w).as("third_key"),
          col("c_acctbal"))
        .orderBy(col("c_mktsegment"), col("c_acctbal").desc, col("c_custkey"))
        .drop("c_acctbal")
    },

    // ----- §2.C top-n pushdown (TakeOrderedAndProject, no full sort at scale) -----
    QueryDef("topn_orders", Some(
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin)) { (s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)
    }
  )
}
