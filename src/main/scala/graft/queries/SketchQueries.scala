package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Sketch-backed aggregations (SURVEY.md §2.B B6–B8).
  *
  * The reference's COUNT DISTINCT / DISTRIBUTION / TOP K are DataSketches
  * Theta/KLL/FrequentItems aggregates, mergeable across partitions with
  * O(sketch) state (reference exercises them via `makeCountDistinctQuery`,
  * `/root/reference/src/test/scala/com/yahoo/bullet/spark/FilterStreamingTest.scala:203`;
  * merge path `JoinStreaming.scala:126`). Spark 4.1 ships the same sketch
  * family natively (`theta_sketch_agg`, `kll_sketch_agg_double`,
  * `approx_top_k` — Catalyst TypedImperativeAggregates with partial/final
  * merge), so we use the built-ins: identical semantics (exact below the
  * sketch's capacity, approximate with bounded state above — Bullet's exact
  * behavior) and they stay inside Spark's codegen'd aggregation paths.
  *
  * Sketch sizes are chosen so results are EXACT at oracle scale (sf0.01)
  * while remaining O(sketch)-bounded and mergeable at 100 TB — which is
  * precisely Bullet's "exact until cap, then approximate" contract.
  */
object SketchQueries {

  private def t = Tables.load _

  val defs: Seq[QueryDef] = Seq(

    // B6: COUNT DISTINCT via Theta sketch (+ HLL cross-check), global.
    QueryDef("b6_theta_distinct", Some(
      """SELECT count(DISTINCT user_id) AS theta_users,
        |       count(DISTINCT user_id) AS hll_users,
        |       count(DISTINCT user_id) AS exact_users
        |FROM events""".stripMargin)) { (s, d) =>
      t(s, d, "events").agg(
        expr("theta_sketch_estimate(theta_sketch_agg(user_id))").as("theta_users"),
        expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("hll_users"),
        countDistinct(col("user_id")).as("exact_users"))
    },

    // B6 grouped: per-key Theta sketches, merged across partitions.
    QueryDef("b6_theta_grouped", Some(
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)) { (s, d) =>
      t(s, d, "events")
        .groupBy(col("event_type"))
        .agg(expr("theta_sketch_estimate(theta_sketch_agg(user_id))").as("n_users"))
        .orderBy(col("event_type"))
    },

    // B7: DISTRIBUTION/QUANTILE via KLL sketch. k=65535 → exact (no
    // compaction) below 65k rows; the datasketches INCLUSIVE-rank
    // convention = the ceil(p*n)-th smallest order statistic, which the
    // oracle reproduces relationally.
    QueryDef("b7_kll_quantile", Some(
      """WITH s AS (SELECT l_extendedprice AS v,
        |    row_number() OVER (ORDER BY l_extendedprice) AS rn,
        |    count(*) OVER () AS n FROM lineitem),
        |  p AS (SELECT unnest([0.01,0.1,0.25,0.5,0.75,0.9,0.99]) AS p)
        |SELECT CAST(p.p AS DOUBLE) AS p, min(s.v) AS v
        |FROM p, s WHERE s.rn >= ceil(p.p * s.n)
        |GROUP BY p.p ORDER BY p""".stripMargin)) { (s, d) =>
      val probs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
      t(s, d, "lineitem")
        .agg(expr(
          s"kll_sketch_get_quantile_double(kll_sketch_agg_double(l_extendedprice, 65535)," +
            s" array(${probs.mkString(",")}))").as("vs"))
        .select(posexplode(col("vs")).as(Seq("i", "v")))
        .select(element_at(lit(probs.toArray), col("i") + 1).as("p"), col("v"))
        .orderBy(col("p"))
    },

    // B7 grouped: per-key KLL sketches — DISTRIBUTION per group, the
    // shape Bullet only offers globally. Each group's sketch is mergeable
    // O(k) state combined map-side, so 100 TB pays one shuffle of
    // (group, sketch) pairs, never of values; k=65535 keeps the fixture
    // exact (largest per-flag group ≈ 30k rows < 65k), so the same
    // inclusive-rank oracle as b7_kll_quantile applies per group.
    QueryDef("b7_kll_grouped", Some(
      """WITH s AS (SELECT l_returnflag AS flag, l_extendedprice AS v,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n FROM lineitem),
        |  p AS (SELECT unnest([0.5,0.9,0.99]) AS p)
        |SELECT flag, CAST(p.p AS DOUBLE) AS p, min(s.v) AS v
        |FROM p, s WHERE s.rn >= ceil(p.p * s.n)
        |GROUP BY flag, p.p ORDER BY flag, p""".stripMargin)) { (s, d) =>
      val probs = Seq(0.5, 0.9, 0.99)
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag").as("flag"))
        .agg(expr(
          s"kll_sketch_get_quantile_double(kll_sketch_agg_double(l_extendedprice, 65535)," +
            s" array(${probs.mkString(",")}))").as("vs"))
        .select(col("flag"), posexplode(col("vs")).as(Seq("i", "v")))
        .select(col("flag"), element_at(lit(probs.toArray), col("i") + 1).as("p"), col("v"))
        .orderBy(col("flag"), col("p"))
    },

    // B8: TOP K via frequent-items sketch. maxItemsTracked=4096 ≥ the
    // fixture cardinality → exact counts; deterministic re-rank
    // (count DESC, item) before the final limit.
    QueryDef("b8_freq_topk", Some(
      """SELECT user_id, count(*) AS cnt FROM events
        |GROUP BY user_id ORDER BY cnt DESC, user_id LIMIT 10""".stripMargin)) { (s, d) =>
      t(s, d, "events")
        .agg(expr("approx_top_k(user_id, 2000, 4096)").as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.item").as("user_id"), col("e.count").as("cnt"))
        .orderBy(col("cnt").desc, col("user_id"))
        .limit(10)
    },

    // B8 grouped: per-key frequent items — the grouped shape Bullet's TOP K
    // only offers globally (the B7 b7_kll_grouped story, applied to B8).
    // Each group's frequent-items sketch is mergeable bounded state
    // combined map-side (ObjectHashAggregate partial+final), so 100 TB
    // pays one shuffle of (group, sketch) pairs, never of raw rows;
    // maxItemsTracked=4096 ≥ fixture cardinality keeps counts exact. The
    // sketch's own tie order is arbitrary, so a second bounded-heap pass
    // (topk_min — |groups| x k exchange) re-ranks deterministically by
    // (count desc, user_id) before emitting rank.
    QueryDef("b8_topk_grouped", Some(
      """WITH c AS (SELECT event_type, user_id, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, user_id, cnt,
        |  row_number() OVER (PARTITION BY event_type ORDER BY cnt DESC, user_id) AS rnk
        |  FROM c)
        |SELECT event_type, rnk, user_id, cnt FROM r WHERE rnk <= 5
        |ORDER BY event_type, rnk""".stripMargin)) { (s, d) =>
      import graft.functions.topk_min
      t(s, d, "events")
        .groupBy(col("event_type"))
        .agg(expr("approx_top_k(user_id, 2000, 4096)").as("tk"))
        .select(col("event_type"), explode(col("tk")).as("e"))
        .select(col("event_type"), col("e.item").as("user_id"), col("e.count").as("cnt"))
        .groupBy(col("event_type"))
        .agg(topk_min(struct((-col("cnt")).as("nc"), col("user_id").as("user_id"),
          col("cnt").as("cnt")), 5).as("tk"))
        .select(col("event_type"), posexplode(col("tk")).as(Seq("pos", "st")))
        .select(col("event_type"), (col("pos") + 1).as("rnk"),
          col("st.user_id").as("user_id"), col("st.cnt").as("cnt"))
        .orderBy(col("event_type"), col("rnk"))
    },

    // B6/B7 sketch-state INTERCHANGE — the headline reason mergeable
    // sketches exist at scale: aggregate each "day" to serialized sketch
    // state (binary columns), persist/ship those partials, and roll them
    // up later WITHOUT rescanning the raw data. Here both hops run in one
    // query (day partials -> theta_union_agg / kll_merge_agg_double), but
    // the binary `tsk`/`ksk` columns are exactly what a daily job would
    // write to parquet and a weekly job would merge — the incremental-
    // aggregation contract Bullet's DataSketches aggregates are built on
    // (SURVEY.md §2.B B6–B8). Sketches are exact at oracle scale (events
    // per day ≪ 65535, distinct users ≪ 4096 nominal), so the DuckDB
    // oracle checks the estimates as exact counts/quantiles; merged ≡
    // single-pass parity is additionally spec-gated at both fixtures.
    // Scale shape: first aggregate shuffles (day, partial-sketch) pairs —
    // O(days × sketch) — and the rollup is a second O(days) aggregate;
    // raw user_ids/values never cross the wire twice.
    QueryDef("b6_theta_merge", Some(
      """WITH e AS (SELECT strftime(ts, '%Y-%m-%d') AS day, user_id, value FROM events),
        |d AS (SELECT day, count(DISTINCT user_id) AS day_users FROM e GROUP BY day),
        |dq AS (SELECT day, min(v) AS day_p50 FROM (
        |    SELECT day, value AS v,
        |      row_number() OVER (PARTITION BY day ORDER BY value) AS rn,
        |      count(*) OVER (PARTITION BY day) AS n FROM e)
        |  WHERE rn >= ceil(0.5 * n) GROUP BY day),
        |tot AS (SELECT count(DISTINCT user_id) AS total_users FROM e),
        |tq AS (SELECT min(v) AS total_p50 FROM (
        |    SELECT value AS v, row_number() OVER (ORDER BY value) AS rn,
        |      count(*) OVER () AS n FROM e)
        |  WHERE rn >= ceil(0.5 * n))
        |SELECT day, day_users, day_p50, total_users, total_p50
        |FROM d JOIN dq USING (day), tot, tq ORDER BY day""".stripMargin)) { (s, d) =>
      val e = t(s, d, "events")
        .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"), col("value"))
      val partials = e.groupBy(col("day")).agg(
        expr("theta_sketch_agg(user_id)").as("tsk"),
        expr("kll_sketch_agg_double(value, 65535)").as("ksk"))
      val rollup = partials.agg(
        expr("theta_sketch_estimate(theta_union_agg(tsk))").as("total_users"),
        expr("element_at(kll_sketch_get_quantile_double(kll_merge_agg_double(ksk), array(0.5D)), 1)")
          .as("total_p50"))
      partials
        .select(col("day"),
          expr("theta_sketch_estimate(tsk)").as("day_users"),
          expr("element_at(kll_sketch_get_quantile_double(ksk, array(0.5D)), 1)").as("day_p50"))
        .crossJoin(broadcast(rollup))
        .select(col("day"), col("day_users"), col("day_p50"),
          col("total_users"), col("total_p50"))
        .orderBy(col("day"))
    },

    // Theta SET ALGEBRA — the capability that picks Theta over HLL in the
    // first place (Bullet's COUNT DISTINCT rides DataSketches Theta for
    // exactly this reason): audience overlap (clickers ∩ viewers) and
    // exclusion (clickers \ viewers) computed ON THE SKETCHES, no
    // re-scan, no distinct-pair join. One pass builds a sketch per
    // segment as conditional aggregates (map-side combined); the
    // intersection/difference are O(sketch) driver-side expression calls
    // on the two binary values. At 100 TB the segment sketches are the
    // persisted daily artifacts (b6_theta_merge's tsk column) and this
    // query is pure sketch algebra over KBs. Exact at oracle scale
    // (distinct users ≪ 4096 nominal entries), so DuckDB checks the
    // estimates as exact INTERSECT/EXCEPT counts.
    QueryDef("b6_theta_setops", Some(
      """WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
        |v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view')
        |SELECT
        |  (SELECT count(*) FROM c) AS click_users,
        |  (SELECT count(*) FROM v) AS view_users,
        |  (SELECT count(*) FROM (SELECT * FROM c INTERSECT SELECT * FROM v)) AS both_users,
        |  (SELECT count(*) FROM (SELECT * FROM c EXCEPT SELECT * FROM v)) AS click_only_users""".stripMargin)) { (s, d) =>
      t(s, d, "events").agg(
          expr("theta_sketch_agg(CASE WHEN event_type = 'click' THEN user_id END)").as("cs"),
          expr("theta_sketch_agg(CASE WHEN event_type = 'view' THEN user_id END)").as("vs"))
        .select(
          expr("theta_sketch_estimate(cs)").as("click_users"),
          expr("theta_sketch_estimate(vs)").as("view_users"),
          expr("theta_sketch_estimate(theta_intersection(cs, vs))").as("both_users"),
          expr("theta_sketch_estimate(theta_difference(cs, vs))").as("click_only_users"))
    },

    // B5 cardinality-cap guard (Bullet caps GROUP cardinality at
    // bullet.query.aggregation.max.size=500 via a sketch over group keys):
    // report the would-be group count cheaply with a Theta sketch over the
    // encoded key tuple — the pre-flight a planner runs before a huge
    // groupBy. lgk=17 (131072 nominal entries) keeps the sketch exact at
    // oracle scale while staying O(1 MB) mergeable state at 100 TB.
    QueryDef("b5_group_cap_probe", Some(
      """SELECT count(DISTINCT (l_partkey, l_suppkey)) AS n_groups,
        |  count(DISTINCT (l_partkey, l_suppkey)) <= 500 AS under_cap
        |FROM lineitem""".stripMargin)) { (s, d) =>
      t(s, d, "lineitem")
        .agg(expr("theta_sketch_estimate(theta_sketch_agg(concat_ws('|', l_partkey, l_suppkey), 17))")
          .as("n_groups"))
        .select(col("n_groups"), (col("n_groups") <= 500).as("under_cap"))
    },

    // ---- persisted sketch-rollup store (the sketch warehouse) ----
    // B6's state interchange as a PIPELINE, not just a column: daily
    // mergeable partials persist once, and every report below reads the
    // O(days) store — never the events table. At 100 TB this is the
    // pattern the sketch family exists for: "30-day MAU" costs a merge
    // of 30 KB-sized rows instead of a rescan of 30 days of raw events
    // (reference merge path: JoinStreaming.scala:126; plan-gated in
    // SketchStoreSpec — no events scan may appear in either query plan).

    // Weekly rollup + per-week median from the store alone. Exact at
    // oracle scale on BOTH SFs (weekly distinct users ≤ 1500 ≪ the
    // lgk=17 sketch's 131072 nominal entries; weekly rows ≪ KLL 65535);
    // at 100x the same plan answers within the SketchRegimeSpec bounds.
    QueryDef("op_sketch_rollup", Some(
      """WITH e AS (SELECT CAST(floor((CAST(strftime(ts, '%d') AS INT) - 1) / 7) AS BIGINT) AS wk,
        |    user_id, value FROM events),
        |a AS (SELECT wk, CAST(count(*) AS BIGINT) AS n_events,
        |    count(DISTINCT user_id) AS users FROM e GROUP BY wk),
        |q AS (SELECT wk, min(v) AS p50 FROM (
        |    SELECT wk, value AS v,
        |      row_number() OVER (PARTITION BY wk ORDER BY value) AS rn,
        |      count(*) OVER (PARTITION BY wk) AS n FROM e)
        |  WHERE rn >= ceil(0.5 * n) GROUP BY wk)
        |SELECT wk, n_events, users, p50 FROM a JOIN q USING (wk)
        |ORDER BY wk""".stripMargin)) { (s, d) =>
      sketchStore(s, d)
        .withColumn("wk",
          floor((substring(col("day"), 9, 2).cast(IntegerType) - 1) / 7).cast(LongType))
        .groupBy(col("wk"))
        .agg(sum(col("n_events")).as("n_events"),
          expr("theta_sketch_estimate(theta_union_agg(tsk, 17))").as("users"),
          expr("element_at(kll_sketch_get_quantile_double(kll_merge_agg_double(ksk), array(0.5D)), 1)")
            .as("p50"))
        .orderBy(col("wk"))
    },

    // Trailing-7-day active users (the "30-day MAU" shape at oracle
    // scale) per day, from the store alone. NOT a nested-loop range
    // join: each store row explodes to the ≤7 window anchors it serves
    // (O(7·days) rows), a broadcast semi-join keeps anchors that are
    // real days, and one hash aggregate merges the sketches — the plan
    // a 10-year daily store needs (3650 rows, still KBs).
    QueryDef("op_sketch_window", Some(
      """WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS dd FROM events),
        |e AS (SELECT CAST(ts AS DATE) AS ed, user_id FROM events)
        |SELECT strftime(d.dd, '%Y-%m-%d') AS day, CAST(count(*) AS BIGINT) AS n7,
        |  count(DISTINCT e.user_id) AS mau7
        |FROM days d JOIN e ON e.ed BETWEEN d.dd - 6 AND d.dd
        |GROUP BY d.dd ORDER BY day""".stripMargin)) { (s, d) =>
      val store = sketchStore(s, d)
        .select(to_date(col("day")).as("sday"), col("n_events"), col("tsk"))
      val anchors = store.select(col("sday").as("day"))
      store
        .withColumn("day", explode(expr("sequence(sday, date_add(sday, 6))")))
        .join(broadcast(anchors), Seq("day"), "left_semi")
        .groupBy(col("day"))
        .agg(sum(col("n_events")).as("n7"),
          expr("theta_sketch_estimate(theta_union_agg(tsk, 17))").as("mau7"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("n7"), col("mau7"))
        .orderBy(col("day"))
    }
  )

  // ---- sketch-store plumbing ----

  /** Store location for fixture dir `d` — the near-dup store's keying
    * convention (content-addressed under spark.graft.index.dir). */
  private[graft] def sketchStorePath(s: org.apache.spark.sql.SparkSession, d: String): String =
    s.conf.getOption("spark.graft.index.dir")
      .getOrElse("/tmp/graft_index_store") + "/sketch_store_" +
      java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(d).toLong & 0xffffffffL)

  /** Content stamp of `events.parquet` — a regenerated fixture at the
    * same path invalidates the store instead of serving stale partials
    * (the near store's manifest discipline). */
  private[graft] def sketchStoreStamp(d: String): String = {
    val f = new java.io.File(d, "events.parquet")
    val parts =
      if (f.isFile) Seq(s"${f.getName}:${f.length}:${f.lastModified}")
      else Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(_.isFile).sortBy(_.getName).toSeq
        .map(p => s"${p.getName}:${p.length}:${p.lastModified}")
    java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.orderedHash(parts).toLong & 0xffffffffL)
  }

  /** The persisted daily-partial store: one row per day carrying the
    * exact count plus the two mergeable sketch binaries
    * (Theta lgk=17 over user_id, KLL k=65535 over value). Built ONCE per
    * fixture content (manifest written LAST — a crash mid-build leaves a
    * store the next read rebuilds); every consumer reads the parquet
    * store, never the events table. */
  private[graft] def sketchStore(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val path = sketchStorePath(s, d)
    val manifest = new java.io.File(path, "_manifest")
    val stamp = sketchStoreStamp(d)
    val valid = manifest.isFile &&
      new String(java.nio.file.Files.readAllBytes(manifest.toPath), "UTF-8") == stamp
    if (!valid) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
      t(s, d, "events")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n_events"),
          expr("theta_sketch_agg(user_id, 17)").as("tsk"),
          expr("kll_sketch_agg_double(value, 65535)").as("ksk"))
        .write.mode("overwrite").parquet(path + "/days")
      java.nio.file.Files.write(manifest.toPath, stamp.getBytes("UTF-8"))
    }
    s.read.parquet(path + "/days")
  }

  /** Day-N+1 maintenance: fold a new day's raw events into the store as
    * one appended partial row per day. IDEMPOTENT per day — days already
    * present are anti-joined away, so an at-least-once scheduler cannot
    * double-count n_events (the sketches would union out duplicates, the
    * exact count would not). The read-check-then-append runs under
    * [[graft.operators.StoreLock]], so two schedulers committing the
    * SAME day concurrently serialize: the second sees the day present
    * and appends nothing (CommitConcurrencySpec races it). */
  private[graft] def sketchStoreCommit(s: org.apache.spark.sql.SparkSession,
      d: String, dayEvents: org.apache.spark.sql.DataFrame): Unit = {
    val path = sketchStorePath(s, d)
    graft.operators.StoreLock.withLock(path) {
      // day list to the driver (O(days) — a 10-year store is 3650 strings)
      // rather than an anti-join reading the same path the write appends
      // to; the collect completes (and so does the check) before the
      // append starts, and the lock holds across both
      val existingDays = sketchStore(s, d).select(col("day"))
        .collect().map(_.getString(0)).toSeq
      dayEvents
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n_events"),
          expr("theta_sketch_agg(user_id, 17)").as("tsk"),
          expr("kll_sketch_agg_double(value, 65535)").as("ksk"))
        .filter(if (existingDays.isEmpty) lit(true) else !col("day").isin(existingDays: _*))
        .write.mode("append").parquet(path + "/days")
    }
  }
}
