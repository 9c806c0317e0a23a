package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.bql.Compiler
import graft.sources.Tables

/** BQL end-to-end under the driver's oracle gate: each entry is a BQL text
  * parsed by graft.bql.Parser, compiled to a Catalyst plan by
  * graft.bql.Compiler, and run against the parquet fixtures — proving the
  * full text → AST → Column → result path (the layer the reference
  * outsources to Bullet's web service; SURVEY.md §3.2 step 3).
  */
object BqlQueries {

  private def bql(s: SparkSession, d: String, table: String, text: String): DataFrame =
    Compiler.compile(text)._2(Tables.load(s, d, table))

  val defs: Seq[QueryDef] = Seq(

    QueryDef("bql_filter_project", Some(
      """SELECT event_id, user_id, value * 2 AS v2 FROM events
        |WHERE event_type = 'click' AND value >= 50 ORDER BY event_id""".stripMargin)) { (s, d) =>
      bql(s, d, "events",
        "SELECT event_id, user_id, value * 2 AS v2 FROM STREAM " +
          "WHERE event_type == 'click' AND value >= 50 ORDER BY event_id")
    },

    QueryDef("bql_group_agg", Some(
      """SELECT event_type, count(*) AS cnt, min(value) AS mn, max(value) AS mx
        |FROM events WHERE user_id % 2 = 0 GROUP BY event_type
        |ORDER BY event_type""".stripMargin)) { (s, d) =>
      bql(s, d, "events",
        "SELECT event_type, COUNT(*) AS cnt, MIN(value) AS mn, MAX(value) AS mx " +
          "FROM STREAM WHERE user_id % 2 == 0 GROUP BY event_type ORDER BY event_type")
    },

    QueryDef("bql_count_distinct", Some(
      """SELECT count(DISTINCT user_id) AS n_users FROM events
        |WHERE event_type IN ('click','view')""".stripMargin)) { (s, d) =>
      bql(s, d, "events",
        "SELECT COUNT(DISTINCT user_id) AS n_users FROM STREAM " +
          "WHERE event_type IN ('click', 'view')")
    },

    QueryDef("bql_topk", Some(
      """SELECT event_type, count(*) AS cnt FROM events
        |GROUP BY event_type ORDER BY cnt DESC, event_type LIMIT 3""".stripMargin)) { (s, d) =>
      bql(s, d, "events", "SELECT TOP(3, event_type) AS cnt FROM STREAM")
    },

    QueryDef("bql_having_expr", Some(
      """SELECT event_type, count(*) AS cnt, avg(user_id) AS avg_uid
        |FROM events GROUP BY event_type HAVING count(*) > 150
        |ORDER BY cnt DESC, event_type""".stripMargin)) { (s, d) =>
      // AVG over an integer column: the double sum stays exact (< 2^53),
      // so Spark's avg and DuckDB's avg are bit-identical. Float-typed
      // AVGs go through the decimal-sum pattern instead (CoreQueries).
      bql(s, d, "events",
        "SELECT event_type, COUNT(*) AS cnt, AVG(user_id) AS avg_uid FROM STREAM " +
          "GROUP BY event_type HAVING cnt > 150 ORDER BY cnt DESC, event_type")
    },

    // B7 DISTRIBUTION through the full BQL path: QUANTILE compiles to the
    // KLL sketch aggregate (k=65535 → exact below 65k rows, mergeable
    // O(k) state at 100 TB). The oracle reproduces the datasketches
    // INCLUSIVE-rank convention relationally (ceil(p*n)-th smallest),
    // same as b7_kll_quantile.
    QueryDef("bql_quantile", Some(
      """WITH s AS (SELECT value AS v,
        |    row_number() OVER (ORDER BY value) AS rn,
        |    count(*) OVER () AS n FROM events WHERE event_type = 'click'),
        |  p AS (SELECT unnest([0.25,0.5,0.75]) AS p)
        |SELECT CAST(p.p AS DOUBLE) AS quantile, min(s.v) AS q
        |FROM p, s WHERE s.rn >= ceil(p.p * s.n)
        |GROUP BY p.p ORDER BY quantile""".stripMargin)) { (s, d) =>
      bql(s, d, "events",
        "SELECT QUANTILE(value, 0.25, 0.5, 0.75) AS q FROM STREAM " +
          "WHERE event_type == 'click' ORDER BY quantile")
    },

    // B7 PMF through BQL: interval counts for split points 25/50/75 —
    // bin 0 = (-inf,25), bins 1-2 = [lo,hi), bin 3 = [75,inf). The batch
    // compilation is exact conditional counts (one partial+final agg).
    QueryDef("bql_pmf", Some(
      """WITH c AS (SELECT
        |  count(*) FILTER (WHERE value < 25) AS b0,
        |  count(*) FILTER (WHERE value >= 25 AND value < 50) AS b1,
        |  count(*) FILTER (WHERE value >= 50 AND value < 75) AS b2,
        |  count(*) FILTER (WHERE value >= 75) AS b3 FROM events)
        |SELECT unnest([0,1,2,3]) AS bin, unnest([b0,b1,b2,b3]) AS n
        |FROM c ORDER BY bin""".stripMargin)) { (s, d) =>
      bql(s, d, "events", "SELECT PMF(value, 25, 50, 75) AS n FROM STREAM ORDER BY bin")
    },

    // B7 CDF through BQL: cumulative counts at the same split points.
    QueryDef("bql_cdf", Some(
      """WITH c AS (SELECT
        |  count(*) FILTER (WHERE value <= 25) AS c0,
        |  count(*) FILTER (WHERE value <= 50) AS c1,
        |  count(*) FILTER (WHERE value <= 75) AS c2 FROM events)
        |SELECT CAST(unnest([25.0,50.0,75.0]) AS DOUBLE) AS point, unnest([c0,c1,c2]) AS n
        |FROM c ORDER BY point""".stripMargin)) { (s, d) =>
      bql(s, d, "events", "SELECT CDF(value, 25, 50, 75) AS n FROM STREAM ORDER BY point")
    },

    // B7 generated point specs (bullet-core's public forms beyond explicit
    // lists): QUANTILE(f, LINEAR, n) = n evenly spaced probabilities in
    // [0,1]; PMF/CDF(f, REGION, lo, hi, step) = static split points over
    // the value domain; PMF/CDF(f, LINEAR, n) = n points spanning the
    // DATA min..max, resolved at result time (the dynamic-domain form —
    // batch pays a broadcast 1-row min/max stats frame, streaming reads
    // min/max off the KLL sketch).
    QueryDef("bql_quantile_linear", Some(
      """WITH s AS (SELECT value AS v,
        |    row_number() OVER (ORDER BY value) AS rn,
        |    count(*) OVER () AS n FROM events),
        |  p AS (SELECT unnest([0.0,0.25,0.5,0.75,1.0]) AS p)
        |SELECT CAST(p.p AS DOUBLE) AS quantile, min(s.v) AS q
        |FROM p, s WHERE s.rn >= ceil(p.p * s.n)
        |GROUP BY p.p ORDER BY quantile""".stripMargin)) { (s, d) =>
      bql(s, d, "events",
        "SELECT QUANTILE(value, LINEAR, 5) AS q FROM STREAM ORDER BY quantile")
    },

    QueryDef("bql_pmf_region", Some(
      """WITH c AS (SELECT
        |  count(*) FILTER (WHERE value < 20) AS b0,
        |  count(*) FILTER (WHERE value >= 20 AND value < 40) AS b1,
        |  count(*) FILTER (WHERE value >= 40 AND value < 60) AS b2,
        |  count(*) FILTER (WHERE value >= 60 AND value < 80) AS b3,
        |  count(*) FILTER (WHERE value >= 80) AS b4 FROM events)
        |SELECT unnest([0,1,2,3,4]) AS bin, unnest([b0,b1,b2,b3,b4]) AS n
        |FROM c ORDER BY bin""".stripMargin)) { (s, d) =>
      bql(s, d, "events",
        "SELECT PMF(value, REGION, 20, 80, 20) AS n FROM STREAM ORDER BY bin")
    },

    QueryDef("bql_cdf_linear", Some(
      // the dynamic-domain form: points are lo + (hi-lo)*f for f in
      // {0, .25, .5, .75, 1} — both engines compute the identical
      // double expression, so the point column hash-compares exactly
      """WITH s AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
        |p AS (SELECT lo + (hi - lo) * f AS pt
        |      FROM s, (SELECT unnest([0.0,0.25,0.5,0.75,1.0]) AS f))
        |SELECT pt AS point,
        |  (SELECT count(*) FROM events WHERE value <= pt) AS n
        |FROM p ORDER BY point""".stripMargin)) { (s, d) =>
      bql(s, d, "events",
        "SELECT CDF(value, LINEAR, 5) AS n FROM STREAM ORDER BY point")
    },

    // LATERAL VIEW EXPLODE (bullet-bql's explode surface): unnest a
    // list-typed field to one row per element, with the alias visible to
    // WHERE/SELECT. CAST to DOUBLE is an exact float32 widening on both
    // engines, so the hash compare is deterministic with no float math.
    QueryDef("bql_explode", Some(
      """SELECT vec_id, CAST(e AS DOUBLE) AS ev, label
        |FROM (SELECT vec_id, label, unnest(embedding) AS e FROM embeddings)
        |WHERE e >= 0.3 ORDER BY vec_id, ev""".stripMargin)) { (s, d) =>
      bql(s, d, "embeddings",
        "SELECT vec_id, CAST(e, DOUBLE) AS ev, label FROM STREAM " +
          "LATERAL VIEW EXPLODE(embedding) AS e " +
          "WHERE e >= 0.3 ORDER BY vec_id, ev")
    },

    // SET through the text surface (B6 + the armed-modes lever): the BQL
    // theta knob raises the sketch's nominal entries (lgk 17 → 131072)
    // above the fixture's event_id cardinality (10k at sf0.01, 100k at
    // sf0.1), so the sketch answers EXACTLY and the DuckDB oracle
    // hash-matches at BOTH scales. At the default lgk=12 (4096 nominal)
    // this query would be an estimate at either SF — a passing oracle
    // therefore PROVES the SET statement reached the sketch.
    QueryDef("bql_set_distinct", Some(
      "SELECT count(DISTINCT event_id) AS n_events FROM events")) { (s, d) =>
      bql(s, d, "events",
        "SET spark.graft.bql.theta.lgk = 17; " +
          "SELECT COUNT(DISTINCT event_id) AS n_events FROM STREAM")
    },

    // SET tuning the KLL knob (B7): k=32768 covers the click subset at
    // both SFs (2006 / 19863 rows), so the sketch stays in its exact
    // regime and the inclusive-rank oracle hash-matches.
    QueryDef("bql_set_quantile", Some(
      """WITH s AS (SELECT value AS v,
        |    row_number() OVER (ORDER BY value) AS rn,
        |    count(*) OVER () AS n FROM events WHERE event_type = 'click'),
        |  p AS (SELECT unnest([0.1,0.9]) AS p)
        |SELECT CAST(p.p AS DOUBLE) AS quantile, min(s.v) AS q
        |FROM p, s WHERE s.rn >= ceil(p.p * s.n)
        |GROUP BY p.p ORDER BY quantile""".stripMargin)) { (s, d) =>
      bql(s, d, "events",
        "SET spark.graft.bql.kll.k = 32768; " +
          "SELECT QUANTILE(value, 0.1, 0.9) AS q FROM STREAM " +
          "WHERE event_type == 'click' ORDER BY quantile")
    },

    // B2 COPY-mode projection end-to-end: `SELECT *, expr AS x` keeps
    // every source column and appends computed ones — bullet-core's COPY
    // projection (vs PASSTHROUGH/NO_COPY), here one Catalyst projection
    // with the star expanded at compile time. IN-list predicate rides
    // along (compiles to a pushable OR chain). ts is exported as epoch
    // micros so the star expansion stays integer-exact on both engines.
    QueryDef("bql_copy_project", Some(
      """SELECT event_id, epoch_us(ts) AS ts, user_id, event_type, value, props,
        |  value * 0.5 + user_id AS score
        |FROM events WHERE event_type IN ('click', 'purchase')
        |ORDER BY event_id""".stripMargin)) { (s, d) =>
      import org.apache.spark.sql.functions.{col, unix_micros}
      val e = Tables.load(s, d, "events").withColumn("ts", unix_micros(col("ts")))
      Compiler.compile(
        "SELECT *, value * 0.5 + user_id AS score FROM STREAM " +
          "WHERE event_type IN ('click', 'purchase') ORDER BY event_id")._2(e)
    },

    // B11+B12 culling end-to-end: ORDER BY ... LIMIT through BQL must
    // compile to the top-n physical shape (TakeOrderedAndProject — heap
    // select per partition, merge k, never a global sort; plan-gated in
    // PlanSpec). Ties on value are broken by event_id so the k-row
    // result set is deterministic on both engines.
    QueryDef("bql_orderby_limit", Some(
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'purchase'
        |ORDER BY value DESC, event_id LIMIT 50""".stripMargin)) { (s, d) =>
      bql(s, d, "events",
        "SELECT event_id, user_id, value FROM STREAM " +
          "WHERE event_type == 'purchase' ORDER BY value DESC, event_id LIMIT 50")
    },

    // B3 scalar-expression breadth end-to-end: IF, JSON-path extraction +
    // CAST, XOR, RLIKE, BETWEEN and LIKE all through text → AST →
    // Catalyst. Every op maps to a built-in Column (when/otherwise,
    // get_json_object, =!=, rlike, between, like), so the whole predicate
    // stays inside codegen and the comparisons push toward the scan.
    // RLIKE is anchored (^...$) so Spark's find() and DuckDB's
    // regexp_matches agree; value is a double but only compared, never
    // aggregated, so the hash compare is exact.
    QueryDef("bql_expr_scalar", Some(
      """SELECT event_id,
        |  CASE WHEN value >= 50.0 THEN 'hi' ELSE 'lo' END AS band,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |  (value >= 50.0) != (user_id % 2 = 0) AS flip
        |FROM events
        |WHERE regexp_matches(event_type, '^(click|view)$')
        |  AND value BETWEEN 20.0 AND 80.0 AND props LIKE '%k%'
        |ORDER BY event_id""".stripMargin)) { (s, d) =>
      bql(s, d, "events",
        "SELECT event_id, IF(value >= 50.0, 'hi', 'lo') AS band, " +
          "CAST(JSON(props, '$.k'), INTEGER) AS k, " +
          "(value >= 50.0) XOR (user_id % 2 == 0) AS flip " +
          "FROM STREAM WHERE event_type RLIKE '^(click|view)$' " +
          "AND value BETWEEN 20.0 AND 80.0 AND props LIKE '%k%' " +
          "ORDER BY event_id")
    },

    // B3 collection ops end-to-end: SIZEIS, 0-based element access,
    // SIZEOF, and both quantified comparisons over a list-typed field —
    // `ANY` compiles to a codegen'd exists(), `ALL` to forall() (the
    // literal-list form expands to OR/AND chains that push down; this is
    // the field-of-list form, which can't). Element 0 is CAST to DOUBLE —
    // an exact float32 widening on both engines, no float arithmetic.
    QueryDef("bql_expr_collection", Some(
      """SELECT vec_id, label, CAST(embedding[1] AS DOUBLE) AS e0,
        |  CAST(len(embedding) AS INTEGER) AS n_dims
        |FROM embeddings
        |WHERE len(embedding) = 64
        |  AND len(list_filter(embedding, x -> 0.35 <= x)) > 0
        |  AND len(list_filter(embedding, x -> -0.35 < x)) = len(embedding)
        |ORDER BY vec_id""".stripMargin)) { (s, d) =>
      bql(s, d, "embeddings",
        "SELECT vec_id, label, CAST(embedding[0], DOUBLE) AS e0, " +
          "SIZEOF(embedding) AS n_dims " +
          "FROM STREAM WHERE SIZEIS(embedding, 64) " +
          "AND 0.35 <= ANY embedding AND -0.35 < ALL embedding " +
          "ORDER BY vec_id")
    },

    // ---- the LLM-pipeline verbs as query text (round-15 demand #7):
    // the three a data engineer reaches for first, each traversing the
    // full text → AST → Catalyst path and sharing its Scala twin's
    // oracle semantics verbatim ----

    // dd_exact as BQL: DEDUPE(content, id) → one content-hash groupBy
    QueryDef("bql_dedupe", Some(
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin)) { (s, d) =>
      bql(s, d, "documents",
        "SELECT DEDUPE(text, doc_id) FROM STREAM ORDER BY keep_id")
    },

    // srch_bm25 as BQL: SEARCH('terms', k) → the shared BM25 ranking
    // tree (same terms/k as the Scala twin → same oracle, shared val)
    QueryDef("bql_search", Some(SearchQueries.bm25Sql)) { (s, d) =>
      bql(s, d, "documents",
        "SELECT SEARCH('spark merge window', 25) FROM STREAM")
    },

    // samp_hash_sample as BQL: SAMPLE(frac, content) as a WHERE
    // predicate — round(0.1·256) = 26 = 0x1a, the Scala twin's cut,
    // so the oracle is shared verbatim
    QueryDef("bql_sample", Some(
      """SELECT doc_id, lang FROM documents
        |WHERE substr(md5(text), 1, 2) < '1a' ORDER BY doc_id""".stripMargin)) { (s, d) =>
      bql(s, d, "documents",
        "SELECT doc_id, lang FROM STREAM WHERE SAMPLE(0.1, text) ORDER BY doc_id")
    },

    // ---- round-15 continuation: the pipeline CLASSIFIERS as scalar
    // verbs (graft.functions.TextFns kernels — the SAME vals the Scala
    // surface and these oracles are generated from, so they cannot
    // drift). Scalars, not aggregates: they compose inside WHERE and
    // projections, which is how a curation pipeline actually uses them
    // ("keep docs where QUALITY(text) >= 2 and LANGID(text) == 'en'").

    // tx_langid as a BQL scalar: LANGID(text) → lexicon-hit argmax
    QueryDef("bql_langid", Some(
      graft.functions.TextFns.sqlLangId + " ORDER BY doc_id")) { (s, d) =>
      bql(s, d, "documents",
        "SELECT doc_id, LANGID(text) AS lang_pred FROM STREAM ORDER BY doc_id")
    },

    // QUALITY as a verb USED IN THE FILTER — the curation gate shape
    QueryDef("bql_quality_gate", Some(
      s"""SELECT doc_id, ${graft.functions.TextFns.sqlQuality} AS q
         |FROM documents
         |WHERE ${graft.functions.TextFns.sqlQuality} >= 2
         |ORDER BY doc_id""".stripMargin)) { (s, d) =>
      bql(s, d, "documents",
        "SELECT doc_id, QUALITY(text) AS q FROM STREAM " +
          "WHERE QUALITY(text) >= 2 ORDER BY doc_id")
    },

    // TOKENS as both projection and budget predicate — the context-
    // window screen ("docs that fit")
    QueryDef("bql_token_budget", Some(
      s"""SELECT doc_id, ${graft.functions.TextFns.sqlTokenCount} AS n_tok
         |FROM documents
         |WHERE ${graft.functions.TextFns.sqlTokenCount} BETWEEN 40 AND 90
         |ORDER BY doc_id""".stripMargin)) { (s, d) =>
      bql(s, d, "documents",
        "SELECT doc_id, TOKENS(text) AS n_tok FROM STREAM " +
          "WHERE TOKENS(text) >= 40 AND TOKENS(text) <= 90 ORDER BY doc_id")
    }
  )
}
