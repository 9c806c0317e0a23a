package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Scalar-function breadth (SURVEY.md §2.C: the reference has NO date/time
  * functions — time is epoch longs — and no string/math library beyond B3;
  * our engine exposes Spark's function library, sampled here under the
  * oracle).
  *
  * Function choice is deliberately restricted to cross-engine-deterministic
  * operations: date part extraction, string surgery, integer math, and
  * sqrt (IEEE-754 requires correct rounding for sqrt — unlike ln/exp/pow,
  * which vary by libm and are kept out of oracle-checked outputs).
  */
object FunctionQueries {

  val defs: Seq[QueryDef] = Seq(

    QueryDef("fn_datetime", Some(
      """SELECT event_id,
        |  CAST(year(ts) AS BIGINT) AS y, CAST(month(ts) AS BIGINT) AS mo,
        |  CAST(day(ts) AS BIGINT) AS d, CAST(hour(ts) AS BIGINT) AS h,
        |  strftime(ts, '%Y-%m-%d') AS dday,
        |  CAST(epoch_ms(date_trunc('second', ts)) / 1000 AS BIGINT) AS epoch_s
        |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin)) { (s, d) =>
      Tables.load(s, d, "events")
        .filter(col("event_id") < 2000)
        .select(
          col("event_id"),
          year(col("ts")).cast(LongType).as("y"),
          month(col("ts")).cast(LongType).as("mo"),
          dayofmonth(col("ts")).cast(LongType).as("d"),
          hour(col("ts")).cast(LongType).as("h"),
          date_format(col("ts"), "yyyy-MM-dd").as("dday"),
          unix_timestamp(date_trunc("second", col("ts"))).as("epoch_s"))
        .orderBy(col("event_id"))
    },

    QueryDef("fn_string_math", Some(
      """SELECT event_id,
        |  substr(event_type, 1, 2) AS pre,
        |  replace(event_type, 'c', 'k') AS repl,
        |  reverse(event_type) AS rev,
        |  lpad(CAST(user_id AS VARCHAR), 6, '0') AS padded,
        |  concat(event_type, '-', CAST(user_id AS VARCHAR)) AS tag,
        |  CAST(floor(value) AS BIGINT) AS fl, CAST(ceil(value) AS BIGINT) AS ce,
        |  event_id % 7 AS m7,
        |  sqrt(CAST(user_id AS DOUBLE)) AS sq
        |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin)) { (s, d) =>
      Tables.load(s, d, "events")
        .filter(col("event_id") < 2000)
        .select(
          col("event_id"),
          substring(col("event_type"), 1, 2).as("pre"),
          regexp_replace(col("event_type"), "c", "k").as("repl"),
          reverse(col("event_type")).as("rev"),
          lpad(col("user_id").cast(StringType), 6, "0").as("padded"),
          concat(col("event_type"), lit("-"), col("user_id").cast(StringType)).as("tag"),
          floor(col("value")).cast(LongType).as("fl"),
          ceil(col("value")).cast(LongType).as("ce"),
          (col("event_id") % 7).as("m7"),
          sqrt(col("user_id").cast(DoubleType)).as("sq"))
        .orderBy(col("event_id"))
    },

    // Feature standardization (z-score) — the numeric-feature prep pass of
    // an ML pipeline. Population mean/std are computed from EXACT integer
    // sums (n, Σx, Σx² as BIGINTs — p_size is an int column), so every
    // downstream double op (division, sqrt — both IEEE-correctly-rounded)
    // is bit-identical cross-engine; the engines' own stddev() aggregates
    // are deliberately avoided (float summation order varies). Shape: one
    // map-side-combined stats aggregate broadcast back over one linear
    // pass — the same two-scan stats-then-apply pattern as srch_bm25.
    // The zero-variance guard is integer-exact (n·Σx² = (Σx)² ⟺ σ = 0 —
    // no float epsilon), mapping a constant feature to z = 0 on both
    // sides; without it Spark emits NaN where DuckDB's double 0/0 is
    // NULL. (At extreme scale (Σx)² can outgrow BIGINT — a deployment
    // with columns that hot switches s1/s2 to DECIMAL(38,0).)
    QueryDef("fn_zscore", Some(
      """WITH st AS (SELECT count(*) AS n, CAST(sum(p_size) AS BIGINT) AS s1,
        |    CAST(sum(p_size * p_size) AS BIGINT) AS s2 FROM part)
        |SELECT p_partkey, p_size,
        |  CASE WHEN n * s2 = s1 * s1 THEN 0.0
        |    ELSE (p_size - CAST(s1 AS DOUBLE)/n)
        |      / sqrt(CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n) * (CAST(s1 AS DOUBLE)/n)) END AS z
        |FROM part CROSS JOIN st ORDER BY p_partkey""".stripMargin)) { (s, d) =>
      val part = Tables.load(s, d, "part")
      val x = col("p_size").cast(LongType)
      val st = part.agg(count(lit(1)).as("n"), sum(x).as("s1"), sum(x * x).as("s2"))
      val mu = col("s1").cast(DoubleType) / col("n")
      part.crossJoin(broadcast(st))
        .select(col("p_partkey"), col("p_size"),
          when(col("n") * col("s2") === col("s1") * col("s1"), 0.0)
            .otherwise((col("p_size") - mu) /
              sqrt(col("s2").cast(DoubleType) / col("n") - mu * mu)).as("z"))
        .orderBy(col("p_partkey"))
    },

    // Fixed-width histogram — numeric profiling over a double column.
    // Bounds come from min/max (exact — no summation), the bucket index
    // from one deterministic floor; the top edge clamps into the last
    // bucket, and a degenerate all-equal column (hi = lo → width 0, a 0/0
    // NaN whose long-cast would throw under ANSI) collapses to bucket 0
    // on both sides. Two linear scans (bounds, then assign+count), the
    // 1-row bounds frame broadcast; the bucket aggregate is 16 groups.
    QueryDef("fn_histogram", Some(
      """WITH st AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders),
        |b AS (SELECT CASE WHEN hi = lo THEN 0
        |      ELSE least(CAST(floor((o_totalprice - lo) / ((hi - lo) / 16)) AS BIGINT), 15) END AS bucket,
        |    lo, hi FROM orders CROSS JOIN st)
        |SELECT bucket, count(*) AS n,
        |  min(lo + bucket * ((hi - lo) / 16)) AS bucket_lo
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin)) { (s, d) =>
      val orders = Tables.load(s, d, "orders")
      val st = orders.agg(min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
      val w = (col("hi") - col("lo")) / 16
      orders.crossJoin(broadcast(st))
        .select(when(col("hi") === col("lo"), 0L)
          .otherwise(least(floor((col("o_totalprice") - col("lo")) / w).cast(LongType), lit(15L)))
          .as("bucket"), col("lo"), col("hi"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("lo") + col("bucket") * ((col("hi") - col("lo")) / 16)).as("bucket_lo"))
        .orderBy(col("bucket"))
    },

    // Higher-order array-function breadth: transform / filter / aggregate
    // / zip_with / reverse / array_distinct / array_max composed over a
    // per-row token-length array. These are the collection primitives a
    // feature-engineering pass leans on (per-row vectors, no explode —
    // the array never leaves the row, so a 100 TB corpus is one linear
    // codegen'd scan with zero shuffles; ORDER BY is oracle determinism
    // only). All-integer arithmetic so the oracle compare is exact.
    QueryDef("fn_array", Some(
      """WITH g AS (SELECT doc_id, list_transform(string_split(text,' '), x -> length(x)) AS lens FROM documents)
        |SELECT doc_id,
        |  CAST(len(lens) AS BIGINT) AS n_tokens,
        |  CAST(len(list_filter(lens, x -> x > 4)) AS BIGINT) AS n_long,
        |  CAST(list_sum(lens) AS BIGINT) AS total_chars,
        |  CAST(list_max(lens) AS BIGINT) AS longest,
        |  CAST(len(list_distinct(lens)) AS BIGINT) AS n_distinct_lens,
        |  CAST(list_sum(list_transform(list_zip(lens, list_reverse(lens)), x -> x[1]*x[2])) AS BIGINT) AS rev_dot
        |FROM g ORDER BY doc_id""".stripMargin)) { (s, d) =>
      val lens = transform(split(col("text"), " "), x => length(x))
      Tables.load(s, d, "documents")
        .select(col("doc_id"), lens.as("lens"))
        .select(col("doc_id"),
          size(col("lens")).cast(LongType).as("n_tokens"),
          size(filter(col("lens"), x => x > 4)).cast(LongType).as("n_long"),
          aggregate(col("lens"), lit(0L), (acc, x) => acc + x).as("total_chars"),
          array_max(col("lens")).cast(LongType).as("longest"),
          size(array_distinct(col("lens"))).cast(LongType).as("n_distinct_lens"),
          aggregate(zip_with(col("lens"), reverse(col("lens")), (a, b) => (a * b).cast(LongType)),
            lit(0L), (acc, x) => acc + x).as("rev_dot"))
        .orderBy(col("doc_id"))
    },

    // Map-typed column breadth: build a per-doc term-frequency map
    // row-locally (map_from_arrays over the distinct tokens — per-row
    // cost |tokens|·|doc vocab|, bounded by doc length squared, zero
    // shuffles, no explode) and interrogate it with the map surface:
    // size, element_at, map_filter, map_values, map_contains_key. This
    // is the feature-dictionary shape (sparse per-row features keyed by
    // string) a training pipeline carries; the oracle rebuilds the same
    // stats relationally from unnested tokens. All-integer outputs.
    QueryDef("fn_map", Some(
      """WITH g AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents),
        |c AS (SELECT doc_id, tok, count(*) AS c FROM g GROUP BY 1, 2)
        |SELECT doc_id, CAST(count(*) AS INTEGER) AS n_distinct,
        |  CAST(coalesce(max(CASE WHEN tok = 'table' THEN c END), 0) AS BIGINT) AS tf_table,
        |  CAST(count(*) FILTER (WHERE c = 1) AS INTEGER) AS n_hapax,
        |  CAST(max(c) AS BIGINT) AS max_tf,
        |  CAST(sum(c) AS BIGINT) AS n_tokens,
        |  coalesce(bool_or(tok = 'spark'), false) AS has_spark
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin)) { (s, d) =>
      val t = split(col("text"), " ")
      val uniq = array_distinct(t)
      val tf = map_from_arrays(uniq, transform(uniq, x => size(filter(t, y => y === x))))
      // the per-doc tf map is the scan-side CPU hog and the fixture scan
      // is ONE task (single row group) — spread to the session's cores
      // before the expensive projection (profiled: two ~0.9 s single-task
      // jobs, the orderBy's range-sampling pass evaluates it twice)
      graft.operators.Spread.toCores(Tables.load(s, d, "documents")
          .select(col("doc_id"), col("text")))
        .select(col("doc_id"), tf.as("tf"))
        .select(col("doc_id"),
          size(col("tf")).as("n_distinct"),
          coalesce(element_at(col("tf"), lit("table")), lit(0)).cast(LongType).as("tf_table"),
          size(map_filter(col("tf"), (_, v) => v === 1)).as("n_hapax"),
          array_max(map_values(col("tf"))).cast(LongType).as("max_tf"),
          aggregate(map_values(col("tf")), lit(0L), (a, x) => a + x).as("n_tokens"),
          map_contains_key(col("tf"), "spark").as("has_spark"))
        .orderBy(col("doc_id"))
    },

    // Quantile binning (feature prep): per-SOURCE length deciles — the
    // discretization step before bucketed training features or stratified
    // length sampling. Scale shape: `source` is a LOW-cardinality key
    // (~tens of values in a real corpus), so a per-source ntile window
    // would sort each stratum's entire document set in ONE task — a
    // parallelism ceiling no cluster size fixes. Instead the per-source
    // decile CUT POINTS come from one mergeable KLL sketch per source
    // (exact below 65k rows/group, inclusive-rank convention — the same
    // fn_winsorize uses and the b7 oracles reproduce), then the tiny
    // |sources|×9 cuts frame broadcast-joins back for a shuffle-free,
    // sort-free binning pass: decile(x) = 1 + |{cuts c : c < x}|.
    // Value-based assignment means ties share a decile (the statistically
    // right call for discretization); the oracle states the identical
    // bounds-based rule, and the integer domain makes the double->long
    // cut-point cast exact.
    QueryDef("fn_quantile_bin", Some(
      """WITH r AS (SELECT source, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
        |    count(*) OVER (PARTITION BY source) AS n FROM documents),
        |q AS (SELECT source,
        |    min(CASE WHEN rn >= ceil(0.1 * n) THEN n_chars END) AS c1,
        |    min(CASE WHEN rn >= ceil(0.2 * n) THEN n_chars END) AS c2,
        |    min(CASE WHEN rn >= ceil(0.3 * n) THEN n_chars END) AS c3,
        |    min(CASE WHEN rn >= ceil(0.4 * n) THEN n_chars END) AS c4,
        |    min(CASE WHEN rn >= ceil(0.5 * n) THEN n_chars END) AS c5,
        |    min(CASE WHEN rn >= ceil(0.6 * n) THEN n_chars END) AS c6,
        |    min(CASE WHEN rn >= ceil(0.7 * n) THEN n_chars END) AS c7,
        |    min(CASE WHEN rn >= ceil(0.8 * n) THEN n_chars END) AS c8,
        |    min(CASE WHEN rn >= ceil(0.9 * n) THEN n_chars END) AS c9
        |  FROM r GROUP BY source)
        |SELECT d.doc_id, d.source, d.n_chars,
        |  CAST(1 + CASE WHEN d.n_chars > q.c1 THEN 1 ELSE 0 END
        |     + CASE WHEN d.n_chars > q.c2 THEN 1 ELSE 0 END
        |     + CASE WHEN d.n_chars > q.c3 THEN 1 ELSE 0 END
        |     + CASE WHEN d.n_chars > q.c4 THEN 1 ELSE 0 END
        |     + CASE WHEN d.n_chars > q.c5 THEN 1 ELSE 0 END
        |     + CASE WHEN d.n_chars > q.c6 THEN 1 ELSE 0 END
        |     + CASE WHEN d.n_chars > q.c7 THEN 1 ELSE 0 END
        |     + CASE WHEN d.n_chars > q.c8 THEN 1 ELSE 0 END
        |     + CASE WHEN d.n_chars > q.c9 THEN 1 ELSE 0 END AS BIGINT) AS decile
        |FROM documents d JOIN q USING (source) ORDER BY d.doc_id""".stripMargin)) { (s, d) =>
      val docs = Tables.load(s, d, "documents")
      val cuts = docs.groupBy(col("source"))
        .agg(expr("kll_sketch_get_quantile_double(" +
          "kll_sketch_agg_double(CAST(n_chars AS DOUBLE), 65535), " +
          "array(0.1D, 0.2D, 0.3D, 0.4D, 0.5D, 0.6D, 0.7D, 0.8D, 0.9D))").as("qs"))
        .select(col("source"), transform(col("qs"), x => x.cast(LongType)).as("cuts"))
      docs.join(broadcast(cuts), Seq("source"))
        .select(col("doc_id"), col("source"), col("n_chars"),
          (lit(1) + size(filter(col("cuts"), c => c < col("n_chars")))).cast(LongType).as("decile"))
        .orderBy(col("doc_id"))
    },

    // Per-group winsorization (percentile clamp) — the outlier-taming
    // step feature prep runs before z-scoring or bucketing: clamp each
    // doc's length to its language's [p05, p95]. Scale shape: the
    // per-group bounds come from ONE mergeable KLL sketch per group
    // (exact below 65k rows/group — the same inclusive-rank convention
    // the b7 oracles reproduce), then the tiny |groups|-row bounds frame
    // broadcast-joins back onto the corpus for a shuffle-free clamp pass.
    // Integer domain end to end: the quantile of an integer column is an
    // actual data value, so the double->long cast is exact and the
    // greatest/least clamp hash-compares exactly.
    QueryDef("fn_winsorize", Some(
      """WITH r AS (SELECT lang, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n FROM documents),
        |q AS (SELECT lang,
        |    min(CASE WHEN rn >= ceil(0.05 * n) THEN n_chars END) AS lo,
        |    min(CASE WHEN rn >= ceil(0.95 * n) THEN n_chars END) AS hi
        |  FROM r GROUP BY lang)
        |SELECT d.doc_id, d.lang, d.n_chars, q.lo, q.hi,
        |  greatest(q.lo, least(q.hi, d.n_chars)) AS clamped
        |FROM documents d JOIN q USING (lang) ORDER BY d.doc_id""".stripMargin)) { (s, d) =>
      val docs = Tables.load(s, d, "documents")
      val q = docs.groupBy(col("lang"))
        .agg(expr("kll_sketch_get_quantile_double(" +
          "kll_sketch_agg_double(CAST(n_chars AS DOUBLE), 65535), array(0.05D, 0.95D))").as("qs"))
        .select(col("lang"),
          element_at(col("qs"), 1).cast(LongType).as("lo"),
          element_at(col("qs"), 2).cast(LongType).as("hi"))
      docs.join(broadcast(q), Seq("lang"))
        .select(col("doc_id"), col("lang"), col("n_chars"), col("lo"), col("hi"),
          greatest(col("lo"), least(col("hi"), col("n_chars"))).as("clamped"))
        .orderBy(col("doc_id"))
    },

    // Robust (median/MAD) z-score — the outlier-resistant twin of
    // fn_zscore: per-language median via one mergeable KLL sketch, then
    // MAD = median(|x - med|) via a SECOND KLL pass over the deviations,
    // both broadcast back as |groups|-row frames for a shuffle-free
    // scoring pass. Mean/stddev scaling (fn_zscore) lets one runaway
    // outlier drag the whole stratum's scale; median/MAD is what quality
    // filters actually threshold on. Two corpus scans, zero corpus-keyed
    // shuffles — each KLL aggregate combines map-side (exact below 65k
    // rows/group, mergeable beyond; the same inclusive-rank convention
    // fn_winsorize pins). Integer domain end to end: the median of an
    // integer column is a data value (exact long cast), deviations are
    // integers, and the final (x-med)/mad is one long/long double
    // division — correctly rounded identically in both engines. mad = 0
    // (a constant-valued stratum) yields NULL, not a division blow-up.
    QueryDef("fn_robust_zscore", Some(
      """WITH r AS (SELECT lang, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n FROM documents),
        |m AS (SELECT lang,
        |    min(CASE WHEN rn >= ceil(0.5 * n) THEN n_chars END) AS med
        |  FROM r GROUP BY lang),
        |v AS (SELECT d.lang, abs(d.n_chars - m.med) AS dev
        |  FROM documents d JOIN m USING (lang)),
        |s AS (SELECT lang, dev,
        |    row_number() OVER (PARTITION BY lang ORDER BY dev) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n FROM v),
        |q AS (SELECT lang,
        |    min(CASE WHEN rn >= ceil(0.5 * n) THEN dev END) AS mad
        |  FROM s GROUP BY lang)
        |SELECT d.doc_id, d.lang, d.n_chars, m.med, q.mad,
        |  CASE WHEN q.mad = 0 THEN NULL
        |       ELSE CAST(d.n_chars - m.med AS DOUBLE) / q.mad END AS robust_z
        |FROM documents d JOIN m USING (lang) JOIN q USING (lang)
        |ORDER BY d.doc_id""".stripMargin)) { (s, d) =>
      val docs = Tables.load(s, d, "documents")
      def kllMedian(in: org.apache.spark.sql.DataFrame, valueCol: String, out: String) =
        in.groupBy(col("lang"))
          .agg(expr("kll_sketch_get_quantile_double(" +
            s"kll_sketch_agg_double(CAST($valueCol AS DOUBLE), 65535), array(0.5D))").as("qs"))
          .select(col("lang"), element_at(col("qs"), 1).cast(LongType).as(out))
      val med = kllMedian(docs, "n_chars", "med")
      val withMed = docs.join(broadcast(med), Seq("lang"))
        .withColumn("dev", abs(col("n_chars") - col("med")))
      val mad = kllMedian(withMed, "dev", "mad")
      withMed.join(broadcast(mad), Seq("lang"))
        .select(col("doc_id"), col("lang"), col("n_chars"), col("med"), col("mad"),
          when(col("mad") === 0, lit(null).cast("double"))
            .otherwise((col("n_chars") - col("med")).cast("double") / col("mad"))
            .as("robust_z"))
        .orderBy(col("doc_id"))
    },

    // Smoothed target encoding — the categorical-feature workhorse:
    // replace a category (source) with the smoothed mean of a numeric
    // target over that category, enc = (sum_s + prior·m)/(n_s + m)
    // (prior = global mean, m = 20 pseudo-counts), plus the
    // LEAVE-ONE-OUT variant real pipelines train on (each row's own
    // target subtracted, killing self-leakage). n_chars stands in for
    // the target; a real deployment swaps the column. Scale shape: one
    // map-side-combining aggregate for the per-category sums, a 1-row
    // global frame and a |categories|-row encoder frame both broadcast
    // back, then a shuffle-free codegen scoring pass. Determinism: all
    // sums/counts are integer-exact, and the final doubles come from a
    // FIXED tree of individually-correctly-rounded IEEE ops evaluated
    // identically by both engines — no float summation ever happens.
    QueryDef("fn_target_encode", Some(
      """WITH g AS (SELECT sum(n_chars) AS gsum, count(*) AS gn FROM documents),
        |a AS (SELECT source, sum(n_chars) AS ssum, count(*) AS n
        |      FROM documents GROUP BY source)
        |SELECT d.doc_id, d.source, d.n_chars,
        |  (CAST(a.ssum AS DOUBLE) + (CAST(g.gsum AS DOUBLE) / g.gn) * 20.0)
        |    / (a.n + 20.0) AS enc,
        |  (CAST(a.ssum - d.n_chars AS DOUBLE) + (CAST(g.gsum AS DOUBLE) / g.gn) * 20.0)
        |    / (a.n - 1 + 20.0) AS enc_loo
        |FROM documents d JOIN a USING (source) CROSS JOIN g
        |ORDER BY d.doc_id""".stripMargin)) { (s, d) =>
      val docs = Tables.load(s, d, "documents")
      val g = docs.agg(sum(col("n_chars")).as("gsum"), count(lit(1)).as("gn"))
      val a = docs.groupBy(col("source"))
        .agg(sum(col("n_chars")).as("ssum"), count(lit(1)).as("n"))
      val prior = (col("gsum").cast("double") / col("gn")) * 20.0
      val encTable = a.crossJoin(broadcast(g))
        .select(col("source"), col("ssum"), col("n"),
          ((col("ssum").cast("double") + prior) / (col("n") + 20.0)).as("enc"),
          prior.as("p20"))
      docs.join(broadcast(encTable), Seq("source"))
        .select(col("doc_id"), col("source"), col("n_chars"), col("enc"),
          (((col("ssum") - col("n_chars")).cast("double") + col("p20"))
            / (col("n") - 1 + 20.0)).as("enc_loo"))
        .orderBy(col("doc_id"))
    },

    // Feature hashing (the "hashing trick", Weinberger et al. 2009,
    // public literature): project each document's bag-of-tokens into a
    // FIXED 64-bucket space by hashing tokens — the unbounded-vocabulary
    // featurizer linear classifiers and quality filters train on, with
    // no vocabulary table to build, ship, or look up. Scale shape:
    // ENTIRELY row-local — md5 each token once, fold the bucket array
    // into 64 counts inside the row, posexplode the non-zero slots. Zero
    // shuffles, zero joins, zero driver state; at 100 TB this is a pure
    // codegen map over the corpus (the ORDER BY is oracle determinism
    // only). The bucket function is the first 4 hex chars of md5 mod 64
    // — cross-engine exact (Spark conv(hex,16,10) ≡ the oracle's
    // digit-wise strpos expansion), unlike xxhash64/murmur whose seeds
    // differ per engine.
    QueryDef("fn_feature_hash", Some(
      """WITH g AS (SELECT doc_id, unnest(string_split(text,' ')) AS t FROM documents),
        |h AS (SELECT doc_id,
        |   ((strpos('0123456789abcdef', substr(md5(t),1,1))-1)*4096
        |   +(strpos('0123456789abcdef', substr(md5(t),2,1))-1)*256
        |   +(strpos('0123456789abcdef', substr(md5(t),3,1))-1)*16
        |   +(strpos('0123456789abcdef', substr(md5(t),4,1))-1)) % 64 AS bucket
        | FROM g)
        |SELECT doc_id, CAST(bucket AS BIGINT) AS bucket, count(*) AS cnt
        |FROM h GROUP BY doc_id, bucket ORDER BY doc_id, bucket""".stripMargin)) { (s, d) =>
      // one imperative O(tokens) pass per row inside codegen
      // (functions.Md5BucketCounts) — replaced the filter-per-bucket HOF
      // shape, which paid O(nBuckets·tokens) per row. Still entirely
      // row-local: zero shuffles at any corpus size.
      val nBuckets = 64
      val counts = graft.functions.md5_bucket_counts(split(col("text"), " "), nBuckets)
      Tables.load(s, d, "documents")
        .select(col("doc_id"), explode(counts).as("r"))
        .select(col("doc_id"), col("r.bucket").as("bucket"), col("r.cnt").as("cnt"))
        .orderBy(col("doc_id"), col("bucket"))
    }
  )
}
