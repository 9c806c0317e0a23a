package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic sampling and dataset splitting — the selection ops a
  * training-data pipeline runs constantly. Randomness comes from a
  * content hash, not an RNG: the same row lands in the same
  * sample/split on every engine, every run, every cluster size (an RNG
  * sample is neither reproducible across partitionings nor
  * oracle-checkable). Hex-string comparison on md5 gives a uniform
  * selector available identically in Spark and DuckDB.
  */
object SamplingQueries {

  val defs: Seq[QueryDef] = Seq(

    // ~10% deterministic sample: md5 hex < '1a' (26/256 of the first-byte
    // space ≈ 10.2%). Content-hash keyed → stable under repartitioning.
    QueryDef("samp_hash_sample", Some(
      """SELECT doc_id, lang FROM documents
        |WHERE substr(md5(text), 1, 2) < '1a' ORDER BY doc_id""".stripMargin)) { (s, d) =>
      Tables.load(s, d, "documents")
        .filter(substring(md5(col("text")), 1, 2) < "1a")
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    },

    // Train/val/test split (80/10/10) keyed on content hash; per-split
    // per-language counts — the split-manifest a data pipeline materializes.
    QueryDef("samp_train_val_test", Some(
      """SELECT split, lang, count(*) AS n FROM (
        |  SELECT lang,
        |    CASE WHEN substr(md5(text), 1, 2) < 'cd' THEN 'train'
        |         WHEN substr(md5(text), 1, 2) < 'e7' THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |GROUP BY split, lang ORDER BY split, lang""".stripMargin)) { (s, d) =>
      val h = substring(md5(col("text")), 1, 2)
      Tables.load(s, d, "documents")
        .withColumn("split",
          when(h < "cd", "train").when(h < "e7", "val").otherwise("test"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("split"), col("lang"))
    },

    // Stratified sample: exactly min(50, |stratum|) docs per language,
    // chosen by hash rank within the stratum — the balanced-subset draw
    // that counters corpus language skew. Two-phase selection: a single
    // per-stratum window would funnel each language (~1/5 of the corpus)
    // into ONE sort task at scale, so phase 1 ranks within (stratum,
    // salt) — `spark.graft.stratifiedSaltBuckets` (default 64) × the
    // parallelism, each task sorting ~1/(strata·salts) of the corpus —
    // and keeps k rows per salted group. The global per-stratum top-k is
    // necessarily inside those survivors, so phase 2's exact rank runs
    // over ≤ k·salts rows per stratum (tiny at any corpus size). Same
    // rows as the one-window form; the oracle keeps the simple shape.
    QueryDef("samp_stratified", Some(
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 50 ORDER BY doc_id""".stripMargin)) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val k = 50
      val salts = s.conf.get("spark.graft.stratifiedSaltBuckets", "64").toInt
      val base = Tables.load(s, d, "documents").select(
        col("doc_id"), col("lang"), md5(col("text")).as("h"),
        pmod(xxhash64(col("doc_id")), lit(salts)).as("salt"))
      val w1 = Window.partitionBy(col("lang"), col("salt"))
        .orderBy(col("h"), col("doc_id"))
      val survivors = base
        .withColumn("rk1", row_number().over(w1)).filter(col("rk1") <= k)
      val w2 = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
      survivors
        .withColumn("rk", row_number().over(w2)).filter(col("rk") <= k)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    },

    // Mixture-weighted sampling: resample the corpus toward a target
    // domain mixture (the pretraining "data mixing" step — up/down-weight
    // sources to hit prescribed proportions). Each source carries a keep
    // rate from a mixture config; selection is the same content-hash
    // threshold as samp_hash_sample, so the draw is deterministic and
    // stable under repartitioning. The config is a lookup TABLE joined in
    // (broadcast — it is O(#sources), never data-sized), not a baked-in
    // CASE: a real pipeline feeds rates from a config store, and the join
    // keeps the plan identical whether there are 20 sources or 20,000.
    // Rates here: source id mod 4 → keep all / ~50% / ~25% / ~10%.
    QueryDef("samp_mixture", Some(
      """SELECT doc_id, source FROM documents
        |WHERE substr(md5(text), 1, 2) <
        |  CASE CAST(substr(source, 4) AS INTEGER) % 4
        |    WHEN 0 THEN 'g' WHEN 1 THEN '80' WHEN 2 THEN '40' ELSE '1a' END
        |ORDER BY doc_id""".stripMargin)) { (s, d) =>
      val thresholds = Seq("g", "80", "40", "1a")
      val rates = s.createDataFrame(
        (0 until 20).map(i => (s"src$i", thresholds(i % 4)))).toDF("source", "keep_below")
      Tables.load(s, d, "documents")
        .join(broadcast(rates), Seq("source"))
        .filter(substring(md5(col("text")), 1, 2) < col("keep_below"))
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    },

    // Token-budget shard packing: assign each doc to a ~4096-token shard
    // within a hash bucket — how a pipeline materializes training shards
    // of bounded context length. Running token sum per bucket (buckets
    // pack in parallel, shard ids are (bucket, shard) pairs),
    // start-offset based so a doc belongs to the shard its first token
    // lands in. The bucket is an md5-hex PREFIX whose width scales with
    // input volume: a fixed 16-way bucket is a hard 16-task parallelism
    // ceiling at scale, so the width grows (16^w buckets) until the
    // expected bucket population fits `spark.graft.packMaxRowsPerBucket`
    // (default 256k rows ≈ one comfortably sorted window task); set
    // `spark.graft.packBucketChars` to pin it. The fixture sizes derive
    // width 1, which is what the static oracle SQL encodes.
    QueryDef("tx_pack_shards", Some(
      """SELECT doc_id, bucket, CAST(floor((cum - tokens) / 4096) AS BIGINT) AS shard, tokens
        |FROM (
        |  SELECT doc_id, bucket, tokens,
        |    sum(tokens) OVER (PARTITION BY bucket ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM (
        |    SELECT doc_id, substr(md5(text), 1, 1) AS bucket, md5(text) AS h,
        |      len(string_split(text, ' ')) AS tokens
        |    FROM documents))
        |ORDER BY doc_id""".stripMargin)) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.load(s, d, "documents")
      val chars = packBucketChars(s, () => docs.count())
      val base = docs.select(
        col("doc_id"),
        substring(md5(col("text")), 1, chars).as("bucket"),
        md5(col("text")).as("h"),
        size(split(col("text"), " ")).cast("long").as("tokens"))
      val w = Window.partitionBy(col("bucket")).orderBy(col("h"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      base
        .withColumn("cum", sum(col("tokens")).over(w))
        .select(col("doc_id"), col("bucket"),
          floor((col("cum") - col("tokens")) / 4096).cast("long").as("shard"),
          col("tokens"))
        .orderBy(col("doc_id"))
    },

    // GPT-style SEQUENCE PACKING — the pretraining batch layout:
    // documents concatenate in a fixed deterministic order (doc_id) and
    // the token stream chunks into fixed-length sequences
    // (`spark.graft.pack.seqLen`, default 512); a document SPLITS across
    // a boundary (unlike tx_pack_shards' doc-granular shard budgeting),
    // so every sequence except the last is exactly full. The global
    // token prefix-sum is the op_global_rank shape — never a one-task
    // window: doc_id-contiguous buckets, per-bucket token sums collected
    // (|buckets| longs), exclusive offsets broadcast back as a map
    // literal, the within-bucket cumsum a per-bucket window. Each doc
    // then explodes over only the sequences it overlaps (ntok/L + 1
    // rows) and the per-sequence report is one map-side-combinable
    // aggregate. Integer-exact end to end.
    QueryDef("tx_pack_sequences", Some(
      """WITH t AS (SELECT doc_id, len(string_split(coalesce(text,''),' ')) AS ntok FROM documents),
        |c AS (SELECT doc_id, ntok,
        |        COALESCE(sum(ntok) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
        |      FROM t),
        |x AS (SELECT doc_id, st, ntok,
        |        unnest(range(CAST(st // 512 AS BIGINT),
        |                     CAST((st + ntok - 1) // 512 + 1 AS BIGINT))) AS seq_id
        |      FROM c)
        |SELECT seq_id, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(least(st + ntok, (seq_id + 1) * 512)
        |         - greatest(st, seq_id * 512)) AS BIGINT) AS n_tokens
        |FROM x GROUP BY seq_id ORDER BY seq_id""".stripMargin)) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.LongType
      val L = s.conf.get("spark.graft.pack.seqLen", "512").toLong
      val nb = s.conf.get("spark.graft.rank.buckets", "32").toInt
      val t = Tables.load(s, d, "documents")
        .select(col("doc_id"),
          size(split(coalesce(col("text"), lit("")), " ")).cast(LongType).as("ntok"))
      // doc_id-contiguous buckets so per-bucket sums compose into a
      // global exclusive prefix (id density is irrelevant — only the
      // ORDER partitioning matters)
      val maxId = Option(t.agg(max(col("doc_id"))).head.get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      val width = maxId / nb + 1
      val tb = t.withColumn("b", (col("doc_id") / width).cast("int"))
      val sums = tb.groupBy(col("b")).agg(sum(col("ntok")).as("s"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
      val offsets = (0 until nb).scanLeft(0L)((acc, i) => acc + sums.getOrElse(i, 0L))
      val offMap = map((0 until nb).flatMap(i => Seq(lit(i), lit(offsets(i)))): _*)
      val w = Window.partitionBy(col("b")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tb.withColumn("st",
          element_at(offMap, col("b")) + sum(col("ntok")).over(w) - col("ntok"))
        .withColumn("seq_id", explode(sequence(
          expr(s"st div $L"), expr(s"(st + ntok - 1) div $L"))))
        .groupBy(col("seq_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(least(col("st") + col("ntok"), (col("seq_id") + 1) * L)
            - greatest(col("st"), col("seq_id") * L)).as("n_tokens"))
        .orderBy(col("seq_id"))
    },

    // Per-group cap — "keep the best N documents per source", the
    // domain-balancing step that stops one crawl/domain from dominating
    // the training mixture (every mixture recipe caps domains before
    // weighting them). Quality policy matches dd_keep_best: longest
    // n_chars, doc_id as the deterministic tie-break. The per-group rank
    // is the bounded-heap topk_min aggregate — each map task keeps <= N
    // rows per source and the exchange carries |sources| x N rows, so
    // the cap costs one partial+final aggregate however large the
    // corpus (a row_number window here would sort every group in one
    // task; plan-gated against WindowExec in PlanSpec).
    QueryDef("samp_group_cap", Some(
      """SELECT source, rnk, doc_id, n_chars FROM (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rnk
        |  FROM documents) WHERE rnk <= 5
        |ORDER BY source, rnk""".stripMargin)) { (s, d) =>
      import graft.functions.topk_min
      val capN = s.conf.get("spark.graft.groupCap", "5").toInt
      Tables.load(s, d, "documents")
        .groupBy(col("source"))
        .agg(topk_min(struct((-col("n_chars")).as("nq"), col("doc_id").as("doc_id"),
          col("n_chars").as("n_chars")), capN).as("tk"))
        .select(col("source"), posexplode(col("tk")).as(Seq("pos", "st")))
        .select(col("source"), (col("pos") + 1).as("rnk"),
          col("st.doc_id").as("doc_id"), col("st.n_chars").as("n_chars"))
        .orderBy(col("source"), col("rnk"))
    },

    // Class-BALANCED downsampling — equalize classes by keeping exactly
    // n_min (the smallest class's size) docs per class, selected by
    // content-hash rank so the draw is uniform-within-class yet fully
    // deterministic across engines and partitionings. The per-class
    // selection is the samp_group_cap bounded-heap shape (topk_min on
    // (md5, id) — ≤ n_min entries per map task, |classes|×n_min
    // exchange, no window sort); n_min itself is one tiny aggregate
    // collected to the driver (|classes| rows). Scale note: the heap is
    // exact-N per class — right up to n_min in the millions (same
    // certificate as samp_exact_n); a corpus whose minority class is
    // larger than that switches to rate-based acceptance
    // (samp_stratified's shape) and trades exactness for O(1) state.
    QueryDef("samp_balanced", Some(
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |m AS (SELECT min(n) AS n_min FROM c),
        |r AS (SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rnk
        |  FROM documents)
        |SELECT lang, doc_id FROM r, m WHERE rnk <= n_min
        |ORDER BY lang, doc_id""".stripMargin)) { (s, d) =>
      import graft.functions.topk_min
      val docs = Tables.load(s, d, "documents")
      val nMin = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .agg(min(col("n"))).head.getLong(0).toInt
      docs
        .select(col("lang"), md5(col("text")).as("h"), col("doc_id"))
        .groupBy(col("lang"))
        .agg(topk_min(struct(col("h"), col("doc_id").as("doc_id")), nMin).as("tk"))
        .select(col("lang"), explode(col("tk")).as("st"))
        .select(col("lang"), col("st.doc_id").as("doc_id"))
        .orderBy(col("lang"), col("doc_id"))
    },

    // Importance-weighted sampling — keep each doc with probability
    // proportional to a per-row weight (here quality ∝ length, capped at
    // 1), still fully DETERMINISTIC: the acceptance draw is the doc's
    // md5 prefix read as a 16-bit fraction, compared against the weight
    // scaled to the same 16-bit space (max 65535, so a weight of 1.0
    // keeps everything except the 1-in-65536 prefix 'ffff' — the price of
    // a fixed-width compare) AS EQUAL-LENGTH HEX STRINGS
    // (lexicographic == numeric for fixed-width hex — the same
    // cross-engine trick as samp_hash_sample, generalized from a fixed
    // threshold to a per-row one). This is the resampling step
    // importance-weighting recipes (DSIR-style) run after scoring:
    // reproducible across engines, partitionings, and cluster sizes,
    // unlike an RNG sample. One linear codegen pass, no shuffle (the
    // ORDER BY is oracle determinism only).
    QueryDef("samp_weighted", Some(
      """SELECT doc_id, n_chars,
        |  CAST(floor(least(1.0, n_chars / 800.0) * 65535) AS BIGINT) AS w16
        |FROM documents
        |WHERE substr(md5(text), 1, 4) < printf('%04x',
        |  CAST(floor(least(1.0, n_chars / 800.0) * 65535) AS BIGINT))
        |ORDER BY doc_id""".stripMargin)) { (s, d) =>
      val w16 = floor(least(lit(1.0), col("n_chars") / 800.0) * 65535).cast("long")
      Tables.load(s, d, "documents")
        .withColumn("w16", w16)
        .filter(substring(md5(col("text")), 1, 4) < format_string("%04x", col("w16")))
        .select(col("doc_id"), col("n_chars"), col("w16"))
        .orderBy(col("doc_id"))
    },

    // Temperature-scaled mixture sampling — the multilingual-pretraining
    // rebalancing step: resample so stratum s's share follows
    // n_s^T / Σ n^T (T = 0.5 here) instead of its raw share, boosting
    // tail languages and damping the head, at a fixed total budget
    // (half the corpus). Everything is INTEGER-exact cross-engine:
    // w_s = floor(sqrt(n_s)) (IEEE sqrt is correctly rounded, so both
    // engines agree bit-for-bit), the per-stratum 16-bit acceptance
    // threshold is pure BIGINT arithmetic
    //   t16_s = min(65535, (65535 * (N/2) * w_s) div (Σw * n_s)),
    // and the draw is the same fixed-width md5-hex compare as
    // samp_weighted. Scale shape: one count-star aggregate over the
    // corpus (map-side combinable), a |strata|-row rates frame
    // broadcast back, then one shuffle-free codegen filter pass — the
    // rates join costs the same whether there are 5 strata or 5,000.
    // (The BIGINT product is safe to ~1e9 target rows x 1e5 weight;
    // past that, widen the rate arithmetic to DECIMAL(38,0) — the plan
    // shape is unchanged.)
    QueryDef("samp_temperature", Some(
      """WITH n AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |w AS (SELECT lang, n, CAST(floor(sqrt(n)) AS BIGINT) AS w FROM n),
        |t AS (SELECT sum(w) AS sw, sum(n) AS tot FROM w),
        |r AS (SELECT lang,
        |    CAST(least(65535, (65535 * (tot // 2) * w) // (sw * n)) AS BIGINT) AS t16
        |  FROM w CROSS JOIN t)
        |SELECT d.doc_id, d.lang, r.t16 FROM documents d JOIN r USING (lang)
        |WHERE substr(md5(d.text), 1, 4) < printf('%04x', r.t16)
        |ORDER BY d.doc_id""".stripMargin)) { (s, d) =>
      val docs = Tables.load(s, d, "documents")
      val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .withColumn("w", floor(sqrt(col("n"))).cast("long"))
      val totals = counts.agg(sum(col("w")).as("sw"), sum(col("n")).as("tot"))
      val rates = counts.crossJoin(broadcast(totals))
        .select(col("lang"),
          least(lit(65535L),
            expr("(65535 * (tot div 2) * w) div (sw * n)")).as("t16"))
      docs.join(broadcast(rates), Seq("lang"))
        .filter(substring(md5(col("text")), 1, 4) < format_string("%04x", col("t16")))
        .select(col("doc_id"), col("lang"), col("t16"))
        .orderBy(col("doc_id"))
    },

    // Exact-N global uniform sample — "give me exactly 100 documents,
    // uniformly, deterministically": rank the corpus by content hash and
    // keep the N smallest. The rank is the bounded-heap `topk_min`
    // aggregate over the md5 hex key (UTF8 byte ordering == DuckDB
    // varchar ordering for fixed-width hex), NOT a global ORDER BY
    // LIMIT over the raw rows: each map task keeps <= N (hash, id)
    // pairs and the exchange carries parts x N tiny rows into one final
    // k-vs-k merge — the aggregate-side analogue of
    // TakeOrderedAndProject, and the same certificate samp_group_cap
    // holds per group. md5 keys the draw to content, so the same doc
    // set is selected on every engine, partitioning, and cluster size.
    QueryDef("samp_upsample", Some(
      // Repeat-UPSAMPLING — the other half of importance weighting:
      // samp_weighted can only keep/drop (p <= 1); mixture recipes also
      // REPEAT high-weight documents (epochs-per-source > 1). Each doc
      // gets floor(w) guaranteed copies plus one more with probability
      // frac(w), the fractional draw being the same deterministic
      // 16-bit md5 compare as samp_weighted — so expected copies = w,
      // realized copies are a pure function of content, and the oracle
      // reproduces them exactly. w = min(4, n_chars/200) here; a real
      // pipeline feeds per-source epoch weights. One codegen pass +
      // a row-local explode — no shuffle (ORDER BY is oracle
      // determinism only), and the fan-out is bounded by the weight cap.
      """WITH w AS (SELECT doc_id, least(4.0, n_chars / 200.0) AS w,
        |    substr(md5(text), 1, 4) AS h4 FROM documents),
        |c AS (SELECT doc_id,
        |    CAST(floor(w) AS BIGINT) +
        |    CASE WHEN h4 < printf('%04x',
        |      CAST(floor((w - floor(w)) * 65535) AS BIGINT)) THEN 1 ELSE 0 END AS n_copies
        |  FROM w)
        |SELECT doc_id, u.k AS copy
        |FROM c, unnest(generate_series(1, n_copies)) u(k)
        |ORDER BY doc_id, copy""".stripMargin)) { (s, d) =>
      val w = least(lit(4.0), col("n_chars") / 200.0)
      val frac16 = floor((w - floor(w)) * 65535).cast("long")
      val nCopies = (floor(w).cast("long") +
        when(substring(md5(col("text")), 1, 4) < format_string("%04x", frac16), 1L)
          .otherwise(0L)).as("n_copies")
      Tables.load(s, d, "documents")
        .select(col("doc_id"), nCopies)
        // sequence(1, 0) would generate a DESCENDING [1, 0] — guard the
        // zero-copy case with an empty array (explode then drops it)
        .select(col("doc_id"),
          explode(when(col("n_copies") >= 1, sequence(lit(1L), col("n_copies")))
            .otherwise(array().cast("array<bigint>"))).as("copy"))
        .orderBy(col("doc_id"), col("copy"))
    },

    QueryDef("samp_exact_n", Some(
      """SELECT doc_id, h FROM (
        |  SELECT doc_id, md5(text) AS h FROM documents ORDER BY h, doc_id LIMIT 100)
        |ORDER BY doc_id""".stripMargin)) { (s, d) =>
      import graft.functions.topk_min
      val n = s.conf.get("spark.graft.exactSampleN", "100").toInt
      Tables.load(s, d, "documents")
        .select(col("doc_id"), md5(col("text")).as("h"))
        .agg(topk_min(struct(col("h").as("h"), col("doc_id").as("doc_id")), n).as("tk"))
        .select(explode(col("tk")).as("st"))
        .select(col("st.doc_id").as("doc_id"), col("st.h").as("h"))
        .orderBy(col("doc_id"))
    },

    // Deterministic MIXING ORDER (stride scheduling) — the data-loader
    // side of samp_mixture: instead of dropping rows to hit the mixture,
    // assign every doc a schedule position so that reading the schedule
    // in order yields sources at their target rates (any prefix's source
    // mix ∝ weight × volume). Position = u · m_s where u is the doc's
    // 16-bit md5 draw and m_s the source's integer inverse weight
    // (10/20/40/100 ≡ weights 1/.5/.25/.1 — samp_mixture's tiers): a
    // heavily-weighted source's docs pack early strides, a down-weighted
    // one spreads 10× sparser. ALL-integer arithmetic (one 16-bit value
    // times a small constant — no floats anywhere), one shuffle-free
    // codegen projection; the ORDER BY is the deliverable (the schedule)
    // and doubles as oracle determinism.
    QueryDef("samp_interleave", Some(
      """SELECT doc_id, source,
        |  CAST(((strpos('0123456789abcdef', substr(md5(text),1,1))-1)*4096
        |      + (strpos('0123456789abcdef', substr(md5(text),2,1))-1)*256
        |      + (strpos('0123456789abcdef', substr(md5(text),3,1))-1)*16
        |      + (strpos('0123456789abcdef', substr(md5(text),4,1))-1))
        |    * CASE CAST(substr(source, 4) AS INTEGER) % 4
        |        WHEN 0 THEN 10 WHEN 1 THEN 20 WHEN 2 THEN 40 ELSE 100 END
        |    AS BIGINT) AS pos
        |FROM documents ORDER BY pos, doc_id""".stripMargin)) { (s, d) =>
      // Inverse-weight tiers come from session config and apply to the
      // corpus's OWN distinct sources (one map-side-combinable distinct
      // pass -> a |sources|-row broadcast frame) — no source list is
      // baked in, so the query is corpus-portable; a real pipeline
      // swaps the derived frame for its config-store rates table and
      // the plan is unchanged whether there are 20 sources or 20,000.
      val tiers = s.conf.get("spark.graft.interleave.tiers", "10,20,40,100")
        .split(",").map(_.trim.toLong)
      val srcN = expr("try_cast(substring(source, 4, 10) AS INT)")
      val m = coalesce(
        element_at(array(tiers.map(lit(_)): _*),
          (pmod(srcN, lit(tiers.length)) + 1).cast("int")),
        lit(tiers.last))
      val rates = Tables.load(s, d, "documents")
        .select(col("source")).distinct()
        .withColumn("m", m)
      val u = conv(substring(md5(col("text")), 1, 4), 16, 10).cast("long")
      Tables.load(s, d, "documents")
        .join(broadcast(rates), Seq("source"))
        .select(col("doc_id"), col("source"), (u * col("m")).as("pos"))
        .orderBy(col("pos"), col("doc_id"))
    }
  )

  /** Bucket-prefix width for shard packing: pinned by
    * `spark.graft.packBucketChars`, else the smallest w (1..8) with
    * rows/16^w ≤ `spark.graft.packMaxRowsPerBucket`. The count is only
    * evaluated in auto mode (one cheap parquet count-star job). */
  private[graft] def packBucketChars(
      s: org.apache.spark.sql.SparkSession, rowCount: () => Long): Int =
    s.conf.get("spark.graft.packBucketChars", "auto") match {
      case "auto" =>
        val maxRows = s.conf.get("spark.graft.packMaxRowsPerBucket", "262144").toLong
        val n = rowCount()
        var w = 1
        while (w < 8 && n / math.pow(16, w) > maxRows) w += 1
        w
      case pinned => pinned.toInt
    }
}
