package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scale-sanity harness: replicates the sf0.1 fixtures k-fold (ids shifted
  * so keys stay distinct) into /tmp and times flagship plans at 1x and kx.
  * A plan whose runtime grows ~linearly in k has no hidden quadratic or
  * driver-side bottleneck — the local proxy for the 100 TB question.
  * Not driver-run; results recorded in BASELINE.md.
  *
  * Modes:
  *   ScaleCheck [k]        — uniform replication (default k=8)
  *   ScaleCheck skew [k]   — adversarial skew: the same replication, but
  *     10% of rows carry ONE hot key per table (orders → one customer,
  *     documents → one boilerplate template + one hot lang stratum), so a
  *     single join key / LSH bucket / stratum holds 10% of the data. The
  *     hot groups are planted BEFORE per-copy token salting, so each copy
  *     carries its own hot clique — k× data means k× hot-group work, and a
  *     skew-resilient plan stays ~linear while a plan with a single-reducer
  *     quadratic blows past it. Measured on the shuffle-heavy plans only.
  */
object ScaleCheck {

  /** Plant the hot keys on the base (pre-replication) tables: one customer
    * receives 10% of orders; 10% of documents become copies of one
    * boilerplate template in one hot lang stratum. */
  private def skewTransform(name: String, df: DataFrame): DataFrame = name match {
    case "orders" =>
      df.withColumn("o_custkey",
        when(col("o_orderkey") % 10 === 0, lit(1L)).otherwise(col("o_custkey")))
    // one order receives 10% of all lineitems — the both-sides-hot join
    // key the salted join exists for (key 0 exists in every orders copy)
    case "lineitem" =>
      df.withColumn("l_orderkey",
        when(col("l_orderkey") % 10 === 0, lit(0L)).otherwise(col("l_orderkey")))
    // one user emits 10% of all events — the hot timeline key for the
    // event-log plans (cdc compaction, funnel, windows); a map-side-
    // combining plan shrugs it off, a sort-per-key plan serializes on it
    case "events" =>
      df.withColumn("user_id",
        when(col("event_id") % 10 === 0, lit(1L)).otherwise(col("user_id")))
    case "documents" =>
      val template = (1 to 40).map(i => s"boiler$i").mkString(" ")
      df.withColumn("text",
          when(col("doc_id") % 10 === 0, lit(template)).otherwise(col("text")))
        .withColumn("lang",
          when(col("doc_id") % 10 === 0, lit("hotl")).otherwise(col("lang")))
        // one SOURCE stratum holds 10% of the corpus — the hot
        // low-cardinality stratum fn_quantile_bin / samp_group_cap /
        // samp_stratified key on. A per-stratum sort (the retired ntile
        // plan) would serialize the hot stratum in one task; the KLL
        // cut-point / bounded-heap plans combine it map-side. The name
        // keeps the numeric-suffix convention ("src99") so the
        // split-parsing queries (dd_incremental) classify the hot
        // stratum as batch-side and face its collapsed fingerprint.
        .withColumn("source",
          when(col("doc_id") % 10 === 0, lit("src99")).otherwise(col("source")))
    // 10% of vectors become copies of ONE vector — a degenerate hot LSH
    // bucket / hot PQ cell, and (because vector content is identical
    // across replication copies) the hot bucket grows with k. The ANN
    // plans must stay linear: candidate work is bucket-bounded and the
    // bounded-heap topk keeps every rank exchange at |probes| x k rows.
    // Probe 0 (vec_id 0) IS the hot vector, so the hottest probe's
    // candidate set is the full 10% slice — the worst case on purpose.
    case "embeddings" =>
      df.withColumn("embedding",
        when(col("vec_id") % 10 === 0,
          typedLit((0 until 64).map(i => (0.1f + 0.01f * i)))).otherwise(col("embedding")))
    case _ => df
  }

  def main(args: Array[String]): Unit = {
    val skew = args.contains("skew")
    val keep = args.contains("keep")
    val rest = args.filterNot(a => a == "skew" || a == "keep")
    val k = rest.find(_.forall(_.isDigit)).map(_.toInt).getOrElse(8)
    // conf:key=value args: session confs for the run (e.g. the guard's
    // own scale path, conf:spark.graft.dedup.pairSource=minhash)
    val confs = rest.filter(_.startsWith("conf:")).map { a =>
      val kv = a.drop(5).split("=", 2); (kv(0), kv(1))
    }
    // remaining non-numeric args: restrict to those query names
    val only = rest.filterNot(a => a.forall(_.isDigit) || a.startsWith("conf:")).toSet
    val base = "/root/testdata/sf0.1"
    val tag = if (skew) "scale_skew" else "scale"
    val out = s"/tmp/graft_${tag}_${k}x"
    val out1 = s"/tmp/graft_${tag}_1x"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // the kx ss_* replays deliberately collect k-fold feeds to the
      // driver (HarnessFeed's scaled cap is the structural guard); the
      // default 1g maxResultSize would abort the 64x collect mid-run.
      // Harness-scoped: only this main lifts it. Run 64x with
      // SPARK_DRIVER_MEM=96g (default 24g heap OOMs on the sinks).
      .config("spark.driver.maxResultSize", "0")
      // single-JVM 64x replays put the driver under full-heap GC pauses
      // long enough to miss heartbeats (local mode: the heartbeat is a
      // formality, the "executor" IS the driver) — don't let the
      // formality kill the measurement
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "1200s"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the kx replicas are a DELIBERATELY larger differential replay, so
    // scale the ss_* harness-feeder cap with k (an explicit conf: arg
    // still wins — user confs apply after this default)
    spark.conf.set(graft.streaming.HarnessFeed.MaxRowsKey,
      (graft.streaming.HarnessFeed.DefaultMaxRows.toLong * math.max(1, k)).toString)
    confs.foreach { case (key, value) => spark.conf.set(key, value) }

    // replicate with shifted ids (documents/embeddings get distinct ids so
    // dedup/ANN keys do not collapse; fact/dim tables keep their FK shape
    // by shifting both sides consistently)
    def replicate(dir: String, copies: Int)(name: String, idCols: Seq[String], shift: Long): Unit = {
      val loaded = Tables.load(spark, base, name)
      val df = if (skew) skewTransform(name, loaded) else loaded
      val reps = (0 until copies).map { i =>
        val shifted = idCols.foldLeft(df) { (d, c) => d.withColumn(c, col(c) + lit(i * shift)) }
        // documents: salt every token with the copy index. A plain text
        // copy would make all k replicas exact near-dups of each other,
        // growing pair work k² — the salt keeps each copy's INTERNAL
        // duplicate structure bit-identical (token bijection) while
        // copies never cross-match, so k× data means k× true pair work.
        if (name == "documents")
          shifted.withColumn("text",
            concat_ws(" ", transform(split(col("text"), " "), t => concat(t, lit(s"~$i")))))
        else shifted
      }
      reps.reduce(_.union(_)).write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    def buildAll(dir: String, copies: Int): Unit = {
      val r = replicate(dir, copies) _
      // nation/region are FIXED-cardinality dims: real scale-up grows
      // facts, not the 25-nation/5-region tables. Replicating them with
      // unshifted keys (as rounds 4-8 did) makes every c_nationkey match
      // k nation rows and every n_regionkey k region rows — a k²
      // many-to-many row explosion through the star join that measures
      // the fixture, not the plan (the round-8 "j_multiway_star 4.7,
      // genuine fact-side growth" reading, and a 57x blow-up at 32x).
      val r1 = replicate(dir, 1) _
      r("lineitem", Seq("l_orderkey"), 100000000L)
      r("orders", Seq("o_orderkey", "o_custkey"), 100000000L)
      r("customer", Seq("c_custkey"), 100000000L)
      r1("nation", Seq.empty, 0L)
      r1("region", Seq.empty, 0L)
      r("supplier", Seq("s_suppkey"), 100000000L)
      r("part", Seq("p_partkey"), 100000000L)
      r("events", Seq("event_id", "user_id"), 100000000L)
      r("documents", Seq("doc_id"), 100000000L)
      r("embeddings", Seq("vec_id"), 100000000L)
    }
    // `keep`: reuse an existing replica set — for one-query-per-JVM runs
    // at large k, where rebuilding the kx fixtures per query would
    // dominate (the big multi-stream replays are measured in separate
    // JVMs: session-lifetime state across MANY MemoryStream replays in
    // one JVM is a harness failure mode, not an operator one). The
    // caller owns staleness: delete /tmp/graft_scale_* after changing
    // fixtures or the replication scheme.
    def built(dir: String): Boolean =
      new java.io.File(s"$dir/embeddings.parquet/_SUCCESS").exists()
    if (!(keep && built(out))) buildAll(out, k)
    // skew mode compares skewed-1x to skewed-kx (apples to apples); uniform
    // mode reads 1x straight off the sf0.1 fixtures as before
    val baseDir = if (skew) {
      if (!(keep && built(out1))) buildAll(out1, 1)
      out1
    } else base

    val names =
      if (skew)
        // the shuffle-heavy plans where one hot key / hot bucket / hot
        // stratum could concentrate work on a single reducer
        Seq("j_multiway_star", "dd_dup_clusters", "dd_minhash_lsh",
          "dd_simhash", "samp_stratified", "dd_paragraph", "op_salted_join",
          "op_cdc_upsert", "op_funnel", "op_scd2", "wf_rolling_range",
          "j_asof_nearest",
          "dd_keep_best", "ann_lsh_topk", "ann_pq_topk", "op_retention",
          "fn_quantile_bin", "samp_group_cap", "samp_weighted", "ss_enrich",
          // round-9 ops facing the planted hot strata: the boilerplate
          // template IS tx_remove_boilerplate's worst case (10% of all
          // chunks collapse to ~5 chunk hashes), the hot lang stratum
          // stresses the per-lang KLL/temperature plans, the hot source
          // stresses the streaming bounded heap
          "tx_remove_boilerplate", "fn_robust_zscore", "samp_temperature",
          // the hot template's grams are ALL cross-doc duplicated — the
          // worst case for substring-span detection: the per-hash
          // min/max dup flag must combine map-side and the islands
          // window stays doc-keyed
          "dd_substring",
          // the hot template collapses 10% of docs onto ONE n_chars
          // value — a single rank bucket holds the whole tie group, the
          // worst case for quantile-cut range bucketing
          "op_global_rank",
          // the hot template collapses 10% of the corpus onto ONE
          // fingerprint in the pipeline's dedup stage, and the hot lang
          // stratum concentrates its KLL bounds group
          "pipe_curate",
          // hot lang stratum skews the classifier's labels and the hot
          // template floods BM25/score ties; both plans are broadcast-
          // stats + codegen scans with bounded-key aggregates, so the
          // hot mass must spread across mappers
          "tx_train_apply", "srch_hard_negatives", "emb_generate",
          // the hot template collapses 10% of docs onto ONE token-set
          // fingerprint — the algebraic first-occurrence + store join
          // must shrug it off
          // op_pagerank: the hot customer densifies one node's in-edge
          // set — per-iteration work stays edge-linear because the dst
          // aggregate combines the hot node's contributions map-side
          // and the rank table broadcasts regardless of degree.
          // op_attribution: a 10%-hot user makes the touch x conversion
          // pair SET quadratic in the hot share — semantics, not plan —
          // so each copy's hot clique is a large CONSTANT and kx copies
          // mean kx cliques (linear). The plan question is whether one
          // task emits a whole clique: run with
          // conf:spark.graft.attribution.saltBuckets=8 to measure the
          // salted path (the default path leans on AQE skew-join).
          "op_attribution",
          "dd_cross_near", "ss_topk", "dd_incremental", "dd_incremental_near",
          "dd_cluster_stats", "ss_near_screen",
          // hot o_custkey: the forget cascade's semi/anti joins stay
          // broadcast (tombstones are key-bounded), so a hot customer
          // only grows the scanned side linearly
          // op_cooccur_topk: the hot customer's (c, s) rows COLLAPSE in
          // the distinct pass (<= |suppliers| rows per customer however
          // hot), so the per-customer self-join never sees the hot mass
          // ss_cooccur_maintain: the hot customer's interactions dedupe
          // to <= |suppliers| distinct (c, s) pairs in the batch
          // dropDuplicates AND in the seen store, so the postings join
          // and the within-batch self-join face the collapsed basket,
          // not the raw hot mass — same defense as op_cooccur_topk
          "op_forget_users", "op_pagerank", "op_cooccur_topk",
          "ss_cooccur_maintain",
          // hot template: 10% of all bigrams collapse onto ~40 distinct
          // bigram keys — the hot-vocab worst case for collocation
          // counting (map-side combine must absorb it); hot user: one
          // window partition holds 10% of the event timeline for path
          // mining — linear share per copy, the sessionize shape
          "tx_collocations", "op_top_paths",
          // hot template: 10% of docs share ONE token set — tf/df for
          // the ~40 boiler terms concentrates on single term keys; the
          // df aggregate and the per-doc heap must absorb it map-side
          "tx_keywords",
          // hot customer: one dense graph node for label propagation —
          // its (dst, lbl) counts must combine map-side and the label
          // broadcast is node-bounded regardless of degree.
          // (op_skyline is EXCLUDED from skew the dd_semdedup way: the
          // hot stratum is 10% identical docs in their OWN lang, i.e.
          // one giant non-dominated tie group — the output IS 10% of
          // the corpus by the operator's definition, semantics not
          // plan. mm_phash_* skew ≡ uniform: payloads derive from
          // doc_id, which the skew transform never touches.)
          "op_label_prop",
          // hot user: 10% of the event timeline in ONE key — a single
          // SCD2 window partition (time travel), one GroupState group
          // whose per-batch slice sorts in one task (funnel,
          // transitions). All linear-share shapes; the gate is that
          // nothing quadratic hides in the per-key fold.
          "op_time_travel", "ss_funnel", "ss_transitions", "ss_scd2_maintain",
          // hot customer: its basket collapses to <= |suppliers| rows in
          // the distinct pass BEFORE the co-occurrence self-join (the
          // op_cooccur_topk defense), and the mutual-kNN edge set stays
          // <= 5|S| whatever the degree skew upstream; hot user: one
          // GroupState group whose days-set is calendar-bounded — the
          // retention fold is linear in the hot key's share; gap fill /
          // path mining: O(1)-state groups sorting 10% of each batch —
          // linear share. (ss_attribution is EXCLUDED from skew the
          // op_attribution way: the hot user's per-purchase candidate
          // scan over its 7-day touch window is quadratic in the hot
          // share BY SEMANTICS, concentrated in one GroupState key —
          // the batch op's salted path is the documented escalation.)
          // ss_triangles_maintain: the IVM layer faces the hot basket
          // with the ss_cooccur_maintain defense (distinct collapse in
          // the batch dedupe + seen store), the closure reads the
          // output-sized counts store
          "op_triangles", "ss_triangles_maintain", "ss_retention_maintain",
          "ss_gap_fill", "ss_top_paths",
          // hot template: 10% of all bigrams collapse onto ~40 distinct
          // bigram model keys — the tx_collocations hot-vocab shape; the
          // two model joins face the hot keys as big COUNTS, not big
          // groups. hot l_orderkey: the profile twin's bucket key hashes
          // (orderkey, linenumber), so the hot order's rows spread over
          // all buckets and the fold is linear-share per bucket
          "tx_lm_surprisal", "ss_profile_maintain",
          // hot user: 10% of the event timeline in ONE GroupState key —
          // the forget fold is a linear-share O(1)-state pass (the
          // ss_funnel shape); hot template: the LM store fold faces 10%
          // of all bigram deltas collapsing onto ~40 keys, which the
          // map-side delta combine absorbs before the store join
          "ss_forget_enforce", "ss_lm_maintain",
          // hot template: 10% of all postings collapse onto ~40 term
          // keys — the append is a map-side-combined per-batch count
          // (hot keys are big COUNTS, not big groups) and the serving
          // pass reconstructs dl per doc from doc-keyed sums
          "ss_bm25_maintain",
          // hot template: the forgotten docs' delta counts collapse onto
          // the same ~40 hot term keys — the subtract/compaction joins
          // face them as big counts behind map-side combines, and the
          // tombstone broadcast is unaffected by skew
          "fg_lm_subtract", "fg_bm25_compact",
          // hot embedding: 10% of vectors are ONE vector — they all
          // assign to one inverted list, so the hot list holds a linear
          // share and the serving join faces it as ONE big candidate
          // cell (semantics: identical vectors ARE neighbors); the
          // per-batch assignment pass is stateless and skew-blind
          "ss_ivf_maintain",
          // hot template: 10% of word POSITIONS collapse onto ~40 hot
          // words — the tokenize join on w faces them as big groups
          // (AQE skew-join territory), while the word table and the
          // driver trainer see just 40 more distinct words
          "tx_bpe_apply",
          // hot template: 10% of docs collapse onto ONE fingerprint —
          // the refcount fold faces it as one big COUNT (map-side
          // combine), never one big group
          "ss_fp_maintain")
      else
        Seq("b5_group_agg", "b1_filter_compound", "j_multiway_star",
          "b6_theta_distinct", "b8_freq_topk", "dd_minhash_lsh", "ann_lsh_topk",
          "tx_quality", "b13_window_tumbling", "op_sessionize",
          "dd_dup_clusters", "ann_ivf_topk", "samp_stratified", "tx_pack_shards",
          "tx_repetition", "dd_canonical_corpus", "tx_decontaminate",
          "tx_rarity", "tx_chunk", "samp_mixture", "tx_importance",
          "ann_filtered_topk", "srch_bm25", "srch_rrf", "dd_cross_dedup", "tx_corpus_stats",
          "j_full_outer", "op_pivot", "op_unpivot", "tx_classify",
          "fn_zscore", "fn_histogram", "dd_fuzzy_names",
          "dd_source_overlap", "tx_bigram_rarity", "emb_label_stats",
          "b7_kll_grouped", "ann_ivf_bigk", "wf_analytic_full",
          "tx_vocab_coverage", "emb_knn_classify", "dd_containment",
          "dd_paragraph", "fn_array", "srch_phrase", "fn_map", "ann_pq_topk",
          "op_salted_join", "emb_pca_project", "op_cdc_upsert", "op_funnel",
          "op_transitions", "wf_rolling_range", "op_scd2", "fn_quantile_bin",
          "dd_keep_best", "b6_theta_merge", "b8_topk_grouped", "samp_group_cap",
          "fn_winsorize", "op_retention", "op_gap_fill", "bql_cdf_linear",
          "samp_weighted", "ss_enrich", "mm_features_png", "ss_ann_assign",
          "samp_temperature", "samp_exact_n", "fn_robust_zscore",
          "tx_remove_boilerplate", "op_bucketed_join", "ss_topk",
          "ss_quantile", "dd_cross_near", "fn_target_encode",
          "srch_hybrid", "dd_incremental", "dd_incremental_near",
          "dd_cluster_stats", "ss_near_screen",
          "emb_int8_quantize", "op_profile",
          "emb_centroids", "op_profile_sketch", "samp_upsample", "op_dq_rules",
          "fn_feature_hash", "op_forget_users", "op_zorder_layout",
          "src_csv_roundtrip", "j_interval_overlap", "dd_bloom_prefilter",
          "op_corr", "op_join_estimate", "mm_frame_sample",
          "op_dq_quarantine", "op_diff_partitions", "samp_balanced",
          "tx_contamination_report", "dd_substring", "tx_train_apply",
          "ss_classify", "op_global_rank", "j_asof_nearest",
          "src_orc_roundtrip", "pipe_curate", "samp_interleave",
          "emb_generate", "ss_infer", "srch_hard_negatives",
          "mm_resize_png", "op_sketch_rollup", "op_sketch_window",
          "ss_sketch_maintain", "op_attribution", "op_pagerank",
          "src_schema_evolution", "op_cooccur_topk", "ss_cooccur_maintain",
          "op_anomaly_ewma", "mm_phash_neardup",
          "tx_collocations", "op_top_paths", "op_skyline", "mm_audio_vad",
          "ss_anomaly_ewma", "op_time_travel", "tx_keywords",
          "mm_phash_clusters", "op_label_prop", "ss_skyline_maintain",
          "mm_tile_stats", "op_lag_cov", "ss_funnel", "ss_transitions",
          "tx_stem_vocab", "ss_scd2_maintain", "op_triangles",
          "ss_triangles_maintain", "ss_retention_maintain", "ss_gap_fill",
          "ss_attribution", "ss_top_paths", "tx_lm_surprisal",
          "ss_profile_maintain", "ss_corr_maintain", "ss_forget_enforce",
          "ss_lm_maintain", "ss_bm25_maintain",
          // deletion propagation: store build + broadcast-delta edit;
          // the tombstone set stays request-bounded at every k
          "fg_lm_subtract", "fg_bm25_compact", "fg_cooccur_subtract",
          "fg_sketch_rewindow",
          // the IVF store verbs: segment-append maintenance + key delete
          // (broadcast tombstones, touched lists only)
          "ss_ivf_maintain", "fg_ivf_delete", "fg_fp_subtract",
          "ss_fp_maintain",
          // sequence packing: bucketed prefix sums + broadcast offsets,
          // per-doc span explode — the op_global_rank shape over tokens
          "tx_pack_sequences",
          // BPE: distributed word count + capped driver loop (train),
          // per-distinct-word kernel + relational tokenize join (apply).
          // Token salting grows the word table ~k-fold until the
          // maxWords cap bites — the cap is the documented scale lever
          "tx_bpe_train", "tx_bpe_apply",
          // media codecs: per-partition encode→decode maps over doc_id
          // (AVI/RIFF video, VP8L webp) — payloads never shuffle, so
          // kx docs must cost exactly kx decode work
          "mm_video_frames", "mm_video_mjpeg",
          "mm_webp_roundtrip", "mm_webp_palette",
          // deflate compressibility: per-partition map, reused Deflater
          "tx_compress_ratio")
    val selected = if (only.isEmpty) names else names.filter(only)
    // dd_semdedup is excluded the same way dd_embed_cosine is: replicated
    // embeddings are bit-identical across copies, so k-fold data has k²
    // true cosine pairs — the linearity signal would measure the fixture,
    // not the plan. emb_bitext_mine is its quadratic-guarded sibling
    // (exact |A|x|B| pair frame by design) and emb_bitext_ann clusters
    // those same bit-identical replicas into quadratic true-pair cells:
    // same exclusion; the scale path's linearity argument is structural
    // (per-cluster bounded candidates, kClusters tracks corpus).
    // srch_bm25 caveat: token salting means only copy 0 hits the fixed
    // query terms at kx, so hit DENSITY falls k-fold. The measured cost is
    // still representative — BM25's work is the per-token tf scan and the
    // corpus stats aggregate, both of which run in full over every salted
    // copy; only the top-k heap sees fewer distinct positive scores.

    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once
    selected.foreach { n => time(n, baseDir); time(n, out) }
    println(f"${"query"}%-22s ${"1x"}%8s ${s"${k}x"}%8s ratio (linear = $k)${if (skew) "  [skew: 10% hot key]" else ""}")
    selected.foreach { n =>
      val t1 = math.min(time(n, baseDir), time(n, baseDir))
      val tk = math.min(time(n, out), time(n, out))
      println(f"$n%-22s $t1%8.2f $tk%8.2f ${tk / t1}%5.1f")
    }
    spark.stop()
  }
}
