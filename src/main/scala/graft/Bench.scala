package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop sink: forces full evaluation of every column (a bare .count()
    // would let Catalyst prune the projections we mean to measure).
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val names = SparkEntry.queries.keys.toSeq.sorted
    // warm-up: JIT + parquet footer caches, so numbers measure the plan.
    names.foreach { n =>
      try exec(SparkEntry.queries(n)(spark, sfDir)) catch { case _: Throwable => () }
    }
    // two measured runs, min per query: the host is shared, so a single
    // run can absorb multi-second scheduler noise on shuffle-heavy plans.
    def timeOne(name: String): Double = {
      val t0 = System.nanoTime()
      try exec(SparkEntry.queries(name)(spark, sfDir)) catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }
    val r1 = names.map(n => n -> timeOne(n)).toMap
    val r2 = names.map(n => n -> timeOne(n)).toMap
    val results = names.map(n => n -> math.min(r1(n), r2(n))).toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // like-for-like subtotal vs the round-1 58-query self-baseline
    // (BASELINE.md headline 30.9 s): queries added after round 1 are
    // excluded so round-over-round totals compare without arithmetic.
    // Any future query additions belong in this set too.
    val addedSinceBaseline = Set("ann_ivf_topk", "tx_normalize", "tx_redact",
      "dd_dup_clusters", "samp_stratified", "tx_pack_shards",
      "tx_repetition", "dd_canonical_corpus", "tx_decontaminate",
      "tx_rarity", "dd_semdedup", "tx_chunk",
      "samp_mixture", "tx_importance", "ann_filtered_topk",
      "srch_bm25", "dd_cross_dedup", "tx_corpus_stats",
      "j_full_outer", "op_pivot", "op_unpivot", "tx_classify",
      "fn_zscore", "fn_histogram", "dd_fuzzy_names",
      "dd_source_overlap", "tx_bigram_rarity", "bql_explode", "emb_label_stats",
      "b7_kll_grouped", "bql_quantile", "bql_pmf", "bql_cdf", "ann_ivf_bigk",
      "mm_features_ppm", "ss_join_stream", "ss_join_outer",
      "emb_knn_classify", "tx_vocab_coverage", "dd_containment",
      "ss_sessionize", "mm_resize_ppm", "dd_paragraph", "fn_array",
      "op_grouping_sets", "ss_dedup", "bql_expr_scalar", "bql_expr_collection",
      "srch_phrase", "ss_window_agg", "fn_map", "ann_pq_topk", "op_salted_join",
      "emb_pca_project", "op_cdc_upsert", "op_funnel", "op_transitions",
      "wf_rolling_range", "op_scd2", "ss_cdc", "bql_copy_project",
      "bql_orderby_limit", "mm_audio_wav", "fn_quantile_bin", "dd_keep_best",
      "b6_theta_merge", "b8_topk_grouped", "bql_quantile_linear",
      "bql_pmf_region", "bql_cdf_linear", "samp_group_cap", "ss_enrich",
      "fn_winsorize", "op_retention", "op_gap_fill", "samp_weighted",
      "mm_features_png", "ss_ann_assign", "samp_temperature", "samp_exact_n",
      "fn_robust_zscore", "tx_remove_boilerplate", "op_bucketed_join",
      "ss_topk", "ss_quantile", "dd_cross_near", "fn_target_encode",
      "srch_hybrid", "dd_incremental", "emb_int8_quantize", "op_profile",
      "emb_centroids", "op_profile_sketch", "samp_upsample", "op_dq_rules")
    val baselineSubset = results.view.filterKeys(!addedSinceBaseline.contains(_))
    val subtotal = baselineSubset.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""baseline_subset_sec":$subtotal,"baseline_subset_n":${baselineSubset.size},""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
