package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Host-contention marker: 1/5/15-min loadavg + runnable/total process
    * counts from /proc/loadavg, so the verdict's ±15% host band is
    * machine-attributable (a loaded host at bench time explains a uniform
    * drift; an idle one rules it out). Best-effort — absent /proc yields
    * nulls, never a bench failure. */
  private def loadMarker(): String =
    try {
      val parts = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")),
        java.nio.charset.StandardCharsets.UTF_8).trim.split("\\s+")
      val procs = parts(3).split("/")
      s"""{"load1":${parts(0)},"load5":${parts(1)},"load15":${parts(2)},""" +
        s""""runnable":${procs(0)},"procs":${procs(1)}}"""
    } catch { case _: Throwable =>
      """{"load1":null,"load5":null,"load15":null,"runnable":null,"procs":null}"""
    }

  def main(args: Array[String]): Unit = {
    val loadStart = loadMarker()
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
    // optional args: query names — restrict the sweep for local A/B
    // iteration (the driver always runs the no-arg full form)
    val only = args.toSet
    val names = (if (only.isEmpty) SparkEntry.queries.keys
      else SparkEntry.queries.keys.filter(only)).toSeq.sorted
    // warm-up: JIT + parquet footer caches, so numbers measure the plan.
    names.foreach { n =>
      try exec(SparkEntry.queries(n)(spark, sfDir)) catch { case _: Throwable => () }
    }
    // three measured runs, min per query: the host is shared with ±40%
    // observed variance — min-of-2 still let multi-second scheduler noise
    // read as round-over-round "regressions" on shuffle-heavy plans.
    def timeOne(name: String): Double = {
      val t0 = System.nanoTime()
      try exec(SparkEntry.queries(name)(spark, sfDir)) catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }
    val runs = (1 to 3).map(_ => names.map(n => n -> timeOne(n)).toMap)
    val results = names.map(n => n -> runs.map(_(n)).min).toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // like-for-like subtotal vs the round-1 58-query self-baseline
    // (BASELINE.md headline 30.9 s): pinned as an ALLOWLIST of the
    // round-1 names (from BENCH_r01.json), so newly added queries can
    // never silently inflate the round-over-round comparison (the old
    // added-since blocklist had to be maintained by hand and drifted).
    val round1Baseline = Set(
      "ann_brute_topk", "ann_bucket_stats", "ann_lsh_topk",
      "b13_window_tumbling", "b1_filter_compound", "b1_filter_eq",
      "b2_project_expr", "b3_expr_json", "b4_raw_limit", "b5_group_agg",
      "b5_group_all", "b5_group_cap_probe", "b6_count_distinct",
      "b6_theta_distinct", "b6_theta_grouped", "b7_kll_quantile",
      "b7_pmf_cdf", "b7_quantile", "b8_freq_topk", "b8_topk",
      "b9_post_agg_chain", "bql_count_distinct", "bql_filter_project",
      "bql_group_agg", "bql_having_expr", "bql_topk", "cube_agg",
      "dd_embed_cosine", "dd_exact", "dd_minhash_lsh", "dd_ngram_jaccard",
      "dd_simhash", "fn_datetime", "fn_string_math", "j_anti",
      "j_broadcast_inner", "j_left_outer", "j_multiway_star", "j_semi",
      "mm_features", "mm_frame_count", "mm_ingest_meta", "op_asof_join",
      "op_range_join", "op_sessionize", "rollup_agg", "samp_hash_sample",
      "samp_train_val_test", "set_except", "set_intersect", "set_union",
      "topn_orders", "tx_fingerprint", "tx_langid", "tx_ngram_freq",
      "tx_quality", "tx_tokens", "wf_analytic")
    val baselineSubset = results.view.filterKeys(round1Baseline.contains)
    val subtotal = baselineSubset.values.sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""baseline_subset_sec":$subtotal,"baseline_subset_n":${baselineSubset.size},""" +
      s""""load_start":$loadStart,"load_end":${loadMarker()},""" +
      s""""sf":"$sfDir"}"""
    // the driver keeps only a bounded stdout TAIL, which has truncated the
    // per-query map in past rounds (BENCH_r13.json.parsed: null, per-query
    // times regex-recovered) — so the full line is ALSO written whole to a
    // file (SPARK_GRAFT_BENCH_OUT overrides the default repo-cwd path);
    // stdout keeps the driver contract's single JSON line as before
    // a name-filtered A/B run must NOT clobber the full-sweep artifact
    if (only.isEmpty)
      try java.nio.file.Files.write(
        java.nio.file.Paths.get(
          sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")),
        json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case _: Throwable => () } // an unwritable cwd must not fail the bench
    println(json)
    // The driver keeps only the last ~2000 stdout chars: at 254 queries the
    // full line above is ~10 KB, so its head (and the "queries" map) has
    // been truncated out of every round's BENCH_rNN.json capture and the
    // driver's parse has returned null since round 1 (PERF per_query empty).
    // A COMPACT summary line is therefore printed LAST — totals + the
    // baseline subset + counts, small enough to always survive the tail
    // window — while the full per-query map stays in the line above and in
    // BENCH_FULL.json. Nothing is removed or renamed: the contract line is
    // unchanged and still printed first.
    val compact = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""n":${results.size},"baseline_subset_sec":$subtotal,""" +
      s""""baseline_subset_n":${baselineSubset.size},"cpus":$cpus,""" +
      s""""queries_file":"BENCH_FULL.json","sf":"$sfDir"}"""
    println(compact)
    spark.stop()
  }
}
