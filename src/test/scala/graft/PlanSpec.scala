package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions.{col, count, explode, expr, greatest, least, lit, sequence, size, split, sum, to_date}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.debug
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan discipline gates: the properties that carry these plans
  * to 100 TB, asserted against the actual executed plans so a regression
  * (lost pushdown, join strategy flip, codegen fallback) fails CI rather
  * than a future bench run. */
class PlanSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = GraftSession.local(4)

  /** Execute (so AQE finalizes) and return the final physical plan. */
  private def finalPlan(df: DataFrame): SparkPlan = {
    df.write.format("noop").mode("overwrite").save()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def planStr(name: String): String =
    finalPlan(SparkEntry.queries(name)(spark, sfDir)).toString

  test("filters are pushed to the parquet scan") {
    val p = planStr("b1_filter_eq")
    assert(p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]"), p)
  }

  test("scans are column-pruned to the projection") {
    val p = planStr("b1_filter_eq")
    val scan = p.linesIterator.find(_.contains("FileScan parquet")).getOrElse(fail("no scan"))
    // scan attribute list must not include the unused ts/props columns
    assert(!scan.contains("props#") && !scan.contains("ts#"), scan)
  }

  test("star join broadcasts every dimension") {
    val p = planStr("j_multiway_star")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 3, p)
    assert(!p.contains("SortMergeJoin"), "fact side must not shuffle for dims")
  }

  test("semi/anti subqueries stay semi/anti joins") {
    assert(planStr("j_semi").contains("LeftSemi"))
    assert(planStr("j_anti").contains("LeftAnti"))
  }

  test("top-n compiles to TakeOrderedAndProject, not global sort") {
    val p = planStr("topn_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("group aggregation is partial+final hash aggregate") {
    val p = planStr("b5_group_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("top-paths mines triples in ONE user window pass, heap-selects top-25") {
    val p = planStr("op_top_paths")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-25 paths must be per-partition heaps, not a global sort:\n$p")
    // the session boundary must ride the SAME user_id window as the
    // triple leads — re-partitioning on (user, session) would double the
    // event-table shuffle
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      s"expected exactly one user_id exchange:\n$p")
  }

  test("keywords top-3/doc is the bounded heap, not a per-doc window sort") {
    val p = planStr("tx_keywords")
    assert(!p.contains("WindowExec") && !p.contains("Window"),
      s"per-doc top-3 must be topk_min partial+final, not a window rank:\n$p")
    assert(p.contains("topk_min") || p.contains("TopKMin"),
      s"expected the bounded-heap aggregate in the plan:\n$p")
  }

  test("time travel joins no intervals: probe coverage is sequence math") {
    val p = planStr("op_time_travel")
    assert(!p.contains("SortMergeJoin"),
      s"interval containment must be the sequence explode, not a range join:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the 1-row (lo, step) frame must broadcast:\n$p")
  }

  test("label propagation: labels broadcast every round, edges never sort-merge") {
    SparkEntry.queries("op_label_prop")(spark, sfDir) // eager builder
    val p = graft.operators.GraphIterate.recentPlans("labelprop").last
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"each of the 3 rounds must broadcast the O(nodes) label table:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the edge table must never shuffle for a label join:\n$p")
  }

  test("skyline runs bucketed-prefilter then global: two window partitionings") {
    val p = planStr("op_skyline")
    assert(p.contains("hashpartitioning(lang") ,
      s"expected lang-keyed window exchanges:\n$p")
    assert(p.contains("bucket"),
      s"phase 1 must partition by (lang, bucket) — the scale prefilter:\n$p")
  }

  test("lag covariance joins only post-aggregate frames") {
    val p = planStr("op_lag_cov")
    assert(!p.contains("CartesianProduct"),
      s"the 7-row lag table must broadcast, not cartesian:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"the daily conditional counts must combine map-side:\n$p")
  }

  test("collocation top-100 is a bounded heap with broadcast totals") {
    val p = planStr("tx_collocations")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-100 by lift must be per-partition heaps, not a global sort:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the 1-row token/bigram totals must broadcast:\n$p")
  }

  /** AQE hides subtrees behind QueryStageExec leaves; disable it while
    * rendering generated code so codegenString can traverse the plan. */
  private def codegenOf(name: String): String = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try debug.codegenString(
      SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan)
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("custom vector expressions stay inside whole-stage codegen") {
    assert(codegenOf("ann_brute_topk").contains("graft.functions.DotProduct.compute"),
      "dot product must be compiled into generated code, not interpreted fallback")
    assert(codegenOf("ann_lsh_topk").contains("graft.functions.CosineSimilarity.compute"),
      "cosine must be compiled into generated code, not interpreted fallback")
  }

  test("minhash/simhash expressions stay inside whole-stage codegen") {
    assert(codegenOf("dd_minhash_lsh").contains("graft.functions.MinHashSig.compute"),
      "minhash in codegen")
    assert(codegenOf("dd_simhash").contains("graft.functions.SimHash64.compute"),
      "simhash in codegen")
  }

  test("ngram join exchanges hashed longs, not shingle strings") {
    val p = planStr("dd_ngram_jaccard")
    val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty, p)
    assert(!exchanges.exists(_.contains("shingle#")),
      s"shingle strings must be hashed before the exchange:\n${exchanges.mkString("\n")}")
  }

  test("ivf search joins broadcast probes; no pmf/cdf single-partition window") {
    val ivf = planStr("ann_ivf_topk")
    assert(ivf.contains("BroadcastHashJoin") || ivf.contains("BroadcastExchange"),
      s"IVF probe side must broadcast:\n$ivf")
    val pmf = planStr("b7_pmf_cdf")
    assert(!pmf.contains("Window"), s"pmf/cdf must not use WindowExec:\n$pmf")
    assert(pmf.contains("BroadcastHashJoin") || pmf.contains("BroadcastNestedLoopJoin"),
      s"cdf running sum must be a broadcast range-join:\n$pmf")
  }

  test("quantile binning broadcasts KLL cut points; no per-stratum window sort") {
    val p = planStr("fn_quantile_bin")
    assert(!p.contains("Window"),
      s"fn_quantile_bin must bin via broadcast cut points, not a per-source ntile window:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the |sources|x9 cuts frame must broadcast-join back onto the corpus:\n$p")
  }

  test("decontamination broadcasts the eval shingle set; corpus never shuffles shingles") {
    val p = planStr("tx_decontaminate")
    assert(p.contains("BroadcastHashJoin"), s"eval side must broadcast:\n$p")
    val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(!exchanges.exists(_.contains("sg#")),
      s"corpus shingle strings must never hit an exchange:\n${exchanges.mkString("\n")}")
  }

  test("canonical corpus drops duplicates via broadcast anti-join") {
    val p = planStr("dd_canonical_corpus")
    assert(p.contains("LeftAnti"), s"drop set must anti-join:\n$p")
    assert(p.linesIterator.exists(l => l.contains("LeftAnti") && l.contains("Broadcast")),
      s"the (tiny) drop set must broadcast under AQE:\n$p")
  }

  test("chunking stays one shuffle-free codegen explode; rarity aggregates partial+final") {
    val chunk = planStr("tx_chunk")
    assert(!chunk.contains("Window"), s"no window machinery in chunking:\n$chunk")
    val chunkExchanges = chunk.linesIterator.count(_.contains("Exchange"))
    assert(chunkExchanges <= 1, s"only the oracle ORDER BY may exchange:\n$chunk")
    val rarity = planStr("tx_rarity")
    assert("HashAggregate".r.findAllIn(rarity).size >= 2,
      s"vocabulary count must map-side combine:\n$rarity")
    val rarityExchanges = rarity.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(!rarityExchanges.exists(_.contains("t#")),
      s"token strings must be hashed before any exchange:\n${rarityExchanges.mkString("\n")}")
  }

  test("mixture sampling broadcasts the rates table; importance hashes tokens before exchange") {
    val mix = planStr("samp_mixture")
    assert(mix.contains("BroadcastHashJoin"),
      s"the O(#sources) rates config must broadcast, never shuffle the corpus:\n$mix")
    val imp = planStr("tx_importance")
    val exchanges = imp.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty, imp)
    assert(!exchanges.exists(_.contains("t#")),
      s"token strings must be hashed to longs before any exchange:\n${exchanges.mkString("\n")}")
    assert(imp.contains("BroadcastNestedLoopJoin") || imp.contains("BroadcastExchange"),
      s"the 1-row totals frame must ride in as a broadcast:\n$imp")
  }

  test("filtered ann pushes the metadata predicate into the candidate scan") {
    val p = planStr("ann_filtered_topk")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"probe side must broadcast:\n$p")
    assert(p.contains("PushedFilters") && p.contains("IsNotNull(label)"),
      s"label predicate must reach the parquet scan:\n$p")
  }

  test("bm25 broadcasts corpus stats and heap-selects top-k; cross-dedup broadcasts eval") {
    val p = planStr("srch_bm25")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must be per-partition heaps, not a global sort:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the 1-row stats frame must broadcast:\n$p")
    val x = planStr("dd_cross_dedup")
    assert(x.contains("BroadcastHashJoin"),
      s"the benchmark-sized eval fingerprint set must broadcast:\n$x")
    assert(!x.contains("SortMergeJoin"), s"the corpus must not shuffle:\n$x")
    val cl = planStr("tx_classify")
    assert(!cl.contains("Exchange hashpartitioning"),
      s"classifier scoring is a per-row fold; only the oracle ORDER BY may exchange:\n$cl")
    val fz = planStr("dd_fuzzy_names")
    assert(fz.contains("BroadcastNestedLoopJoin"),
      s"fuzzy matching compares the broadcast distinct vocabulary, never corpus rows:\n$fz")
  }

  test("full outer shuffles both sides; pivot is one conditional aggregate; unpivot never shuffles") {
    val fo = planStr("j_full_outer")
    assert(fo.contains("FullOuter"), s"join must be full outer:\n$fo")
    val pv = planStr("op_pivot")
    // explicit value list → two map-side-combined aggregate stages and no
    // distinct-scan job; every exchange must sit above a partial aggregate
    assert(pv.contains("partial_pivotfirst"), s"pivot must pre-aggregate map-side:\n$pv")
    assert("Exchange hashpartitioning".r.findAllIn(pv).size <= 2,
      s"pivot with bound values is two aggregate exchanges, no more:\n$pv")
    val up = planStr("op_unpivot")
    assert(!up.contains("Exchange hashpartitioning"),
      s"unpivot is a per-row local fan-out; only the oracle ORDER BY may exchange:\n$up")
  }

  test("source overlap and bigram rarity exchange only 8-byte hashes, never shingle strings") {
    val so = planStr("dd_source_overlap")
    val soEx = so.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(soEx.nonEmpty, so)
    // positive check: the source-set fold keys on the 8-byte hash column;
    // negative: neither the text column nor any materialized shingle
    // string reaches an exchange
    assert(soEx.exists(_.contains("h#")),
      s"source-set fold must key on the shingle hash:\n${soEx.mkString("\n")}")
    assert(!soEx.exists(l => l.contains("text#") || l.contains("sh#")),
      s"shingle/text strings must never hit an exchange:\n${soEx.mkString("\n")}")
    assert(so.contains("BroadcastHashJoin"),
      s"the O(#sources) totals frame must broadcast:\n$so")
    val bg = planStr("tx_bigram_rarity")
    val bgEx = bg.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(!bgEx.exists(_.contains("b#")),
      s"bigram strings must be hashed to longs before any exchange:\n${bgEx.mkString("\n")}")
    assert("HashAggregate".r.findAllIn(bg).size >= 2,
      s"bigram vocabulary count must map-side combine:\n$bg")
  }

  test("knn classify broadcasts probes; vocab coverage and containment exchange hashes only") {
    val knn = planStr("emb_knn_classify")
    assert(knn.contains("BroadcastNestedLoopJoin") || knn.contains("BroadcastHashJoin"),
      s"the probe set must broadcast — the corpus never shuffles for the distance pass:\n$knn")
    val knnEx = knn.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(!knnEx.exists(l => l.contains("embedding#") || l.contains("qe#")),
      s"vectors must be reduced to scores before the rank shuffle:\n${knnEx.mkString("\n")}")
    val vc = planStr("tx_vocab_coverage")
    assert("HashAggregate".r.findAllIn(vc).size >= 2,
      s"vocabulary count must map-side combine:\n$vc")
    val vcEx = vc.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(!vcEx.exists(l => l.contains("t#") || l.contains("text#")),
      s"token strings must be hashed to longs before any exchange:\n${vcEx.mkString("\n")}")
    val ct = planStr("dd_containment")
    val ctEx = ct.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(ctEx.nonEmpty, ct)
    assert(!ctEx.exists(l => l.contains("text#") || l.contains("shingle#")),
      s"shingle strings must never hit an exchange:\n${ctEx.mkString("\n")}")
  }

  test("paragraph dedup exchanges only hashed chunk keys; fn_array never shuffles") {
    val pd = planStr("dd_paragraph")
    val pdEx = pd.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(pdEx.nonEmpty, pd)
    // the chunk text is hashed inside codegen — neither the token array
    // nor the text column may reach an exchange
    assert(!pdEx.exists(l => l.contains("t#") || l.contains("text#")),
      s"chunk strings must be hashed to longs before any exchange:\n${pdEx.mkString("\n")}")
    assert("HashAggregate".r.findAllIn(pd).size >= 2,
      s"first-occurrence min must map-side combine:\n$pd")
    val fa = planStr("fn_array")
    assert(!fa.contains("Exchange hashpartitioning"),
      s"higher-order array ops are a per-row fold; only the oracle ORDER BY may exchange:\n$fa")
    assert(!fa.contains("Generate"),
      s"the array must never explode:\n$fa")
    val fm = planStr("fn_map")
    assert(!fm.contains("Exchange hashpartitioning"),
      s"the tf map is built and interrogated per row; only the oracle ORDER BY may exchange:\n$fm")
    assert(!fm.contains("Generate"),
      s"the map must never explode:\n$fm")
  }

  test("phrase search exchanges carry anchors, not terms or text") {
    val pp = planStr("srch_phrase")
    val ppEx = pp.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(ppEx.nonEmpty, pp)
    // the term filter and the posting->anchor projection run inside the
    // explode's codegen stage: no token string may reach an exchange
    assert(!ppEx.exists(l => l.contains("term#") || l.contains("text#")),
      s"postings must shuffle as (phrase_id, doc_id, anchor) longs only:\n${ppEx.mkString("\n")}")
    assert("HashAggregate".r.findAllIn(pp).size >= 4,
      s"both anchor-vote and occurrence counts must map-side combine:\n$pp")
  }

  test("pq search never shuffles vectors or codes") {
    val pq = planStr("ann_pq_topk")
    val ex = pq.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(ex.nonEmpty, pq)
    // ADC projects (qid, vec_id, acos) before the shortlist window's
    // exchange and the refine joins are broadcast: the corpus's vectors
    // and code columns must never be repartitioned
    assert(!ex.exists(l => l.contains("embedding#") || l.contains("c0#")),
      s"only (qid, vec_id, score) rows may reach an exchange:\n${ex.mkString("\n")}")
    assert(pq.contains("BroadcastHashJoin") || pq.contains("BroadcastNestedLoopJoin"),
      s"probe and shortlist joins must broadcast:\n$pq")
  }

  test("ann family ranks via the bounded-heap aggregate — no per-probe window sort") {
    // the round-7 finding: row_number().over(partitionBy(qid)) shuffles
    // every scored candidate into |probes| reducers — for the PQ ADC pass
    // that is the whole corpus into 5 tasks. The topk_min aggregate keeps
    // <= k rows per probe per map task, so the exchange is |probes| x k
    // regardless of candidate-set size.
    for (n <- Seq("ann_brute_topk", "ann_filtered_topk", "ann_lsh_topk",
        "ann_ivf_topk", "ann_pq_topk", "emb_knn_classify", "samp_group_cap",
        "samp_exact_n")) {
      val p = planStr(n)
      assert(!p.contains("Window"), s"$n must not rank via a window sort:\n$p")
      assert(p.contains("ObjectHashAggregate"),
        s"$n must rank via the topk_min object aggregate:\n$p")
      assert(p.contains("partial_topk_min"),
        s"$n's rank must combine map-side (partial+final):\n$p")
    }
  }

  test("temperature sampling broadcasts the rates frame; the corpus never re-shuffles") {
    // the |strata|-row rate table joins back by broadcast, so the accept
    // pass is one codegen filter over the scan; the only hash exchanges
    // belong to the tiny per-stratum count aggregate (keyed on lang)
    val p = planStr("samp_temperature")
    assert(p.contains("BroadcastHashJoin"),
      s"rates must broadcast back onto the corpus:\n$p")
    val ex = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(ex.forall(_.contains("lang")),
      s"only the stratum-count aggregate may shuffle:\n${ex.mkString("\n")}")
  }

  test("robust z-score: two KLL passes broadcast back; no per-stratum window sort") {
    val p = planStr("fn_robust_zscore")
    assert(!p.contains("Window"),
      s"median/MAD must come from mergeable KLL sketches, not window sorts:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"both the median and MAD frames must broadcast-join back:\n$p")
    assert(p.contains("partial_kll_sketch_agg_double"),
      s"the sketches must combine map-side:\n$p")
  }

  test("boilerplate removal: anti-join broadcasts the frequent set; frequency pass shuffles hashes") {
    val p = planStr("tx_remove_boilerplate")
    assert(p.contains("LeftAnti"), s"surviving chunks come from an anti-join:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the boilerplate-hash set must broadcast:\n$p")
    val ex = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(!ex.exists(_.contains("chunk#")),
      s"exchanges must key on 8-byte hashes or doc_id, never chunk text:\n${ex.mkString("\n")}")
  }

  test("bucketed layout co-locates the fact-fact join: no hash exchange in the plan") {
    // both sides bucketed on the join key -> the SMJ's distribution
    // requirement is met by the LAYOUT; the per-order aggregate's
    // clustering is a superset of the bucket key so it re-uses the same
    // partitioning — the only exchange is the output sort's range part.
    val p = planStr("op_bucketed_join")
    assert(p.contains("SortMergeJoin"), s"merge hint must hold the SMJ path:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketing must satisfy both the join and the aggregate distribution:\n$p")
    assert(p.contains("Bucketed: true"),
      s"both scans must read the bucketed layout:\n$p")
  }

  test("hybrid retrieval: corpus pays only the BM25 heap; vector math is shortlist-side") {
    val p = planStr("srch_hybrid")
    assert(p.contains("TakeOrderedAndProject"),
      s"the BM25 shortlist must be a bounded heap, not a global sort:\n$p")
    // the embeddings join must broadcast (the 20-row shortlist side),
    // so the corpus-scale side never shuffles for the re-rank
    assert(p.contains("BroadcastHashJoin"),
      s"the shortlist re-rank must be a broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no corpus-sized shuffle join belongs in the funnel:\n$p")
  }

  test("salted join spreads the key across salt-qualified exchanges") {
    val sj = planStr("op_salted_join")
    val ex = sj.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(ex.exists(_.contains("__salt")),
      s"the join exchanges must partition by (key, salt):\n${ex.mkString("\n")}")
    assert(sj.contains("SortMergeJoin"),
      s"the demonstration must take the shuffle path, not broadcast:\n$sj")
  }

  test("grouping sets expand map-side into one aggregate exchange") {
    val gs = planStr("op_grouping_sets")
    assert(gs.contains("Expand"), s"grouping sets must expand, not rescan per set:\n$gs")
    assert("HashAggregate".r.findAllIn(gs).size >= 2,
      s"expanded rows must pre-aggregate map-side:\n$gs")
    assert("Exchange hashpartitioning".r.findAllIn(gs).size <= 1,
      s"both sets must share ONE aggregate shuffle:\n$gs")
  }

  test("bql-compiled plans get the same pushdown as hand-written ones") {
    val df = graft.bql.Compiler.compile(
      "SELECT event_id FROM STREAM WHERE event_type == 'click'")._2(
      graft.sources.Tables.load(spark, sfDir, "events"))
    val p = finalPlan(df).toString
    assert(p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]"), p)
  }

  test("cdc compaction combines map-side; the exchange carries keys, not the log") {
    // the whole point of the max_by formulation: a partial aggregate
    // BEFORE the exchange (one row per key per mapper crosses the wire),
    // and no WindowExec ranking whole shuffled partitions
    val p = planStr("op_cdc_upsert")
    assert(!p.contains("Window"), s"compaction must not rank via a window sort:\n$p")
    assert(p.contains("partial_max_by"), s"compaction must combine map-side:\n$p")
    val agg = "SortAggregate".r.findAllIn(p).size + "HashAggregate".r.findAllIn(p).size
    assert(agg >= 2, s"compaction must be partial+final:\n$p")
  }

  test("funnel stages stay co-partitioned on the user key") {
    // after the first hash exchange on user_id, the stage joins and later
    // aggregates must reuse that partitioning — no second exchange SHAPE
    // (every exchange in the plan hashes on user_id alone)
    val p = planStr("op_funnel")
    val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty, p)
    assert(exchanges.forall(_.contains("user_id")),
      s"every funnel exchange must key on user_id:\n${exchanges.mkString("\n")}")
  }

  test("bql ORDER BY + LIMIT compiles to top-n, not a global sort") {
    val p = planStr("bql_orderby_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("AQE splits a runtime-detected skewed join partition (no manual salt)") {
    // the runtime complement of op_salted_join's compile-time salting:
    // when a shuffle partition turns out hot at the stage boundary, AQE
    // re-plans the sort-merge join to read that partition in slices
    // (AQEShuffleRead ... skewed / SMJ skew=true). Thresholds are tuned
    // down for the tiny fixture; at real scale the defaults (factor 5,
    // 256 MB) fire on their own — this gate proves the engine's session
    // config actually enables the path.
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.files.maxPartitionBytes",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> spark.conf.get(k))
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8192")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8192")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "262144")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // sf0.1 events (100k rows): enough shuffle bytes for the skew
      // detector's size stats to see the hot partition at tiny thresholds
      val ev = graft.sources.Tables.load(spark, "/root/testdata/sf0.1", "events")
        // 90% of the log collapses onto ONE join key
        .withColumn("k",
          org.apache.spark.sql.functions.when(col("event_id") % 10 =!= 0, 1L)
            .otherwise(col("event_id")))
      val right = graft.sources.Tables.load(spark, "/root/testdata/sf0.1", "events")
        .select(col("event_id").as("k2"), col("value").as("v2"))
      // a runtime replan only lands in THIS QueryExecution — drive it
      // with collect() (the noop-write helper executes a separate one).
      // The repartition(16) gives the join shuffle MANY map tasks: skew
      // splitting slices a hot reduce partition at map-output-block
      // granularity, and the single-row-group fixture parquet would
      // otherwise put the whole hot partition in ONE map's output —
      // unsplittable however hot the key. (On a real cluster the fact
      // table's thousands of scan tasks provide this for free.)
      val df = ev.repartition(16)
        .join(right.repartition(16), col("k") === col("k2"))
      df.collect()
      val p = (df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case x => x
      }).toString
      assert(p.contains("skew=true") || p.contains("skewed"),
        s"AQE must split the hot partition:\n$p")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // the 100 TB lever for selective-dim shuffle joins: Catalyst injects a
    // bloom_filter_agg over the filtered dim keys and a might_contain
    // filter on the fact scan, so most fact rows die before the exchange.
    // Thresholds are tuned down because the fixture is tiny; at real scale
    // the defaults (10 GB application side) trigger on their own.
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> spark.conf.get(k))
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
    try {
      val d = graft.sources.Tables.load(spark, sfDir, "orders")
        .filter(col("o_totalprice") > 400000)
      val f = graft.sources.Tables.load(spark, sfDir, "lineitem")
      val j = f.join(d, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      val p = finalPlan(j).toString
      assert(p.contains("might_contain"),
        s"fact side must be bloom-pruned before the exchange:\n$p")
      assert(p.contains("bloom_filter_agg"), p)
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("interval-overlap join runs as a bucket equi-join, never a nested loop") {
    // the inequality-only formulation would fall back to
    // BroadcastNestedLoopJoin (O(|A|·|B|)); the bucketized plan must be a
    // shuffle/broadcast HASH or sort-merge join on the bucket key with the
    // overlap predicate as a post-join filter
    val p = planStr("j_interval_overlap")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"interval join must not nested-loop:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("bloom prefilter screens the corpus in one scan — no join in the plan") {
    val p = planStr("dd_bloom_prefilter")
    assert(!p.contains("Join"), s"membership screen must be join-free:\n$p")
    assert(p.contains("might_contain"), p)
  }

  test("date-partitioned layout prunes partitions at the scan") {
    // the data-layout half of scan discipline: a pipeline that writes its
    // event log partitioned by day gets day-ranged reads that never open
    // the other days' files — PartitionFilters at the scan, not a
    // post-read filter. (Row-group min/max pruning inside files comes
    // free from parquet once data is additionally sorted in-partition.)
    val dir = s"/tmp/graft_layout_${java.util.UUID.randomUUID().toString.take(8)}"
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
    try {
      ev.withColumn("day", to_date(col("ts")))
        .write.partitionBy("day").parquet(dir)
      val read = spark.read.parquet(dir)
        .filter(col("day") === "2024-01-05")
        .select(col("event_id"), col("user_id"))
      val p = finalPlan(read).toString
      val scan = p.linesIterator.find(_.contains("FileScan parquet")).getOrElse(fail(p))
      assert(scan.contains("PartitionFilters: [isnotnull(day"), scan)
      assert(scan.contains("(day"), scan) // the equality predicate is partition-level
      // and it is NOT also a post-scan data filter
      assert(!p.contains("PushedFilters: [IsNotNull(day"), p)
      val expected = ev.filter(to_date(col("ts")) === "2024-01-05").count()
      assert(read.count() == expected)
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("dynamic partition pruning: a joined dim filter prunes fact partitions at runtime") {
    // the OTHER half of partition discipline: the day predicate lives on a
    // DIM table, not the fact scan, so static pruning can't fire — Catalyst
    // must inject a dynamicpruningexpression into the fact scan's
    // PartitionFilters, fed by the (reused) broadcast of the filtered dim.
    // At 100 TB this is the difference between scanning 3 days and 3 years
    // when the date range arrives via a calendar/dim join.
    val base = s"/tmp/graft_dpp_${java.util.UUID.randomUUID().toString.take(8)}"
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
    try {
      ev.withColumn("day", to_date(col("ts")))
        .write.partitionBy("day").parquet(s"$base/fact")
      // calendar dim: one row per day, a non-partition attribute to filter
      // on. The predicate must be literal-comparison-shaped — DPP's
      // hasSelectivePredicate ignores a bare boolean attribute.
      ev.select(to_date(col("ts")).as("day")).distinct()
        .withColumn("label",
          org.apache.spark.sql.functions.when(
            col("day").between("2024-01-02", "2024-01-04"), "window")
            .otherwise("rest"))
        .write.parquet(s"$base/dim")
      val fact = spark.read.parquet(s"$base/fact")
      val dim = spark.read.parquet(s"$base/dim")
        .filter(col("label") === "window").select(col("day"))
      // aggregate over real data columns: a zero-column fact scan estimates
      // ~0 bytes and fails DPP's pruning-benefit check (filterRatio ×
      // factSize must exceed the dim subquery's cost)
      val j = fact.join(dim, Seq("day"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n"),
          org.apache.spark.sql.functions.sum(col("value")).as("sv"))
      val p = finalPlan(j).toString
      val scan = p.linesIterator
        .filter(_.contains("FileScan parquet"))
        .find(_.contains("/fact")).getOrElse(fail(p))
      assert(scan.contains("dynamicpruningexpression"),
        s"fact scan must carry a runtime partition filter:\n$scan")
      // and the result matches the statically-filtered recompute
      val expected = ev.withColumn("day", to_date(col("ts")))
        .filter(col("day").between("2024-01-02", "2024-01-04"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n"),
          org.apache.spark.sql.functions.sum(col("value")).as("sv"))
        .collect().toSet
      val got = j.collect().toSet
      assert(got == expected)
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("phash near-dup pairs via the band equi-join, never an all-pairs product") {
    // the image twin of the minhash discipline: candidates must come from
    // the (dims, band, value) hash join — an inequality-only formulation
    // would nested-loop O(|docs|²) over every same-dim pair
    val p = planStr("mm_phash_neardup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"band join must stay an equi-join:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("scd2 history build rides one user-keyed exchange end to end") {
    // both row_number windows, the run aggregate, and the lead window
    // all cluster on user_id (or a superset) — hashpartitioning(user_id)
    // satisfies every one of them, so the whole pipeline should need
    // exactly one hash exchange
    val p = planStr("op_scd2")
    val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.size == 1,
      s"scd2 must reuse one user_id exchange:\n${exchanges.mkString("\n")}\n$p")
    assert(exchanges.head.contains("user_id"), exchanges.head)
  }

  test("sequence packing's prefix-sum window is bucket-partitioned, never global") {
    val p = planStr("tx_pack_sequences")
    // the cumsum window must carry the bucket partition key — an empty
    // partitionBy would funnel the whole corpus into ONE window task
    val windows = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.nonEmpty, s"expected the bucketed cumsum window:\n$p")
    assert(windows.forall(_.contains("windowspecdefinition(b#")),
      s"the window must partition by the doc_id bucket:\n${windows.mkString("\n")}")
    // and the result equals the one-task reference on the fixture
    val got = SparkEntry.queries("tx_pack_sequences")(spark, sfDir)
      .collect().map(_.toString).toSeq
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("ntok"))
      .withColumn("st", sum(col("ntok")).over(w) - col("ntok"))
      .withColumn("seq_id", explode(sequence(
        expr("st div 512"), expr("(st + ntok - 1) div 512"))))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("st") + col("ntok"), (col("seq_id") + 1) * 512)
          - greatest(col("st"), col("seq_id") * 512)).as("n_tokens"))
      .orderBy(col("seq_id"))
      .collect().map(_.toString).toSeq
    assert(got == ref, "bucketed prefix sum must equal the global-window reference")
  }

  test("transition matrix second aggregate carries type-pair keys, not events") {
    val p = planStr("op_transitions")
    // one window exchange (user timeline) + one aggregate exchange whose
    // keys are the (src, dst) pair — partial+final so each task emits
    // ~|types|^2 rows into the final exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("Window"), p)
  }
}
