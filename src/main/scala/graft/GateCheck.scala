package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Machine-readable quality gates for the NON-oracle (approximate /
  * seed-dependent) queries — the 21 `no_oracle` rows in the driver's
  * CORRECTNESS artifact. Each row re-measures the query's primary
  * quantitative gate (recall vs its exact counterpart, differential
  * parity with its batch twin, structural completeness, error bound)
  * exactly as the spec suite does (ApproxSuiteSpec / BloomPrefilterSpec /
  * IndexPersistenceSpec / IngestAndMultimodalSpec own the full
  * assertions; this main distills one health number per gate) and emits
  * ONE JSON file the driver can diff round-over-round without running
  * ScalaTest:
  *
  * {{{
  * sbt "runMain graft.GateCheck /root/testdata/sf0.01,/root/testdata/sf0.1 GATES.json 13"
  * }}}
  *
  * Output: `{"round": N, "sfs": [...], "all_pass": bool, "runs": [{"sf",
  * "all_pass", "gates": [{"query", "gate", "measured", "op", "bound",
  * "pass"}, ...]}, ...], "gates_delta": [{"sf", "query", "gate", "prev",
  * "measured", "delta"}, ...]}` (top-level `sf`/`gates` mirror the first
  * run for round-over-round diffs against the pre-13 single-SF format) —
  * every no_oracle query contributes at least one row PER SCALE; a
  * recall regression at either SF flips `pass` false, and `gates_delta`
  * (computed against the previous round's file, read before the
  * overwrite) surfaces measured-value drift rounds before it crosses a
  * bound.
  * Everything here is deterministic (seeded hashes, fixed fixtures), so
  * a pass/fail flip is a real regression, never flake. */
object GateCheck {

  final case class Gate(query: String, gate: String, measured: Double,
      op: String, bound: Double) {
    def pass: Boolean = op match {
      case ">=" => measured >= bound
      case "<=" => measured <= bound
      case "==" => measured == bound
      case _ => false
    }
    def json: String =
      s"""{"query":"$query","gate":"$gate","measured":$measured,""" +
        s""""op":"$op","bound":$bound,"pass":$pass}"""
  }

  private def pairSet(df: DataFrame, a: String, b: String): Set[(Long, Long)] =
    df.select(a, b).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Id shift separating replica copies in the 4x corpus — pairs with
    * both ids below it are the ORIGINAL pair structure. */
  private val Rep4Shift = 100000000L

  /** 4x-replicated embeddings + documents corpus for the octave gates
    * (the ScaleCheck replica protocol: ids shifted so keys stay
    * distinct, content identical), cached per fixture dir. */
  private def rep4Dir(spark: SparkSession, sfDir: String): String = {
    val out = "/tmp/graft_gate_rep4_" + java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(sfDir).toLong & 0xffffffffL)
    if (!new java.io.File(s"$out/embeddings.parquet/_SUCCESS").exists() ||
        !new java.io.File(s"$out/documents.parquet/_SUCCESS").exists()) {
      val e = graft.sources.Tables.load(spark, sfDir, "embeddings")
      (0 until 4).map(i => e.withColumn("vec_id", col("vec_id") + lit(i * Rep4Shift)))
        .reduce(_.union(_))
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      (0 until 4).map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * Rep4Shift)))
        .reduce(_.union(_))
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
    }
    out
  }

  def main(args: Array[String]): Unit = {
    // arg0: comma-separated SF dirs (estimate-regime gates run at EVERY
    // listed scale — sketch-capacity recalls at sf0.1 are a different
    // regime than sf0.01); arg1: output file; arg2: round label.
    val sfDirs = args.headOption.getOrElse("/root/testdata/sf0.01,/root/testdata/sf0.1")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val outFile = if (args.length > 1) args(1) else "GATES.json"
    val round = if (args.length > 2) args(2).toInt else 0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // previous round's artifact (the driver leaves it in place): parsed
    // BEFORE the overwrite so the new file can carry per-gate DELTAS —
    // measured-value MOVEMENT, not just pass/fail, so a drifting recall
    // is visible rounds before it crosses a bound.
    val prev: Map[(String, String, String), Double] =
      if (new java.io.File(outFile).isFile) {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(outFile)), java.nio.charset.StandardCharsets.UTF_8)
        val runRe = """\{"sf":"([^"]+)","all_pass":[^\[]*"gates":\[""".r
        val gateRe = ("""\{"query":"([^"]+)","gate":"([^"]+)",""" +
          """"measured":([-0-9.eE]+)""").r
        // gates between one run header and the next belong to that sf
        val starts = runRe.findAllMatchIn(txt).toSeq
        starts.zipWithIndex.flatMap { case (m, i) =>
          val end = if (i + 1 < starts.size) starts(i + 1).start else txt.length
          gateRe.findAllMatchIn(txt.substring(m.end, end)).map(g =>
            (m.group(1), g.group(1), g.group(2)) -> g.group(3).toDouble)
        }.toMap
      } else Map.empty

    val runs = sfDirs.map { sfDir =>
      val gates = gatesFor(spark, sfDir)
      gates.foreach(g => println(
        f"[gate] ${if (g.pass) "PASS" else "FAIL"} [$sfDir] ${g.query}%-22s ${g.gate}%-40s ${g.measured}%.4f ${g.op} ${g.bound}"))
      sfDir -> gates
    }
    val allPass = runs.forall(_._2.forall(_.pass))
    val nGates = runs.map(_._2.size).sum
    val runsJson = runs.map { case (sf, gates) =>
      s"""{"sf":"$sf","all_pass":${gates.forall(_.pass)},"n_gates":${gates.size},""" +
        s""""gates":[${gates.map(_.json).mkString(",")}]}"""
    }.mkString(",")
    val deltaJson = runs.flatMap { case (sf, gates) =>
      gates.map { g =>
        val p = prev.get((sf, g.query, g.gate))
        s"""{"sf":"$sf","query":"${g.query}","gate":"${g.gate}",""" +
          s""""prev":${p.map(_.toString).getOrElse("null")},""" +
          s""""measured":${g.measured},""" +
          s""""delta":${p.map(v => (g.measured - v).toString).getOrElse("null")}}"""
      }
    }.mkString(",")
    val json = s"""{"round":$round,"sfs":[${sfDirs.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""sf":"${sfDirs.head}","all_pass":$allPass,"n_gates":$nGates,""" +
      s""""gates":[${runs.head._2.map(_.json).mkString(",")}],"runs":[$runsJson],""" +
      s""""gates_delta":[$deltaJson]}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[gate] ${runs.map(_._2.count(_.pass)).sum}/$nGates pass " +
      s"across ${sfDirs.size} SFs -> $outFile")
    spark.stop()
    if (!allPass) sys.exit(1)
  }

  /** All gate rows for one fixture scale. */
  def gatesFor(spark: SparkSession, sfDir: String): Seq[Gate] = {
    def run(name: String): DataFrame = SparkEntry.queries(name)(spark, sfDir)

    val gates = scala.collection.mutable.ArrayBuffer.empty[Gate]

    // ---- near-dup candidate generation vs the exact shingle baseline ----
    val exactPairs = pairSet(run("dd_ngram_jaccard"), "doc_a", "doc_b")
    val lshPairs = pairSet(run("dd_minhash_lsh"), "doc_a", "doc_b")
    gates += Gate("dd_minhash_lsh", "pair_recall_vs_exact_jaccard",
      (exactPairs & lshPairs).size.toDouble / math.max(1, exactPairs.size), ">=", 0.8)
    val simPairs = pairSet(run("dd_simhash"), "doc_a", "doc_b")
    gates += Gate("dd_simhash", "pair_recall_vs_exact_jaccard",
      (exactPairs & simPairs).size.toDouble / math.max(1, exactPairs.size), ">=", 0.5)

    // ---- embedding near-dup vs the exact cosine baseline ----
    val exactCos = pairSet(run("dd_embed_cosine"), "vec_a", "vec_b")
    val semPairs = pairSet(run("dd_semdedup"), "vec_a", "vec_b")
    gates += Gate("dd_semdedup", "pair_recall_vs_exact_cosine",
      (exactCos & semPairs).size.toDouble / math.max(1, exactCos.size), ">=", 0.8)
    gates += Gate("dd_semdedup", "false_positive_pairs",
      (semPairs -- exactCos).size.toDouble, "==", 0)

    // ---- decontamination / incremental screens: doc recall vs exact ----
    val sources = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val exactContaminated = exactPairs.flatMap { case (a, b) =>
      (sources(a) == "src0", sources(b) == "src0") match {
        case (true, false) => Some(b)
        case (false, true) => Some(a)
        case _ => None
      }
    }
    val crossNear = run("dd_cross_near").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    gates += Gate("dd_cross_near", "doc_recall_vs_exact_cross_split",
      (exactContaminated & crossNear).size.toDouble /
        math.max(1, exactContaminated.size), ">=", 0.7)

    // ---- the approximate dedup family at the NEXT corpus octave ----
    // The IVF octave gate caught PQ decay a round early; the same 4x
    // protocol now covers banding/threshold decay in the dedup family.
    // Recall is measured ONLY over the ORIGINAL pair structure (both ids
    // below the replica shift): replication floods the corpus with exact
    // self-pairs any banding finds trivially, so counting them would
    // inflate recall exactly when crowding (hot-bucket caps, fuller LSH
    // bands, bigger IVF lists) starts dropping the real pairs — the
    // decay these gates exist to catch. Bounds sit an octave under the
    // fixture bounds (lsh 0.8→0.7, simhash 0.5→0.4, semdedup 0.8→0.6,
    // cross 0.7→0.6), the IVF headroom rule.
    {
      val rep4 = rep4Dir(spark, sfDir)
      def origPairs(df: DataFrame, a: String, b: String): Set[(Long, Long)] =
        pairSet(df, a, b).filter(p => p._1 < Rep4Shift && p._2 < Rep4Shift)
      val lsh4 = origPairs(
        SparkEntry.queries("dd_minhash_lsh")(spark, rep4), "doc_a", "doc_b")
      gates += Gate("dd_minhash_lsh", "orig_pair_recall_vs_exact_4x_corpus",
        (exactPairs & lsh4).size.toDouble / math.max(1, exactPairs.size),
        ">=", 0.7)
      val sim4 = origPairs(
        SparkEntry.queries("dd_simhash")(spark, rep4), "doc_a", "doc_b")
      gates += Gate("dd_simhash", "orig_pair_recall_vs_exact_4x_corpus",
        (exactPairs & sim4).size.toDouble / math.max(1, exactPairs.size),
        ">=", 0.4)
      val sem4 = origPairs(
        SparkEntry.queries("dd_semdedup")(spark, rep4), "vec_a", "vec_b")
      gates += Gate("dd_semdedup", "orig_pair_recall_vs_exact_cosine_4x_corpus",
        (exactCos & sem4).size.toDouble / math.max(1, exactCos.size),
        ">=", 0.6)
      val crossNear4 = SparkEntry.queries("dd_cross_near")(spark, rep4)
        .select("doc_id").collect().map(_.getLong(0))
        .filter(_ < Rep4Shift).toSet
      gates += Gate("dd_cross_near", "orig_doc_recall_vs_exact_4x_corpus",
        (exactContaminated & crossNear4).size.toDouble /
          math.max(1, exactContaminated.size), ">=", 0.6)
    }

    def srcNum(src: String): Int =
      scala.util.Try(src.drop(3).toInt).getOrElse(Int.MinValue)
    val exactCrossBatch = exactPairs.flatMap { case (a, b) =>
      (srcNum(sources(a)) >= 15, srcNum(sources(b)) >= 15) match {
        case (true, false) => Some(a)
        case (false, true) => Some(b)
        case _ => None
      }
    }
    val verdicts = run("dd_incremental_near").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val flagged = verdicts.filter { case (_, v) =>
      v == "near_dup_of_corpus" || v == "dup_of_corpus" }.keySet
    gates += Gate("dd_incremental_near", "doc_recall_vs_exact_cross_batch",
      (exactCrossBatch & flagged).size.toDouble /
        math.max(1, exactCrossBatch.size), ">=", 0.7)

    // ss_near_screen: sig-verified drain ≡ the batch store verdicts
    // (drained ∖ exact-dups == near verdicts, and nothing outside both)
    val nearV = verdicts.filter(_._2 == "near_dup_of_corpus").keySet
    val dupV = verdicts.filter(_._2 == "dup_of_corpus").keySet
    val screened = run("ss_near_screen").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // symmetric difference of (screened ∖ exact-dups) vs the near verdicts
    val screenDiff = ((screened -- dupV) -- nearV).size +
      (nearV -- (screened -- dupV)).size
    gates += Gate("ss_near_screen", "verdict_set_difference_vs_batch",
      screenDiff.toDouble, "==", 0)

    // ---- bloom decontamination prefilter + its streaming twin ----
    val bloom = run("dd_bloom_prefilter").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val bloomFlagged = bloom.filter(_._2 == 1L).map(_._1).toSet
    // ground truth: train docs sharing a token-set fingerprint with the
    // eval split (the BloomPrefilterSpec truth join, same md5 expression
    // as Fingerprints.tokenSetFp)
    val docsDf = graft.sources.Tables.load(spark, sfDir, "documents")
    val fpCol = md5(concat_ws(" ", array_sort(array_distinct(split(col("text"), " ")))))
    val withFp = docsDf.select(col("doc_id"), col("source"), fpCol.as("fp"))
    val evalFps = withFp.filter(col("source") === "src0").select(col("fp")).distinct()
    val truth = withFp.filter(col("source") =!= "src0")
      .join(evalFps, Seq("fp"), "left_semi")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val bloomFp = (bloomFlagged -- truth).size
    gates += Gate("dd_bloom_prefilter", "false_positive_docs",
      bloomFp.toDouble, "<=", math.max(1, bloom.length / 100).toDouble)
    gates += Gate("dd_bloom_prefilter", "missed_true_collisions",
      (truth -- bloomFlagged).size.toDouble, "==", 0)
    val bloomStream = run("ss_bloom_screen").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    gates += Gate("ss_bloom_screen", "row_mismatches_vs_batch",
      bloomStream.diff(bloom.sorted.toSeq).size.toDouble +
        bloom.sorted.toSeq.diff(bloomStream).size.toDouble, "==", 0)

    // ---- ANN family: recall@10 vs the exact brute-force ranks ----
    // Bounds mirror ApproxSuiteSpec's fixture gates. The IVF rows now run
    // the SCALING RULE (kClusters ~ sqrt(corpus), nProbe holding list
    // coverage at spark.graft.ivf.coverage) rather than fixed knobs —
    // round-13 sat exactly ON the old 0.50 bound at sf0.1; the rule
    // measures 0.74-0.86 across SFs, so both IVF bounds rise to 0.6 WITH
    // headroom. The spec suite additionally holds ivf/pq to >= 0.8 on a
    // cosine-CLUSTERED fixture (this fixture's weak structure makes
    // recall ~track coverage).
    val brute = pairSet(run("ann_brute_topk"), "qid", "vec_id")
    for ((q, bound) <- Seq(("ann_lsh_topk", 0.5), ("ann_ivf_topk", 0.6),
        ("ann_ivf_bigk", 0.6), ("ann_pq_topk", 0.7))) {
      val approx = pairSet(run(q), "qid", "vec_id")
      gates += Gate(q, "recall_at_10_vs_brute",
        (brute & approx).size.toDouble / math.max(1, brute.size), ">=", bound)
    }

    // ---- IVF at the NEXT corpus octave: 4x-replicated embeddings ----
    // The decay mechanism both IVF and PQ hit (recall falling as corpus
    // outgrows fixed index geometry) is caught an octave EARLY: recall is
    // re-measured on a 4x-replicated corpus (ids shifted, content
    // identical — the ScaleCheck replica protocol), where the scaling
    // rule must still clear 0.55. A rule that stops tracking corpus
    // growth breaks here before it can break the fixture gates above.
    val rep4 = rep4Dir(spark, sfDir)
    val brute4 = pairSet(SparkEntry.queries("ann_brute_topk")(spark, rep4),
      "qid", "vec_id")
    val ivf4 = pairSet(SparkEntry.queries("ann_ivf_topk")(spark, rep4),
      "qid", "vec_id")
    gates += Gate("ann_ivf_topk", "recall_at_10_vs_brute_4x_corpus",
      (brute4 & ivf4).size.toDouble / math.max(1, brute4.size), ">=", 0.55)

    // ann_bucket_stats: exact partition of the corpus across buckets
    val bucketRows = run("ann_bucket_stats").collect()
    val nVecs = graft.sources.Tables.load(spark, sfDir, "embeddings").count()
    gates += Gate("ann_bucket_stats", "vectors_outside_exactly_one_bucket",
      math.abs(bucketRows.map(_.getLong(1)).sum - nVecs).toDouble, "==", 0)

    // ---- bitext: ANN alignment vs the exact margin miner ----
    val exactBx = run("emb_bitext_mine").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val annBx = run("emb_bitext_ann").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val agree = exactBx.count { case (a, (b, _)) =>
      annBx.get(a).exists(_._1 == b) }
    gates += Gate("emb_bitext_ann", "pick_agreement_vs_exact",
      agree.toDouble / math.max(1, exactBx.size), ">=", 0.4)
    val ratios = exactBx.collect { case (a, (_, m)) if m > 0 && annBx.contains(a) =>
      annBx(a)._2.toDouble / m }
    gates += Gate("emb_bitext_ann", "mean_margin_ratio_vs_exact",
      ratios.sum / math.max(1, ratios.size), ">=", 0.95)

    // ---- PCA: distributed projection variance vs driver eigenvalues ----
    val pcaRows = run("emb_pca_project").collect()
    val pcaDev = pcaRows.map { r =>
      val (v, evv) = (r.getLong(2), r.getLong(3))
      math.abs(v - evv).toDouble / math.max(1.0, evv / 20.0)
    }.max
    gates += Gate("emb_pca_project", "max_component_var_deviation",
      pcaDev, "<=", 1.0)

    // ---- streaming IVF assignment vs the batch pass ----
    val drained = run("ss_ann_assign").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val embeddings = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val k = spark.conf.getOption("spark.graft.ivf.k").map(_.toInt).getOrElse(16)
    val cents = graft.queries.Ivf.train(embeddings, k, iters = 3, trainSample = 2000)
    val batchAssign = graft.queries.Ivf.assigned(embeddings, cents).collect()
      .map(r => r.getLong(0) -> r.getInt(2).toLong).toMap
    gates += Gate("ss_ann_assign", "assignment_mismatches_vs_batch",
      (batchAssign.count { case (id, c) => !drained.get(id).contains(c) } +
        (drained.keySet -- batchAssign.keySet).size).toDouble, "==", 0)

    // ---- maintained IVF index + deletion propagation: EXACT equality ----
    // Both serve through the shared SimilarityQueries.ivfProbeSearch from
    // a postings store; assignment under FIXED centroids is per-row
    // deterministic, so these contracts are exact zero-mismatch
    // equalities, not recall bounds. The gate rebuilds the batch
    // counterpart with the same deterministic training (hash-ordered
    // sample, fixed iters — bit-identical centroids).
    def triples(df: DataFrame): Set[(Long, Long, Long)] =
      df.select(col("qid"), col("rank").cast("long"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val eAll = embeddings.select(col("vec_id"), col("embedding"))
    val ivfK = graft.queries.Ivf.intConf(spark, "spark.graft.ivf.k", 16)
    val ivfIters = graft.queries.Ivf.intConf(spark, "spark.graft.ivf.iters", 3)
    val ivfSample = graft.queries.Ivf.intConf(spark, "spark.graft.ivf.trainSample", 2000)
    val fixedCents = graft.queries.Ivf.train(eAll, ivfK, ivfIters, ivfSample)
    // nProbe from cents.size, NOT the conf k: Ivf.train may return fewer
    // centroids than requested on small corpora, and the queries under
    // test (fg_ivf_delete) derive nProbe from the actual centroid count.
    val nProbe = math.max(3, math.ceil(
      spark.conf.get("spark.graft.ivf.coverage", "0.375").toDouble
        * fixedCents.size).toInt)

    val maintained = triples(run("ss_ivf_maintain"))
    val batchIndex = triples(graft.queries.SimilarityQueries.ivfProbeSearch(
      graft.queries.Ivf.assigned(eAll, fixedCents),
      eAll.filter(col("vec_id") < graft.queries.SimilarityQueries.NQueries),
      fixedCents, nProbe))
    gates += Gate("ss_ivf_maintain", "search_mismatches_vs_batch_index",
      ((maintained -- batchIndex).size + (batchIndex -- maintained).size).toDouble,
      "==", 0)

    // ---- automatic segment compaction mid-stream: serving unchanged ----
    // Force the Ivf.compactIfDue threshold below the fixture's slice
    // count so the lists_upto_<B> swap fires DURING the drain, then
    // hold serving to the same zero-mismatch equality — the policy can
    // reorganize the store but never change an answer.
    val compacted = {
      spark.conf.set("spark.graft.ivf.segCompactAfter", "2")
      try triples(run("ss_ivf_maintain"))
      finally spark.conf.unset("spark.graft.ivf.segCompactAfter")
    }
    gates += Gate("ss_ivf_maintain", "search_mismatches_across_auto_compaction",
      ((compacted -- batchIndex).size + (batchIndex -- compacted).size).toDouble,
      "==", 0)

    val purgedServed = triples(run("fg_ivf_delete"))
    val tombIds = eAll.filter(col("vec_id") % 97 === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    gates += Gate("fg_ivf_delete", "tombstoned_ids_in_results",
      purgedServed.count(t => tombIds(t._3)).toDouble, "==", 0)
    val purgedRebuild = triples(graft.queries.SimilarityQueries.ivfProbeSearch(
      graft.queries.Ivf.assigned(eAll.filter(col("vec_id") % 97 =!= 0), fixedCents),
      eAll.filter(col("vec_id") >= 1 &&
        col("vec_id") <= graft.queries.SimilarityQueries.NQueries),
      fixedCents, nProbe))
    gates += Gate("fg_ivf_delete", "search_mismatches_vs_purged_rebuild",
      ((purgedServed -- purgedRebuild).size +
        (purgedRebuild -- purgedServed).size).toDouble, "==", 0)

    // ---- BPE tokenizer: round-trip identity, bounds, rule uniqueness ----
    // Tokenization must be LOSSLESS: reconstructing each document from
    // its token stream (drop separators, map the </w> sentinel back to a
    // space) must reproduce the text exactly, for every doc. Token
    // counts are bounded by construction (>= words, <= chars + 1), and
    // the merge table must be duplicate-free; compression < 1 proves the
    // merges are non-vacuous on this corpus.
    val bpeM = graft.queries.TextQueries.bpeMerges(spark, sfDir)
    val bpeT = graft.queries.TextQueries.bpeTokenized(spark, sfDir, bpeM)
      .join(docsDf.select(col("doc_id"),
        coalesce(col("text"), lit("")).as("text")), Seq("doc_id"))
      .select(col("doc_id"), col("n_words"), col("n_tokens"),
        length(col("text")).as("n_chars"),
        (expr("rtrim(replace(replace(tok_stream, ' ', ''), '</w>', ' '))")
          === col("text")).as("rt_ok"))
      .collect()
    gates += Gate("tx_bpe_apply", "round_trip_mismatch_docs",
      bpeT.count(!_.getBoolean(4)).toDouble, "==", 0)
    gates += Gate("tx_bpe_apply", "token_count_bound_violations",
      bpeT.count(r => r.getLong(2) < r.getLong(1) ||
        r.getLong(2) > r.getInt(3) + 1).toDouble, "==", 0)
    gates += Gate("tx_bpe_apply", "compression_tokens_per_char_split",
      bpeT.map(_.getLong(2)).sum.toDouble /
        math.max(1L, bpeT.map(_.getInt(3).toLong + 1).sum), "<=", 0.9)
    val bpeRules = run("tx_bpe_train").collect()
      .map(r => (r.getString(1), r.getString(2)))
    gates += Gate("tx_bpe_train", "duplicate_merge_rules",
      (bpeRules.length - bpeRules.distinct.length).toDouble, "==", 0)

    // ---- generic multimodal kernel: distributed ≡ driver-side decode ----
    val mmRows = run("mm_features").collect()
    val localFeats = docsDf.select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        graft.multimodal.Multimodal.decodeToFeatures(r.getString(1).getBytes)).toMap
    val mmMismatch = mmRows.count { r =>
      val f = localFeats(r.getLong(0))
      val topBin = f.indexOf(f.max) + 1
      r.getInt(1) != topBin || r.getInt(2) != f.length
    } + (localFeats.size - mmRows.length)
    gates += Gate("mm_features", "kernel_parity_mismatches",
      mmMismatch.toDouble, "==", 0)

    // ---- MJPEG video round trip (mm_video_mjpeg, no SQL oracle —
    // DCT quantization): container structure EXACT (frame count + dims
    // reproduce the fixture's closed form), and each constant-gray
    // frame's decoded mean within JPEG DC-quantization of the source.
    val vj = run("mm_video_mjpeg").collect()
    gates += Gate("mm_video_mjpeg", "frame_count_or_dim_mismatches",
      vj.count { r =>
        r.getLong(1) != r.getLong(2) ||
          r.getLong(3) != 8 + r.getLong(0) % 5 ||
          r.getLong(4) != 8 + r.getLong(0) % 4
      }.toDouble, "==", 0)
    gates += Gate("mm_video_mjpeg", "max_mean_gray_deviation",
      vj.map(_.getLong(5)).max.toDouble, "<=", 2)

    // ---- deflate compressibility filter (tx_compress_ratio, no SQL
    // oracle — DuckDB has no deflate). Three certificates: output
    // bounds (a raw deflate stream of n bytes costs at most n + small
    // framing), redundancy exploitation (doubling the text must NOT
    // double the cost — the property the boilerplate filter relies
    // on), and determinism across re-runs (same JVM, same settings).
    val cr = run("tx_compress_ratio").collect()
    gates += Gate("tx_compress_ratio", "bounds_violations",
      cr.count { r =>
        val n = r.getLong(1); val d = r.getLong(2)
        d <= 0 || d > n + 64
      }.toDouble, "==", 0)
    gates += Gate("tx_compress_ratio", "doubling_not_exploited",
      cr.count { r =>
        r.getLong(1) >= 64 && r.getLong(3) >= 2 * r.getLong(2)
      }.toDouble, "==", 0)
    val cr2 = run("tx_compress_ratio").collect()
    gates += Gate("tx_compress_ratio", "rerun_mismatches",
      cr.zip(cr2).count { case (a, b) => a != b }.toDouble, "==", 0)

    gates.toSeq
  }
}
