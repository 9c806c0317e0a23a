package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.funsuite.AnyFunSuite

/** Quality gates for the approximate (non-oracle) operators: each is
  * measured against its exact counterpart on the sf0.01 fixtures.
  * Everything is deterministic (seeded hashes, fixed data), so these are
  * exact assertions, not flaky statistical ones. */
class ApproxSuiteSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.01"
  private lazy val spark: SparkSession = GraftSession.local(4)

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("minhash-lsh recall vs exact ngram jaccard") {
    val exact = run("dd_ngram_jaccard").select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = run("dd_minhash_lsh").select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "exact baseline found no near-dup pairs")
    val recall = (exact & lsh).size.toDouble / exact.size
    info(s"exact=${exact.size} lsh=${lsh.size} recall=$recall")
    assert(recall >= 0.8, s"LSH recall $recall below 0.8 (found ${lsh.size}, exact ${exact.size})")
  }

  test("cross-split near-dup decontamination recalls the exact cross-split docs") {
    // ground truth: exact ngram-jaccard pairs with exactly one side in
    // the eval split (src0) — the contaminated TRAIN doc set
    val sources = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val exactPairs = run("dd_ngram_jaccard").select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val exactContaminated = exactPairs.flatMap { case (a, b) =>
      (sources(a) == "src0", sources(b) == "src0") match {
        case (true, false) => Some(b)
        case (false, true) => Some(a)
        case _ => None
      }
    }.toSet
    assert(exactContaminated.nonEmpty, "fixture has no exact cross-split near-dups")
    val near = run("dd_cross_near").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val recall = (exactContaminated & near).size.toDouble / exactContaminated.size
    info(s"exact=${exactContaminated.size} near=${near.size} recall=$recall")
    assert(recall >= 0.7,
      s"cross-split near-dup recall $recall below 0.7 " +
        s"(found ${near.size}, exact ${exactContaminated.size})")
    // flagged docs must be real near-dups of SOME eval doc per the
    // signature estimate — sanity: the flagged set can't dwarf the
    // corpus (the whole train split would mean degenerate banding)
    assert(near.size < sources.size / 2, s"flagged ${near.size} of ${sources.size} docs")
  }

  test("incremental near-dup store recalls the exact cross-batch near-dups; batch side broadcasts") {
    // ground truth: exact ngram-jaccard pairs with one side in the
    // corpus split (srcN < 15) and one in the batch split (>= 15) — the
    // batch docs a full-corpus near-dup pass would have caught
    def srcNum(src: String): Int =
      scala.util.Try(src.drop(3).toInt).getOrElse(Int.MinValue)
    val sources = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val exactPairs = run("dd_ngram_jaccard").select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val exactCross = exactPairs.flatMap { case (a, b) =>
      (srcNum(sources(a)) >= 15, srcNum(sources(b)) >= 15) match {
        case (true, false) => Some(a)
        case (false, true) => Some(b)
        case _ => None
      }
    }.toSet
    assert(exactCross.nonEmpty, "fixture has no exact cross-batch near-dups")
    val df = run("dd_incremental_near")
    val verdicts = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val flagged = verdicts.filter { case (_, v) =>
      v == "near_dup_of_corpus" || v == "dup_of_corpus" }.keySet
    val recall = (exactCross & flagged).size.toDouble / exactCross.size
    info(s"exactCross=${exactCross.size} flagged=${flagged.size} recall=$recall")
    assert(recall >= 0.7, s"incremental near-dup recall $recall below 0.7")
    assert(flagged.size < verdicts.size / 2, "flagged set dwarfs the batch: degenerate banding")
    // exact verdicts agree with dd_incremental wherever the near check
    // doesn't take precedence: dup_of_corpus is identical in both
    val exactVerdicts = run("dd_incremental").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(verdicts.keySet == exactVerdicts.keySet)
    exactVerdicts.foreach { case (id, v) =>
      if (v == "dup_of_corpus") assert(verdicts(id) == "dup_of_corpus", s"doc $id: $v became ${verdicts(id)}")
      if (verdicts(id) == "new") assert(v == "new", s"doc $id: near variant lost verdict $v")
    }
    // the store (corpus-sized) must never be shuffled for the candidate
    // or verify joins: the day batch broadcasts. With AQE the store-side
    // joins must all plan as broadcast joins — no sort-merge/shuffled-
    // hash join may touch a near_store scan.
    df.write.format("noop").mode("overwrite").save()
    val plan = (df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a store-side join degraded to sort-merge (day batch must broadcast):\n$plan")
  }

  test("ss_near_screen drains the same corpus-near docs the batch store query flags") {
    // the streaming screen is SIGNATURE-based, the batch verdicts are
    // precedence-ordered (exact fp first). The fixture's exact dups are
    // SHUFFLED copies — same token set (fp hit) but different shingles,
    // so they are NOT sig-reachable in general. The exact differential
    // is therefore on the non-exact part: drained ∖ dup_of_corpus must
    // EQUAL the near_dup_of_corpus verdict set (both are "sig-verified,
    // not exact"), and nothing outside the two verdict classes may ever
    // be drained.
    val streamed = run("ss_near_screen").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val verdicts = run("dd_incremental_near").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val nearV = verdicts.filter(_._2 == "near_dup_of_corpus").keySet
    val dupV = verdicts.filter(_._2 == "dup_of_corpus").keySet
    assert(nearV.nonEmpty, "fixture has no near-dup-of-corpus batch docs")
    assert((streamed -- dupV) == nearV,
      s"drained-minus-exact ${(streamed -- dupV).size} != near verdicts ${nearV.size}: " +
        s"${((streamed -- dupV) -- nearV).take(3)} extra, ${(nearV -- (streamed -- dupV)).take(3)} missing")
    assert(streamed.subsetOf(nearV ++ dupV),
      s"drained docs outside the sig-verified verdict classes: ${(streamed -- nearV -- dupV).take(5)}")
  }

  test("near store commit: after appending a day's new docs, re-screening finds no new") {
    import graft.queries.DedupQueries
    // isolated store dir: the commit MUTATES the store, and the shared
    // /tmp store must stay a pure function of the fixture for Verify
    val tmp = java.nio.file.Files.createTempDirectory("graft_commit_spec").toString
    spark.conf.set("spark.graft.index.dir", tmp)
    try {
      val before = run("dd_incremental_near").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val nNew = before.values.count(_ == "new")
      val nInBatch = before.values.count(_ == "dup_in_batch")
      assert(nNew > 0, "fixture batch must contain genuinely new docs")
      val committed = DedupQueries.nearStoreCommitNew(spark, sfDir)
      assert(committed == nNew, s"committed $committed docs, expected the $nNew 'new' ones")
      // day N+1 replays the same batch: every former 'new' doc is now an
      // exact corpus hit, and every 'dup_in_batch' doc's first occurrence
      // is in the store too — nothing is 'new' twice
      val after = run("dd_incremental_near").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(after.keySet == before.keySet)
      assert(!after.values.exists(v => v == "new" || v == "dup_in_batch"),
        s"re-screen after commit still sees: ${after.filter(kv => kv._2 == "new" || kv._2 == "dup_in_batch").take(5)}")
      before.foreach { case (id, v) =>
        if (v == "new" || v == "dup_in_batch")
          assert(after(id) == "dup_of_corpus" || after(id) == "near_dup_of_corpus",
            s"doc $id: $v became ${after(id)}")
        else assert(after(id) == v, s"doc $id: stable verdict $v drifted to ${after(id)}")
      }
      info(s"committed $committed new docs; $nInBatch dup_in_batch docs now resolve against the store")
      // compaction: bands rebuilt from the accumulated sigs (re-sorted,
      // re-capped, append files collapsed) must not change any verdict
      DedupQueries.nearStoreCompact(spark, sfDir)
      val compacted = run("dd_incremental_near").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(compacted == after, "compaction changed screening verdicts")
    } finally {
      spark.conf.unset("spark.graft.index.dir")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("compaction crash safety: a crash at either rename leaves a store the next read recovers") {
    import graft.queries.DedupQueries
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact_crash").toString
    spark.conf.set("spark.graft.index.dir", tmp)
    try {
      def verdicts() = run("dd_incremental_near").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val baseline = verdicts() // builds the store
      val storePath = DedupQueries.nearStorePath(spark, sfDir)
      def bands = new java.io.File(storePath + "/bands")
      def old = new java.io.File(storePath + "/bands_old")

      // crash point 1: after `bands -> bands_old`, before the replacement
      // lands — the delete-then-rename pattern would have lost the data
      // here; two-rename keeps it intact in bands_old
      DedupQueries.compactCrashPoint = 1
      intercept[java.io.IOException] { DedupQueries.nearStoreCompact(spark, sfDir) }
      DedupQueries.compactCrashPoint = 0
      assert(!bands.exists() && old.exists(),
        "crash point 1 should leave bands absent but bands_old intact")
      // a reader arriving mid-crash recovers the swap and screens identically
      assert(verdicts() == baseline, "post-crash-1 screening diverged")
      assert(bands.exists() && !old.exists(), "recovery did not restore bands/")

      // crash point 2: new layout live, leftover bands_old not yet deleted
      DedupQueries.compactCrashPoint = 2
      intercept[java.io.IOException] { DedupQueries.nearStoreCompact(spark, sfDir) }
      DedupQueries.compactCrashPoint = 0
      assert(bands.exists() && old.exists(),
        "crash point 2 should leave the new bands live with a bands_old leftover")
      assert(verdicts() == baseline, "post-crash-2 screening diverged")
      assert(!old.exists(), "recovery did not sweep the bands_old leftover")

      // an uninterrupted compaction still completes cleanly afterwards
      DedupQueries.nearStoreCompact(spark, sfDir)
      assert(bands.exists() && !old.exists())
      assert(verdicts() == baseline, "clean compaction changed screening verdicts")
    } finally {
      DedupQueries.compactCrashPoint = 0
      spark.conf.unset("spark.graft.index.dir")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("near store manifest: a regenerated fixture at the same path invalidates the store") {
    import graft.queries.DedupQueries
    val tmp = java.nio.file.Files.createTempDirectory("graft_store_stamp").toString
    spark.conf.set("spark.graft.index.dir", tmp)
    try {
      val baseline = run("dd_incremental_near").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val storePath = DedupQueries.nearStorePath(spark, sfDir)
      val manifest = new java.io.File(storePath + "/_MANIFEST")
      assert(manifest.exists(), "store build must finish by writing the manifest")
      val stamp = new String(java.nio.file.Files.readAllBytes(manifest.toPath)).trim
      assert(stamp == DedupQueries.nearStoreStamp(sfDir))
      // a store whose manifest no longer matches the fixture (regenerated
      // fixture / crashed build) must be rebuilt, not silently served
      java.nio.file.Files.write(manifest.toPath, "stale".getBytes)
      val sigsMarker = new java.io.File(storePath + "/sigs/_PROBE_STALE")
      java.nio.file.Files.write(sigsMarker.toPath, Array.emptyByteArray)
      assert(run("dd_incremental_near").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap == baseline)
      assert(!sigsMarker.exists(), "stale store was served instead of rebuilt")
      assert(new String(java.nio.file.Files.readAllBytes(manifest.toPath)).trim == stamp,
        "rebuild must restore the fixture stamp")
      // a crashed FIRST build (no manifest yet) also rebuilds
      org.apache.commons.io.FileUtils.deleteQuietly(manifest)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(storePath + "/bands"))
      assert(run("dd_incremental_near").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap == baseline)
      assert(manifest.exists())
    } finally {
      spark.conf.unset("spark.graft.index.dir")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("simhash finds the shuffled/mutated near-dup pairs") {
    val sim = run("dd_simhash").select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = run("dd_ngram_jaccard").select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    info(s"simhash=${sim.size} exact=${exact.size} overlap=${(sim & exact).size}")
    assert(sim.nonEmpty, "simhash found no candidate pairs")
    // simhash (token-multiset signal) must recover a majority of the
    // high-jaccard pairs the shingle baseline finds
    assert((sim & exact).size.toDouble / exact.size >= 0.5)
  }

  /** Run `name` on `dir` after capturing the `lsh_skew_<name>` observed
    * metric; returns (collected rows, metric row). Metrics post async on
    * the listener bus, so poll with a deadline. */
  private def runCapturingSkew(name: String, dir: String, cap: Int): (Array[Row], Row) = {
    @volatile var metrics: Option[Row] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        qe.observedMetrics.get(s"lsh_skew_$name").foreach(m => metrics = Some(m))
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    spark.conf.set("spark.graft.lsh.maxBucket", cap.toString)
    try {
      val rows = SparkEntry.queries(name)(spark, dir).collect()
      val deadline = System.nanoTime() + 20L * 1000 * 1000 * 1000
      while (metrics.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      (rows, metrics.getOrElse(fail(s"lsh_skew_$name metric never observed")))
    } finally {
      spark.conf.unset("spark.graft.lsh.maxBucket")
      spark.listenerManager.unregister(listener)
    }
  }

  /** Adversarial skew fixture: 1,000 identical boilerplate docs (ONE
    * maximally hot bucket per band/chunk) plus two distinct docs. */
  private def hotBucketFixture(tag: String): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(tag).toString
    val boiler = (0L until 1000L).map(i =>
      (i, "common boilerplate header text repeated across the whole crawl segment", "en", "s", 66L))
    val rest = Seq(
      (5000L, "totally unrelated document body one", "en", "s", 35L),
      (5001L, "another distinct piece of writing here", "en", "s", 38L))
    (boiler ++ rest).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("minhash-lsh hot bucket is capped, observed, and pair work stays bounded") {
    // uncapped, this fixture generates 16 x C(1000,2) ≈ 8M candidate pairs;
    // with cap=32 every band keeps the same 32 lowest doc_ids, so exactly
    // C(32,2) verified pairs survive and the observed pair count proves the
    // quadratic was bounded at the postings stage.
    val (res, m) = runCapturingSkew("dd_minhash_lsh", hotBucketFixture("graftlshskew"), 32)
    assert(res.length == 32 * 31 / 2, s"expected C(32,2) pairs, got ${res.length}")
    assert(res.forall(_.getDouble(2) == 1.0), "identical docs must verify at est_jaccard 1.0")
    assert(m.getAs[Long]("hot_buckets") == 16L, s"all 16 band buckets hot: $m")
    assert(m.getAs[Long]("entries_dropped") == 16L * (1000 - 32), s"dropped tail logged: $m")
    assert(m.getAs[Long]("candidate_pairs") == 16L * (32 * 31 / 2), s"bounded pair work: $m")
  }

  test("simhash hot chunk bucket is capped, observed, and pair work stays bounded") {
    // identical docs → identical fingerprints → all 4 chunk buckets hot;
    // cap=32 keeps the 32 lowest doc_ids per chunk → C(32,2) hamming-0 pairs
    val (res, m) = runCapturingSkew("dd_simhash", hotBucketFixture("graftsimskew"), 32)
    val boilerPairs = res.filter(r => r.getLong(0) < 1000 && r.getLong(1) < 1000)
    assert(boilerPairs.length == 32 * 31 / 2, s"expected C(32,2) pairs, got ${boilerPairs.length}")
    assert(boilerPairs.forall(_.getInt(2) == 0), "identical docs are hamming 0")
    assert(m.getAs[Long]("hot_buckets") == 4L, s"all 4 chunk buckets hot: $m")
    assert(m.getAs[Long]("entries_dropped") == 4L * (1000 - 32), s"dropped tail logged: $m")
    assert(m.getAs[Long]("candidate_pairs") == 4L * (32 * 31 / 2), s"bounded pair work: $m")
  }

  test("lsh ann recall@10 vs brute force") {
    val brute = run("ann_brute_topk").select("qid", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = run("ann_lsh_topk").select("qid", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    info(s"recall@10 = $recall")
    assert(recall >= 0.5, s"LSH ANN recall@10 $recall below 0.5")
  }

  test("ivf ann recall@10 vs brute force") {
    val brute = run("ann_brute_topk").select("qid", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = run("ann_ivf_topk").select("qid", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    info(s"recall@10 = $recall")
    // The fixture's embeddings have weak cosine-cluster structure (true
    // top-10 neighbors scatter across labels — measured), so IVF recall
    // here tracks scanned-corpus coverage. The SCALING RULE (kClusters ~
    // sqrt(corpus), nProbe holding coverage at spark.graft.ivf.coverage
    // = 0.375) measures 0.82 on this fixture — the quantizer must still
    // beat the coverage floor by a wide margin, which is what proves the
    // lists are real. The clustered-fixture test below shows the same
    // pipeline at 1.0 recall on data that HAS cosine structure.
    assert(recall >= 0.6, s"IVF ANN recall@10 $recall below 0.6")
  }

  /** Cosine-clustered embeddings fixture: 20 tight Gaussian cones,
    * within-cone cos ~0.99, cross-cone ~0 — data with REAL cosine
    * structure for the IVF gates. */
  private def clusteredFixture(tag: String): String = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 32; val cones = 20; val perCone = 100
    val centers = Array.fill(cones)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val rows = (0 until cones * perCone).map { i =>
      val c = centers(i % cones)
      (i.toLong, c.map(x => x + 0.12f * rnd.nextGaussian().toFloat).toSeq, i % cones)
    }
    val dir = java.nio.file.Files.createTempDirectory(tag).toString
    rows.toDF("vec_id", "embedding", "label").write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("ivf ann recall@10 >= 0.8 on a cosine-clustered fixture") {
    // Proof that the 0.64 recall above is the fixture's (lack of) cosine
    // structure, not a quantizer bug: on data with real cosine clusters
    // the same IVF pipeline tuned to kClusters=#cones must recover the
    // brute-force top-10 nearly perfectly.
    val cones = 20
    val dir = clusteredFixture("graftivf")
    spark.conf.set("spark.graft.ivf.kClusters", cones.toString)
    spark.conf.set("spark.graft.ivf.nProbe", "3")
    try {
      val brute = SparkEntry.queries("ann_brute_topk")(spark, dir).select("qid", "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ivf = SparkEntry.queries("ann_ivf_topk")(spark, dir).select("qid", "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (brute & ivf).size.toDouble / brute.size
      info(s"clustered-fixture recall@10 = $recall")
      assert(recall >= 0.8, s"IVF recall@10 $recall below 0.8 on clustered data")
    } finally {
      spark.conf.unset("spark.graft.ivf.kClusters")
      spark.conf.unset("spark.graft.ivf.nProbe")
    }
  }

  test("ivf join-shaped MULTI-assignment is row-identical to the literal path") {
    // dd_semdedup's boundary-pair recovery at index-scale k: the
    // broadcast-join + bounded-heap top-nAssign must pick the same
    // (vector, cluster) rows as the sorted-literal-array path, including
    // the tiebreak (best score, then highest index).
    import org.apache.spark.sql.functions.col
    val e = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val cents = graft.queries.Ivf.train(e, kClusters = 12, iters = 3, trainSample = 2000)
    def rows(threshold: String): Set[(Long, Int)] = {
      spark.conf.set("spark.graft.ivf.joinAssignThreshold", threshold)
      try graft.queries.Ivf.multiAssigned(e, cents, nAssign = 3).collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      finally spark.conf.unset("spark.graft.ivf.joinAssignThreshold")
    }
    val lit = rows("100000")
    val joined = rows("0")
    assert(lit.nonEmpty && lit == joined,
      s"multi-assign paths diverged: literal ${lit.size} rows, join ${joined.size}")
  }

  test("ivf join-shaped assignment is row-identical to the literal path") {
    // past spark.graft.ivf.joinAssignThreshold the corpus assignment runs
    // as broadcast-centroids-DataFrame + max(struct) argmax instead of a
    // k-term literal expression. Same training, same tiebreak (best
    // score, then highest index) → the two plans must produce the SAME
    // rows, and the executed plans must prove each path was taken.
    val dir = clusteredFixture("graftivfjoin")
    spark.conf.set("spark.graft.ivf.kClusters", "20")
    spark.conf.set("spark.graft.ivf.nProbe", "3")
    def rows(threshold: String): (Seq[(Long, Int, Long)], String) = {
      spark.conf.set("spark.graft.ivf.joinAssignThreshold", threshold)
      val df = SparkEntry.queries("ann_ivf_topk")(spark, dir)
      (df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq,
        df.queryExecution.executedPlan.toString)
    }
    try {
      val (litRows, litPlan) = rows("100000")
      val (joinRows, joinPlan) = rows("0")
      assert(!litPlan.contains("BroadcastNestedLoopJoin"), "literal path must not cross-join")
      assert(joinPlan.contains("BroadcastNestedLoopJoin"), "join path must cross-join centroids")
      assert(litRows.nonEmpty && litRows == joinRows,
        s"assignment paths diverged: literal ${litRows.take(3)} vs join ${joinRows.take(3)}")
    } finally {
      spark.conf.unset("spark.graft.ivf.kClusters")
      spark.conf.unset("spark.graft.ivf.nProbe")
      spark.conf.unset("spark.graft.ivf.joinAssignThreshold")
    }
  }

  test("ann_ivf_bigk (join-assigned at k=64) keeps clustered-fixture recall") {
    // the index-scale variant end-to-end: k=64 > threshold(=0 here not
    // needed — 64 stays literal by default, so force the join path) must
    // still beat the brute-force recall gate on clustered data
    val dir = clusteredFixture("graftivfbigk")
    spark.conf.set("spark.graft.ivf.joinAssignThreshold", "32")
    try {
      val brute = SparkEntry.queries("ann_brute_topk")(spark, dir).select("qid", "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ivf = SparkEntry.queries("ann_ivf_bigk")(spark, dir).select("qid", "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (brute & ivf).size.toDouble / brute.size
      info(s"bigk clustered-fixture recall@10 = $recall")
      assert(recall >= 0.8, s"bigk recall@10 $recall below 0.8 on clustered data")
    } finally spark.conf.unset("spark.graft.ivf.joinAssignThreshold")
  }

  test("pq ann recall@10 vs brute force") {
    val brute = run("ann_brute_topk").select("qid", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = run("ann_pq_topk").select("qid", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & pq).size.toDouble / brute.size
    info(s"pq recall@10 = $recall")
    // measured 0.84 on the weak-structure fixture (ADC-only ranks 0.36;
    // the refine stage recovers the rest); gate leaves host-noise margin
    assert(recall >= 0.7, s"PQ ANN recall@10 $recall below 0.7")
  }

  test("pq ann recall@10 >= 0.8 on a cosine-clustered fixture") {
    // the ADC shortlist must recover the query's cone (codes alone
    // cannot rank WITHIN a cone — members quantize identically) and the
    // exact refine pass must then reproduce brute-force top-10
    val dir = clusteredFixture("graftpq")
    val brute = SparkEntry.queries("ann_brute_topk")(spark, dir).select("qid", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = SparkEntry.queries("ann_pq_topk")(spark, dir).select("qid", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & pq).size.toDouble / brute.size
    info(s"pq clustered-fixture recall@10 = $recall")
    assert(recall >= 0.8, s"PQ recall@10 $recall below 0.8 on clustered data")
  }

  test("pca components are orthonormal; distributed variance matches eigenvalues") {
    import org.apache.spark.sql.functions.{col, xxhash64}
    import graft.operators.Pca
    val sample = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id"))).limit(2000)
      .collect().map(_.getSeq[Float](1).toArray)
    val (_, cov) = Pca.meanCov(sample)
    val (vals, vecs) = Pca.topComponents(cov, 8)
    for (i <- 0 until 8; j <- i until 8) {
      val d = vecs(i).indices.map(k => vecs(i)(k) * vecs(j)(k)).sum
      if (i == j) assert(math.abs(d - 1) < 1e-9, s"component $i not unit: $d")
      else assert(math.abs(d) < 1e-6, s"components $i,$j not orthogonal: $d")
    }
    assert(vals.toSeq.sliding(2).forall(p => p.head >= p(1) - 1e-12), "spectrum must decrease")
    // the corpus IS the sample at this SF, so the distributed projection
    // variance must reproduce the driver eigenvalue (float32 literal
    // truncation is the only slack) — the differential that proves the
    // projection pass implements the trained transform
    val rows = SparkEntry.queries("emb_pca_project")(spark, sfDir).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val (v, ev) = (r.getLong(2), r.getLong(3))
      assert(math.abs(v - ev) <= math.max(1, ev / 20),
        s"component ${r.getInt(0)}: distributed var $v vs driver eigen $ev")
    }
    val evs = rows.map(_.getLong(3)).toSeq
    assert(evs.sliding(2).forall(p => p.head >= p(1)), "query spectrum must decrease")
  }

  test("dup_clusters is empty (not a crash) when no pairs pass the jaccard gate") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftnodup").toString
    // five documents with zero shared 3-shingles → empty pair graph
    Seq(
      (1L, "alpha beta gamma delta", "en", "a", 22L),
      (2L, "one two three four five", "en", "a", 23L),
      (3L, "red green blue yellow", "en", "a", 21L),
      (4L, "cat dog bird fish", "en", "a", 17L),
      (5L, "north south east west", "en", "a", 21L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("dd_dup_clusters")(spark, dir)
    assert(out.columns.toSeq == Seq("doc_id", "cluster_id"))
    assert(out.count() == 0L)
  }

  test("tx_repetition computes exact dup fractions and deterministic top bigram") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftrep").toString
    Seq(
      // "a b a b a": bigrams [a b, b a, a b, b a] → dup 1-2/4; trigrams
      // [a b a, b a b, a b a] → dup 1-2/3; top bigram ties 2-2 → lexical
      // min "a b", char frac = 2*3/9
      (1L, "a b a b a", "en", "s", 9L),
      (2L, "all tokens here differ fully", "en", "s", 28L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("tx_repetition")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = rows(1L)
    assert(r1.getDouble(1) == 1.0 - 2.0 / 4.0)
    assert(r1.getDouble(2) == 1.0 - 2.0 / 3.0)
    assert(r1.getString(3) == "a b")
    assert(r1.getDouble(4) == 2.0 * 3.0 / 9.0)
    val r2 = rows(2L)
    assert(r2.getDouble(1) == 0.0 && r2.getDouble(2) == 0.0)
  }

  test("dd_canonical_corpus keeps cluster representatives plus singletons") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftcanon").toString
    // 1 and 2 are exact dups (Jaccard 1.0), 3 shares nothing
    Seq(
      (1L, "w1 w2 w3 w4 w5", "en", "s", 14L),
      (2L, "w1 w2 w3 w4 w5", "en", "s", 14L),
      (3L, "x1 x2 x3 x4 x5", "en", "s", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val kept = SparkEntry.queries("dd_canonical_corpus")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("dd_canonical_corpus agrees with dd_dup_clusters on the fixture") {
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val labels = run("dd_dup_clusters")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val dropped = labels.collect { case (id, lbl) if id != lbl => id }.toSet
    val kept = run("dd_canonical_corpus")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == docs -- dropped)
    assert(labels.collect { case (id, lbl) if id == lbl => id }.toSet.subsetOf(kept))
  }

  test("tx_decontaminate flags the planted eval-overlap doc and only it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftdecon").toString
    // doc 10 copies 6 consecutive tokens (= two 5-gram shingles) from the
    // eval doc; doc 11 shares vocabulary but no 5-token run
    Seq(
      (1L, "q1 q2 q3 q4 q5 q6 q7 q8", "en", "src0", 23L),
      (10L, "w0 q1 q2 q3 q4 q5 q6 w1 w2 w3", "en", "src1", 29L),
      (11L, "q1 w9 q2 w8 q3 w7 q4 w6 q5", "en", "src2", 26L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("tx_decontaminate")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows.keySet == Set(10L, 11L))
    assert(rows(10L) == ((2L, 6L, 2.0 / 6)))
    assert(rows(11L) == ((0L, 5L, 0.0)))
  }

  test("ann_bucket_stats partitions the corpus exactly across LSH buckets") {
    val rows = run("ann_bucket_stats").collect()
    val n = graft.sources.Tables.load(spark, sfDir, "embeddings").count()
    assert(rows.map(_.getLong(1)).sum == n, "every vector in exactly one bucket")
    assert(rows.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 64), "6-bit bucket range")
  }

  test("semdedup recall vs exact embedding-cosine pairs") {
    val exact = run("dd_embed_cosine").select("vec_a", "vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sem = run("dd_semdedup").select("vec_a", "vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "exact baseline found no cosine near-dup pairs")
    // every semdedup pair must be a true pair (the cosine check is exact;
    // clustering only limits WHICH pairs get compared)
    assert((sem -- exact).isEmpty, s"false positives: ${(sem -- exact).take(5)}")
    val recall = (exact & sem).size.toDouble / exact.size
    info(s"exact=${exact.size} semdedup=${sem.size} recall=$recall")
    assert(recall >= 0.8, s"semdedup recall $recall below 0.8")
  }

  test("kll exactness precondition: per-group row counts stay under k=65535") {
    // b7_kll_quantile / b7_kll_grouped / bql_quantile oracle-match an
    // EXACT inclusive-rank SQL because a KLL sketch with k=65535 never
    // compacts below 65535 values. If the fixture grows past that, the
    // sketch goes approximate while the oracle stays exact — fail HERE
    // with a clear message instead of a confusing value mismatch there.
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
    val maxGroup = li.groupBy(col("l_returnflag")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(maxGroup < 65535,
      s"largest l_returnflag group has $maxGroup rows >= KLL k=65535: " +
        "b7_kll_grouped's exact-oracle equivalence no longer holds — raise k " +
        "or shrink the fixture")
    val events = graft.sources.Tables.load(spark, sfDir, "events").count()
    assert(events < 65535,
      s"events has $events rows >= KLL k=65535: bql_quantile's exact-oracle " +
        "equivalence no longer holds")
  }

  test("kll default-k quantiles within rank tolerance of exact") {
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
    val approx = li.agg(expr(
      "kll_sketch_get_quantile_double(kll_sketch_agg_double(l_extendedprice), array(0.5))"))
      .head().getSeq[Double](0).head
    // normalized rank of the approximate median must be within KLL's
    // default-k error bound (~1.65% at k=200, we allow 3%)
    val n = li.count().toDouble
    val rank = li.filter(col("l_extendedprice") <= approx).count() / n
    info(s"approx median=$approx rank=$rank")
    assert(math.abs(rank - 0.5) < 0.03)
  }

  test("sketch-state interchange: merged day partials == single-pass sketch") {
    // the b6_theta_merge contract: serialized per-day sketch state (binary
    // columns — what a daily job would persist) unioned later must give
    // the same estimate as one pass over the raw data. Exact at these
    // cardinalities, so equality is strict, on both fixtures.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.BinaryType
    for (dir <- Seq("/root/testdata/sf0.001", sfDir)) {
      val e = graft.sources.Tables.load(spark, dir, "events")
        .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"), col("value"))
      val partials = e.groupBy(col("day")).agg(
        expr("theta_sketch_agg(user_id)").as("tsk"),
        expr("kll_sketch_agg_double(value, 65535)").as("ksk"))
      assert(partials.schema("tsk").dataType == BinaryType,
        "theta partial state must be an interchangeable binary column")
      assert(partials.schema("ksk").dataType == BinaryType,
        "kll partial state must be an interchangeable binary column")
      val merged = partials.agg(
        expr("theta_sketch_estimate(theta_union_agg(tsk))").as("mu"),
        expr("element_at(kll_sketch_get_quantile_double(kll_merge_agg_double(ksk), array(0.5D)), 1)")
          .as("mq")).head()
      val direct = e.agg(
        expr("theta_sketch_estimate(theta_sketch_agg(user_id))"),
        expr("element_at(kll_sketch_get_quantile_double(kll_sketch_agg_double(value, 65535), array(0.5D)), 1)"))
        .head()
      assert(merged.getLong(0) == direct.getLong(0),
        s"$dir: merged theta ${merged.getLong(0)} != direct ${direct.getLong(0)}")
      assert(merged.getDouble(1) == direct.getDouble(1),
        s"$dir: merged kll median ${merged.getDouble(1)} != direct ${direct.getDouble(1)}")
    }
  }

  test("samp_mixture achieves the configured per-group keep rates") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val grp = (substring(col("source"), 4, 10).cast("int") % 4).as("grp")
    val total = docs.groupBy(grp).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val kept = run("samp_mixture").groupBy(grp).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // group 0 keeps everything exactly; the hashed groups land near
    // their targets (50/25/10%) within fixture-size noise
    assert(kept(0) == total(0))
    val r1 = kept(1).toDouble / total(1)
    val r2 = kept(2).toDouble / total(2)
    val r3 = kept.getOrElse(3, 0L).toDouble / total(3)
    info(f"rates: 1.00 / $r1%.3f / $r2%.3f / $r3%.3f")
    assert(r1 > 0.30 && r1 < 0.75, s"~50% group got $r1")
    assert(r2 > 0.08 && r2 < 0.45, s"~25% group got $r2")
    assert(r3 < 0.25, s"~10% group got $r3")
    assert(r1 > r2 && r2 > r3, "rates must order with the configured weights")
  }

  test("tx_importance: target-domain docs lean target; masses are consistent") {
    import org.apache.spark.sql.functions._
    val imp = run("tx_importance")
    // target mass can never exceed corpus mass (src0 tokens are a subset
    // of corpus tokens), and every token contributes at least 1 corpus hit
    assert(imp.filter(col("tgt_mass") > col("corp_mass")).isEmpty)
    assert(imp.filter(col("corp_mass") < col("n_tokens")).isEmpty)
    // token counts agree with tx_tokens
    val mismatch = imp.select(col("doc_id"), col("n_tokens"))
      .join(run("tx_tokens").select(col("doc_id"), col("n_tokens").as("nt2")), Seq("doc_id"))
      .filter(col("n_tokens") =!= col("nt2"))
    assert(mismatch.isEmpty)
    // the point of the score: docs drawn from the target source lean
    // target more than the rest of the corpus (exact on the fixed fixture)
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), (col("source") === "src0").as("is_tgt"))
    val Array(tgtFrac, restFrac) = imp.join(docs, Seq("doc_id"))
      .groupBy(col("is_tgt"))
      .agg(avg(col("n_target_leaning").cast("double") / col("n_tokens")).as("f"))
      .orderBy(col("is_tgt").desc).collect().map(_.getDouble(1))
    info(f"target-leaning frac: src0=$tgtFrac%.3f rest=$restFrac%.3f")
    assert(tgtFrac > restFrac)
  }

  test("ann_filtered_topk is the exact filtered top-k (predicate honored)") {
    import org.apache.spark.sql.functions._
    val res = run("ann_filtered_topk")
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
    // every neighbor satisfies the metadata predicate
    assert(res.join(emb, Seq("vec_id")).filter(col("label") % 2 =!= 0).isEmpty)
    // full k rows per probe, ranks 1..k
    val perQ = res.groupBy(col("qid")).count().collect()
    assert(perQ.nonEmpty && perQ.forall(_.getLong(1) == 10))
    // filtering changed the answer vs the unfiltered exact top-k (some
    // odd-label neighbor was in the unfiltered result)
    val brute = run("ann_brute_topk").withColumnRenamed("vec_id", "bv")
    val diff = res.join(brute, Seq("qid", "rank"))
      .filter(col("vec_id") =!= col("bv"))
    assert(!diff.isEmpty, "filtered result should differ from unfiltered brute force")
  }

  test("ann bitext alignment is competitive with the exact margin miner") {
    // deterministic quantizer (farthest-point init over hash-ordered
    // sample) -> these numbers are stable, not flaky: gate pick agreement
    // well below measured and the competitive-margin ratio tightly (the
    // ANN picks' margins must be as good as the exact picks', which is
    // the honest ANN quality metric - recall of the literal argmax is
    // secondary when many candidates tie closely).
    val exact = run("emb_bitext_mine").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val ann = run("emb_bitext_ann").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(ann.keySet == exact.keySet, "ANN path must align every source vector")
    val agree = exact.count { case (a, (b, _)) => ann(a)._1 == b }
    val agreeFrac = agree.toDouble / exact.size
    val ratios = exact.collect { case (a, (_, m)) if m > 0 => ann(a)._2.toDouble / m }
    val meanRatio = ratios.sum / ratios.size
    info(f"agreement=$agreeFrac%.3f meanMarginRatio=$meanRatio%.3f n=${exact.size}")
    assert(agreeFrac >= 0.4, s"ANN pick agreement $agreeFrac below 0.4")
    assert(meanRatio >= 0.95, s"ANN margins not competitive: $meanRatio")
  }

  test("custom expressions are deterministic across partitionings") {
    import org.apache.spark.sql.functions._
    import graft.functions._
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val a = docs.repartition(1).select(col("doc_id"), simhash64(split(col("text"), " ")).as("f"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = docs.repartition(7).select(col("doc_id"), simhash64(split(col("text"), " ")).as("f"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
  }
}
