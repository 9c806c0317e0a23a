package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end corpus pipeline over the sf0.01 fixtures: the operators a
  * training-data run chains — quality filter → canonical dedup →
  * decontamination → context-window chunking — must COMPOSE: outputs key
  * by the same doc_id space, the filters only ever shrink it, and the
  * chunker's row counts reconcile with the token counts, so a user can
  * wire stage outputs into stage inputs without glue logic. */
class CorpusPipelineSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.01"
  private lazy val spark: SparkSession = GraftSession.local(4)

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("pipeline stages compose: filter -> dedup -> decontaminate -> chunk") {
    val allDocs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // stage 1: quality gate (composite score >= 2)
    val quality = run("tx_quality").collect()
      .map(r => r.getLong(0) -> r.getInt(r.fieldIndex("quality"))).toMap
    val afterQuality = quality.collect { case (id, q) if q >= 2 => id }.toSet
    assert(quality.keySet == allDocs, "quality scores every doc")
    assert(afterQuality.nonEmpty && afterQuality.size < allDocs.size,
      "the gate must actually filter on this fixture")

    // stage 2: canonical dedup — keep set intersects monotonically
    val canonical = run("dd_canonical_corpus")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(canonical.subsetOf(allDocs))
    val afterDedup = afterQuality & canonical
    assert(afterDedup.size < afterQuality.size,
      "the fixture plants near-dups, so dedup must drop something")

    // stage 3: decontamination — training side only, flags are a subset
    val decon = run("tx_decontaminate").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val evalDocs = allDocs -- decon.keySet // src0 rows are the eval corpus
    assert(evalDocs.nonEmpty && decon.keySet.subsetOf(allDocs))
    val contaminated = decon.collect { case (id, hits) if hits > 0 => id }.toSet
    assert(contaminated.nonEmpty, "the fixture plants eval overlap")
    val afterDecon = (afterDedup -- evalDocs) -- contaminated

    // stage 4: chunking — rows reconcile with token counts per doc
    val tokens = run("tx_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chunkCounts = run("tx_chunk").collect()
      .groupBy(_.getLong(0)).map { case (id, rows) => id -> rows.length.toLong }
    afterDecon.foreach { id =>
      val expected = (tokens(id) - 1) / 24 + 1
      assert(chunkCounts(id) == expected,
        s"doc $id: ${chunkCounts(id)} chunks, expected $expected from ${tokens(id)} tokens")
    }
    info(s"docs ${allDocs.size} -> quality ${afterQuality.size} -> dedup ${afterDedup.size} " +
      s"-> decontaminated ${afterDecon.size}")
    assert(afterDecon.nonEmpty)
  }

  test("pair graph cache lifecycle: reuse, conf invalidation, clear unpersists") {
    import graft.queries.DedupQueries
    import org.apache.spark.storage.StorageLevel
    // Dataset.storageLevel resolves through the CacheManager by logical
    // plan, and a rebuilt graph has an IDENTICAL plan (only runtime confs
    // changed) — so persisted-block accounting must come from the
    // SparkContext's persistent-RDD registry, not the frames.
    def nPersist = spark.sparkContext.getPersistentRDDs.size
    DedupQueries.clearPairGraphCache()
    assert(DedupQueries.pairGraphCacheEntries.isEmpty)
    val base = nPersist

    run("dd_dup_clusters").collect()
    val e1 = DedupQueries.pairGraphCacheEntries
    assert(e1.size == 1, "one shared pair graph after the first consumer")
    assert(e1.head.storageLevel != StorageLevel.NONE, "the shared frame must be persisted")
    val n1 = nPersist
    assert(n1 == base + 1, "exactly one persisted pair-graph RDD")

    run("dd_keep_best").collect()
    val e2 = DedupQueries.pairGraphCacheEntries
    assert(e2.size == 1 && (e2.head eq e1.head),
      "the second consumer must reuse the same persisted frame, not rebuild")
    assert(nPersist == n1, "reuse must not add persisted blocks")

    // a conf the exact build bakes in changes -> the lookup must MISS
    // (fresh build) and the superseded entry must be unpersisted, not
    // silently served stale / left accumulating
    spark.conf.set(graft.operators.QuadraticGuard.MaxRowsKey, "999999")
    try {
      run("dd_dup_clusters").collect()
      val e3 = DedupQueries.pairGraphCacheEntries
      assert(e3.size == 1 && !(e3.head eq e1.head),
        "a guard-conf change must invalidate the cached pair graph")
      assert(nPersist == n1,
        "eviction must unpersist the superseded entry (no accumulation)")
    } finally spark.conf.unset(graft.operators.QuadraticGuard.MaxRowsKey)

    DedupQueries.clearPairGraphCache()
    assert(DedupQueries.pairGraphCacheEntries.isEmpty)
    assert(nPersist == base, "clear must unpersist every entry")
  }

  test("pair graph cache drops a stopped session's entries on the next access") {
    import graft.queries.DedupQueries
    DedupQueries.clearPairGraphCache()
    run("dd_dup_clusters").collect()
    assert(DedupQueries.pairGraphCacheEntries.size == 1)
    // stopping the real shared local SparkContext would kill every other
    // suite in this JVM, so the stop signal is injected: the sweep that
    // every cache access runs (with predicate _.sparkContext.isStopped)
    // must reclaim the entry without any manual clearPairGraphCache()
    DedupQueries.sweepStoppedSessions(isStopped = _ => true)
    assert(DedupQueries.pairGraphCacheEntries.isEmpty,
      "a stopped session's cache entries must be reclaimed by the access-time sweep")
    // and a live session rebuilds cleanly afterwards
    run("dd_keep_best").collect()
    assert(DedupQueries.pairGraphCacheEntries.size == 1)
    DedupQueries.clearPairGraphCache()
  }

  test("cluster family runs off minhash pairs past the quadratic guard (pairSource=minhash)") {
    // ground truth: exact-pair clusters (the oracle-checked default path)
    val exact = run("dd_dup_clusters").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val exactLbl = exact.toMap
    val coClustered = for {
      (a, la) <- exact; (b, lb) <- exact if a < b && la == lb
    } yield (a, b)
    assert(coClustered.nonEmpty, "fixture must have multi-doc clusters")

    val conf = spark.conf
    conf.set("spark.graft.dedup.pairSource", "minhash")
    // prove the family no longer REFUSES past the guard: with the guard
    // lowered below the fixture size, the exact path would throw — the
    // minhash path must not consult it at all
    conf.set(graft.operators.QuadraticGuard.MaxRowsKey, "10")
    try {
      val mh = run("dd_dup_clusters").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val hits = coClustered.count { case (a, b) =>
        mh.get(a).exists(la => mh.get(b).contains(la))
      }
      val recall = hits.toDouble / coClustered.size
      info(f"minhash-fed cluster recall vs exact: $recall%.2f (${mh.size} labeled docs)")
      assert(recall >= 0.7, f"minhash-fed clusters recovered only $recall%.2f of exact pairs")

      // downstream consumers run on the same (shared, persisted) source
      val canon = run("dd_canonical_corpus").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(canon.nonEmpty, "canonical corpus must materialize on the minhash path")
      val kb = run("dd_keep_best").collect()
      assert(kb.nonEmpty && kb.forall(r => r.getLong(3) >= 2),
        "keep_best clusters must be real multi-doc clusters")
      // every minhash cluster label is its component's min doc id, so the
      // canonical keep-set must contain each cluster's label
      assert(mh.values.toSet.subsetOf(canon), "cluster representatives must survive the drop")

      // scale posture: the minhash pair path must not FORCE corpus-sized
      // broadcasts the way the guarded exact path's nsh rejoin does —
      // no broadcast hint anywhere in the minhash query's logical plan
      val lp = SparkEntry.queries("dd_minhash_lsh")(spark, sfDir)
        .queryExecution.analyzed.toString
      assert(!lp.contains("ResolvedHint"),
        s"minhash pair source must leave join strategy to Catalyst:\n$lp")
    } finally {
      conf.unset("spark.graft.dedup.pairSource")
      conf.unset(graft.operators.QuadraticGuard.MaxRowsKey)
    }
    // and the exact path is untouched: rerun reproduces the same labels
    val again = run("dd_dup_clusters").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == exactLbl, "default path must be byte-identical after the minhash run")
  }
}
