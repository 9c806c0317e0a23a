package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{dot_product, minhash_sig, ngram_hashes, simhash64}
import graft.sources.Tables

/** Deduplication suite over `documents` / `embeddings` — exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design: every variant follows the signature → band → bucket-join →
  * verify shape. Signatures are computed per row inside codegen (custom
  * expressions, graft.functions) so the wide text/vector columns never get
  * exploded or shuffled; only (id, small signature) pairs enter the
  * candidate join, and the verify step touches original content for
  * candidate pairs only. The one exception is `dd_ngram_jaccard`, the exact
  * shingle-join baseline the approximate variants are tested against (its
  * oracle is the ground truth for the MinHash/SimHash recall specs).
  */
object DedupQueries {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.load(s, d, "documents")
  private def emb(s: SparkSession, d: String): DataFrame = Tables.load(s, d, "embeddings")

  private val toks: Column = split(col("text"), " ")

  /** Shingle-hash base `(doc_id, hs)` for the exact pair-graph family.
    * The ngram-hash pass is the scan-side CPU hog and it feeds THREE
    * consumers (the postings explode plus the two broadcast nsh sides) —
    * on the single-row-group fixture that meant up to three serial
    * single-task hash passes (profiled: 0.9 s + 0.3 s single-task jobs).
    * Spread the scan to the session's cores first (guarded: a real
    * corpus has many row groups and skips the exchange entirely). The
    * consumers still re-evaluate the hashes, but each pass is now
    * core-wide; an eager localCheckpoint was A/B-tested and REGRESSED
    * the pair-graph consumers 1.3-1.5x (the ~100 MB array
    * materialization costs more than the parallel re-evals save). */
  private def shingleHashBase(s: SparkSession, df: DataFrame): DataFrame =
    graft.operators.Spread.toCores(df.select(col("doc_id"), col("text")))
      .select(col("doc_id"), ngram_hashes(toks, 3).as("hs"))

  /** Exact near-dup PAIR GRAPH (Jaccard ≥ 0.5 over 3-token shingles) —
    * the ground-truth pair source shared by clustering and canonical-
    * corpus materialization. Postings-list expansion: one shuffle on the
    * shingle hash, pair counts combined map-side, per-doc shingle counts
    * rejoined via two broadcasts (bounded by the quadratic guard — the
    * minhash path of [[pairGraph]] joins instead). */
  private def exactPairGraph(s: SparkSession, d: String, name: String): DataFrame = {
    // NOTE: deliberately NOT shingleHashBase — the cluster-family
    // consumers A/B-regressed 1.2-1.3x with the spread exchange (their
    // downstream work dominates; the extra shuffle is pure cost here)
    val base = graft.operators.QuadraticGuard
      .check(docs(s, d), name, "spark.graft.dedup.pairSource=minhash")
      .select(col("doc_id"), ngram_hashes(toks, 3).as("hs"))
    val nsh = base.select(col("doc_id"), size(col("hs")).cast(LongType).as("nsh"))
    val sh = base.select(col("doc_id"), explode(col("hs")).as("h"))
    val postings = sh.groupBy(col("h")).agg(collect_list(col("doc_id")).as("ds"))
      .filter(size(col("ds")) > 1)
    postings
      .select(explode(col("ds")).as("doc_a"), col("ds"))
      .select(col("doc_a"), explode(col("ds")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(nsh.select(col("doc_id").as("doc_a"), col("nsh").as("na"))), "doc_a")
      .join(broadcast(nsh.select(col("doc_id").as("doc_b"), col("nsh").as("nb"))), "doc_b")
      .filter(col("inter") * lit(1.0) / (col("na") + col("nb") - col("inter")) >= 0.5)
      .select(col("doc_a"), col("doc_b"))
  }

  /** MinHash+LSH candidate pairs verified at estimated Jaccard ≥ 0.5 —
    * the body of `dd_minhash_lsh` and the scale-path pair source for the
    * cluster family. Linear in the corpus (capped postings, ids-only band
    * exchanges); the signature rejoins for the verify are JOINS, not
    * broadcasts — the per-doc signature frame is corpus-sized. */
  private def minhashPairs(s: SparkSession, d: String): DataFrame = {
    val bands = 16
    val rowsPerBand = 4
    val cap = graft.operators.HotBuckets.maxBucket(s)
    val sig = docs(s, d).select(col("doc_id"), minhash_sig(toks, 3, bands * rowsPerBand).as("sig"))
    val banded = sig.select(col("doc_id"),
      explode(array((0 until bands).map(bnd =>
        xxhash64(lit(bnd), slice(col("sig"), bnd * rowsPerBand + 1, rowsPerBand))): _*)).as("bkey"))
    val postings = banded.groupBy(col("bkey"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) > 1)
    val pairs = graft.operators.HotBuckets
      .capObserve(postings, "ds", cap, "dd_minhash_lsh")
      .select(explode(col("ds")).as("doc_a"), col("ds"))
      .select(col("doc_a"), explode(col("ds")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      // dedupe pairs BEFORE the signature comparison: a pair colliding in
      // k bands would otherwise pay the 64-slot zip k times
      .dropDuplicates("doc_a", "doc_b")
    pairs
      .join(sig.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sig.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast(DoubleType) / (bands * rowsPerBand)).as("est_jaccard"))
      .filter(col("est_jaccard") >= 0.5)
  }

  /** Banding geometry of the incremental NEAR-dup store (shared by
    * `dd_incremental_near` and its streaming twin `ss_near_screen` — the
    * store is only useful if every consumer bands identically). */
  private[graft] val NearStoreBands = 16
  private[graft] val NearStoreRows = 4

  /** Band-bucket keys derived from a `sig` column of the store geometry. */
  private[graft] def nearStoreBandKeys: Column =
    explode(array((0 until NearStoreBands).map(bnd =>
      xxhash64(lit(bnd), slice(col("sig"), bnd * NearStoreRows + 1, NearStoreRows))): _*))

  /** The persisted incremental near-dup store for corpus snapshot `d`:
    * built ONCE (idempotent per fixture dir) from the corpus split
    * (srcN < 15) — one linear pass writes (corpus_id, sig, fp); band
    * buckets derive from the STORED sigs with posting lists capped at
    * `spark.graft.lsh.maxBucket` (HotBuckets — a boilerplate bucket
    * stays bounded). Returns (bands, sigs) frames reading the store;
    * the corpus text is never rescanned by any consumer. */
  private[graft] def nearStorePath(s: SparkSession, d: String): String =
    s.conf.getOption("spark.graft.index.dir")
      .getOrElse("/tmp/graft_index_store") + "/near_store_ts_" +
      java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(d).toLong & 0xffffffffL)

  /** Content stamp of the fixture the near store derives from: file
    * names + lengths + mtimes of `documents.parquet`. A regenerated
    * fixture at the SAME path therefore invalidates the store (the old
    * existence-only check silently served stale signatures). */
  private[graft] def nearStoreStamp(d: String): String = {
    val f = new java.io.File(d, "documents.parquet")
    val parts =
      if (f.isFile) Seq(s"${f.getName}:${f.length}:${f.lastModified}")
      else Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(_.isFile).sortBy(_.getName).toSeq
        .map(p => s"${p.getName}:${p.length}:${p.lastModified}")
    java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.orderedHash(parts).toLong & 0xffffffffL)
  }

  /** Finish any compaction swap a crash interrupted: `bands_old` present
    * without `bands` means the crash hit between the two renames — the
    * old layout is intact, restore it; both present means the crash hit
    * after the second rename — the new layout won, drop the leftover. */
  private[graft] def nearStoreRecover(storePath: String): Unit = {
    val bands = new java.io.File(storePath + "/bands")
    val old = new java.io.File(storePath + "/bands_old")
    if (old.exists()) {
      if (!bands.exists()) {
        if (!old.renameTo(bands))
          throw new java.io.IOException(s"near-store recovery rename failed for $storePath")
      } else org.apache.commons.io.FileUtils.deleteDirectory(old)
    }
    // an orphaned compaction temp dir is always safe to drop
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(storePath + "/bands_compacting"))
  }

  private[graft] def nearStore(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val srcN = expr("try_cast(substring(source, 4, 10) AS INT)")
    val storePath = nearStorePath(s, d)
    val cap = graft.operators.HotBuckets.maxBucket(s)
    // The manifest is written LAST (after bands) and carries the fixture
    // stamp: its absence means a crashed/partial build, a stale stamp
    // means the fixture was regenerated — both force a clean rebuild.
    val manifest = new java.io.File(storePath + "/_MANIFEST")
    val stamp = nearStoreStamp(d)
    def currentlyValid(): Boolean = manifest.exists() && {
      val read = new String(
        java.nio.file.Files.readAllBytes(manifest.toPath),
        java.nio.charset.StandardCharsets.UTF_8).trim
      read == stamp
    }
    if (!currentlyValid()) {
      // rebuild under the SAME lock as commit/compaction (the lock file is
      // a sibling of the store dir, so deleteDirectory can't remove a lock
      // a peer holds); re-check under the lock — a concurrent rebuilder may
      // already have won, in which case this degenerates to recovery.
      graft.operators.StoreLock.withLock(storePath) {
        if (!currentlyValid()) {
          org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(storePath))
          docs(s, d).filter(srcN < 15)
            .select(col("doc_id").as("corpus_id"),
              minhash_sig(toks, 3, NearStoreBands * NearStoreRows).as("sig"),
              Fingerprints.tokenSetFp(toks).as("fp"))
            .write.mode("overwrite").parquet(storePath + "/sigs")
          s.read.parquet(storePath + "/sigs")
            .select(col("corpus_id"), nearStoreBandKeys.as("bkey"))
            .groupBy(col("bkey"))
            .agg(sort_array(collect_list(col("corpus_id"))).as("ids"))
            .withColumn("ids", slice(col("ids"), 1, cap))
            .select(col("bkey"), explode(col("ids")).as("corpus_id"))
            .write.mode("overwrite").parquet(storePath + "/bands")
          java.nio.file.Files.write(manifest.toPath,
            stamp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        } else nearStoreRecover(storePath)
      }
    } else nearStoreRecover(storePath)
    (s.read.parquet(storePath + "/bands"), s.read.parquet(storePath + "/sigs"))
  }

  /** Day-N+1 store maintenance — COMMIT a day's canonical NEW documents
    * (verdict `new` from [[nearStore]]-backed screening; their
    * `dup_in_batch` twins are represented by them, and the two *_corpus
    * verdicts already are) into the near store, so tomorrow's batch
    * screens against today's ingest without any corpus rescan: one
    * day-sized append to sigs/ and the derived band rows to bands/.
    * Appends bypass the build-time posting cap (a day contributes
    * day-sized postings); periodic [[nearStoreCompact]] re-caps hot
    * buckets and collapses the append files.
    * Spec-gated (ApproxSuiteSpec): after commit, re-screening the same
    * batch yields zero `new`/`dup_in_batch` verdicts.
    *
    * Runs under [[graft.operators.StoreLock]] with an anti-join against
    * the sigs already present: two at-least-once schedulers committing
    * the same batch concurrently serialize, and the second appends
    * nothing — per-doc idempotent, not just single-writer-safe
    * (CommitConcurrencySpec races it). The fresh slice is staged to a
    * scratch dir first so the sigs append never reads the directory it
    * is writing. */
  private[graft] def nearStoreCommit(s: SparkSession, d: String, newDocs: DataFrame): Unit = {
    val storePath = nearStorePath(s, d)
    graft.operators.StoreLock.withLock(storePath) {
      // finish any interrupted compaction swap BEFORE appending: an append
      // against a crash-point-1 store (bands/ moved aside, bands_old/
      // holding all postings) would otherwise create a fresh bands/ whose
      // presence makes the next recover DELETE bands_old — silently losing
      // every pre-crash posting.
      nearStoreRecover(storePath)
      val staging = storePath + "/_staging_commit"
      newDocs.select(col("doc_id").as("corpus_id"), col("sig"), col("fp"))
        .join(s.read.parquet(storePath + "/sigs").select(col("corpus_id")),
          Seq("corpus_id"), "left_anti")
        .write.mode("overwrite").parquet(staging)
      // bands FIRST, sigs LAST: the anti-join keys on sigs, so the sigs
      // append is the commit point — a crash between the two appends is
      // healed by the retry (the doc is still absent from sigs, so both
      // appends re-run; the duplicate band postings that leaves are
      // candidate-generation noise the next compaction rewrites away,
      // whereas the reverse order would orphan a doc out of screening
      // forever).
      val fresh = s.read.parquet(staging)
      fresh.select(col("corpus_id"), nearStoreBandKeys.as("bkey"))
        .write.mode("append").parquet(storePath + "/bands")
      fresh.write.mode("append").parquet(storePath + "/sigs")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(staging))
    }
  }

  /** Test hook: 1 → crash after the first rename (bands moved aside,
    * replacement not yet in place — the window the two-rename pattern
    * makes recoverable), 2 → crash after the second rename (new layout
    * live, leftover `bands_old` not yet deleted). 0 in production. */
  private[graft] var compactCrashPoint: Int = 0

  /** Periodic store COMPACTION: rewrite bands/ from the accumulated
    * sigs/ exactly the way the initial build does — re-sorting each
    * bucket's posting list and re-applying the HotBuckets cap, so hot
    * buckets grown past the cap by daily appends are bounded again and
    * the many small append files collapse into one sorted layout. Runs
    * in one pass over the sigs store (never the corpus text).
    *
    * The swap is the crash-safe two-rename pattern (never
    * delete-then-rename): `bands` → `bands_old`, `bands_compacting` →
    * `bands`, delete `bands_old`. A crash at ANY point leaves a store
    * [[nearStoreRecover]] restores on the next read — there is no
    * window in which the posting data exists nowhere on disk. */
  private[graft] def nearStoreCompact(s: SparkSession, d: String): Unit = {
    val storePath = nearStorePath(s, d)
    val cap = graft.operators.HotBuckets.maxBucket(s)
    // same lock as the commit path: a compaction swapping bands/ out from
    // under a concurrent commit's append (or two compactors renaming at
    // once) would corrupt the layout the two-rename pattern protects
    graft.operators.StoreLock.withLock(storePath) {
      nearStoreRecover(storePath) // finish any interrupted prior swap first
      val tmpOut = storePath + "/bands_compacting"
      s.read.parquet(storePath + "/sigs")
        .select(col("corpus_id"), nearStoreBandKeys.as("bkey"))
        .groupBy(col("bkey"))
        .agg(sort_array(collect_list(col("corpus_id"))).as("ids"))
        .withColumn("ids", slice(col("ids"), 1, cap))
        .select(col("bkey"), explode(col("ids")).as("corpus_id"))
        .write.mode("overwrite").parquet(tmpOut)
      val bands = new java.io.File(storePath + "/bands")
      val old = new java.io.File(storePath + "/bands_old")
      if (!bands.renameTo(old))
        throw new java.io.IOException(s"compaction swap (bands -> bands_old) failed for $storePath")
      if (compactCrashPoint == 1)
        throw new java.io.IOException(s"injected compaction crash after first rename: $storePath")
      if (!new java.io.File(tmpOut).renameTo(bands)) {
        old.renameTo(bands) // roll the intact old layout back
        throw new java.io.IOException(s"compaction swap (compacting -> bands) failed for $storePath")
      }
      if (compactCrashPoint == 2)
        throw new java.io.IOException(s"injected compaction crash after second rename: $storePath")
      org.apache.commons.io.FileUtils.deleteDirectory(old)
    }
  }

  /** Convenience commit: screen the fixture's batch split with the
    * dd_incremental_near machinery and append its `new` docs. */
  private[graft] def nearStoreCommitNew(s: SparkSession, d: String): Long = {
    val srcN = expr("try_cast(substring(source, 4, 10) AS INT)")
    val verdicts = graft.SparkEntry.queries("dd_incremental_near")(s, d)
      .filter(col("verdict") === "new").select(col("doc_id"))
    val batch = docs(s, d).filter(srcN >= 15)
      .select(col("doc_id"),
        minhash_sig(toks, 3, NearStoreBands * NearStoreRows).as("sig"),
        Fingerprints.tokenSetFp(toks).as("fp"))
    val newDocs = batch.join(verdicts, Seq("doc_id")).persist()
    val n = newDocs.count()
    nearStoreCommit(s, d, newDocs)
    newDocs.unpersist(blocking = false)
    n
  }

  /** The cluster family's pair source, switched by
    * `spark.graft.dedup.pairSource`:
    *  - `exact` (default): [[exactPairGraph]] — ground truth, quadratic-
    *    guarded, for corpora the guard admits;
    *  - `minhash`: [[minhashPairs]] — the linear scale path; clusters
    *    become approximate (recall-gated vs exact in CorpusPipelineSpec)
    *    but the plan survives any corpus size.
    * The result is persisted and memoized per (session, dir, source,
    * conf fingerprint), so `dd_dup_clusters` / `dd_canonical_corpus` /
    * `dd_keep_best` in one session share ONE pair-graph computation
    * instead of recomputing the postings pass three times. The cached
    * frame is near-dup pairs only — small by construction (capped
    * buckets / guarded input).
    *
    * Lifecycle: the key includes the confs the build depends on
    * (`spark.graft.lsh.maxBucket` for minhash; the quadratic-guard
    * opt-in/limit for exact), so changing them mid-session computes a
    * fresh graph rather than silently serving a stale one; any
    * key-or-insert miss first EVICTS (unpersists) that session's other
    * entries for the same dir — the common "conf changed / fixture
    * regenerated" path; every access also sweeps entries whose session
    * is STOPPED ([[sweepStoppedSessions]] — a JVM cycling many sessions
    * never accumulates dead session references); and
    * [[clearPairGraphCache]] unpersists and drops everything (for tests
    * that need to observe a fresh build). */
  private val pairGraphCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String, String), DataFrame]()

  /** The confs a pair-graph build bakes in, per mode — part of the cache
    * key so later lookups under different confs miss instead of lying. */
  private def pairGraphConfKey(s: SparkSession, mode: String): String = mode match {
    case "minhash" =>
      s"${graft.operators.HotBuckets.MaxBucketKey}=${graft.operators.HotBuckets.maxBucket(s)}"
    case _ =>
      s"${graft.operators.QuadraticGuard.OptInKey}=" +
        s"${s.conf.get(graft.operators.QuadraticGuard.OptInKey, "false")};" +
        s"${graft.operators.QuadraticGuard.MaxRowsKey}=" +
        s"${s.conf.get(graft.operators.QuadraticGuard.MaxRowsKey, "")}"
  }

  /** Test/diagnostic view of the live cache entries. */
  private[graft] def pairGraphCacheEntries: Seq[DataFrame] = {
    sweepStoppedSessions()
    import scala.jdk.CollectionConverters._
    pairGraphCache.values.asScala.toSeq
  }

  /** Drop entries whose session is stopped — the lifecycle hole a
    * long-lived JVM cycling many sessions would otherwise hit (each key
    * strongly references its SparkSession). Runs on every cache access,
    * so a dead session's entries disappear on the next pairGraph call
    * from ANY session, without requiring a manual clearPairGraphCache().
    * No unpersist is attempted: a stopped session's executors (and their
    * cached blocks) are already gone. The predicate is injectable for
    * deterministic testing (stopping the real shared local context would
    * kill every other suite in the JVM). */
  private[graft] def sweepStoppedSessions(
      isStopped: SparkSession => Boolean = _.sparkContext.isStopped): Unit = {
    val it = pairGraphCache.entrySet().iterator()
    while (it.hasNext) {
      if (isStopped(it.next().getKey._1)) it.remove()
    }
  }

  /** Unpersist and drop every cached pair graph (all sessions). */
  def clearPairGraphCache(): Unit = {
    val it = pairGraphCache.entrySet().iterator()
    while (it.hasNext) {
      try it.next().getValue.unpersist(blocking = false)
      catch { case _: Exception => () } // session may already be stopped
      it.remove()
    }
  }

  private def pairGraph(s: SparkSession, d: String): DataFrame = {
    sweepStoppedSessions()
    val mode = s.conf.get("spark.graft.dedup.pairSource", "exact")
    val key = (s, d, mode, pairGraphConfKey(s, mode))
    val hit = pairGraphCache.get(key)
    if (hit != null) hit
    else {
      // miss: evict superseded builds for this (session, dir) — a conf
      // change or mode flip must not leave stale persisted blocks behind
      val it = pairGraphCache.entrySet().iterator()
      while (it.hasNext) {
        val en = it.next()
        if (en.getKey._1 == s && en.getKey._2 == d) {
          en.getValue.unpersist(blocking = false)
          it.remove()
        }
      }
      pairGraphCache.computeIfAbsent(key, _ => (mode match {
        case "minhash" => minhashPairs(s, d).select(col("doc_a"), col("doc_b"))
        case _ => exactPairGraph(s, d,
          "dd_dup_clusters/dd_canonical_corpus/dd_keep_best (pairSource=exact)")
      }).persist())
    }
  }

  /** Oracle CTE prefix shared by the cluster-shaped queries: exact pair
    * graph (`p`), symmetric edges (`e`), transitive closure (`reach`),
    * component labels (`lab` = min reachable id per node). */
  private val clusterCte: String =
    """WITH RECURSIVE sh AS (
      |  SELECT doc_id,
      |    unnest(list_distinct([array_to_string(t[i:i+2],' ') FOR i IN range(1, len(t)-1)])) AS shingle,
      |    len(list_distinct([array_to_string(t[i:i+2],' ') FOR i IN range(1, len(t)-1)])) AS nsh
      |  FROM (SELECT doc_id, string_split(text,' ') AS t FROM documents)),
      |p AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |  HAVING count(*) * 1.0 / (any_value(a.nsh) + any_value(b.nsh) - count(*)) >= 0.5),
      |e AS (
      |  SELECT doc_a AS a, doc_b AS b FROM p
      |  UNION SELECT doc_b, doc_a FROM p),
      |reach(a, b) AS (
      |  SELECT a, b FROM e
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
      |lab AS (
      |  SELECT a AS doc_id, least(a, min(b)) AS cluster_id
      |  FROM reach GROUP BY a)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Exact dedup: content-hash groupBy, keep lowest doc_id per group.
    QueryDef("dd_exact", Some(
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin)) { (s, d) =>
      docs(s, d)
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("keep_id"))
    },

    // Exact n-gram Jaccard near-dup pairs (the ground-truth baseline):
    // explode distinct shingles, self-join on shingle, count intersections,
    // Jaccard = inter / (|A| + |B| - inter) >= 0.5. Output keeps integer
    // evidence columns (inter/na/nb) instead of a float — hash-stable.
    QueryDef("dd_ngram_jaccard", Some(
      """WITH sh AS (
        |  SELECT doc_id,
        |    unnest(list_distinct([array_to_string(t[i:i+2],' ') FOR i IN range(1, len(t)-1)])) AS shingle,
        |    len(list_distinct([array_to_string(t[i:i+2],' ') FOR i IN range(1, len(t)-1)])) AS nsh
        |  FROM (SELECT doc_id, string_split(text,' ') AS t FROM documents))
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  count(*) AS inter, any_value(a.nsh) AS na, any_value(b.nsh) AS nb
        |FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |GROUP BY 1, 2
        |HAVING count(*) * 1.0 / (any_value(a.nsh) + any_value(b.nsh) - count(*)) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin)) { (s, d) =>
      // Scale shape: the self-join shuffles (doc_id, hash) longs — the
      // shingle hashes come straight off the token array inside codegen
      // (ngram_hashes; shingle STRINGS are never materialized), and
      // per-doc shingle counts rejoin only after pair-counting, via two
      // broadcasts of the tiny (doc, nsh) side. Hash collisions:
      // ~(n_shingles)^2 / 2^64 — negligible, and the oracle gate would
      // catch one on the fixed fixtures.
      val base = shingleHashBase(s, graft.operators.QuadraticGuard
        .check(docs(s, d), "dd_ngram_jaccard", "dd_minhash_lsh"))
      val nsh = base.select(col("doc_id"), size(col("hs")).cast(LongType).as("nsh"))
      val sh = base.select(col("doc_id"), explode(col("hs")).as("h"))
      // postings-list pair expansion: ONE shuffle (group by shingle hash)
      // instead of a two-sided shuffle join; the quadratic pair expansion
      // happens post-shuffle in the same stage as the (doc_a, doc_b)
      // partial count, so only combined pair counts hit the second
      // exchange. df-1 shingles cannot produce pairs and are dropped.
      val postings = sh.groupBy(col("h")).agg(collect_list(col("doc_id")).as("ds"))
        .filter(size(col("ds")) > 1)
      postings
        .select(explode(col("ds")).as("doc_a"), col("ds"))
        .select(col("doc_a"), explode(col("ds")).as("doc_b"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("inter"))
        .join(broadcast(nsh.select(col("doc_id").as("doc_a"), col("nsh").as("na"))), "doc_a")
        .join(broadcast(nsh.select(col("doc_id").as("doc_b"), col("nsh").as("nb"))), "doc_b")
        .filter(col("inter") * lit(1.0) / (col("na") + col("nb") - col("inter")) >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("inter"), col("na"), col("nb"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // Duplicate clustering: near-dup detection emits PAIRS; dropping
    // duplicates needs connected COMPONENTS (keep min doc_id per
    // component). Min-label propagation over the exact-pair graph:
    // every node starts labeled with itself, each round takes the min
    // label across neighbors, loop until fixpoint (diameter-bounded —
    // the fixture converges in 2-3 rounds; at scale this is the classic
    // iterative CC shape, upgradeable to large-star/small-star without
    // changing the contract). Only docs that appear in some pair are
    // emitted.
    QueryDef("dd_dup_clusters", Some(
      s"""$clusterCte
        |SELECT doc_id, cluster_id FROM lab ORDER BY doc_id""".stripMargin)) { (s, d) =>
      // clustering is delegated to the shared CC operator: min-label
      // propagation (one join+groupBy per round, O(diameter)) with an
      // automatic switch to large-star/small-star (O(log n) rounds) if
      // the duplicate graph turns out chain-shaped — see
      // operators/ConnectedComponents.scala. The pair source is the
      // shared pairGraph: exact (oracle ground truth) by default,
      // minhash past the guard via spark.graft.dedup.pairSource.
      graft.operators.ConnectedComponents
        .components(pairGraph(s, d))
        .select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
        .orderBy(col("doc_id"))
    },

    // Canonical-corpus materialization: the step that actually DROPS the
    // duplicates — keep each cluster's minimum doc_id (which IS the
    // component label) plus every doc in no cluster. The drop set is the
    // clustered non-representatives: tiny next to the corpus, so the
    // anti-join broadcasts under AQE; the corpus side streams through
    // unshuffled. At 100 TB set spark.graft.dedup.pairSource=minhash and
    // the same plan runs off the LSH pair source instead of the exact
    // (quadratic-guarded) graph.
    QueryDef("dd_canonical_corpus", Some(
      s"""$clusterCte
        |SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM lab WHERE doc_id <> cluster_id)
        |ORDER BY doc_id""".stripMargin)) { (s, d) =>
      val labels = graft.operators.ConnectedComponents
        .components(pairGraph(s, d))
      val drop = labels.filter(col("id") =!= col("lbl")).select(col("id").as("doc_id"))
      docs(s, d).join(drop, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    },

    // Quality-policy canonicalization — the "which copy survives" step
    // that dd_canonical_corpus (keep min doc_id) leaves to policy: per
    // duplicate cluster, keep the HIGHEST-QUALITY member (longest
    // n_chars, doc_id as the deterministic tie-break) — the standard
    // curation choice (the longest copy is usually the least truncated).
    // Selection is an algebraic max_by over the cluster label — the same
    // map-side-combining compaction shape as op_cdc_upsert, so the
    // per-cluster pick never sorts or ranks; cluster sizes ride along as
    // a count. At 100 TB set spark.graft.dedup.pairSource=minhash and the
    // labels come from the LSH pair source instead of the exact
    // (quadratic-guarded) graph.
    QueryDef("dd_keep_best", Some(
      s"""$clusterCte
        |SELECT cluster_id, doc_id AS keep_id, n_chars AS keep_n_chars,
        |  n_docs
        |FROM (
        |  SELECT l.cluster_id, d.doc_id, d.n_chars,
        |    count(*) OVER (PARTITION BY l.cluster_id) AS n_docs,
        |    row_number() OVER (PARTITION BY l.cluster_id
        |      ORDER BY d.n_chars DESC, d.doc_id DESC) AS rn
        |  FROM lab l JOIN documents d ON l.doc_id = d.doc_id)
        |WHERE rn = 1 ORDER BY cluster_id""".stripMargin)) { (s, d) =>
      val labels = graft.operators.ConnectedComponents
        .components(pairGraph(s, d))
        .select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
      labels
        .join(docs(s, d).select(col("doc_id"), col("n_chars")), Seq("doc_id"))
        .groupBy(col("cluster_id"))
        .agg(
          max_by(struct(col("doc_id"), col("n_chars")),
            struct(col("n_chars"), col("doc_id"))).as("best"),
          count(lit(1)).as("n_docs"))
        .select(col("cluster_id"), col("best.doc_id").as("keep_id"),
          col("best.n_chars").as("keep_n_chars"), col("n_docs"))
        .orderBy(col("cluster_id"))
    },

    // Dedup QA report — the curation dashboard a near-dup pass feeds:
    // per SOURCE, how many docs it contributes, how many would be
    // DROPPED by canonicalization (clustered non-representatives), how
    // many distinct dup clusters it touches, and the largest cluster it
    // participates in. This is the "which sources are polluting the
    // corpus" view that decides where to spend crawl/filter effort —
    // computed off the SAME shared pair graph as dd_dup_clusters /
    // dd_canonical_corpus (one postings pass per session, pairSource
    // switchable to minhash past the guard). Scale shape: the label and
    // cluster-size frames are near-dup-bounded (tiny next to the
    // corpus), so both joins broadcast under AQE and the corpus pays
    // one linear pass into a |sources|-key aggregate; countDistinct is
    // bounded by |clusters| per source, never corpus-sized.
    QueryDef("dd_cluster_stats", Some(
      s"""$clusterCte,
        |sz AS (SELECT cluster_id, count(*) AS csz FROM lab GROUP BY cluster_id),
        |j AS (
        |  SELECT d.source, d.doc_id, l.cluster_id, sz.csz
        |  FROM documents d
        |  LEFT JOIN lab l ON d.doc_id = l.doc_id
        |  LEFT JOIN sz ON l.cluster_id = sz.cluster_id)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN cluster_id IS NOT NULL AND doc_id <> cluster_id
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |  CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
        |  CAST(max(coalesce(csz, 1)) AS BIGINT) AS max_cluster
        |FROM j GROUP BY source ORDER BY source""".stripMargin)) { (s, d) =>
      val labels = graft.operators.ConnectedComponents
        .components(pairGraph(s, d))
        .select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
      val sizes = labels.groupBy(col("cluster_id")).agg(count(lit(1)).as("csz"))
      docs(s, d).select(col("doc_id"), col("source"))
        .join(broadcast(labels), Seq("doc_id"), "left")
        .join(broadcast(sizes), Seq("cluster_id"), "left")
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("cluster_id").isNotNull && col("doc_id") =!= col("cluster_id"), 1L)
            .otherwise(0L)).as("n_dropped"),
          countDistinct(col("cluster_id")).as("n_clusters"),
          max(coalesce(col("csz"), lit(1L))).as("max_cluster"))
        .orderBy(col("source"))
    },

    // Paragraph-level (sub-document) dedup — the pass that catches
    // repeated boilerplate INSIDE otherwise-distinct documents (headers,
    // license blocks, navigation chrome), which doc-level dedup never
    // sees. Text is split into fixed 8-token chunks (the corpus has no
    // newline paragraph marks; a real corpus swaps the chunker for a
    // split-on-blank-line, same plan); a chunk survives only at its FIRST
    // corpus-wide occurrence (min (doc_id, chunk_idx)); per doc we report
    // how much survives. Scale shape: n_chunks is a per-row projection
    // (doc_id is unique), so the totals side never explodes or
    // aggregates — only the first-occurrence side scans the exploded
    // chunks, ONCE; chunks are hashed inside codegen, so the exchanges
    // carry only 8-byte keys — (hash), then (doc_id) twice for the
    // join — the chunk text never shuffles; first-occurrence keys are
    // folded map-side (min is algebraic). Hash identity stands in for
    // chunk identity (64-bit xxhash; the oracle groups by the chunk
    // text itself, so a collision would surface as a mismatch).
    QueryDef("dd_paragraph", Some(
      """WITH g AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |c AS (SELECT doc_id, t, unnest(range(0, CAST((len(t)-1)//8 AS BIGINT)+1)) AS ci FROM g),
        |e AS (SELECT doc_id, ci, array_to_string(t[ci*8+1:ci*8+8],' ') AS chunk FROM c),
        |k AS (SELECT chunk, min(doc_id*1000000+ci) AS mk FROM e GROUP BY chunk),
        |kept AS (SELECT CAST(mk // 1000000 AS BIGINT) AS kdoc, count(*) AS n_kept FROM k GROUP BY 1),
        |tot AS (SELECT doc_id, count(*) AS n_chunks FROM e GROUP BY doc_id)
        |SELECT doc_id, n_chunks, COALESCE(n_kept, 0) AS n_kept,
        |  n_chunks - COALESCE(n_kept, 0) AS n_dropped
        |FROM tot LEFT JOIN kept ON tot.doc_id = kept.kdoc
        |ORDER BY doc_id""".stripMargin)) { (s, d) =>
      val stride = 8
      val base = docs(s, d).select(col("doc_id"), toks.as("t"))
        .withColumn("n_chunks", floor((size(col("t")) - 1) / stride).cast(LongType) + 1)
      val tot = base.select(col("doc_id"), col("n_chunks"))
      val keyed = base
        .select(col("doc_id"), col("t"), explode(sequence(lit(0L), col("n_chunks") - 1)).as("ci"))
        .select(
          xxhash64(concat_ws(" ",
            slice(col("t"), (col("ci") * stride + 1).cast("int"), lit(stride)))).as("h"),
          (col("doc_id") * 1000000 + col("ci")).as("k"))
      val kept = keyed.groupBy(col("h")).agg(min(col("k")).as("mk"))
        .select(expr("mk DIV 1000000").as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_kept"))
      tot.join(kept, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_chunks"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          (col("n_chunks") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
        .orderBy(col("doc_id"))
    },

    // MinHash + LSH banding: 64-slot signature per doc (one codegen pass),
    // 16 bands x 4 rows; docs sharing any band bucket become candidates;
    // verify by estimated Jaccard (matching slots / 64) >= 0.5.
    // Not SQL-expressible → rows-only driver check; recall vs the exact
    // baseline is asserted in ApproxSuiteSpec.
    //
    // Skew posture (the 100 TB read): the ONLY data that enters the
    // banding exchange is (bkey, doc_id) — each band's 4-slot slice is
    // hashed (band-index salted) to one long, so the 64-slot signature is
    // never replicated through the 16-way band explode. Candidates come
    // from the postings pattern (one shuffle, pairs expanded post-shuffle)
    // with every bucket capped at spark.graft.lsh.maxBucket entries
    // (observed + logged — HotBuckets), so a degenerate boilerplate bucket
    // costs C(cap,2), not C(B,2). Signatures rejoin ONCE per deduped
    // candidate pair for the verify. Band-hash collisions only ever ADD
    // candidates, which the exact slot-match verify then rejects.
    QueryDef("dd_minhash_lsh", None) { (s, d) =>
      minhashPairs(s, d).orderBy(col("doc_a"), col("doc_b"))
    },

    // SimHash near-dup: 64-bit fingerprint per doc; candidates share one of
    // four 16-bit chunks (pigeonhole: hamming<=3 pairs always collide);
    // verify hamming distance via bit_count(xor) <= 3.
    //
    // Skew posture: 16-bit chunk keys mean at most 65k buckets — one
    // popular chunk value (a common doc shape) is quadratic without a cap,
    // so buckets go through the same capped-postings guard as minhash
    // (HotBuckets, observed + logged). The fingerprint is one long, so it
    // rides inside the posting struct — no rejoin needed and no
    // amplification concern.
    QueryDef("dd_simhash", None) { (s, d) =>
      val cap = graft.operators.HotBuckets.maxBucket(s)
      val fp = docs(s, d).select(col("doc_id"), simhash64(toks).as("fp"))
      // chunk key packed to one long: (chunk index << 16) | 16-bit value
      val chunked = fp.select(struct(col("doc_id"), col("fp")).as("df"),
        explode(array((0 until 4).map(c =>
          shiftrightunsigned(col("fp"), c * 16).bitwiseAND(0xffffL) + lit(c.toLong << 16)): _*))
          .as("ckey"))
      val postings = chunked.groupBy(col("ckey"))
        .agg(sort_array(collect_list(col("df"))).as("ds"))
        .filter(size(col("ds")) > 1)
      graft.operators.HotBuckets
        .capObserve(postings, "ds", cap, "dd_simhash")
        .select(explode(col("ds")).as("a"), col("ds"))
        .select(col("a"), explode(col("ds")).as("b"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).as("hamming"))
        // verify BEFORE deduping: hamming is a pure function of the pair
        // (identical for every chunk-collision copy), so the <=3 filter
        // drops the same pairs either way — but running it first means
        // the dedup exchange carries only verified matches, not every
        // candidate the bucketing produced
        .filter(col("hamming") <= 3)
        .dropDuplicates("doc_a", "doc_b")
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // Embedding-cosine near-dup pairs: brute-force at fixture scale (the
    // LSH-bucketed scale path is ann_lsh_topk in SimilarityQueries).
    // Integer ids only in the output — float-free, hash-stable.
    QueryDef("dd_embed_cosine", Some(
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |        x -> CAST(x[1] AS DOUBLE) * x[2]))
        |  / sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * x))
        |       * list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * x))) >= 0.4
        |ORDER BY vec_a, vec_b""".stripMargin)) { (s, d) =>
      // squared norms precomputed once per vector (dot(v,v) uses the same
      // fold order as the fused cosine, so dot/sqrt(na*nb) stays
      // bit-identical to cosine_sim) — the n² inner loop runs one fused
      // sum instead of three.
      val e = graft.operators.QuadraticGuard
        .check(emb(s, d), "dd_embed_cosine", "ann_lsh_topk")
        .select(col("vec_id"), col("embedding"),
          dot_product(col("embedding"), col("embedding")).as("nsq"))
      // one-row-group fixture parquet = one scan partition = the whole n²
      // cosine pass in a single task; spread the streamed side over the
      // executor slots (scale-adaptive defaultParallelism) so the
      // broadcast-NL join parallelizes
      val a = graft.operators.Spread.toCores(
        e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"), col("nsq").as("na")))
      val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"), col("nsq").as("nb"))
      a.join(b, col("vec_a") < col("vec_b"))
        .filter(dot_product(col("ea"), col("eb")) / sqrt(col("na") * col("nb")) >= 0.4)
        .select(col("vec_a"), col("vec_b"))
        .orderBy(col("vec_a"), col("vec_b"))
    },

    // Semantic dedup (the SemDeDup recipe, Abbas et al. 2023, public
    // literature): coarse-quantize embeddings with the shared IVF k-means,
    // then compare pairs ONLY within a shared cluster — the quadratic is
    // bounded per cluster, so with kClusters tracking corpus/constant the
    // total pair work stays linear, no global n². Boundary pairs (near-
    // dups split across clusters) are recovered by multi-assignment: each
    // vector lands in its nAssign nearest clusters (the index-build dual
    // of nProbe), candidate ids are deduped BEFORE the exact cosine
    // verify so a pair sharing m clusters pays one comparison. Recall vs
    // the exact dd_embed_cosine baseline is gated in ApproxSuiteSpec;
    // k-means outcome is init-dependent → rows-only driver check.
    // Production note: the centroids are an index ARTIFACT — a real
    // deployment trains once (Ivf.train) and persists them across runs;
    // this query stays self-contained (retrains per invocation) so its
    // result is a pure function of the input directory.
    QueryDef("dd_semdedup", None) { (s, d) =>
      val kClusters = Ivf.intConf(s, "spark.graft.ivf.kClusters", 10)
      val iters = Ivf.intConf(s, "spark.graft.ivf.iters", 3)
      val trainSample = Ivf.intConf(s, "spark.graft.ivf.trainSample", 2000)
      val nAssign = Ivf.intConf(s, "spark.graft.semdedup.nAssign", 3)
      val e = emb(s, d).select(col("vec_id"), col("embedding"))
      val cents = Ivf.train(e, kClusters, iters, trainSample)
      // literal or join-shaped per the k threshold (Ivf.multiAssigned) —
      // index-scale k takes the broadcast-join + bounded-heap path
      val assigned = Ivf.multiAssigned(e, cents, nAssign)
      val cands = assigned.select(col("cl"), col("vec_id").as("vec_a"))
        .join(assigned.select(col("cl"), col("vec_id").as("vec_b")), Seq("cl"))
        .filter(col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"))
        .dropDuplicates("vec_a", "vec_b")
      val withNorm = emb(s, d).select(col("vec_id"), col("embedding"),
        dot_product(col("embedding"), col("embedding")).as("nsq"))
      cands
        .join(withNorm.select(col("vec_id").as("vec_a"),
          col("embedding").as("ea"), col("nsq").as("na")), "vec_a")
        .join(withNorm.select(col("vec_id").as("vec_b"),
          col("embedding").as("eb"), col("nsq").as("nb")), "vec_b")
        .filter(dot_product(col("ea"), col("eb")) / sqrt(col("na") * col("nb")) >= 0.4)
        .select(col("vec_a"), col("vec_b"))
        .orderBy(col("vec_a"), col("vec_b"))
    },

    // Cross-split dedup: drop training docs whose order-insensitive
    // content fingerprint (sorted distinct token set — catches shuffled
    // copies byte-hashing misses) collides with any held-out doc
    // (source 'src0' stands in for the eval split). The decontamination
    // twin at doc granularity: tx_decontaminate measures partial n-gram
    // overlap, this removes whole-doc duplicates across splits. Scale
    // shape: the held-out split is benchmark-sized, so its fingerprint
    // counts BROADCAST; the corpus pays one linear fingerprint pass and
    // an equi-join that only contaminated docs survive — no corpus
    // shuffle (the final ORDER BY is oracle determinism only).
    QueryDef("dd_cross_dedup", Some(
      s"""WITH f AS (SELECT doc_id, source, ${Fingerprints.sql} AS fp
        |  FROM documents),
        |ev AS (SELECT fp, count(*) AS n_eval_matches FROM f WHERE source = 'src0' GROUP BY fp)
        |SELECT doc_id, n_eval_matches FROM f JOIN ev USING (fp)
        |WHERE source <> 'src0' ORDER BY doc_id""".stripMargin)) { (s, d) =>
      val evalSource = s.conf.get("spark.graft.decontaminate.evalSource", "src0")
      val f = docs(s, d).select(col("doc_id"), col("source"),
        Fingerprints.tokenSetFp(toks).as("fp"))
      val ev = f.filter(col("source") === evalSource)
        .groupBy(col("fp")).agg(count(lit(1)).as("n_eval_matches"))
      f.filter(col("source") =!= evalSource)
        .join(broadcast(ev), Seq("fp"))
        .select(col("doc_id"), col("n_eval_matches"))
        .orderBy(col("doc_id"))
    },

    // NEAR-dup cross-split decontamination — the fuzzy twin of
    // dd_cross_dedup: a train doc is contaminated if it is a NEAR
    // duplicate (estimated Jaccard >= 0.5) of any held-out doc, catching
    // the paraphrased/truncated benchmark leaks an exact fingerprint
    // misses (the published decontamination recipes run exactly this
    // MinHash pass between train and eval). Scale shape: ONE signature
    // pass over both splits; the eval split's banded keys and signatures
    // are benchmark-sized, so both BROADCAST — candidate generation never
    // shuffles the corpus. The verify rejoins the deduped candidate ids
    // against the corpus signature frame; the candidate side is
    // eval-bounded (train docs sharing an eval bucket), so AQE broadcasts
    // it and the corpus signatures stream through map-side too. The final
    // aggregate runs over verified candidate rows only. Candidate count
    // per train doc is bounded by the eval docs sharing a bucket, so no
    // postings cap is needed on this asymmetric shape. MinHash estimate
    // → rows-only driver check; doc-level recall vs the exact
    // cross-split ngram baseline is gated in ApproxSuiteSpec.
    QueryDef("dd_cross_near", None) { (s, d) =>
      val evalSource = s.conf.get("spark.graft.decontaminate.evalSource", "src0")
      val bands = 16
      val rowsPerBand = 4
      val all = docs(s, d).select(col("doc_id"), col("source"),
        minhash_sig(toks, 3, bands * rowsPerBand).as("sig"))
      val banded = all.select(col("doc_id"), col("source"),
        explode(array((0 until bands).map(bnd =>
          xxhash64(lit(bnd), slice(col("sig"), bnd * rowsPerBand + 1, rowsPerBand))): _*)).as("bkey"))
      val evalB = banded.filter(col("source") === evalSource)
        .select(col("bkey"), col("doc_id").as("eval_id"))
      val cands = banded.filter(col("source") =!= evalSource)
        .select(col("bkey"), col("doc_id"))
        .join(broadcast(evalB), Seq("bkey"))
        .select(col("doc_id"), col("eval_id"))
        .dropDuplicates("doc_id", "eval_id")
      val sigEval = all.filter(col("source") === evalSource)
        .select(col("doc_id").as("eval_id"), col("sig").as("sig_e"))
      cands
        .join(all.select(col("doc_id"), col("sig")), Seq("doc_id"))
        .join(broadcast(sigEval), Seq("eval_id"))
        .filter(size(filter(zip_with(col("sig"), col("sig_e"), (x, y) => x === y), b => b))
          .cast(DoubleType) / (bands * rowsPerBand) >= 0.5)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_eval_near"))
        .orderBy(col("doc_id"))
    },

    // INCREMENTAL ingest dedup — the daily-batch production shape: dedupe
    // today's batch (sources with numeric suffix >= 15) against (a)
    // itself and (b) the PERSISTED fingerprint store of the existing
    // corpus (suffix < 15), WITHOUT rescanning the corpus. The store is
    // built once per corpus snapshot (here: once per fixture dir,
    // idempotent) and every subsequent ingest pays one linear batch scan
    // + one fp-keyed join against the store — at 100 TB the corpus is
    // never touched again, and bucketing the store by fp (the
    // op_bucketed_join lever) makes even the store side exchange-free
    // across daily runs. Verdicts: 'dup_of_corpus' (fp already in the
    // store), 'dup_in_batch' (not in the store, but an earlier batch doc
    // — min doc_id, an algebraic map-side-combining reduction — has the
    // same fp), else 'new'. Fingerprints are the order-insensitive
    // token-set md5 (the dd_cross_dedup policy — byte-hashing would be
    // vacuous on this fixture, which plants shuffled copies, not
    // byte-identical ones); MinHash (dd_cross_near) slots into the same
    // store schema for a fuzzier policy. The batch side is day-sized, so
    // the store join broadcasts IT, not the store.
    QueryDef("dd_incremental", Some(
      s"""WITH b AS (SELECT doc_id, ${Fingerprints.sql} AS fp FROM documents
        |           WHERE TRY_CAST(substr(source, 4) AS INTEGER) >= 15),
        |o AS (SELECT DISTINCT ${Fingerprints.sql} AS fp FROM documents
        |      WHERE TRY_CAST(substr(source, 4) AS INTEGER) < 15),
        |m AS (SELECT doc_id, fp, min(doc_id) OVER (PARTITION BY fp) AS first_id FROM b)
        |SELECT m.doc_id,
        |  CASE WHEN o.fp IS NOT NULL THEN 'dup_of_corpus'
        |       WHEN m.doc_id <> m.first_id THEN 'dup_in_batch'
        |       ELSE 'new' END AS verdict
        |FROM m LEFT JOIN o ON m.fp = o.fp
        |ORDER BY m.doc_id""".stripMargin)) { (s, d) =>
      // try_cast: a source name without the numeric suffix must not
      // crash the splitter (ANSI cast would); unparseable sources fall
      // out of both splits, matching the oracle's TRY_CAST
      val srcN = expr("try_cast(substring(source, 4, 10) AS INT)")
      val fp = Fingerprints.tokenSetFp(toks)
      val storePath = s.conf.getOption("spark.graft.index.dir")
        .getOrElse("/tmp/graft_index_store") + "/fp_store_ts_" +
        java.lang.Long.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(d).toLong & 0xffffffffL)
      val fs = new java.io.File(storePath)
      if (!fs.exists()) {
        docs(s, d).filter(srcN < 15).select(fp.as("fp")).distinct()
          .write.mode("overwrite").parquet(storePath)
      }
      val store = s.read.parquet(storePath).withColumn("in_corpus", lit(true))
      val batch = docs(s, d).filter(srcN >= 15).select(col("doc_id"), fp.as("fp"))
      val firsts = batch.groupBy(col("fp")).agg(min(col("doc_id")).as("first_id"))
      batch
        .join(firsts, Seq("fp"))
        .join(store, Seq("fp"), "left")
        .select(col("doc_id"),
          when(col("in_corpus"), "dup_of_corpus")
            .when(col("doc_id") =!= col("first_id"), "dup_in_batch")
            .otherwise("new").as("verdict"))
        .orderBy(col("doc_id"))
    },

    // NEAR-dup incremental ingest — dd_incremental's production-complete
    // form: the persisted store carries MinHash SIGNATURES and BAND
    // BUCKETS alongside the exact fingerprints, so a daily batch is also
    // screened for paraphrased/truncated re-crawls (the dd_cross_near
    // policy) WITHOUT ever rescanning the corpus text. Store build (once
    // per corpus snapshot, idempotent): one linear corpus pass writes
    // (corpus_id, sig, fp); bands derive from the STORED sigs; each band
    // bucket's posting list is capped at spark.graft.lsh.maxBucket (the
    // HotBuckets lever — a boilerplate template bucket stays bounded).
    // Daily run: one linear batch pass (sig + fp + bands), then every
    // join against a corpus-sized store frame BROADCASTS the day batch
    // (day ≪ corpus — plan-gated in CorpusPipelineSpec), so the store
    // streams through map-side: candidates = store bands ⋈ broadcast
    // batch bands, verified against store sigs at est-Jaccard >= 0.5
    // with the batch sig broadcast again. Verdict precedence:
    // dup_of_corpus (exact fp hit) > near_dup_of_corpus (signature
    // verify) > dup_in_batch (earlier batch doc, min-id reduction) >
    // new. MinHash estimate → rows-only driver check; batch-doc recall
    // vs the exact cross-batch ngram baseline is gated in
    // ApproxSuiteSpec.
    QueryDef("dd_incremental_near", None) { (s, d) =>
      val srcN = expr("try_cast(substring(source, 4, 10) AS INT)")
      val fp = Fingerprints.tokenSetFp(toks)
      val (storeBands, storeSigs) = nearStore(s, d)
      val batch = docs(s, d).filter(srcN >= 15)
        .select(col("doc_id"),
          minhash_sig(toks, 3, NearStoreBands * NearStoreRows).as("sig"), fp.as("fp"))
      val cands = storeBands
        .join(broadcast(batch.select(col("doc_id"), nearStoreBandKeys.as("bkey"))), Seq("bkey"))
        .select(col("doc_id"), col("corpus_id"))
        .dropDuplicates("doc_id", "corpus_id")
      val nearDup = cands
        .join(storeSigs.select(col("corpus_id"), col("sig").as("sig_c")), Seq("corpus_id"))
        .join(broadcast(batch.select(col("doc_id"), col("sig"))), Seq("doc_id"))
        .filter(size(filter(zip_with(col("sig"), col("sig_c"), (x, y) => x === y), b => b))
          .cast(DoubleType) / (NearStoreBands * NearStoreRows) >= 0.5)
        .select(col("doc_id")).distinct()
        .withColumn("near_dup", lit(true))
      val exactDup = storeSigs.select(col("fp"))
        .join(broadcast(batch.select(col("doc_id"), col("fp"))), Seq("fp"))
        .select(col("doc_id")).distinct()
        .withColumn("exact_dup", lit(true))
      val firsts = batch.groupBy(col("fp")).agg(min(col("doc_id")).as("first_id"))
      batch
        .join(firsts, Seq("fp"))
        .join(exactDup, Seq("doc_id"), "left")
        .join(nearDup, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("exact_dup"), "dup_of_corpus")
            .when(col("near_dup"), "near_dup_of_corpus")
            .when(col("doc_id") =!= col("first_id"), "dup_in_batch")
            .otherwise("new").as("verdict"))
        .orderBy(col("doc_id"))
    },

    // Fuzzy entity matching: near-identical name pairs by edit distance —
    // the catalog-normalization op (one vendor's "blue bolt", another's
    // "blue bolts"). Matching runs on the DISTINCT VOCABULARY, not the
    // rows: dedupe first, compare second, so the corpus contributes one
    // linear distinct pass and the quadratic compare touches |vocab|²
    // pairs (vocab ≪ corpus — entity name sets grow sublinearly in rows;
    // a length-band prune cuts the candidate set further, and a vocabulary
    // too large for this shape graduates to the q-gram LSH family above).
    // levenshtein has identical insert/delete/substitute semantics in
    // Spark and DuckDB, so pairs + distances oracle-check exactly.
    QueryDef("dd_fuzzy_names", Some(
      """WITH n AS (SELECT DISTINCT p_name FROM part)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM n a JOIN n b ON a.p_name < b.p_name
        |  AND abs(length(a.p_name) - length(b.p_name)) <= 2
        |  AND levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY name_a, name_b""".stripMargin)) { (s, d) =>
      val names = Tables.load(s, d, "part").select(col("p_name")).distinct()
      val a = names.select(col("p_name").as("name_a"))
      val b = names.select(col("p_name").as("name_b"))
      a.join(broadcast(b),
          col("name_a") < col("name_b") &&
            abs(length(col("name_a")) - length(col("name_b"))) <= 2 &&
            levenshtein(col("name_a"), col("name_b")) <= 2)
        .select(col("name_a"), col("name_b"),
          levenshtein(col("name_a"), col("name_b")).cast(LongType).as("dist"))
        .orderBy(col("name_a"), col("name_b"))
    },

    // Source-pair overlap matrix: for every ordered pair of corpus
    // sources, how many distinct 5-token shingles they share, and what
    // fraction of the first source's shingles that is (containment —
    // asymmetric by design: a small source swallowed by a big one shows
    // containment ~1 in one direction only). The corpus-curation view of
    // the dedup family: dd_cross_dedup answers "which eval docs leak into
    // train", this answers "which SOURCES are copies of each other" before
    // any per-doc work is spent. Scale shape: one shuffle keyed on the
    // shingle hash folds each shingle's source set (collect_set bounded by
    // the source count, not the corpus size — same bound the postings
    // pattern relies on); pairs explode from that tiny set, so the
    // second aggregation sees |sources|² keys, never a per-doc row.
    QueryDef("dd_source_overlap", Some(
      """WITH g AS (
        |  SELECT source,
        |    list_distinct([array_to_string(t[i:i+4],' ') FOR i IN range(1, len(t)-3)]) AS shs
        |  FROM (SELECT source, string_split(text,' ') AS t FROM documents)),
        |s AS (SELECT DISTINCT source, sh
        |      FROM (SELECT source, unnest(shs) AS sh FROM g)),
        |tot AS (SELECT source, count(*) AS n_a FROM s GROUP BY source),
        |pair AS (
        |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
        |  FROM s a JOIN s b ON a.sh = b.sh AND a.source <> b.source
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, n_shared, n_a,
        |  CAST(n_shared AS DOUBLE) / n_a AS containment
        |FROM pair JOIN tot ON pair.src_a = tot.source
        |ORDER BY src_a, src_b""".stripMargin)) { (s, d) =>
      val srcSets = docs(s, d)
        .select(col("source"), explode(ngram_hashes(toks, 5)).as("h"))
        .groupBy(col("h")).agg(collect_set(col("source")).as("ss"))
      val tot = srcSets
        .select(explode(col("ss")).as("src_a"))
        .groupBy(col("src_a")).agg(count(lit(1)).as("n_a"))
      srcSets
        .select(explode(col("ss")).as("src_a"), col("ss"))
        .select(col("src_a"), explode(col("ss")).as("src_b"))
        .filter(col("src_a") =!= col("src_b"))
        .groupBy(col("src_a"), col("src_b")).agg(count(lit(1)).as("n_shared"))
        .join(broadcast(tot), Seq("src_a"))
        .select(col("src_a"), col("src_b"), col("n_shared"), col("n_a"),
          (col("n_shared").cast(DoubleType) / col("n_a")).as("containment"))
        .orderBy(col("src_a"), col("src_b"))
    },

    // Containment dedup — the asymmetric sibling of dd_ngram_jaccard:
    // flag a pair when the shared shingles cover ≥ 80% of the SMALLER
    // document's shingle set. Catches subset duplicates (a doc embedded
    // verbatim inside a longer one) whose Jaccard similarity is diluted
    // by the size gap and slips under any symmetric threshold — the
    // classic boilerplate-wrapper case in web corpora. Identical
    // postings-list plan to dd_ngram_jaccard (one shuffle on the shingle
    // hash, map-side pair counting, broadcast size rejoin); only the
    // final predicate differs, and it is integer cross-multiplication —
    // no float threshold on either engine.
    QueryDef("dd_containment", Some(
      """WITH sh AS (
        |  SELECT doc_id,
        |    unnest(list_distinct([array_to_string(t[i:i+2],' ') FOR i IN range(1, len(t)-1)])) AS shingle,
        |    len(list_distinct([array_to_string(t[i:i+2],' ') FOR i IN range(1, len(t)-1)])) AS nsh
        |  FROM (SELECT doc_id, string_split(text,' ') AS t FROM documents))
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  count(*) AS inter, any_value(a.nsh) AS na, any_value(b.nsh) AS nb
        |FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |GROUP BY 1, 2
        |HAVING count(*) * 10 >= least(any_value(a.nsh), any_value(b.nsh)) * 8
        |ORDER BY doc_a, doc_b""".stripMargin)) { (s, d) =>
      val base = shingleHashBase(s, graft.operators.QuadraticGuard
        .check(docs(s, d), "dd_containment", "dd_minhash_lsh"))
      val nsh = base.select(col("doc_id"), size(col("hs")).cast(LongType).as("nsh"))
      val sh = base.select(col("doc_id"), explode(col("hs")).as("h"))
      val postings = sh.groupBy(col("h")).agg(collect_list(col("doc_id")).as("ds"))
        .filter(size(col("ds")) > 1)
      postings
        .select(explode(col("ds")).as("doc_a"), col("ds"))
        .select(col("doc_a"), explode(col("ds")).as("doc_b"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("inter"))
        .join(broadcast(nsh.select(col("doc_id").as("doc_a"), col("nsh").as("na"))), "doc_a")
        .join(broadcast(nsh.select(col("doc_id").as("doc_b"), col("nsh").as("nb"))), "doc_b")
        .filter(col("inter") * 10 >= least(col("na"), col("nb")) * 8)
        .select(col("doc_a"), col("doc_b"), col("inter"), col("na"), col("nb"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // Bloom-filter decontamination prefilter — the ZERO-JOIN scale path
    // for membership screening: build ONE bloom filter over the eval
    // set's token-set fingerprints (the bounded side — eval suites are
    // thousands-to-millions of items, so the filter is KBs-to-MBs), ship
    // its bytes as a literal, and screen the entire training corpus in a
    // single codegen scan — no shuffle, no broadcast hash table, no join.
    // Flagged docs are a SUPERSET of true matches (bloom guarantees no
    // false negatives; BloomPrefilterSpec gates FN=0 and bounds the FP
    // rate), which the exact pass (dd_cross_dedup / tx_decontaminate)
    // then confirms on the ~tiny flagged slice. This is Spark's own
    // BloomFilterAggregate/MightContain pair — what AQE injects WITHIN a
    // query — lifted to the cross-job artifact a pipeline persists. The
    // driver collect is the one bounded filter binary (numBits/8 bytes),
    // the same artifact pattern as the IVF centroids. Deterministic
    // (xxhash64 + fixed insertion math) but not SQL-expressible →
    // rows-only driver check; the spec suite carries the semantics.
    QueryDef("dd_bloom_prefilter", None) { (s, d) =>
      val evalSource = s.conf.get("spark.graft.decontaminate.evalSource", "src0")
      val expected = s.conf.get("spark.graft.bloom.expectedItems", "100000").toLong
      val numBits = s.conf.get("spark.graft.bloom.numBits", "800000").toLong
      val base = docs(s, d).select(col("doc_id"), col("source"),
        xxhash64(Fingerprints.tokenSetFp(toks)).as("fph"))
      val bloomBytes = base.filter(col("source") === evalSource)
        .agg(graft.functions.bloom_filter_agg(col("fph"), expected, numBits).as("bf"))
        .head.getAs[Array[Byte]]("bf")
      // empty eval set → null sketch → nothing can match
      val flagged =
        if (bloomBytes == null) lit(0L)
        else when(graft.functions.bloom_might_contain(lit(bloomBytes), col("fph")), 1L)
          .otherwise(0L)
      base.filter(col("source") =!= evalSource)
        .select(col("doc_id"), flagged.as("flagged"))
        .orderBy(col("doc_id"))
    },

    // Exact duplicated-SUBSTRING detection (the Lee et al. 2022
    // "Deduplicating Training Data Makes Language Models Better" pass, at
    // k-token-gram granularity): find, per document, every maximal span
    // of tokens covered by 5-gram windows that also occur VERBATIM in at
    // least one OTHER document. Doc-level dedup misses these (the hosts
    // differ), chunk dedup (dd_paragraph) only sees them when they align
    // to fixed chunk boundaries; the rolling gram window sees every
    // alignment. Spans = gaps-and-islands over the duplicated window
    // positions (windows chain while start-gap <= k, i.e. coverage stays
    // overlapping or contiguous); reported at >= 2k tokens — the paper's
    // "drop duplicate substrings over N tokens" knob, scaled to fixture
    // docs. Scale shape: gram text is hashed inside codegen, so the two
    // corpus-sized exchanges carry (hash) then (hash, doc_id, pos) longs
    // — the text never shuffles; "appears in another doc" is the
    // ALGEBRAIC min(doc)!=max(doc) per hash (no count-distinct); the
    // islands window partitions on doc_id — the high-cardinality per-row
    // key, the one place a window is the scale-safe plan. Hash identity
    // stands in for gram identity (the oracle groups by gram TEXT, so an
    // xxhash64 collision would surface as a mismatch).
    QueryDef("dd_substring", Some(
      """WITH g AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |p AS (SELECT doc_id, t, unnest(range(0, len(t)-4)) AS pos FROM g WHERE len(t) >= 5),
        |e AS (SELECT doc_id, pos, array_to_string(t[pos+1:pos+5],' ') AS gram FROM p),
        |f AS (SELECT gram FROM e GROUP BY gram HAVING min(doc_id) <> max(doc_id)),
        |dup AS (SELECT doc_id, pos FROM e JOIN f USING (gram)),
        |brk AS (SELECT doc_id, pos,
        |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 5
        |         THEN 0 ELSE 1 END AS b
        |  FROM dup),
        |isl AS (SELECT doc_id, pos,
        |    sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM brk),
        |s AS (SELECT doc_id, min(pos) AS span_start, max(pos)+4 AS span_end
        |  FROM isl GROUP BY doc_id, island)
        |SELECT doc_id, span_start, span_end,
        |  span_end - span_start + 1 AS span_tokens
        |FROM s WHERE span_end - span_start + 1 >= 10
        |ORDER BY doc_id, span_start""".stripMargin)) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val k = 5
      val grams = docs(s, d)
        .select(col("doc_id"), toks.as("t"))
        .filter(size(col("t")) >= k)
        .select(col("doc_id"),
          explode(sequence(lit(0L), (size(col("t")) - k).cast(LongType))).as("pos"),
          col("t"))
        .select(col("doc_id"), col("pos"),
          xxhash64(concat_ws(" ",
            slice(col("t"), (col("pos") + 1).cast("int"), lit(k)))).as("h"))
      val crossDoc = grams.groupBy(col("h"))
        .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
        .filter(col("mn") =!= col("mx"))
        .select(col("h"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      grams.join(crossDoc, Seq("h"))
        .withColumn("b", when(col("pos") - lag(col("pos"), 1).over(w) <= k, 0L).otherwise(1L))
        .withColumn("island", sum(col("b")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("doc_id"), col("island"))
        .agg(min(col("pos")).as("span_start"), (max(col("pos")) + k - 1).as("span_end"))
        .select(col("doc_id"), col("span_start"), col("span_end"),
          (col("span_end") - col("span_start") + 1).as("span_tokens"))
        .filter(col("span_tokens") >= 2 * k)
        .orderBy(col("doc_id"), col("span_start"))
    }
  )
}
