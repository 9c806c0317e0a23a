package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Deletion propagation into the MAINTAINED stores — the third leg of the
  * right-to-be-forgotten story. `op_forget_users` purges the raw tables
  * and `ss_forget_enforce` stops new data at the door, but the persisted
  * derived stores — LM counts, BM25 postings, co-occurrence counts, the
  * sketch warehouse's day partials — still carry the opted-out users'
  * contributions. Each verb here deletes those contributions FROM THE
  * STORE, by the cheapest mechanism its algebra allows, and
  * ForgetStoresSpec gates that the edited store is bit-identical to a
  * from-scratch rebuild on the purged corpus:
  *
  *  - exact count stores (LM unigram/bigram, co-occurrence): delta
  *    SUBTRACT — the IVM delta rule run in reverse. Counts are exact
  *    integers, so old − delta(forgotten) ≡ rebuild(purged); keys whose
  *    count reaches 0 are dropped (a rebuild would never have them).
  *  - BM25 postings: tombstone + SEGMENT COMPACTION — postings are
  *    doc-immutable append segments (the ss_bm25_maintain shape), so
  *    deletion rewrites only the segments containing tombstoned docs;
  *    untouched segments' files are not rewritten (spec-gated by file
  *    identity).
  *  - sketch warehouse: sketches are NOT subtractable — the touched DAYS
  *    (days where a forgotten user has events) are re-derived from the
  *    purged raw slice and spliced with the untouched days' partials,
  *    which are reused byte-for-byte; untouched history is never
  *    rescanned.
  *
  * Scale shape shared by all four: the tombstone set is request-bounded
  * (every-97th convention, the op_forget_users fixture), so the
  * forgotten-contribution delta is computed behind a BROADCAST semi-join
  * on the raw tables, the store edit is a broadcast-delta join over the
  * store (never a store shuffle), and the touched-unit list (segments,
  * days) is a bounded driver collect. At 100 TB: stores stay
  * bucket/segment/day-partitioned, the purge touches the tombstones'
  * units only, untouched units are renamed-in, not rewritten.
  */
object ForgetStoreQueries {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")

  /** Forgotten docs/users: the op_forget_users every-97th convention. */
  private val ForgottenDoc = col("doc_id") % 97 === 0
  private val ForgottenUser = col("user_id") % 97 === 0

  private def purge(sql: String, from: String, cond: String): String =
    sql.replace(s"FROM $from", s"FROM (SELECT * FROM $from WHERE $cond)")

  // ---- LM count stores: delta subtract --------------------------------

  /** Full LM count stores persisted, then the forgotten docs' counts
    * SUBTRACTED — returns (purged uni, purged bi). The subtract reads the
    * persisted store and joins the request-bounded delta (broadcast), so
    * the edit costs O(store-scan + delta), never a corpus recount. */
  private[graft] def lmPurgedStores(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val base = StreamingQueries.invocationStore(s, "fglm", d)
    val all = docs(s, d)
    def uniOf(df: DataFrame, cnt: String, spread: Boolean = false) = {
      val in =
        if (spread) graft.operators.Spread.toCores(df.select(col("text")))
        else df
      in.select(explode(split(col("text"), " ")).as("t"))
        .select(xxhash64(col("t")).as("hw"))
        .groupBy(col("hw")).agg(count(lit(1)).as(cnt))
    }
    def biOf(df: DataFrame, cnt: String, spread: Boolean = false) =
      TextQueries.lmBigramPairs(df, spread)
        .groupBy(col("hb")).agg(count(lit(1)).as(cnt))
    // the two corpus-pass store builds are independent — run their write
    // jobs concurrently (guide §2.6), each with a core-wide tokenize
    // (the single-row-group fixture scan is otherwise one task)
    StreamingQueries.foldPar(
      () => uniOf(all, "cu", spread = true)
        .write.mode("overwrite").parquet(s"$base/uni"),
      () => biOf(all, "cb", spread = true)
        .write.mode("overwrite").parquet(s"$base/bi"))
    val gone = all.filter(ForgottenDoc)
    def subtract(store: DataFrame, delta: DataFrame,
        key: String, cnt: String, dCnt: String) =
      store.join(broadcast(delta), Seq(key), "left_outer")
        .select(col(key),
          (col(cnt) - coalesce(col(dCnt), lit(0L))).as(cnt))
        .filter(col(cnt) > 0)
    (subtract(s.read.parquet(s"$base/uni"), uniOf(gone, "du"), "hw", "cu", "du"),
      subtract(s.read.parquet(s"$base/bi"), biOf(gone, "db"), "hb", "cb", "db"))
  }

  // ---- BM25 postings: tombstone + segment compaction -------------------

  /** Segmented postings store built (doc-ranges stand in for ingest
    * batches), tombstoned docs compacted OUT of only the segments that
    * contain them. Returns (segment root, compaction root, served
    * postings frame) — the spec asserts untouched segments' files are
    * byte-untouched and the served index equals a purged rebuild. */
  private[graft] def bm25CompactedStore(
      s: SparkSession, d: String): (String, String, DataFrame) = {
    val segDocs = s.conf.get("spark.graft.forget.segDocs", "32").toInt
    val base = StreamingQueries.invocationStore(s, "fgbm25", d)
    val segRoot = s"$base/segments"
    val compactRoot = s"$base/compacted"
    docs(s, d)
      .select(col("doc_id"), (col("doc_id") / segDocs).cast(LongType).as("seg"),
        explode(split(coalesce(col("text"), lit("")), " ")).as("t"))
      .groupBy(xxhash64(col("t")).as("h"), col("doc_id"), col("seg"))
      .agg(count(lit(1)).as("tf"))
      // explicit width: a bare repartition(col("seg")) AQE-coalesced to a
      // SINGLE task that wrote all ~|docs|/segDocs segment dirs serially
      // (profiled at 7 s single-threaded); hashing segs over the executor
      // slots writes them in parallel — still one file per segment
      .repartition(s.sparkContext.defaultParallelism, col("seg"))
      .write.partitionBy("seg").mode("overwrite").parquet(segRoot)
    val tomb = docs(s, d).filter(ForgottenDoc).select(col("doc_id"))
    // touched segments: request-bounded driver list
    val touched = tomb.select((col("doc_id") / segDocs).cast(LongType).as("seg"))
      .distinct().collect().map(_.getLong(0)).toSeq.sorted
    // compaction job reads ONLY the touched segment directories
    val touchedPaths = touched.map(sg => s"$segRoot/seg=$sg")
      .filter(p => new java.io.File(p).exists())
    if (touchedPaths.nonEmpty)
      s.read.option("basePath", segRoot).parquet(touchedPaths: _*)
        .join(broadcast(tomb), Seq("doc_id"), "left_anti")
        .select(col("h"), col("doc_id"), col("tf"), col("seg"))
        .repartition(s.sparkContext.defaultParallelism, col("seg"))
        .write.partitionBy("seg").mode("overwrite").parquet(compactRoot)
    val untouched = s.read.parquet(segRoot)
      .filter(!col("seg").isin(touched.map(java.lang.Long.valueOf): _*))
      .select(col("h"), col("doc_id"), col("tf"))
    val compacted =
      if (touchedPaths.isEmpty) untouched
      else untouched.unionByName(
        s.read.parquet(compactRoot).select(col("h"), col("doc_id"), col("tf")))
    (segRoot, compactRoot, compacted)
  }

  // ---- co-occurrence counts: the IVM delta rule in reverse -------------

  /** Full (sa, sb, n) pair-count store persisted, then the forgotten
    * customers' pair contributions subtracted: removing customer c
    * removes exactly C(basket_c, 2) pair increments — the
    * ivmCooccurCounts insert rule with the sign flipped. */
  private[graft] def cooccurPurgedCounts(s: SparkSession, d: String): DataFrame = {
    val base = StreamingQueries.invocationStore(s, "fgcooccur", d)
    val pairs = Tables.load(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey").as("c"))
      .join(Tables.load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey").as("sp")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("c"), col("sp").as("s")).distinct()
    // ONE expansion pass yields both the full store counts and the
    // forgotten customers' delta: an increment (sa, sb) contributed by
    // customer c is "gone" iff c is in the forget request, so count(*)
    // and count_if(gone) over the same C(basket,2) expansion reproduce
    // the old pairCounts(pairs) / pairCounts(goneBaskets) exactly
    // (goneBaskets ⊆ pairs — each gone increment is counted in both).
    // The previous shape re-built the orders⋈lineitem distinct AND ran
    // a second expansion just for the delta (profiled as its own
    // broadcast-build job); the fused aggregate is cached once, the
    // persisted store keeps its (sa, sb, n) schema, and the subtract
    // still reads the store and broadcasts the request-bounded delta.
    val expanded = pairs
      .join(pairs.select(col("c"), col("s").as("s2")), Seq("c"))
      .filter(col("s") < col("s2"))
      .select(col("s").as("sa"), col("s2").as("sb"),
        (col("c") % 97 === 0).as("gone"))
      .groupBy(col("sa"), col("sb"))
      .agg(count(lit(1)).as("n"), count_if(col("gone")).as("dn"))
      .persist()
    expanded.select(col("sa"), col("sb"), col("n"))
      .write.mode("overwrite").parquet(s"$base/counts")
    val delta = expanded.filter(col("dn") > 0)
      .select(col("sa"), col("sb"), col("dn"))
    val out = s.read.parquet(s"$base/counts")
      .join(broadcast(delta), Seq("sa", "sb"), "left_outer")
      .select(col("sa"), col("sb"),
        (col("n") - coalesce(col("dn"), lit(0L))).as("n"))
      .filter(col("n") > 0)
      .localCheckpoint(true)
    expanded.unpersist(false)
    out
  }

  // ---- sketch warehouse: re-derive touched days only -------------------

  /** The day-partial store with the forgotten users' days re-derived from
    * the purged raw slice; untouched days' partial rows pass through
    * byte-for-byte (sketches are not subtractable — but only the days a
    * forgotten user actually touched need rebuilding, and the rebuild
    * scan is day-pruned). Returns the spliced store frame. */
  private[graft] def sketchSplicedStore(s: SparkSession, d: String): DataFrame = {
    val store = SketchQueries.sketchStore(s, d)
    val events = Tables.load(s, d, "events")
    val touched = events.filter(ForgottenUser)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .distinct().collect().map(_.getString(0)).toSeq
    val rebuilt = events
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .filter(col("day").isin(touched: _*) && !ForgottenUser)
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_events"),
        expr("theta_sketch_agg(user_id, 17)").as("tsk"),
        expr("kll_sketch_agg_double(value, 65535)").as("ksk"))
    store.filter(if (touched.isEmpty) lit(true)
        else !col("day").isin(touched: _*))
      .unionByName(rebuilt)
  }

  // ---- exact-dedup fingerprint store: refcounted key subtract ----------

  /** The dd_incremental corpus fingerprint store, REFCOUNTED and purged:
    * the persisted store carries (fp, n) — how many corpus docs share
    * each token-set fingerprint — so deletion is the LM delta-subtract
    * run on fingerprints: forgotten docs' fp counts subtract, keys
    * reaching 0 drop, and an fp shared by a forgotten and a surviving
    * doc SURVIVES with its count reduced (a plain distinct-fp store
    * cannot answer that without a corpus recount — the refcount IS what
    * makes the delete O(delta)). The sf0.1 fixture exercises the shared
    * case (3 fps held by both sides); ForgetStoresSpec pins it on a
    * crafted frame. Store slice = dd_incremental's corpus split
    * (source < 15). */
  /** The pure edit: subtract the forgotten docs' fp counts from a
    * refcounted (fp, n) store frame; keys reaching 0 drop. `fps` is the
    * FORGOTTEN docs' (fp) rows — request-bounded, hence broadcast. */
  private[graft] def fpRefcountSubtract(store: DataFrame, goneFps: DataFrame): DataFrame =
    store.join(broadcast(goneFps.groupBy(col("fp")).agg(count(lit(1)).as("dn"))),
        Seq("fp"), "left_outer")
      .select(col("fp"), (col("n") - coalesce(col("dn"), lit(0L))).as("n"))
      .filter(col("n") > 0)

  private[graft] def fpPurgedStore(s: SparkSession, d: String): DataFrame = {
    val base = StreamingQueries.invocationStore(s, "fgfp", d)
    val srcN = expr("try_cast(substring(source, 4, 10) AS INT)")
    val fps = docs(s, d).filter(srcN < 15)
      .select(col("doc_id"),
        Fingerprints.tokenSetFp(split(col("text"), " ")).as("fp"))
    fps.groupBy(col("fp")).agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$base/fp")
    fpRefcountSubtract(s.read.parquet(s"$base/fp"),
      fps.filter(ForgottenDoc).select(col("fp")))
  }

  // ---- ANN index store: tombstoned vectors deleted from their lists ----

  /** The persisted IVF postings store `(vec_id, embedding, cl)`,
    * list-partitioned (`cl=<c>` directories — the inverted-file layout),
    * with the tombstoned vectors deleted. The quantizer is a FROZEN
    * artifact (trained on the pre-purge snapshot, IndexStore-persisted in
    * a deployment): deletion edits the postings, never the centroids —
    * assignment is per-row deterministic under fixed centroids, so the
    * edited store is bit-identical to re-assigning the purged corpus with
    * the same artifact (ForgetStoresSpec gates it; centroid RETRAIN is a
    * compaction-time decision, exactly like the sketch warehouse's
    * non-subtractable days). Touched lists come from re-assigning the
    * request-bounded tombstone set (O(|tombstones|), never a store scan);
    * only those `cl=` directories are rewritten — untouched lists' files
    * are byte-identical (spec-gated by file identity).
    * Returns (list root, compaction root, served postings, centroids). */
  private[graft] def ivfPurgedPostings(s: SparkSession, d: String)
      : (String, String, DataFrame, Seq[Array[Float]]) = {
    val base = StreamingQueries.invocationStore(s, "fgivf", d)
    val listRoot = s"$base/lists"
    val compactRoot = s"$base/compacted"
    val e = Tables.load(s, d, "embeddings").select(col("vec_id"), col("embedding"))
    val k = Ivf.intConf(s, "spark.graft.ivf.k", 16)
    val cents = Ivf.train(e, k, iters = 3,
      trainSample = Ivf.intConf(s, "spark.graft.ivf.trainSample", 2000))
    Ivf.assigned(e, cents)
      .repartition(s.sparkContext.defaultParallelism, col("cl"))
      .write.partitionBy("cl").mode("overwrite").parquet(listRoot)
    val tomb = e.filter(col("vec_id") % 97 === 0)
    // touched lists: re-assign the TOMBSTONES (broadcast-tiny), never
    // scan the store for them
    val touched = Ivf.assigned(tomb, cents)
      .select(col("cl").cast(IntegerType)).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    val tombIds = tomb.select(col("vec_id"))
    val touchedPaths = touched.map(c => s"$listRoot/cl=$c")
      .filter(p => new java.io.File(p).exists())
    if (touchedPaths.nonEmpty)
      s.read.option("basePath", listRoot).parquet(touchedPaths: _*)
        .join(broadcast(tombIds), Seq("vec_id"), "left_anti")
        .select(col("vec_id"), col("embedding"), col("cl"))
        .repartition(s.sparkContext.defaultParallelism, col("cl"))
        .write.partitionBy("cl").mode("overwrite").parquet(compactRoot)
    val untouched = s.read.parquet(listRoot)
      .filter(!col("cl").isin(touched.map(Integer.valueOf): _*))
      .select(col("vec_id"), col("embedding"), col("cl"))
    val served =
      if (touchedPaths.isEmpty) untouched
      else untouched.unionByName(s.read.parquet(compactRoot)
        .select(col("vec_id"), col("embedding"), col("cl")))
    (listRoot, compactRoot, served, cents)
  }

  // ---- near-dup store: key delete --------------------------------------

  /** The dedup near store purged by KEY DELETE — fingerprint/signature
    * stores key rows by doc id, so deletion is an anti-join on the
    * tombstones, no recompute at all. Returns the purged (bands, sigs)
    * frames (a deployment rewrites the store files under the StoreLock;
    * the shared fixture store is left untouched here because every other
    * dedup query reads it). Key-delete ≡ purged rebuild whenever no band
    * bucket was truncated by the HotBuckets cap (ForgetStoresSpec checks
    * the precondition, then the equality). */
  private[graft] def nearStorePurged(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val (bands, sigs) = DedupQueries.nearStore(s, d)
    val tomb = docs(s, d).filter(ForgottenDoc)
      .select(col("doc_id").as("corpus_id"))
    (bands.join(broadcast(tomb), Seq("corpus_id"), "left_anti"),
      sigs.join(broadcast(tomb), Seq("corpus_id"), "left_anti"))
  }

  val defs: Seq[QueryDef] = Seq(

    // Delta-subtract on the LM count stores, then the standard surprisal
    // report over the purged corpus — scoring reads the EDITED store, so
    // the oracle (the full LM pipeline on the purged corpus) passing
    // proves the subtraction reproduced the purged model exactly.
    QueryDef("fg_lm_subtract", Some(
      purge(TextQueries.lmSurprisalSql, "documents", "doc_id % 97 <> 0"))) { (s, d) =>
      val (uni, bi) = lmPurgedStores(s, d)
      TextQueries.lmScore(
        TextQueries.lmBigramPairs(
          docs(s, d).filter(!ForgottenDoc), spread = true), uni, bi)
    },

    // Tombstone + segment compaction on the postings store, then the
    // shared BM25 serving pass — dl/N/avgdl/df all reconstruct from the
    // compacted postings, so the purged-corpus oracle passing proves no
    // tombstoned posting (and no over-deleted survivor) remains.
    QueryDef("fg_bm25_compact", Some(
      purge(SearchQueries.bm25Sql, "documents", "doc_id % 97 <> 0"))) { (s, d) =>
      SearchQueries.bm25PostingsScore(bm25CompactedStore(s, d)._3)
    },

    // Reverse-IVM subtract on the co-occurrence counts, then the
    // op_cooccur_topk bounded-heap report off the edited store.
    QueryDef("fg_cooccur_subtract", Some(
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |  WHERE o_custkey % 97 <> 0),
        |co AS (
        |  SELECT a.s AS sa, b.s AS sb, CAST(count(*) AS BIGINT) AS n_common
        |  FROM pairs a JOIN pairs b ON a.c = b.c AND a.s < b.s
        |  GROUP BY a.s, b.s),
        |sym AS (SELECT sa AS s, sb AS nb, n_common FROM co
        |        UNION ALL SELECT sb AS s, sa AS nb, n_common FROM co),
        |r AS (SELECT s, nb, n_common,
        |        row_number() OVER (PARTITION BY s
        |                           ORDER BY n_common DESC, nb) AS rnk
        |      FROM sym)
        |SELECT s AS supp, rnk, nb AS neighbor, n_common
        |FROM r WHERE rnk <= 5 ORDER BY supp, rnk""".stripMargin)) { (s, d) =>
      import graft.functions.topk_min
      val counts = cooccurPurgedCounts(s, d)
      val sym = counts
        .select(col("sa").as("s"), col("sb").as("nb"), col("n").as("n_common"))
        .unionByName(counts
          .select(col("sb").as("s"), col("sa").as("nb"), col("n").as("n_common")))
      sym.groupBy(col("s"))
        .agg(topk_min(struct((-col("n_common")).as("ncnt"),
          col("nb").as("nb"), col("n_common").as("n_common")), 5).as("tk"))
        .select(col("s"), posexplode(col("tk")).as(Seq("pos", "st")))
        .select(col("s").as("supp"), (col("pos") + 1).as("rnk"),
          col("st.nb").as("neighbor"), col("st.n_common").as("n_common"))
        .orderBy(col("supp"), col("rnk"))
    },

    // Touched-day re-derivation in the sketch warehouse, then the weekly
    // rollup off the spliced store (exact at oracle scale — the
    // op_sketch_rollup regime), proving the splice equals a full purged
    // rebuild while untouched days were reused, not rescanned.
    QueryDef("fg_sketch_rewindow", Some(
      """WITH e AS (SELECT CAST(floor((CAST(strftime(ts, '%d') AS INT) - 1) / 7) AS BIGINT) AS wk,
        |    user_id, value FROM events WHERE user_id % 97 <> 0),
        |a AS (SELECT wk, CAST(count(*) AS BIGINT) AS n_events,
        |    count(DISTINCT user_id) AS users FROM e GROUP BY wk),
        |q AS (SELECT wk, min(v) AS p50 FROM (
        |    SELECT wk, value AS v,
        |      row_number() OVER (PARTITION BY wk ORDER BY value) AS rn,
        |      count(*) OVER (PARTITION BY wk) AS n FROM e)
        |  WHERE rn >= ceil(0.5 * n) GROUP BY wk)
        |SELECT wk, n_events, users, p50 FROM a JOIN q USING (wk)
        |ORDER BY wk""".stripMargin)) { (s, d) =>
      sketchSplicedStore(s, d)
        .withColumn("wk",
          floor((substring(col("day"), 9, 2).cast(IntegerType) - 1) / 7).cast(LongType))
        .groupBy(col("wk"))
        .agg(sum(col("n_events")).as("n_events"),
          expr("theta_sketch_estimate(theta_union_agg(tsk, 17))").as("users"),
          expr("element_at(kll_sketch_get_quantile_double(kll_merge_agg_double(ksk), array(0.5D)), 1)")
            .as("p50"))
        .orderBy(col("wk"))
    },

    // Refcounted subtract on the exact-dedup fingerprint store: the
    // persisted (fp, n) store minus the forgotten docs' fp counts equals
    // the purged-corpus fingerprint census exactly — including the
    // shared case (an fp held by both a forgotten and a surviving doc
    // keeps its key with n reduced; sf0.1 has 3 such fps). The oracle
    // recomputes the census from the purged corpus, so a pass proves
    // the O(delta) edit reproduced what a full recount would.
    QueryDef("fg_fp_subtract", Some(
      s"""SELECT ${Fingerprints.sql} AS fp, CAST(count(*) AS BIGINT) AS n
         |FROM documents
         |WHERE TRY_CAST(substr(source, 4) AS INTEGER) < 15
         |  AND doc_id % 97 <> 0
         |GROUP BY 1 ORDER BY fp""".stripMargin)) { (s, d) =>
      fpPurgedStore(s, d).orderBy(col("fp"))
    },

    // Key delete in the ANN index: tombstoned vectors removed from their
    // inverted lists (only those lists rewritten), then the shared IVF
    // serving tree (SimilarityQueries.ivfProbeSearch — one definition,
    // every IVF surface) answers probes from the edited store. No SQL
    // oracle (k-means is not SQL); GateCheck holds (a) zero tombstoned
    // ids in any result and (b) zero row mismatches vs re-assigning the
    // purged corpus under the same frozen centroids; ForgetStoresSpec
    // additionally gates untouched-list file identity. Probes are the
    // surviving vectors 1..NQueries (vec 0 is itself tombstoned by the
    // every-97th convention).
    QueryDef("fg_ivf_delete", None) { (s, d) =>
      val (_, _, served, cents) = ivfPurgedPostings(s, d)
      val k = cents.size
      val nProbe = math.max(3, math.ceil(
        s.conf.get("spark.graft.ivf.coverage", "0.375").toDouble * k).toInt)
      val probeBase = Tables.load(s, d, "embeddings")
        .select(col("vec_id"), col("embedding"))
        .filter(col("vec_id") >= 1 && col("vec_id") <= SimilarityQueries.NQueries)
      SimilarityQueries.ivfProbeSearch(served, probeBase, cents, nProbe)
    }
  )
}
