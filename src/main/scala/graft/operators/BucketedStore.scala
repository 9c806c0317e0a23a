package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hash-bucketed persisted store for the incremental-view-maintenance
  * folds (`ivmCooccurCounts`, `ss_lm_maintain`) — the graduation of the
  * version-alternating full rewrite: the store lives as parquet
  * partitioned by `__bkt = hash(bucketCols) % nBuckets`, and a fold
  * touches ONLY the buckets the batch's delta hashes into. Per
  * micro-batch the old shape paid O(|store|) — read the whole store,
  * full_outer the delta, rewrite the whole store — which at warehouse
  * scale with minute-level batches dominates the entire maintenance
  * family; here the fold reads and rewrites (touched/nBuckets)·|store| +
  * O(|delta|), so a trickle batch whose keys land in t buckets pays the
  * t-bucket slice of the store, NOT the store (IvmBucketedSpec gates
  * both the bit-identity with the full fold and that untouched buckets'
  * files are not rewritten). This is the repo's own `op_bucketed_join`
  * lever (co-located key layout → zero-exchange per-bucket work) applied
  * to the maintained stores.
  *
  * Layout and lifecycle: each fold writes a NEW generation directory
  * `root/fold_<gen>/__bkt=<b>/…` containing only the touched buckets (no
  * read-your-own-overwrite: the fold job reads the previous generations
  * and writes a fresh one). A driver-side map tracks, per bucket, which
  * generation currently owns it; reads union the live generations with a
  * partition-pruned `__bkt IN (…)` filter, so untouched generations'
  * other buckets are never scanned. Generations a fold fully supersedes
  * are deleted immediately; when the live-generation fan-in exceeds
  * `compactAfter`, everything compacts into one generation (the classic
  * LSM bound on read amplification — amortized O(|store|/compactAfter)
  * per fold).
  *
  * Scale shape: the bucket map is O(nBuckets) driver state (ints and
  * strings — at the production nBuckets ~ 4096 this is nothing); every
  * data-touching step is a distributed scan/join/write. Single-writer
  * per store root, the same contract the version-alternating fold had —
  * a shared multi-writer deployment would wrap folds in the repo's
  * [[StoreLock]].
  *
  * @param template   zero-row frame fixing the store's columns/types
  *                   (keys first, value columns after)
  * @param keyCols    the store's logical key (fold join key)
  * @param bucketCols the bucketing subset of `keyCols` — bucket by the
  *                   JOIN key the maintenance reads with (e.g. the seen
  *                   store keys (c, s) but buckets by c, so "postings for
  *                   this batch's customers" prunes to the customers'
  *                   buckets)
  */
final class BucketedStore(
    root: String,
    template: DataFrame,
    keyCols: Seq[String],
    bucketCols: Seq[String],
    nBuckets: Int,
    compactAfter: Int = 8) {
  require(bucketCols.forall(keyCols.contains), "bucketCols must be key columns")
  private val spark = template.sparkSession
  // bucket -> generation dir currently owning it (driver-side, O(nBuckets))
  private val live = scala.collection.mutable.Map.empty[Int, String]
  private var gen = 0

  /** The bucket id of a row — pure function of the bucket columns, so it
    * can be recomputed after a USING join coalesces the keys. */
  def bucketExpr: Column =
    pmod(xxhash64(bucketCols.map(col): _*), lit(nBuckets.toLong)).cast("int")

  /** Distinct bucket ids a frame's rows hash into (bounded driver
    * collect: at most nBuckets ints). */
  def bucketsOf(df: DataFrame): Set[Int] =
    df.select(bucketExpr.as("__bkt")).distinct()
      .collect().map(_.getInt(0)).toSet

  private def emptyWithBkt: DataFrame =
    template.withColumn("__bkt", lit(0).cast("int")).where(lit(false))

  /** Rows currently stored in the given buckets, `__bkt` column included.
    * One scan per live generation holding a requested bucket, reading the
    * requested `__bkt=<b>` subdirectories as EXPLICIT paths (basePath
    * recovers the bucket column) — the scan never even LISTS the other
    * buckets' directories, so a trickle read costs the touched buckets'
    * files, not an nBuckets-wide listing. */
  def readBuckets(buckets: Set[Int]): DataFrame = {
    val byDir = live.toSeq.filter(e => buckets(e._1))
      .groupBy(_._2).view.mapValues(_.map(_._1)).toSeq
    if (byDir.isEmpty) emptyWithBkt
    else byDir.map { case (dir, bks) =>
      val paths = bks.map(b => s"$dir/__bkt=$b")
        .filter(p => new java.io.File(p).exists())
      if (paths.isEmpty) emptyWithBkt
      else spark.read.option("basePath", dir).parquet(paths: _*)
        .select(template.columns.map(col) :+ col("__bkt").cast("int"): _*)
    }.reduce(_.unionByName(_))
  }

  /** The whole store (all live buckets), `__bkt` included. */
  def readAll(): DataFrame = readBuckets(live.keySet.toSet)

  /** Additive count fold: `delta` carries `keyCols` + `deltaCol`; every
    * key's stored `countCol` becomes old + delta (missing side = 0) —
    * the exact full_outer algebra of the version-alternating fold,
    * restricted to the touched buckets. Two join shapes, chosen PER FOLD
    * by the delta's bucket footprint (`spark.graft.ivm.wideFrac`,
    * default 0.5 — fraction of nBuckets touched at which a fold counts
    * as wide):
    *  - TRICKLE (few buckets touched): left_outer ∪ (delta ∖ store) —
    *    key-set-identical to the full_outer, but both joins BROADCAST
    *    the small delta, so the fold is one pass over the touched
    *    buckets with no shuffle of the store slice.
    *  - WIDE (most buckets touched — a bulk-load batch, the fixture's
    *    4-slice feeds): here the delta is store-sized, so broadcasting
    *    it twice is the wrong plan; the fold runs the single full_outer
    *    the legacy path used (one sort-merge join instead of two
    *    hash-map builds over a corpus-sized delta).
    * The two shapes compute the identical key algebra — IvmBucketedSpec
    * forces each and gates bit-identity. */
  def foldCounts(delta: DataFrame, deltaCol: String, countCol: String): Unit =
    fold(delta) { (cur, d, wide) =>
      if (wide)
        cur.join(d, keyCols, "full_outer")
          .select(keyCols.map(col) :+
            (coalesce(col(countCol), lit(0L)) +
              coalesce(col(deltaCol), lit(0L))).as(countCol): _*)
      else
        cur.join(d, keyCols, "left_outer")
          .select(keyCols.map(col) :+
            (col(countCol) + coalesce(col(deltaCol), lit(0L))).as(countCol): _*)
          .unionByName(d.join(cur, keyCols, "left_anti")
            .select(keyCols.map(col) :+ col(deltaCol).as(countCol): _*))
    }

  /** Set insert: `delta` carries `keyCols` only and must be disjoint from
    * the store (the caller's anti-join guarantees it — same contract the
    * unbucketed union fold had). Insertion is a union either way, so the
    * wide/trickle split does not apply. */
  def foldSet(delta: DataFrame): Unit =
    fold(delta) { (cur, d, _) => cur.select(keyCols.map(col): _*).unionByName(d) }

  private def fold(delta: DataFrame)(
      combine: (DataFrame, DataFrame, Boolean) => DataFrame): Unit = {
    val d = delta.persist()
    try {
      val touched = bucketsOf(d)
      val wideFrac =
        spark.conf.get("spark.graft.ivm.wideFrac", "0.5").toDouble
      val wide = touched.size >= wideFrac * nBuckets
      if (touched.nonEmpty) {
        val cur = readBuckets(touched).drop("__bkt")
        // repartition by bucket before the partitioned write: without it
        // every task writes a file per bucket it happens to hold
        // (tasks × buckets small files); with it each bucket's rows land
        // in one task → one file per bucket per fold
        val out = combine(cur, d, wide).withColumn("__bkt", bucketExpr)
          .repartition(col("__bkt"))
        val dir = s"$root/fold_$gen"
        gen += 1
        out.write.partitionBy("__bkt").mode("overwrite").parquet(dir)
        advance(touched, dir)
      }
    } finally d.unpersist()
    if (live.values.toSet.size > compactAfter) compact()
  }

  /** Rewrite every live bucket into one generation — bounds the read
    * fan-in (and the stale-row accumulation of superseded generations). */
  def compact(): Unit = if (live.nonEmpty) {
    val all = readAll().drop("__bkt").withColumn("__bkt", bucketExpr)
    val dir = s"$root/fold_$gen"
    gen += 1
    all.write.partitionBy("__bkt").mode("overwrite").parquet(dir)
    advance(live.keySet.toSet, dir)
  }

  private def advance(buckets: Set[Int], dir: String): Unit = {
    val before = live.values.toSet
    buckets.foreach(b => live(b) = dir)
    // generations no live bucket points at anymore are dead weight
    (before -- live.values.toSet).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
  }

  /** Current bucket → generation-dir ownership (spec introspection: the
    * untouched-bucket gate asserts a 1-key fold leaves every other
    * bucket's owning directory — and thus its files — unchanged). */
  private[graft] def liveDirs: Map[Int, String] = live.toMap
}
