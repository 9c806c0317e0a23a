package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hash-bucketed persisted store for the incremental-view-maintenance
  * folds (`ivmCooccurCounts`, `ss_lm_maintain`, `ss_fp_maintain`) — the
  * graduation of the version-alternating full rewrite, now a true
  * LSM: the store lives as parquet segments partitioned by
  * `__bkt = hash(bucketCols) % nBuckets`, a fold APPENDS a segment
  * containing only the delta, and reads MERGE across a bucket's
  * segments (sum for additive counts, plain union for disjoint set
  * inserts). Per micro-batch the original shape paid O(|store|) — read
  * the whole store, full_outer the delta, rewrite the whole store; the
  * round-14 bucketed fold paid O(touched-bucket slice) but still one
  * distinct-collect (`bucketsOf`) plus a read+join+rewrite of every
  * touched bucket per fold. Here a fold is ONE Spark job — partition
  * the delta by bucket and write it — because the store's algebra
  * makes the combine deferrable: counts are additive (merge-on-read =
  * sum per key, the exact integer the eager full_outer fold computed)
  * and set inserts are disjoint by the callers' anti-join contract
  * (merge-on-read = union). Which buckets a fold touched is read back
  * from the written directory listing — a driver-side FS stat, not a
  * Spark job. IvmBucketedSpec gates bit-identity with the legacy full
  * fold, untouched-bucket file identity, and the trickle-cost bound.
  *
  * Read amplification is bounded by `compactAfter`: when any bucket's
  * segment fan-in exceeds it, the store compacts — the merged view is
  * rewritten as one segment (the classic LSM bound: amortized
  * O(|store|/compactAfter) per fold). Reads prune to the requested
  * buckets' segment subdirectories as EXPLICIT paths, so a trickle
  * read never even lists the other buckets' directories; `__bkt` is
  * recomputed from the key columns on read (it is a pure function of
  * them), which keeps the scan a single multi-path parquet read with
  * no partition-discovery pass.
  *
  * Scale shape: the segment map is O(nBuckets · compactAfter) driver
  * state (strings — nothing at the production nBuckets ~ 4096); every
  * data-touching step is a distributed scan/write. Single-writer per
  * store root, the same contract the version-alternating fold had — a
  * shared multi-writer deployment would wrap folds in the repo's
  * [[StoreLock]].
  *
  * @param template   zero-row frame fixing the store's columns/types
  *                   (keys first, value columns after)
  * @param keyCols    the store's logical key (merge-on-read group key)
  * @param bucketCols the bucketing subset of `keyCols` — bucket by the
  *                   JOIN key the maintenance reads with (e.g. the seen
  *                   store keys (c, s) but buckets by c, so "postings for
  *                   this batch's customers" prunes to the customers'
  *                   buckets)
  * @param valueCol   Some(count column) for an additive counts store
  *                   (reads sum it per key across segments); None for a
  *                   disjoint-insert set store (reads union segments)
  */
final class BucketedStore(
    root: String,
    template: DataFrame,
    keyCols: Seq[String],
    bucketCols: Seq[String],
    nBuckets: Int,
    compactAfter: Int = 8,
    valueCol: Option[String] = None) {
  require(bucketCols.forall(keyCols.contains), "bucketCols must be key columns")
  require(valueCol.forall(template.columns.contains),
    "valueCol must be a template column")
  private val spark = template.sparkSession
  // bucket -> ordered segment dirs currently holding its rows
  // (driver-side, O(nBuckets · compactAfter))
  private val live = scala.collection.mutable.Map.empty[Int, Vector[String]]
  private var gen = 0

  /** The bucket id of a row — pure function of the bucket columns, so
    * reads recompute it instead of relying on partition discovery. */
  def bucketExpr: Column =
    pmod(xxhash64(bucketCols.map(col): _*), lit(nBuckets.toLong)).cast("int")

  /** Distinct bucket ids a frame's rows hash into (bounded driver
    * collect: at most nBuckets ints). Only needed by READERS pruning a
    * store scan to a probe set's buckets — folds never call it. */
  def bucketsOf(df: DataFrame): Set[Int] =
    df.select(bucketExpr.as("__bkt")).distinct()
      .collect().map(_.getInt(0)).toSet

  /** Driver-side twin of [[bucketExpr]] for a single LONG bucket column:
    * a feeder that already holds the delta rows on the driver (the
    * MemoryStream replay harness does, by construction) can compute the
    * touched-bucket set without paying a Spark job per micro-batch.
    * Must stay bit-equal to `pmod(xxhash64(col), nBuckets)` —
    * IvmBucketedSpec pins the equality on random longs. */
  def bucketOfLong(v: Long): Int = {
    require(bucketCols.size == 1,
      "bucketOfLong is the single-long-bucket-column twin of bucketExpr")
    val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(v, 42L)
    (((h % nBuckets) + nBuckets) % nBuckets).toInt
  }

  private def emptyWithBkt: DataFrame =
    template.withColumn("__bkt", lit(0).cast("int")).where(lit(false))

  /** Store reads pass explicit leaf-bucket dirs — at most nBuckets ·
    * compactAfter paths, each holding ONE file. Past 32 paths Spark
    * launches a DISTRIBUTED listing job per read
    * (`spark.sql.sources.parallelPartitionDiscovery.threshold`): a
    * per-micro-batch Spark job whose task overhead dwarfs the driver's
    * sequential stat of a bounded path list. Scoped raise around the
    * EAGER listing at `read.parquet()` time, restored immediately;
    * the JVM-global lock keeps concurrent compactions of independent
    * stores (foldPar) from racing the set/restore. */
  private def withDriverListing[A](body: => A): A =
    BucketedStore.listingLock.synchronized {
      val key = "spark.sql.sources.parallelPartitionDiscovery.threshold"
      val saved = spark.conf.get(key, "32")
      spark.conf.set(key, "1000000")
      try body finally spark.conf.set(key, saved)
    }

  /** Rows currently stored in the given buckets, `__bkt` column included
    * and segment merge applied (counts summed per key / set segments
    * unioned). One multi-path scan over the requested `__bkt=<b>`
    * subdirectories as EXPLICIT paths — the scan never even LISTS the
    * other buckets' directories, so a trickle read costs the touched
    * buckets' files, not an nBuckets-wide listing. The merge aggregation
    * (a shuffle) only runs when some requested bucket actually has
    * fan-in > 1 — right after a compaction reads stay shuffle-free. */
  def readBuckets(buckets: Set[Int]): DataFrame = {
    val held = live.toSeq.filter(e => buckets(e._1))
    val paths = held.flatMap { case (b, dirs) => dirs.map(d => s"$d/__bkt=$b") }
      .filter(p => new java.io.File(p).exists())
    if (paths.isEmpty) emptyWithBkt
    else {
      val raw = withDriverListing {
        spark.read.schema(template.schema).parquet(paths: _*)
      }.withColumn("__bkt", bucketExpr)
      valueCol match {
        case Some(v) if held.exists(_._2.size > 1) =>
          raw.groupBy((keyCols :+ "__bkt").map(col): _*)
            .agg(sum(col(v)).as(v))
            .select(template.columns.map(col) :+ col("__bkt"): _*)
        case _ => raw
      }
    }
  }

  /** The whole store (all live buckets), `__bkt` included. */
  def readAll(): DataFrame = readBuckets(live.keySet.toSet)

  /** Additive count fold: `delta` carries `keyCols` + `deltaCol`, one row
    * per key (the callers pre-aggregate). The stored value for a key is
    * the SUM of its segment rows — exactly the old + delta algebra of the
    * eager full_outer fold, deferred to read time — so the fold itself is
    * one append-a-segment write job. */
  def foldCounts(delta: DataFrame, deltaCol: String, countCol: String): Unit = {
    require(valueCol.contains(countCol),
      s"foldCounts($countCol) on a store declared with valueCol=$valueCol")
    appendSegment(delta.select(
      keyCols.map(col) :+ col(deltaCol).as(countCol): _*))
  }

  /** Set insert: `delta` carries `keyCols` only and must be disjoint from
    * the store (the caller's anti-join guarantees it — same contract the
    * unbucketed union fold had). One append-a-segment write job. */
  def foldSet(delta: DataFrame): Unit = {
    require(valueCol.isEmpty, "foldSet on a counts store")
    appendSegment(delta.select(keyCols.map(col): _*))
  }

  /** The one Spark job a fold costs: partition the delta by bucket and
    * write it as a new segment. Touched buckets are read back from the
    * written directory names (driver FS listing, no job); an empty delta
    * leaves no bucket dirs and the segment is discarded. The repartition
    * puts each bucket's rows in one task → one file per touched bucket
    * (without it every task writes a file per bucket it happens to hold). */
  private def appendSegment(delta: DataFrame): Unit = {
    val dir = s"$root/fold_$gen"
    gen += 1
    // label the fold job (guide §1.5) — thread-local, so it tags exactly
    // this fold even when foldPar runs two stores' folds concurrently
    spark.sparkContext.setJobDescription(s"ivm fold append: $root")
    try delta.withColumn("__bkt", bucketExpr)
      .repartition(col("__bkt"))
      .write.partitionBy("__bkt").mode("overwrite").parquet(dir)
    finally spark.sparkContext.setJobDescription(null)
    val touched = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("__bkt="))
      .map(_.getName.stripPrefix("__bkt=").toInt).toSet
    if (touched.isEmpty)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    else {
      touched.foreach(b => live(b) = live.getOrElse(b, Vector.empty) :+ dir)
      if (live.valuesIterator.map(_.size).max > compactAfter) compact()
    }
  }

  /** Rewrite every live bucket's merged view into one segment — bounds
    * the read fan-in (and the segment accumulation of append-only
    * folds). */
  def compact(): Unit = if (live.nonEmpty) {
    val before = live.values.flatten.toSet
    val all = readAll().drop("__bkt").withColumn("__bkt", bucketExpr)
      .repartition(col("__bkt"))
    val dir = s"$root/fold_$gen"
    gen += 1
    all.write.partitionBy("__bkt").mode("overwrite").parquet(dir)
    val held = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("__bkt="))
      .map(_.getName.stripPrefix("__bkt=").toInt).toSet
    live.clear()
    held.foreach(b => live(b) = Vector(dir))
    // superseded segments are dead weight
    (before - dir).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
  }

  /** Current bucket → segment-dir ownership (spec introspection: the
    * untouched-bucket gate asserts a 1-key fold appends a segment to
    * exactly its bucket and leaves every other bucket's segment list —
    * and thus its files — unchanged). */
  private[graft] def liveDirs: Map[Int, Vector[String]] = live.toMap
}

object BucketedStore {
  /** Serializes the scoped listing-threshold set/restore across stores
    * (concurrent foldPar compactions share one session conf). */
  private val listingLock = new Object
}
