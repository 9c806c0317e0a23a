package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BucketedStore

/** Gates for the bucketed IVM store ([[BucketedStore]]) — the LSM
  * segment-append graduation of the maintenance family's last
  * O(store)-per-batch term (the version-alternating full rewrite in
  * `ivmCooccurCounts` and `ss_lm_maintain`):
  *
  *  1. BIT-IDENTITY with the legacy full fold — both conf paths of
  *     ss_lm_maintain / ss_cooccur_maintain drain to identical frames
  *     (the GraphIterate forced-path playbook: the scale path must prove
  *     itself against the reference path before it is the default), at
  *     every compaction cadence (compactAfter 1 = eager merge after each
  *     fold, default 8, and never) and under any slicing.
  *  2. A FOLD WRITES ONLY ITS DELTA — a 1-key fold appends a segment
  *     containing only the touched bucket's rows; every other bucket's
  *     segment list (write-once dirs) is unchanged. This is the
  *     plan-level gate that per-batch cost tracks the delta, not |store|.
  *  3. Merge-on-read algebra (counts sum, sets union) equals the eager
  *     fold at any compaction cadence; compaction preserves content,
  *     deletes superseded segments, and caps per-bucket fan-in.
  */
class IvmBucketedSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = GraftSession.local(4)

  private def withConf[A](kv: (String, String)*)(body: => A): A = {
    val saved = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def rowsOf(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sfDir).collect().map(_.toString).sorted.toSeq

  private def scratch(): String =
    java.nio.file.Files.createTempDirectory("graftivmspec").toString

  private def dirSize(d: String): Long = {
    val f = new java.io.File(d)
    if (!f.exists()) 0L
    else if (f.isFile) f.length()
    else Option(f.listFiles()).getOrElse(Array.empty)
      .map(c => dirSize(c.getPath)).sum
  }

  test("bucketOfLong is the bit-equal driver twin of bucketExpr") {
    // the cooccur feeder computes each micro-batch's touched-bucket set
    // on the driver (no Spark job); a drift from the executor-side
    // bucketExpr would silently read the wrong buckets
    import spark.implicits._
    for (nB <- Seq(3, 16, 64)) {
      val store = new BucketedStore(scratch(),
        Seq.empty[(Long, Long)].toDF("c", "s"), Seq("c", "s"), Seq("c"), nB)
      val rng = new scala.util.Random(7)
      val vals = Seq.fill(200)(rng.nextLong()) ++
        Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue)
      val sparkSide = vals.toDF("c").select(col("c"), store.bucketExpr.as("b"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      vals.foreach { v =>
        assert(store.bucketOfLong(v) == sparkSide(v),
          s"bucketOfLong($v) diverged from bucketExpr at nBuckets=$nB")
      }
    }
  }

  test("bucketed ss_lm_maintain and ss_cooccur_maintain are bit-identical to the full fold") {
    for (name <- Seq("ss_lm_maintain", "ss_cooccur_maintain")) {
      val full = withConf("spark.graft.ivm.bucketed" -> "false")(rowsOf(name))
      val bucketed = withConf("spark.graft.ivm.bucketed" -> "true",
        "spark.graft.ivm.buckets" -> "8")(rowsOf(name))
      assert(bucketed == full, s"$name: bucketed fold must equal the full fold")
      // and slicing still cannot matter on the bucketed path
      val oneSlice = withConf("spark.graft.ivm.bucketed" -> "true",
        "spark.graft.ivm.buckets" -> "8",
        "spark.graft.ssjoin.slices" -> "1")(rowsOf(name))
      assert(oneSlice == full, s"$name: bucketed fold must be slice-invariant")
      // compaction cadence can never change content: compactAfter 1
      // compacts after every fold (eager merge — the closest shape to
      // the legacy fold), 100 never compacts (pure merge-on-read)
      val eager = withConf("spark.graft.ivm.bucketed" -> "true",
        "spark.graft.ivm.buckets" -> "8",
        "spark.graft.ivm.compactAfter" -> "1")(rowsOf(name))
      assert(eager == full, s"$name: eager-compaction fold must equal the full fold")
      val lazyMerge = withConf("spark.graft.ivm.bucketed" -> "true",
        "spark.graft.ivm.buckets" -> "8",
        "spark.graft.ivm.compactAfter" -> "100")(rowsOf(name))
      assert(lazyMerge == full, s"$name: never-compacted fold must equal the full fold")
    }
  }

  test("merge-on-read equals the eager fold at every compaction cadence") {
    val s = spark
    import s.implicits._
    val deltas = Seq(
      (1L to 40L).map(k => (k, 2L)),  // spread over every bucket
      Seq((7L, 5L), (100L, 1L)),      // trickle: 1-2 buckets
      (20L to 60L).map(k => (k, k))   // overlap of old and new keys
    ).map(_.toDF("k", "dn"))
    def drain(compactAfter: Int): Map[Long, Long] = {
      val store = new BucketedStore(scratch() + "/w",
        Seq.empty[(Long, Long)].toDF("k", "n"), Seq("k"), Seq("k"), 8,
        compactAfter = compactAfter, valueCol = Some("n"))
      deltas.foreach(d => store.foldCounts(d, "dn", "n"))
      store.readAll().drop("__bkt").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val eager = drain(1)    // compacts after every fold
    val lsm = drain(100)    // never compacts: pure merge-on-read
    val dflt = drain(8)
    assert(eager == lsm, "eager compaction and pure merge-on-read must agree")
    assert(dflt == eager, "the default cadence must not change content")
    assert(eager(7L) == 2L + 5L && eager(30L) == 2L + 30L && eager(55L) == 55L)
  }

  test("a 1-key fold writes exactly its bucket; every other bucket's segments are untouched") {
    val s = spark
    import s.implicits._
    val store = new BucketedStore(scratch() + "/counts",
      Seq.empty[(Long, Long)].toDF("k", "n"), Seq("k"), Seq("k"), 8,
      valueCol = Some("n"))
    // seed: 64 keys spread over all 8 buckets
    store.foldCounts(
      (1L to 64L).map(k => (k, 1L)).toDF("k", "dn"), "dn", "n")
    val before = store.liveDirs
    assert(before.size == 8, "the spread seed must populate every bucket")

    // trickle: one key, one bucket — the fold appends ONE segment there
    store.foldCounts(Seq((7L, 5L)).toDF("k", "dn"), "dn", "n")
    val after = store.liveDirs
    val touched = after.filter { case (b, segs) => before(b) != segs }.keys.toSeq
    assert(touched.size == 1, s"one key must touch one bucket, got $touched")
    val b = touched.head
    assert(after(b).size == before(b).size + 1 && after(b).startsWith(before(b)),
      "the touched bucket must gain exactly one appended segment")
    val newGen = after(b).last
    val parts = Option(new java.io.File(newGen).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("__bkt=")).map(_.getName).toSeq
    assert(parts == Seq(s"__bkt=$b"),
      s"the new segment must contain ONLY the touched bucket, got $parts")
    (before.keySet - b).foreach { ub =>
      assert(after(ub) == before(ub) &&
        before(ub).forall(d => new java.io.File(d).exists()),
        s"untouched bucket $ub must keep its write-once segments")
    }
    // the trickle segment is a small fraction of the store's bytes —
    // the I/O claim itself (1 key's rows + parquet footer overhead)
    val trickleBytes = dirSize(newGen)
    val storeBytes = after.values.flatten.toSet.toSeq.map(dirSize).sum
    assert(trickleBytes * 2 < storeBytes,
      s"1-key fold wrote $trickleBytes of $storeBytes store bytes")
    // and the merge-on-read values are the folded integers
    val got = store.readAll().drop("__bkt").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(7L) == 6L && got(8L) == 1L && got.size == 64)
  }

  test("set folds insert; compaction preserves content, caps fan-in, deletes superseded segments") {
    val s = spark
    import s.implicits._
    val store = new BucketedStore(scratch() + "/seen",
      Seq.empty[(Long, Long)].toDF("c", "v"), Seq("c", "v"), Seq("c"), 4,
      compactAfter = 2)
    store.foldSet(Seq((1L, 10L), (2L, 20L)).toDF("c", "v"))
    store.foldSet(Seq((1L, 11L), (3L, 30L)).toDF("c", "v"))
    val preCompactDirs = store.liveDirs.values.flatten.toSet
    // third segment in customer 1's bucket → fan-in > 2 → compacts
    store.foldSet(Seq((1L, 12L)).toDF("c", "v"))
    val postDirs = store.liveDirs.values.flatten.toSet
    assert(postDirs.size == 1, s"compaction must leave one segment, got $postDirs")
    assert(store.liveDirs.values.forall(_.size == 1),
      "compaction must cap every bucket's fan-in at 1")
    preCompactDirs.foreach(d =>
      assert(!new java.io.File(d).exists(), s"superseded segment $d must be deleted"))
    val got = store.readAll().select("c", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 20L), (1L, 11L), (3L, 30L), (1L, 12L)))
    // bucket-pruned read: customer 1's bucket holds all of its rows
    val b1 = store.bucketsOf(Seq(Tuple1(1L)).toDF("c"))
    val pruned = store.readBuckets(b1).select("c", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Set((1L, 10L), (1L, 11L), (1L, 12L)).subsetOf(pruned))
  }
}
