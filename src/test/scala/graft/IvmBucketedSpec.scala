package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BucketedStore

/** Gates for the bucketed IVM store fold ([[BucketedStore]]) — the
  * graduation of the maintenance family's last O(store)-per-batch term
  * (the version-alternating full rewrite in `ivmCooccurCounts` and
  * `ss_lm_maintain`):
  *
  *  1. BIT-IDENTITY with the legacy full fold — both conf paths of
  *     ss_lm_maintain / ss_cooccur_maintain drain to identical frames
  *     (the GraphIterate forced-path playbook: the scale path must prove
  *     itself against the reference path before it is the default).
  *  2. UNTOUCHED BUCKETS ARE NOT REWRITTEN — a 1-key fold creates a
  *     generation containing only the touched bucket; every other
  *     bucket's owning directory (write-once) is unchanged. This is the
  *     plan-level gate that per-batch cost tracks the delta's bucket
  *     footprint, not |store|.
  *  3. Fold algebra (counts add, sets insert), compaction equivalence +
  *     superseded-generation cleanup, and the trickle-cost bound (a
  *     1-key fold writes a small fraction of the store's bytes).
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
      // both fold JOIN SHAPES forced (wideFrac 0 → every fold full_outer;
      // wideFrac 2 → every fold broadcast left_outer ∪ anti) must agree
      // with the reference — the adaptive switch can never change content
      val allWide = withConf("spark.graft.ivm.bucketed" -> "true",
        "spark.graft.ivm.buckets" -> "8",
        "spark.graft.ivm.wideFrac" -> "0")(rowsOf(name))
      assert(allWide == full, s"$name: forced-wide fold must equal the full fold")
      val allTrickle = withConf("spark.graft.ivm.bucketed" -> "true",
        "spark.graft.ivm.buckets" -> "8",
        "spark.graft.ivm.wideFrac" -> "2")(rowsOf(name))
      assert(allTrickle == full, s"$name: forced-trickle fold must equal the full fold")
    }
  }

  test("wide and trickle fold shapes produce identical store content") {
    val s = spark
    import s.implicits._
    val deltas = Seq(
      (1L to 40L).map(k => (k, 2L)),  // spread: wide under default 0.5
      Seq((7L, 5L), (100L, 1L)),      // trickle: 1-2 buckets
      (20L to 60L).map(k => (k, k))   // overlap of old and new keys
    ).map(_.toDF("k", "dn"))
    def drain(wideFrac: String): Map[Long, Long] = withConf(
      "spark.graft.ivm.wideFrac" -> wideFrac) {
      val store = new BucketedStore(scratch() + "/w",
        Seq.empty[(Long, Long)].toDF("k", "n"), Seq("k"), Seq("k"), 8)
      deltas.foreach(d => store.foldCounts(d, "dn", "n"))
      store.readAll().drop("__bkt").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val wide = drain("0")
    val trickle = drain("2")
    val adaptive = drain("0.5")
    assert(wide == trickle, "forced-wide and forced-trickle folds must agree")
    assert(adaptive == wide, "the adaptive switch must not change content")
    assert(wide(7L) == 2L + 5L && wide(30L) == 2L + 30L && wide(55L) == 55L)
  }

  test("a 1-key fold touches exactly its bucket; every other bucket's generation is untouched") {
    val s = spark
    import s.implicits._
    val store = new BucketedStore(scratch() + "/counts",
      Seq.empty[(Long, Long)].toDF("k", "n"), Seq("k"), Seq("k"), 8)
    // seed: 64 keys spread over all 8 buckets
    store.foldCounts(
      (1L to 64L).map(k => (k, 1L)).toDF("k", "dn"), "dn", "n")
    val before = store.liveDirs
    assert(before.size == 8, "the spread seed must populate every bucket")

    // trickle: one key, one bucket
    store.foldCounts(Seq((7L, 5L)).toDF("k", "dn"), "dn", "n")
    val after = store.liveDirs
    val touched = after.filter { case (b, dir) => before(b) != dir }.keys.toSeq
    assert(touched.size == 1, s"one key must touch one bucket, got $touched")
    val newGen = after(touched.head)
    val parts = Option(new java.io.File(newGen).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("__bkt=")).map(_.getName).toSeq
    assert(parts == Seq(s"__bkt=${touched.head}"),
      s"the new generation must contain ONLY the touched bucket, got $parts")
    (before.keySet - touched.head).foreach { b =>
      assert(after(b) == before(b) && new java.io.File(before(b)).exists(),
        s"untouched bucket $b must keep its write-once generation")
    }
    // the trickle generation is a small fraction of the store's bytes —
    // the I/O claim itself (1 of 8 buckets + parquet footer overhead)
    val trickleBytes = dirSize(newGen)
    val storeBytes = after.values.toSet.map(dirSize).sum
    assert(trickleBytes * 2 < storeBytes,
      s"1-key fold wrote $trickleBytes of $storeBytes store bytes")
    // and the values folded correctly
    val got = store.readAll().drop("__bkt").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(7L) == 6L && got(8L) == 1L && got.size == 64)
  }

  test("set folds insert; compaction preserves content and deletes superseded generations") {
    val s = spark
    import s.implicits._
    val store = new BucketedStore(scratch() + "/seen",
      Seq.empty[(Long, Long)].toDF("c", "v"), Seq("c", "v"), Seq("c"), 4,
      compactAfter = 2)
    store.foldSet(Seq((1L, 10L), (2L, 20L)).toDF("c", "v"))
    store.foldSet(Seq((1L, 11L), (3L, 30L)).toDF("c", "v"))
    val preCompactDirs = store.liveDirs.values.toSet
    store.foldSet(Seq((4L, 40L)).toDF("c", "v")) // fan-in > 2 → compacts
    val postDirs = store.liveDirs.values.toSet
    assert(postDirs.size == 1, s"compaction must leave one generation, got $postDirs")
    preCompactDirs.foreach(d =>
      assert(!new java.io.File(d).exists(), s"superseded generation $d must be deleted"))
    val got = store.readAll().select("c", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 20L), (1L, 11L), (3L, 30L), (4L, 40L)))
    // bucket-pruned read: customer 1's bucket holds both of its rows
    val b1 = store.bucketsOf(Seq(Tuple1(1L)).toDF("c"))
    val pruned = store.readBuckets(b1).select("c", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Set((1L, 10L), (1L, 11L)).subsetOf(pruned))
  }
}
