package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Cluster-size invariance — the determinism claim behind every
  * content-hash draw, sketch threshold, and integer-scaled reduction in
  * the engine, asserted rather than argued: the SAME rows must come back
  * when the scan is split into many more partitions (smaller
  * maxPartitionBytes → more input splits → different evaluation order
  * within and across tasks) and the shuffle fan-out changes (5 vs 32
  * reducers → different merge orders). A plan whose result depends on
  * partitioning (an RNG sample, a float row-sum, an arrival-order rank
  * without a total tie-break) fails here before it fails on a real
  * cluster whose size the author never tested. */
class DeterminismSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = GraftSession.local(4)

  // the partitioning-sensitive families: hash-draw sampling (weighted /
  // temperature / upsample / exact-N / group-cap heaps), hash dedup and
  // the store-backed incremental splitter, sketch-derived cut points,
  // exact decimal aggregation, and the integer-scaled centroid sums
  private val queries = Seq(
    "samp_weighted", "samp_temperature", "samp_upsample", "samp_exact_n",
    "samp_group_cap", "dd_exact", "dd_incremental", "tx_fingerprint",
    "fn_quantile_bin", "b5_group_agg", "emb_centroids", "fn_target_encode",
    // round-9 continuation: float-composite margins (bitext), md5-bucket
    // folds, order-free fingerprint sums, decimal moment sums, bloom
    // screening, sketch set algebra — each claims partitioning
    // invariance in its scaladoc, so it proves it here
    "emb_bitext_mine", "fn_feature_hash", "op_diff_partitions", "op_corr",
    "dd_bloom_prefilter", "b6_theta_setops", "op_join_estimate",
    "j_interval_overlap",
    // substring/classifier/rank batch: gram-hash span merge, trained
    // integer weights (train aggregate order-free), and the global rank
    // (whose KLL cut points and bucket offsets must not move with the
    // partitioning — rank is a pure function of the data)
    "dd_substring", "tx_train_classifier", "tx_train_apply",
    "op_global_rank",
    // closing batch: the composed funnel's staged hash draws, the
    // stride-schedule positions, kernel-generated embeddings, heap-ranked
    // hard negatives, and the bidirectional nearest join's tie rule
    "pipe_curate", "samp_interleave", "emb_generate",
    "srch_hard_negatives", "j_asof_nearest",
    // round-10: store-backed near-dup screening (store build + banded
    // candidates + sig verify must not move with partitioning), the
    // pair-graph-derived QA report, and the multi-frame codec round trip
    "dd_incremental_near", "dd_cluster_stats", "mm_frames_gif",
    // round-11: the persisted sketch-rollup store — daily Theta/KLL
    // partials and their merged weekly/trailing-window reports must not
    // move with the partitioning (sketch build and union are
    // partition-order-free by construction)
    "op_sketch_rollup", "op_sketch_window")

  private def canonical(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sfDir).collect().map(_.toString).toSeq.sorted

  test("results are invariant to scan split size and shuffle fan-out") {
    val defaults = Seq(
      "spark.sql.shuffle.partitions",
      "spark.sql.files.maxPartitionBytes").map(k => k -> spark.conf.get(k))
    val baseline = queries.map(n => n -> canonical(n)).toMap
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "5")
      spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
      queries.foreach { n =>
        assert(canonical(n) == baseline(n),
          s"$n changed its result under a different partitioning")
      }
    } finally defaults.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
