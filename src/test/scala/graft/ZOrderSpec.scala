package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder

/** Z-order layout: prove the interleaved sort key actually buys the
  * data-skipping it exists for. The measurable proxy (file-stat pruning is
  * engine-internal) is the per-file bounding AREA of the two dimensions:
  * min-max stats prune a 2-D box predicate exactly when files cover small
  * areas, and a single-column sort provably cannot shrink the non-sort
  * dimension's span. */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4)

  /** Per-file (xmin,xmax,ymin,ymax) after range-partitioning and sorting
    * the frame by `key` into `nFiles` parquet files — exactly the column
    * statistics a file-skipping reader consults. */
  private def fileStats(df: DataFrame, key: String, nFiles: Int)
      : Seq[(Long, Long, Long, Long)] = {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    df.repartitionByRange(nFiles, col(key)).sortWithinPartitions(col(key))
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("x")).as("x0"), max(col("x")).as("x1"),
        min(col("y")).as("y0"), max(col("y")).as("y1"))
      .collect().toSeq
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
  }

  /** Files a min-max-skipping reader must open for a band predicate
    * `lo <= dim <= hi` (dim: 0 = x, 1 = y). */
  private def touched(stats: Seq[(Long, Long, Long, Long)],
      dim: Int, lo: Long, hi: Long): Int =
    stats.count { case (x0, x1, y0, y1) =>
      if (dim == 0) x0 <= hi && x1 >= lo else y0 <= hi && y1 >= lo
    }

  test("z-ordered files prune BOTH dims' band predicates; a 1-D sort can't prune the other dim") {
    // Uniform 16-bit 2-D points (hash-scattered, deterministic seed) —
    // the domain the 16-bit interleave is specified for. For UNIFORM
    // data every layout covers the same total area, so the honest metric
    // is files TOUCHED by a narrow band predicate on each dim: an x-sort
    // makes y-banded reads open every file (each file spans all of y),
    // while a z-sort (16 files = the 4x4 quadrant grid) bounds both dims
    // per file and opens ~sqrt(nFiles) of them for either band.
    val pts = spark.range(1 << 15)
      .select(col("id"),
        pmod(hash(col("id")), lit(65536)).cast("long").as("x"),
        pmod(hash(col("id"), lit(1)), lit(65536)).cast("long").as("y"))
      .select(col("id"), col("x"), col("y"),
        ZOrder.zval16(col("x"), col("y")).as("z"))
      .cache()
    try {
      val nFiles = 16
      val xStats = fileStats(pts, "x", nFiles)
      val zStats = fileStats(pts, "z", nFiles)
      val band = 4096L // 1/16 of the domain, mid-space
      val lo = 30000L
      // the x-sorted layout answers x bands perfectly but must open ALL
      // files for a y band
      assert(touched(xStats, 1, lo, lo + band) == nFiles,
        s"1-D sort unexpectedly pruned the non-sort dim: $xStats")
      // the z-ordered layout prunes BOTH dims. Ideal 4x4 quadrant cells
      // would open ~4-8 files per band; repartitionByRange's sampled
      // quantile split points don't align exactly with cell boundaries,
      // so straggler rows widen some bounding boxes — the gate allows
      // that slop but requires real pruning on BOTH dims, which the 1-D
      // sort structurally cannot give on its non-sort dim.
      val zx = touched(zStats, 0, lo, lo + band)
      val zy = touched(zStats, 1, lo, lo + band)
      assert(zx <= nFiles * 3 / 4 && zy <= nFiles * 3 / 4,
        s"z-order should prune both dims: x-band=$zx y-band=$zy of $nFiles\n$zStats")
    } finally pts.unpersist()
  }

  test("zval16 is a bijective interleave on the 16-bit domain (corners + random)") {
    import spark.implicits._
    val cases = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L),
      (1L, 0L), (0L, 1L), (43690L, 21845L))
    val got = cases.toDF("x", "y")
      .select(ZOrder.zval16(col("x"), col("y")).as("z")).as[Long].collect()
    def ref(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1))).sum
    assert(got.toSeq == cases.map { case (x, y) => ref(x, y) })
    // corners: (0,0) -> 0, (max,max) -> 2^32-1
    assert(ref(65535L, 65535L) == (1L << 32) - 1)
  }
}
