package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.BucketedStore

/** Measures the bucketed IVM fold's claim directly: with a large counts
  * store already built, folding a TRICKLE delta (100 keys) must cost
  * ~(touched buckets / nBuckets) of the store, where the legacy
  * version-alternating fold pays a full store read + rewrite regardless
  * of delta size. Results recorded in BASELINE.md.
  *
  * Test/runMain graft.tools.IvmTrickleBench [storeRows] [nBuckets]
  */
object IvmTrickleBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000000)
    val nB = if (args.length > 1) args(1).toInt else 64
    val spark = GraftSession.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graftivmbench").toString

    def dirSize(d: String): Long = {
      val f = new java.io.File(d)
      if (!f.exists()) 0L
      else if (f.isFile) f.length()
      else Option(f.listFiles()).getOrElse(Array.empty)
        .map(c => dirSize(c.getPath)).sum
    }
    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val seed = spark.range(n).select(col("id").as("k"), lit(1L).as("dn"))
    def trickle(i: Int) = spark.range(100)
      .select((col("id") * 37 + i).as("k"), lit(1L).as("dn"))

    // bucketed store: seed, then time trickle folds
    val store = new BucketedStore(s"$root/bucketed",
      Seq.empty[(Long, Long)].toDF("k", "n"), Seq("k"), Seq("k"), nB,
      valueCol = Some("n"))
    store.foldCounts(seed, "dn", "n")
    val bucketedSec = (1 to 3).map(i => time(store.foldCounts(trickle(i), "dn", "n"))._2)

    // legacy full fold on the same data: version-alternating full rewrite
    seed.select(col("k"), col("dn").as("n"))
      .write.mode("overwrite").parquet(s"$root/full_v0")
    var v = 0
    def fullFold(i: Int): Unit = {
      spark.read.parquet(s"$root/full_v$v")
        .join(trickle(i), Seq("k"), "full_outer")
        .select(col("k"),
          (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"))
        .write.mode("overwrite").parquet(s"$root/full_v${1 - v}")
      v = 1 - v
    }
    val fullSec = (1 to 3).map(i => time(fullFold(i))._2)

    val storeBytes = dirSize(s"$root/bucketed")
    println(f"[ivmbench] store rows=$n buckets=$nB storeBytes=$storeBytes")
    println(f"[ivmbench] trickle(100 keys) bucketed: ${bucketedSec.map(s => f"$s%.2f").mkString(" ")} s (min ${bucketedSec.min}%.2f)")
    println(f"[ivmbench] trickle(100 keys) full:     ${fullSec.map(s => f"$s%.2f").mkString(" ")} s (min ${fullSec.min}%.2f)")
    println(f"[ivmbench] speedup ${fullSec.min / bucketedSec.min}%.1fx")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    spark.stop()
  }
}
