package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder

/** Small-file compaction, the recurring operational task of any long-lived
  * 100 TB table: streaming ingest leaves thousands of tiny files per day,
  * and the nightly compactor must rewrite them into target-sized files
  * WITHOUT destroying the layout that makes reads fast. The recipe under
  * test is the engine's standard shape —
  * `repartitionByRange(n, key).sortWithinPartitions(key)` over the
  * existing sort key — and the contract has three parts: fewer files,
  * identical content, and per-file key ranges still pairwise disjoint
  * (disjoint ranges are WHY min-max pruning works; a hash repartition
  * would keep the rows and silently destroy the skipping). */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4)

  test("compaction shrinks file count, keeps content, preserves disjoint key ranges") {
    val src = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "orders")
      .select(col("o_orderkey"),
        (col("o_custkey") % 65536).as("x"),
        least(lit(65535L), floor(col("o_totalprice") / 16).cast("long")).as("y"))
      .select(col("o_orderkey"), col("x"), col("y"))
      .withColumn("z", ZOrder.zval16(col("x"), col("y")))

    val fragmented = java.nio.file.Files.createTempDirectory("graft-frag").toString
    val compacted = java.nio.file.Files.createTempDirectory("graft-compact").toString
    // the "after a day of micro-batches" state: 64 tiny z-sorted files
    src.repartitionByRange(64, col("z")).sortWithinPartitions(col("z"))
      .write.mode("overwrite").parquet(fragmented)

    val frag = spark.read.parquet(fragmented)
    frag.repartitionByRange(8, col("z")).sortWithinPartitions(col("z"))
      .write.mode("overwrite").parquet(compacted)
    val comp = spark.read.parquet(compacted)

    def dataFiles(dir: String) =
      new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(dataFiles(fragmented) > 32, "fragmentation setup failed")
    assert(dataFiles(compacted) <= 8, s"compaction left ${dataFiles(compacted)} files")

    // identical content (multiset equality via sorted row dump)
    val a = frag.collect().map(_.toString).sorted.toSeq
    val b = comp.collect().map(_.toString).sorted.toSeq
    assert(a == b, "compaction changed the data")

    // per-file z ranges pairwise disjoint — the stats-pruning contract
    val ranges = comp.groupBy(input_file_name().as("f"))
      .agg(min(col("z")).as("lo"), max(col("z")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping compacted ranges: $hi1 > $lo2")
      case _ =>
    }
  }
}
