package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bpe, IndexStore}
import graft.queries.TextQueries

/** The learned-subword tokenizer (operators.Bpe + the tx_bpe_* queries):
  * the hand-computable classic fixture pins the merge order, inference
  * pins the lowest-rank-first algorithm, and the corpus-level contracts
  * (lossless round-trip, partitioning invariance, artifact round-trip)
  * are held exactly — tokenization is a pure function of
  * (corpus, confs). */
class BpeSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = GraftSession.local(4)

  test("the classic fixture learns es, est, est</w>, lo — in that order") {
    // Sennrich et al.'s worked example: pair counts weighted by word
    // frequency, ties broken lexicographically
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.train(words, 4)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("est", Bpe.EndMark), ("l", "o")))
  }

  test("inference merges the lowest-rank pair first; decode inverts encode") {
    val ranks = Seq(("e", "s"), ("es", "t"), ("est", Bpe.EndMark), ("l", "o"))
      .zipWithIndex.toMap
    assert(Bpe.encode("lowest", ranks).toSeq == Seq("lo", "w", "est" + Bpe.EndMark))
    assert(Bpe.decode(Bpe.encode("lowest", ranks).toSeq) == "lowest")
    // unseen word: falls back to chars + sentinel, still lossless
    assert(Bpe.decode(Bpe.encode("zzq", ranks).toSeq) == "zzq")
    assert(Bpe.encode("", ranks).toSeq == Seq(Bpe.EndMark))
  }

  test("training stops when no pair repeats; merges are unique") {
    val merges = Bpe.train(Seq(("ab", 1L), ("cd", 1L)), 10)
    assert(merges.isEmpty, "singleton pairs must not be merged")
    val corpus = TextQueries.bpeMerges(spark, sfDir)
    assert(corpus.nonEmpty && corpus.distinct.size == corpus.size)
  }

  test("corpus round-trip is lossless for every document; tokenization is partition-invariant") {
    val merges = TextQueries.bpeMerges(spark, sfDir)
    val tokd = TextQueries.bpeTokenized(spark, sfDir, merges)
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
    val bad = tokd.join(docs, Seq("doc_id"))
      .filter(expr("rtrim(replace(replace(tok_stream, ' ', ''), '</w>', ' '))")
        =!= col("text"))
    assert(bad.count() == 0, "every document must reconstruct from its token stream")
    // the registered query is deterministic under physical layout
    val a = SparkEntry.queries("tx_bpe_apply")(spark, sfDir)
      .collect().map(_.toString).toSeq
    val shuffledConf = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    val b = try SparkEntry.queries("tx_bpe_apply")(spark, sfDir)
        .collect().map(_.toString).toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", shuffledConf)
    assert(a == b, "tokenization must not depend on partitioning")
  }

  test("merge artifact round-trips bit-exactly through IndexStore") {
    val merges = TextQueries.bpeMerges(spark, sfDir)
    IndexStore.saveMerges(spark, "/tmp/graft_index_spec/bpe", merges)
    assert(IndexStore.loadMerges(spark, "/tmp/graft_index_spec/bpe") == merges)
  }
}
