package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scale-sanity harness: replicates the sf0.1 fixtures k-fold (ids shifted
  * so keys stay distinct) into /tmp and times flagship plans at 1x and kx.
  * A plan whose runtime grows ~linearly in k has no hidden quadratic or
  * driver-side bottleneck — the local proxy for the 100 TB question.
  * Not driver-run; results recorded in BASELINE.md. */
object ScaleCheck {

  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 8
    val base = "/root/testdata/sf0.1"
    val out = s"/tmp/graft_scale_${k}x"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // replicate with shifted ids (documents/embeddings get distinct ids so
    // dedup/ANN keys do not collapse; fact/dim tables keep their FK shape
    // by shifting both sides consistently)
    def replicate(name: String, idCols: Seq[String], shift: Long): Unit = {
      val df = Tables.load(spark, base, name)
      val copies = (0 until k).map { i =>
        val shifted = idCols.foldLeft(df) { (d, c) => d.withColumn(c, col(c) + lit(i * shift)) }
        // documents: salt every token with the copy index. A plain text
        // copy would make all k replicas exact near-dups of each other,
        // growing pair work k² — the salt keeps each copy's INTERNAL
        // duplicate structure bit-identical (token bijection) while
        // copies never cross-match, so k× data means k× true pair work.
        if (name == "documents")
          shifted.withColumn("text",
            concat_ws(" ", transform(split(col("text"), " "), t => concat(t, lit(s"~$i")))))
        else shifted
      }
      copies.reduce(_.union(_)).write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    replicate("lineitem", Seq("l_orderkey"), 100000000L)
    replicate("orders", Seq("o_orderkey", "o_custkey"), 100000000L)
    replicate("customer", Seq("c_custkey"), 100000000L)
    replicate("nation", Seq.empty, 0L)
    replicate("region", Seq.empty, 0L)
    replicate("supplier", Seq("s_suppkey"), 100000000L)
    replicate("part", Seq("p_partkey"), 100000000L)
    replicate("events", Seq("event_id", "user_id"), 100000000L)
    replicate("documents", Seq("doc_id"), 100000000L)
    replicate("embeddings", Seq("vec_id"), 100000000L)

    val names = Seq("b5_group_agg", "b1_filter_compound", "j_multiway_star",
      "b6_theta_distinct", "b8_freq_topk", "dd_minhash_lsh", "ann_lsh_topk",
      "tx_quality", "b13_window_tumbling", "op_sessionize",
      "dd_dup_clusters", "ann_ivf_topk", "samp_stratified", "tx_pack_shards",
      "tx_repetition", "dd_canonical_corpus", "tx_decontaminate",
      "tx_rarity", "tx_chunk", "samp_mixture", "tx_importance",
      "ann_filtered_topk", "srch_bm25", "dd_cross_dedup", "tx_corpus_stats",
      "j_full_outer", "op_pivot", "op_unpivot", "tx_classify",
      "fn_zscore", "fn_histogram", "dd_fuzzy_names",
      "dd_source_overlap", "tx_bigram_rarity", "emb_label_stats",
      "b7_kll_grouped")
    // dd_semdedup is excluded the same way dd_embed_cosine is: replicated
    // embeddings are bit-identical across copies, so k-fold data has k²
    // true cosine pairs — the linearity signal would measure the fixture,
    // not the plan.
    // srch_bm25 caveat: token salting means only copy 0 hits the fixed
    // query terms at kx, so hit DENSITY falls k-fold. The measured cost is
    // still representative — BM25's work is the per-token tf scan and the
    // corpus stats aggregate, both of which run in full over every salted
    // copy; only the top-k heap sees fewer distinct positive scores.

    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once
    names.foreach { n => time(n, base); time(n, out) }
    println(f"${"query"}%-22s ${"1x"}%8s ${s"${k}x"}%8s ratio (linear = $k)")
    names.foreach { n =>
      val t1 = math.min(time(n, base), time(n, base))
      val tk = math.min(time(n, out), time(n, out))
      println(f"$n%-22s $t1%8.2f $tk%8.2f ${tk / t1}%5.1f")
    }
    spark.stop()
  }
}
