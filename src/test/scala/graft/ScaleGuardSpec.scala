package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QuadraticGuard

/** The quadratic exact baselines must refuse oversized inputs and point at
  * their scale-safe twins, with a conf opt-in to run anyway. */
class ScaleGuardSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = GraftSession.local(4)

  private def withConf(kvs: (String, String)*)(body: => Unit): Unit = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("guard passes small inputs through untouched") {
    val df = spark.range(10).toDF("id")
    assert(QuadraticGuard.check(df, "op", "alt").count() == 10)
  }

  test("guard refuses oversized input and names the alternative") {
    val df = spark.range(QuadraticGuard.DefaultMaxRows + 1).toDF("id")
    val e = intercept[IllegalStateException](QuadraticGuard.check(df, "my_op", "my_alt"))
    assert(e.getMessage.contains("my_op"))
    assert(e.getMessage.contains("my_alt"))
    assert(e.getMessage.contains(QuadraticGuard.OptInKey))
  }

  test("opt-in conf bypasses the guard without counting") {
    val df = spark.range(QuadraticGuard.DefaultMaxRows + 1).toDF("id")
    withConf(QuadraticGuard.OptInKey -> "true") {
      assert(QuadraticGuard.check(df, "op", "alt") eq df)
    }
  }

  test("threshold conf is honored") {
    val df = spark.range(100).toDF("id")
    withConf(QuadraticGuard.MaxRowsKey -> "99") {
      intercept[IllegalStateException](QuadraticGuard.check(df, "op", "alt"))
    }
    withConf(QuadraticGuard.MaxRowsKey -> "100") {
      QuadraticGuard.check(df, "op", "alt")
    }
  }

  test("dd_ngram_jaccard refuses above the threshold, runs with opt-in") {
    // 500 fixture docs: a threshold of 10 triggers the guard on the real query
    withConf(QuadraticGuard.MaxRowsKey -> "10") {
      val e = intercept[IllegalStateException](
        SparkEntry.queries("dd_ngram_jaccard")(spark, sfDir))
      assert(e.getMessage.contains("dd_minhash_lsh"), e.getMessage)
      withConf(QuadraticGuard.OptInKey -> "true") {
        assert(SparkEntry.queries("dd_ngram_jaccard")(spark, sfDir).count() > 0)
      }
    }
  }

  test("dd_embed_cosine refuses above the threshold, runs with opt-in") {
    withConf(QuadraticGuard.MaxRowsKey -> "10") {
      val e = intercept[IllegalStateException](
        SparkEntry.queries("dd_embed_cosine")(spark, sfDir))
      assert(e.getMessage.contains("ann_lsh_topk"), e.getMessage)
      withConf(QuadraticGuard.OptInKey -> "true") {
        assert(SparkEntry.queries("dd_embed_cosine")(spark, sfDir).count() > 0)
      }
    }
  }

  test("fixture-scale runs stay under the default threshold (oracle unchanged)") {
    assert(SparkEntry.queries("dd_ngram_jaccard")(spark, sfDir).count() > 0)
    assert(SparkEntry.queries("dd_embed_cosine")(spark, sfDir).count() > 0)
  }

  // ---- sampling/packing parallelism knobs (the round-4 100×-funnels) ----

  test("stratified sampling rows are invariant to the salt-bucket knob") {
    import org.apache.spark.sql.functions.col
    def rows(salts: String) = withSaltRows(salts)
    def withSaltRows(salts: String) = withConfRows("spark.graft.stratifiedSaltBuckets" -> salts)
    def withConfRows(kv: (String, String)) = {
      var out: Seq[(Long, String)] = null
      withConf(kv) {
        out = SparkEntry.queries("samp_stratified")(spark, sfDir)
          .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      }
      out
    }
    val one = rows("1") // degenerate: exactly the single-window semantics
    val k64 = rows("64")
    val k7 = rows("7")
    assert(one.nonEmpty)
    assert(k64 == one, "salted two-phase selection changed the sample")
    assert(k7 == one)
  }

  test("stratified phase-1 window partitions by (lang, salt), not lang alone") {
    val plan = SparkEntry.queries("samp_stratified")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("salt"), s"no salted window in plan:\n$plan")
  }

  test("pack-shard bucket width derives from volume and scales with the knob") {
    import graft.queries.SamplingQueries.packBucketChars
    // fixture default: small corpus → width 1 (16 buckets — oracle parity)
    assert(packBucketChars(spark, () => 10000L) == 1)
    // growth: each ×16 over the per-bucket cap adds one hex char
    withConf("spark.graft.packMaxRowsPerBucket" -> "1000") {
      assert(packBucketChars(spark, () => 10000L) == 1)
      assert(packBucketChars(spark, () => 100000L) == 2)
      assert(packBucketChars(spark, () => 16L * 16 * 16 * 1000 + 1) == 4)
    }
    // pinned width wins and skips the count entirely
    withConf("spark.graft.packBucketChars" -> "3") {
      assert(packBucketChars(spark, () => sys.error("must not count")) == 3)
    }
  }

  test("pack shards with a wider bucket still packs to the 4096 budget") {
    import org.apache.spark.sql.functions._
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    withConf("spark.graft.packBucketChars" -> "2") {
      val out = SparkEntry.queries("tx_pack_shards")(spark, sfDir).cache()
      try {
        assert(out.count() == nDocs, "every doc must land in exactly one shard")
        assert(out.select(countDistinct(col("bucket"))).head().getLong(0) > 16,
          "2-char prefix must open more than 16 buckets")
        // start-offset contract per bucket: shard ids begin at 0 and the
        // last shard id is exactly floor(lastStart / 4096), where
        // lastStart = bucketTokens - lastDocTokens — i.e. shards stay
        // dense under the wider bucketing, no gaps or runaway ids
        val perBucket = out.groupBy(col("bucket")).agg(
          min(col("shard")).as("s0"), max(col("shard")).as("sMax"),
          sum(col("tokens")).as("t"), max(col("tokens")).as("tMaxDoc"))
        assert(perBucket.filter(col("s0") =!= 0).count() == 0)
        assert(perBucket.filter(col("sMax") > col("t") / 4096).count() == 0)
      } finally out.unpersist()
    }
  }
}
