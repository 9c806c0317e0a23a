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
}
