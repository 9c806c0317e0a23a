package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the live-maintenance twins of the one-pass table reports:
  * `ss_profile_maintain` (ANALYZE maintained in GroupState theta sketches)
  * and `ss_corr_maintain` (the nine exact BigInt moment sums). The
  * value-level gate on the driver fixtures is the shared DuckDB oracle;
  * these pin the twin≡batch equality under different slicings, the
  * order-insensitivity of both folds, and the BigInt overflow headroom the
  * corr state exists for. */
class ProfileCorrTwinSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = GraftSession.local(4)

  private def withSlices[A](n: String)(body: => A): A = {
    val saved = spark.conf.getOption("spark.graft.ssjoin.slices")
    spark.conf.set("spark.graft.ssjoin.slices", n)
    try body
    finally saved match {
      case Some(v) => spark.conf.set("spark.graft.ssjoin.slices", v)
      case None => spark.conf.unset("spark.graft.ssjoin.slices")
    }
  }

  test("profile twin: drained sketch rollup equals the batch profile; slices never matter") {
    val batch = SparkEntry.queries("op_profile")(spark, sfDir).collect().toSeq
    Seq("1", "5").foreach { n =>
      val streamed = withSlices(n) {
        SparkEntry.queries("ss_profile_maintain")(spark, sfDir).collect().toSeq
      }
      assert(streamed == batch, s"ss_profile_maintain != op_profile at $n slices")
    }
  }

  test("corr twin: drained moment rollup reaches bit-identical corr_micro; slices never matter") {
    val batch = SparkEntry.queries("op_corr")(spark, sfDir).collect().toSeq
    Seq("1", "5").foreach { n =>
      val streamed = withSlices(n) {
        SparkEntry.queries("ss_corr_maintain")(spark, sfDir).collect().toSeq
      }
      assert(streamed == batch, s"ss_corr_maintain != op_corr at $n slices")
    }
  }

  test("both folds are feed-order-insensitive: reversed input, identical final state") {
    // batch-mode single-pass run of the folds on a crafted feed and its
    // reversal — commutative merges must land on identical snapshots
    val s = spark
    import s.implicits._
    val profRows = Seq(
      (0, 10L, 100L, "A", false, 5L),
      (0, 11L, 100L, "N", true, 2L),
      (0, 10L, 101L, "R", false, 9L))
    def runProf(rows: Seq[(Int, Long, Long, String, Boolean, Long)]) =
      graft.streaming.StatefulOps.profileMaintain(rows.toDS())
        .collect().map(r => (r.bucket, r.n, r.nulls, r.min_q, r.max_q, r.sum_q,
          r.sk_ok.toSeq, r.sk_pk.toSeq, r.sk_rf.toSeq)).toSeq
    assert(runProf(profRows) == runProf(profRows.reverse),
      "profile fold diverged under feed reversal")

    val corrRows = Seq((0, 1L, 7L, 3L), (0, 2L, 5L, 4L), (0, 4L, 6L, 1L))
    def runCorr(rows: Seq[(Int, Long, Long, Long)]) =
      graft.streaming.StatefulOps.corrMaintain(rows.toDS())
        .collect().map(r => (r.bucket, r.n, r.sx, r.sy, r.sz, r.sxx, r.syy,
          r.szz, r.sxy, r.sxz, r.syz)).toSeq
    assert(runCorr(corrRows) == runCorr(corrRows.reverse),
      "corr fold diverged under feed reversal")
  }

  test("corr state survives sums past Long.MaxValue (the reason it is BigInt)") {
    val s = spark
    import s.implicits._
    // two rows of y = 3e9 cents: syy = 2 * 9e18 = 1.8e19 > Long.MaxValue
    val big = 3000000000L
    val out = graft.streaming.StatefulOps.corrMaintain(
      Seq((0, 1L, big, 0L), (0, 2L, big, 0L)).toDS()).collect()
    assert(out.length == 1)
    assert(BigInt(out.head.syy) == BigInt(big) * big * 2,
      s"syy = ${out.head.syy}")
    assert(BigInt(out.head.syy) > BigInt(Long.MaxValue), "fixture must overflow a long")
  }
}
