package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `dd_bloom_prefilter` semantics: the bloom screen must be a SUPERSET of
  * the exact fingerprint matches (bloom filters cannot false-negative) and
  * tight enough to be worth running (bounded false-positive slice). */
class BloomPrefilterSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = GraftSession.local(4)

  private def fingerprints() = {
    graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"),
        md5(concat_ws(" ", array_sort(array_distinct(split(col("text"), " "))))).as("fp"))
  }

  test("no false negatives: every exact eval-fingerprint match is flagged") {
    val fps = fingerprints()
    val evalFps = fps.filter(col("source") === "src0").select(col("fp")).distinct()
    val truth = fps.filter(col("source") =!= "src0")
      .join(evalFps, Seq("fp"), "left_semi")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val got = SparkEntry.queries("dd_bloom_prefilter")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(truth.nonEmpty, "fixture must contain cross-source duplicates")
    val missed = truth.filterNot(id => got.getOrElse(id, 0L) == 1L)
    assert(missed.isEmpty, s"bloom false-negatived ${missed.size} true matches: $missed")
  }

  test("false-positive slice is bounded (the prefilter must be worth running)") {
    val fps = fingerprints()
    val evalFps = fps.filter(col("source") === "src0").select(col("fp")).distinct()
    val truth = fps.filter(col("source") =!= "src0")
      .join(evalFps, Seq("fp"), "left_semi")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val got = SparkEntry.queries("dd_bloom_prefilter")(spark, sfDir).collect()
    val flagged = got.filter(_.getLong(1) == 1L).map(_.getLong(0)).toSet
    val fp = flagged -- truth
    val nTrain = got.length
    // 800k bits for ~hundreds of eval items → FP rate is essentially 0;
    // allow 1% of the train side before calling the sizing broken.
    assert(fp.size <= math.max(1, nTrain / 100),
      s"${fp.size} false positives of $nTrain train docs — bloom sized wrong")
  }

  test("streaming screen (persisted artifact) drains to the batch prefilter row-for-row") {
    val batch = SparkEntry.queries("dd_bloom_prefilter")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val streamed = SparkEntry.queries("ss_bloom_screen")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(streamed == batch)
    assert(streamed.exists(_._2 == 1L), "fixture must flag at least one doc")
  }

  test("empty eval set flags nothing") {
    spark.conf.set("spark.graft.decontaminate.evalSource", "no_such_source")
    try {
      val got = SparkEntry.queries("dd_bloom_prefilter")(spark, sfDir).collect()
      assert(got.nonEmpty && got.forall(_.getLong(1) == 0L))
    } finally spark.conf.unset("spark.graft.decontaminate.evalSource")
  }
}
