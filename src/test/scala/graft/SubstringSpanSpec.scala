package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** dd_substring property test: plant verbatim shared runs inside
  * otherwise-random documents and assert every planted run is covered by
  * a reported span (recall), that spans never extend past what is
  * actually duplicated (precision at the token level), and that in-doc
  * repetition alone never produces a span (the flag is CROSS-doc). */
class SubstringSpanSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4)
  private val K = 5 // gram width pinned by the operator

  /** Build a corpus in the documents schema with `shared` planted into
    * docs a and b at the given token offsets. */
  private def corpus(rnd: scala.util.Random, shared: Seq[String],
      offA: Int, offB: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    def noise(n: Int, salt: String) = Seq.fill(n)(s"n$salt${rnd.nextInt(1000000)}")
    val a = noise(offA, "a") ++ shared ++ noise(8, "a")
    val b = noise(offB, "b") ++ shared ++ noise(5, "b")
    val others = (2L until 6L).map(i => (i, noise(20, s"o$i").mkString(" ")))
    ((0L, a.mkString(" ")) +: (1L, b.mkString(" ")) +: others)
      .map { case (id, text) => (id, text, "en", "src1", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def spans(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] = {
    // run the operator body against the frame by writing it to a scratch
    // dir the query can load as its `documents` table
    val dir = java.nio.file.Files.createTempDirectory("ddsub").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    SparkEntry.queries("dd_substring")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("planted shared runs are recovered exactly; in-doc repeats are not flagged") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 5).foreach { trial =>
      val len = 10 + rnd.nextInt(8) // >= 2K so the span survives the threshold
      val shared = (0 until len).map(i => s"sh$trial$i")
      val offA = rnd.nextInt(6)
      val offB = rnd.nextInt(6)
      val got = spans(corpus(rnd, shared, offA, offB))
      // recall: each planted run covered by one span on each host doc
      val spanA = got.filter(_._1 == 0L)
      val spanB = got.filter(_._1 == 1L)
      assert(spanA.size == 1 && spanB.size == 1,
        s"trial $trial: expected exactly one span per host, got $got")
      // precision: the span is exactly the planted token range
      assert(spanA.head == ((0L, offA.toLong, (offA + len - 1).toLong)),
        s"trial $trial: span A ${spanA.head} != planted [$offA, ${offA + len - 1}]")
      assert(spanB.head == ((1L, offB.toLong, (offB + len - 1).toLong)),
        s"trial $trial: span B ${spanB.head} != planted [$offB, ${offB + len - 1}]")
    }
  }

  test("a run repeated only WITHIN one doc produces no span") {
    import spark.implicits._
    val run = (0 until 12).map(i => s"rep$i")
    val text = (run ++ Seq("gapx") ++ run).mkString(" ")
    val df = Seq(
      (0L, text, "en", "src1", text.length.toLong),
      (1L, (0 until 30).map(i => s"z$i").mkString(" "), "en", "src2", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(spans(df).isEmpty, "in-doc repetition must not flag cross-doc spans")
  }
}
