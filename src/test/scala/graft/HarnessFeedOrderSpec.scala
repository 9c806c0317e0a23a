package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.HarnessFeed

/** `collectDriverSorted` must reproduce Spark's `orderBy` total order for
  * ALL strings — Spark compares UTF8String bytes (UTF-8 binary = code-point
  * order) while Java's `String.compareTo` compares UTF-16 code units, which
  * diverge on supplementary-plane text (surrogate units sort below
  * U+E000..U+FFFF although they encode code points >= U+10000). */
class HarnessFeedOrderSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4)

  test("driver sort matches Spark orderBy on supplementary-plane keys") {
    import spark.implicits._
    // ASCII, accented BMP, the U+E000-U+FFFF BMP tail, supplementary-plane
    // (surrogate-pair) code points, null — including a pair where UTF-16
    // and UTF-8 orders genuinely diverge (U+FB01 vs U+1F600)
    val keys = Seq("a", "zzz", "�", "x", "😀",
      "𐀀", "ﬁ", "é", "日本",
      "𪛖tail", "", "a😀", "a￿", null)
    val rows = for { k <- keys; i <- 0 until 3 } yield (k, i.toLong)
    val df = rows.toDF("k", "v")
    val sparkOrder = df.orderBy(col("k"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val driverOrder = HarnessFeed.collectDriverSorted(df, Seq("k", "v"))
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(driverOrder == sparkOrder,
      "driver sort diverged from Spark's UTF-8 binary string order")
  }
}
