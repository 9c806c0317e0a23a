package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.topk_min

/** The bounded-heap top-k aggregate must reproduce the window-rank
  * contract exactly: `topk_min(struct(-score, id), k)` exploded in order
  * == `row_number().over(partitionBy(g).orderBy(score desc, id))` rows
  * with rank <= k. The forced-path parity here is what lets the ANN
  * family drop its per-probe window sorts without an oracle (the driver
  * CORRECTNESS gate then re-proves the exact queries end-to-end).
  */
class TopKRankSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = GraftSession.local(4)

  /** Deterministic pseudo-random scored candidates: ~40 groups of varying
    * size (some smaller than k), duplicate scores within groups to
    * exercise the id tiebreak, spread over 7 partitions so partial heaps
    * must serialize, shuffle, and merge. */
  private def scored(n: Int) = {
    spark.range(n).repartition(7)
      .select(
        (col("id") % 40).as("qid"),
        col("id").as("vec_id"),
        // pmod collisions make duplicate scores within a group
        (pmod(col("id") * 2654435761L, lit(97)) / lit(10.0)).as("cos"))
  }

  test("topk_min(struct(-cos, id)) == row_number window rank, all group sizes") {
    for (k <- Seq(1, 3, 10, 100)) {
      val df = scored(5000)
      val viaAgg = df.groupBy(col("qid"))
        .agg(topk_min(struct((-col("cos")).as("nc"), col("vec_id").as("vec_id")), k).as("tk"))
        .select(col("qid"), posexplode(col("tk")).as(Seq("pos", "st")))
        .select(col("qid"), (col("pos") + 1).as("rank"), col("st.vec_id").as("vec_id"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      val viaWindow = df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("qid"), col("rank"), col("vec_id"))
      assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty,
        s"k=$k: bounded-heap rank diverged from the window rank")
    }
  }

  test("groups smaller than k emit their full membership, ranked") {
    val df = scored(60) // 40 groups of 1-2 rows, k = 10
    val out = df.groupBy(col("qid"))
      .agg(topk_min(struct((-col("cos")).as("nc"), col("vec_id").as("vec_id")), 10).as("tk"))
      .select(col("qid"), explode(col("tk")).as("st"))
    assert(out.count() == 60)
  }

  test("null ordering keys are skipped, not ranked") {
    val df = scored(200).withColumn("cos",
      when(col("vec_id") % 3 === 0, lit(null)).otherwise(col("cos")))
    // null cos -> struct field null -> whole struct still non-null, so the
    // caller contract is to null the STRUCT when the key is null
    val out = df.groupBy(col("qid"))
      .agg(topk_min(
        when(col("cos").isNotNull,
          struct((-col("cos")).as("nc"), col("vec_id").as("vec_id"))), 5).as("tk"))
      .select(explode(col("tk")).as("st"))
      .select(col("st.vec_id").as("vec_id"))
    assert(out.filter(col("vec_id") % 3 === 0).count() == 0)
  }

  test("the rank aggregate is partial+final (no candidate-set shuffle)") {
    val df = scored(5000)
    val agg = df.groupBy(col("qid"))
      .agg(topk_min(struct((-col("cos")).as("nc"), col("vec_id").as("vec_id")), 10).as("tk"))
    agg.write.format("noop").mode("overwrite").save()
    val p = agg.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), s"topk must run as an object aggregate:\n$p")
    assert(p.contains("partial_topk_min"), s"topk must combine map-side:\n$p")
    assert(!p.contains("Window"), s"no window may appear:\n$p")
  }
}
