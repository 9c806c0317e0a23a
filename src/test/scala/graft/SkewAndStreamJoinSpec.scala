package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin
import graft.sources.Tables

/** Skew-salting correctness + stream-stream join with watermarks (§2.C). */
class SkewAndStreamJoinSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = GraftSession.local(4)

  test("salted join equals plain join (skewed fact side)") {
    // synthesize skew: 80% of rows get one hot key
    val fact = Tables.load(spark, sfDir, "events")
      .withColumn("k", when(col("event_id") % 5 =!= 0, lit(1L)).otherwise(col("user_id")))
    val dim = Tables.load(spark, sfDir, "events")
      .select(col("user_id").as("k")).distinct()
      .withColumn("dim_tag", concat(lit("u"), col("k")))
    val plain = fact.join(dim, Seq("k")).agg(
      count(lit(1)), sum(col("value").cast("decimal(18,2)"))).head()
    val salted = SkewJoin.saltedJoin(fact, dim, "k", 8).agg(
      count(lit(1)), sum(col("value").cast("decimal(18,2)"))).head()
    assert(salted == plain)
  }

  test("salted count equals plain count per key") {
    val fact = Tables.load(spark, sfDir, "events")
      .withColumn("k", when(col("event_id") % 10 =!= 0, lit(1L)).otherwise(col("user_id")))
    val plain = fact.groupBy("k").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val salted = SkewJoin.saltedCount(fact, "k", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(salted == plain)
  }

  test("stream-stream inner join with watermarks (§2.C)") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val clicks = MemoryStream[(Timestamp, Long)]
    val views = MemoryStream[(Timestamp, Long)]
    val c = clicks.toDF().toDF("cts", "cuser").withWatermark("cts", "10 minutes")
    val v = views.toDF().toDF("vts", "vuser").withWatermark("vts", "10 minutes")
    // view within 5 minutes before the click, same user
    val joined = c.join(v,
      col("cuser") === col("vuser") &&
        col("vts") >= col("cts") - expr("INTERVAL 5 MINUTES") &&
        col("vts") <= col("cts"))
    val q = joined.writeStream.format("memory").queryName("ssj").outputMode("append").start()
    try {
      views.addData((ts(1), 1L), (ts(2), 2L), (ts(20), 1L))
      clicks.addData((ts(4), 1L), (ts(9), 2L))
      q.processAllAvailable()
      val rows = spark.table("ssj").select("cuser", "cts", "vts")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
      // user 1: view 10:01 within [09:59,10:04] of click 10:04 → match
      // user 2: view 10:02 NOT within [10:04,10:09] of click 10:09 → no match
      assert(rows == Set((1L, ts(4), ts(1))), s"got $rows")
    } finally q.stop()
  }

  test("bucketed tables join co-located: the join itself needs zero exchanges (§2.C)") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val orders = Tables.load(spark, sfDir, "orders")
    val lineitem = Tables.load(spark, sfDir, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // force the SMJ path: a broadcast join would hide the bucketing story
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
      lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
      val j = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      j.write.format("noop").mode("overwrite").save()
      val plan = (j.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).toString
      assert(plan.contains("SortMergeJoin"), plan)
      // the ONLY shuffle is the post-join groupBy on o_orderpriority;
      // both join inputs read pre-partitioned bucket files
      assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
      val expect = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val got = j.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == expect)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
