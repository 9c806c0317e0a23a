package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopKWindowRewrite

/** A/B micro-benchmark for TopKWindowRewrite: the SAME naive
  * row_number-over-window top-N DataFrame, unarmed (Spark's own
  * InferWindowGroupLimit plan: map-side full sort + partial group limit +
  * exchange + reduce sort + WindowExec) vs armed (one ObjectHashAggregate
  * bounded heap + posexplode). Not driver-run; numbers go to BASELINE.md.
  *
  *   sbt "runMain graft.RewriteBench [rows] [groups] [n]"
  */
object RewriteBench {
  def main(args: Array[String]): Unit = {
    val numeric = args.filterNot(a => a == "wide" || a == "distinct")
    val rows = numeric.headOption.map(_.toLong).getOrElse(20000000L)
    val groups = numeric.lift(1).map(_.toLong).getOrElse(64L)
    val n = numeric.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // "topk_freq" mode A/Bs TopKFrequentRewrite: exact keyed count +
    // TakeOrderedAndProject vs the armed frequent-items sketch
    if (args.contains("topk_freq")) {
      def q(): DataFrame = spark.range(rows).select(
        coalesce((col("id") * 2654435761L % 5000000L), lit(0L)).as("item"))
        .groupBy(col("item")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("item")).limit(n)
      def time(): Double = {
        val t0 = System.nanoTime()
        q().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      def minOf3(): Double = { time(); Seq(time(), time(), time()).min }
      time()
      val exact = minOf3()
      spark.conf.set(graft.plans.TopKFrequentRewrite.Key, "freq")
      val sk = minOf3()
      spark.conf.unset(graft.plans.TopKFrequentRewrite.Key)
      println(f"rows=$rows n=$n mode=topk_freq (~5M distinct items)")
      println(f"exact count+TakeOrdered:  $exact%6.2f s")
      println(f"approx_top_k sketch:      $sk%6.2f s  (${exact / sk}%.2fx)")
      spark.stop()
      return
    }
    // "percentile" mode A/Bs ApproxPercentileRewrite: exact percentile
    // (per-group value-count map plan) vs the armed KLL sketch aggregate
    if (args.contains("percentile")) {
      def q(): DataFrame = spark.range(rows).select(
        (col("id") % groups).as("grp"),
        (col("id") * 2654435761L % 5000000L).cast("double").as("v"))
        .groupBy(col("grp")).agg(expr("percentile(v, array(0.5D, 0.99D))").as("p"))
      def time(): Double = {
        val t0 = System.nanoTime()
        q().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      def minOf3(): Double = { time(); Seq(time(), time(), time()).min }
      time()
      val exact = minOf3()
      spark.conf.set(graft.plans.ApproxPercentileRewrite.Key, "kll")
      val kll = minOf3()
      spark.conf.unset(graft.plans.ApproxPercentileRewrite.Key)
      println(f"rows=$rows groups=$groups mode=percentile")
      println(f"exact percentile:       $exact%6.2f s")
      println(f"kll sketch estimate:    $kll%6.2f s  (${exact / kll}%.2fx)")
      spark.stop()
      return
    }
    // "distinct" mode A/Bs ApproxDistinctRewrite instead: exact
    // count(DISTINCT) (per-group pre-aggregation plan) vs the armed Theta
    // sketch aggregate, same frame
    if (args.contains("distinct")) {
      def q(): DataFrame = spark.range(rows).select(
        (col("id") % groups).as("grp"),
        (col("id") * 2654435761L % 5000000L).as("user_id"))
        .groupBy(col("grp")).agg(countDistinct(col("user_id")).as("nd"))
      def time(): Double = {
        val t0 = System.nanoTime()
        q().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      def minOf3(): Double = { time(); Seq(time(), time(), time()).min }
      time()
      val exact = minOf3()
      spark.conf.set(graft.plans.ApproxDistinctRewrite.Key, "theta")
      val theta = minOf3()
      spark.conf.unset(graft.plans.ApproxDistinctRewrite.Key)
      println(f"rows=$rows groups=$groups mode=distinct")
      println(f"exact count(DISTINCT):  $exact%6.2f s")
      println(f"theta sketch estimate:  $theta%6.2f s  (${exact / theta}%.2fx)")
      spark.stop()
      return
    }
    // "wide" as a 4th arg adds 8 payload columns — the realistic shape
    // (rank carries the row, not just the key), where the window plan's
    // two full sorts move 5x the bytes but the heap only copies winners.
    // "rank"/"dense_rank" switch the window function (tie-aware buffer
    // path; scores are bucketed so boundary ties actually occur).
    val wide = args.contains("wide")
    val fn: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (args.contains("rank")) _ => rank()
      else if (args.contains("dense_rank")) _ => dense_rank()
      else _ => row_number()
    val tied = args.contains("rank") || args.contains("dense_rank")
    def query(): DataFrame = {
      val base0 = spark.range(rows).select(
        (col("id") % groups).as("grp"),
        // tie-prone key for the rank functions: ~1000 distinct scores
        (col("id") * 2654435761L % (if (tied) 1000L else 1000000007L)).as("score"),
        col("id").as("row_id"))
      val base = if (!wide) base0 else (0 until 8).foldLeft(base0) {
        (df, i) => df.withColumn(s"p$i", col("row_id") * (i + 3) % 997)
      }
      val ord = if (tied) Seq(col("score").desc) else Seq(col("score").desc, col("row_id"))
      val w = Window.partitionBy(col("grp")).orderBy(ord: _*)
      base.withColumn("rn", fn(col("score")).over(w)).filter(col("rn") <= n)
    }
    def time(): Double = {
      val t0 = System.nanoTime()
      query().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def minOf3(): Double = { time(); Seq(time(), time(), time()).min }

    time() // JVM warm-up
    val windowed = minOf3()
    spark.conf.set(TopKWindowRewrite.MaxKKey, "1000")
    val rewritten = minOf3()
    spark.conf.unset(TopKWindowRewrite.MaxKKey)
    val fnName = if (args.contains("rank")) "rank"
      else if (args.contains("dense_rank")) "dense_rank" else "row_number"
    println(f"rows=$rows groups=$groups n=$n wide=$wide fn=$fnName")
    println(f"window (InferWindowGroupLimit): $windowed%6.2f s")
    println(f"window_topk rewrite:            $rewritten%6.2f s  (${windowed / rewritten}%.2fx)")
    spark.stop()
  }
}
