package graft.tools
import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry}

/** Ad-hoc per-query timer: runMain graft.tools.QuickBench [conf=val ...] q1 q2 ...
  * Args containing '=' are set as Spark confs; the rest are query names.
  * Same session shape as Bench (local[32], noop sink, warm + min-of-3). */
object QuickBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (confs, names) = args.partition(_.contains("="))
    confs.foreach { c => val Array(k, v) = c.split("=", 2); spark.conf.set(k, v) }
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timeOne(name: String): Double = {
      val t0 = System.nanoTime()
      exec(SparkEntry.queries(name)(spark, sfDir))
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n => timeOne(n) } // warm
    val runs = (1 to 3).map(_ => names.map(n => n -> timeOne(n)).toMap)
    names.foreach { n =>
      println(f"[quickbench] $n min=${runs.map(_(n)).min}%.2f runs=${runs.map(r => f"${r(n)}%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
