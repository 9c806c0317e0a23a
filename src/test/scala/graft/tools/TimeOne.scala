package graft.tools
import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry}

/** Scratch timer: Test/runMain graft.tools.TimeOne <query> [sfDir] */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 3).foreach(i => println(f"$name run$i: ${once()}%.2f s"))
    spark.stop()
  }
}
