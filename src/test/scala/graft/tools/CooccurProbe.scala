package graft.tools
import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry}

object CooccurProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = GraftSession.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(name: String, confs: (String,String)*): Double = {
      confs.foreach { case (k,v) => spark.conf.set(k,v) }
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        exec(SparkEntry.queries(name)(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      confs.foreach { case (k,_) => spark.conf.unset(k) }
      times.min
    }
    t("ss_cooccur_maintain") // warm
    println(f"[probe] par+parts8 (new dflt)  ${t("ss_cooccur_maintain")}%.2f")
    println(f"[probe] ser+parts8             ${t("ss_cooccur_maintain", "spark.graft.ivm.parfolds"->"false")}%.2f")
    println(f"[probe] par+parts4             ${t("ss_cooccur_maintain", "spark.graft.ivm.parts"->"4")}%.2f")
    println(f"[probe] par+parts16            ${t("ss_cooccur_maintain", "spark.graft.ivm.parts"->"16")}%.2f")
    println(f"[probe] ser+parts32            ${t("ss_cooccur_maintain", "spark.graft.ivm.parfolds"->"false", "spark.graft.ivm.parts"->"32")}%.2f")
    spark.stop()
  }
}
