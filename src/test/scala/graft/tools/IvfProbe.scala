package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Recall probe for the IVF scaling rule: measures ann_ivf_topk /
  * ann_ivf_bigk recall@10 vs ann_brute_topk for a grid of
  * (kClusters, nProbe) configs at a fixture scale.
  *
  * Test/runMain graft.tools.IvfProbe [sfDir] [k:np ...]
  */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val grid = args.drop(1).filter(_.contains(":")).map { a =>
      val kv = a.split(":"); (kv(0).toInt, kv(1).toInt)
    }.toSeq match {
      case Nil => Seq((10, 3), (16, 4), (32, 6), (45, 8), (64, 10))
      case g => g
    }
    val spark = GraftSession.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def pairs(name: String): Set[(Long, Long)] =
      SparkEntry.queries(name)(spark, sfDir).select("qid", "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs("ann_brute_topk")
    // auto mode: no conf pins — measure the ivfGeometry scaling rule
    if (args.contains("auto")) {
      for (q <- Seq("ann_ivf_topk", "ann_ivf_bigk")) {
        val t0 = System.nanoTime()
        val approx = pairs(q)
        val sec = (System.nanoTime() - t0) / 1e9
        val recall = (brute & approx).size.toDouble / math.max(1, brute.size)
        println(f"[ivfprobe] $sfDir $q AUTO recall@10=$recall%.3f time=$sec%.1fs")
      }
    } else for ((k, np) <- grid) {
      spark.conf.set("spark.graft.ivf.kClusters", k.toString)
      spark.conf.set("spark.graft.ivf.nProbe", np.toString)
      val t0 = System.nanoTime()
      val approx = pairs("ann_ivf_topk")
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = (brute & approx).size.toDouble / math.max(1, brute.size)
      println(f"[ivfprobe] $sfDir k=$k nProbe=$np recall@10=$recall%.3f scan=${np.toDouble / k}%.3f time=$sec%.1fs")
    }
    spark.stop()
  }
}
