package graft.tools
import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry}

/** Scratch recall probe: Test/runMain graft.tools.PqProbe <sfDir> <shortlists...> */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = GraftSession.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def pairs(name: String): Set[(Long, Long)] =
      SparkEntry.queries(name)(spark, sfDir).select("qid", "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs("ann_brute_topk")
    // each arg: shortlist[:codes[:subDim]]
    args.drop(1).foreach { spec =>
      val p = spec.split(":")
      spark.conf.set("spark.graft.pq.shortlist", p(0))
      if (p.length > 1) spark.conf.set("spark.graft.pq.codes", p(1))
      if (p.length > 2) spark.conf.set("spark.graft.pq.subDim", p(2))
      val approx = pairs("ann_pq_topk")
      println(f"[pqprobe] $spec recall=${(brute & approx).size.toDouble / brute.size}%.3f")
    }
    spark.stop()
  }
}
