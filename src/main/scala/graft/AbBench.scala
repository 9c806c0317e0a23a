package graft

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement tool: INTERLEAVED A/B of one session
  * conf over a query subset, inside one JVM — the only A/B shape that
  * survives this host's ±10% run-to-run drift (r15's lesson: same-window
  * or it didn't happen). Both values are warmed, then timed alternately
  * (A,B,A,B,...) min-of-N, so JIT state, page cache and host load hit
  * both sides equally.
  *
  * Usage: sbt "runMain graft.AbBench <confKey> <valA> <valB> <query>…"
  * The literal value `unset` clears the conf for that side.
  * Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench.
  */
object AbBench {
  def main(args: Array[String]): Unit = {
    val Array(key, va, vb) = args.take(3)
    val names = args.drop(3).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def setConf(v: String): Unit =
      if (v == "unset") spark.conf.unset(key) else spark.conf.set(key, v)
    def exec(n: String): Unit =
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    // warm both sides
    for (v <- Seq(va, vb); n <- names) {
      setConf(v)
      try exec(n) catch { case t: Throwable =>
        println(s"[ab] WARMUP FAILURE $n ($key=$v): $t"); throw t }
    }
    val best = mutable.Map.empty[(String, String), Double]
    for (_ <- 1 to 3; v <- Seq(va, vb); n <- names) {
      setConf(v)
      val t0 = System.nanoTime()
      exec(n)
      val sec = (System.nanoTime() - t0) / 1e9
      val k = (n, v)
      best(k) = math.min(best.getOrElse(k, Double.MaxValue), sec)
    }
    println(f"[ab] $key: A=$va B=$vb (min of 3, interleaved)")
    var ta = 0.0; var tb = 0.0
    names.foreach { n =>
      val a = best((n, va)); val b = best((n, vb))
      ta += a; tb += b
      println(f"[ab] $n%-28s A=$a%7.3f  B=$b%7.3f  B/A=${b / a}%5.2f")
    }
    println(f"[ab] TOTAL$ta%29.3f  B=$tb%7.3f  B/A=${tb / ta}%5.2f")
    spark.stop()
  }
}
