package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Ad-hoc A/B timer for named queries — the surgical counterpart to the
  * full `graft.Bench` sweep: one warm-up pass then `reps` measured runs
  * per query (min reported), so a single-operator change can be measured
  * in seconds instead of re-running all 235 queries. Results quoted in
  * BASELINE.md where they matter; not driver-run.
  *
  * Test/runMain graft.tools.QueryTime [reps=N] [sf=DIR] [conf:k=v ...] name...
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val reps = args.collectFirst { case a if a.startsWith("reps=") => a.drop(5).toInt }.getOrElse(3)
    val sfDir = args.collectFirst { case a if a.startsWith("sf=") => a.drop(3) }
      .getOrElse("/root/testdata/sf0.1")
    val confs = args.filter(_.startsWith("conf:")).map { a =>
      val kv = a.drop(5).split("=", 2); (kv(0), kv(1))
    }
    val names = args.filterNot(a =>
      a.startsWith("reps=") || a.startsWith("sf=") || a.startsWith("conf:")).toSeq
    require(names.nonEmpty, "usage: QueryTime [reps=N] [sf=DIR] [conf:k=v ...] name...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    def exec(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir).write
        .format("noop").mode("overwrite").save()
    names.foreach { n =>
      exec(n) // warm-up: JIT + parquet footer caches
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        exec(n)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[qtime] $n%-28s min ${ts.min}%.2f s  runs ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
