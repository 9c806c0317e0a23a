package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Optimization-round evidence dumper (round 16): writes
  * `plans/r16/<query>_<suffix>.txt` with the `.explain("formatted")` output
  * for each named query (the judge checks plan claims against these files).
  *
  * Usage: sbt "runMain graft.R16Plans <suffix> <query> [<query>…]"
  * Env: SPARK_GRAFT_SF_DIR (default sf0.001 — plan SHAPE is SF-independent);
  *      SPARK_GRAFT_PLANS_DIR overrides the output directory (so the
  *      "before" dumps can be generated from a baseline checkout into the
  *      same evidence directory).
  */
object R16Plans {
  def main(args: Array[String]): Unit = {
    val suffix = args.head
    val names = args.tail
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r16")
    val spark = GraftSession.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(s"$outDir/${name}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
