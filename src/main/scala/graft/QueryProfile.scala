package graft

import scala.collection.mutable

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Optimization-round instrumentation (guide §1): per-JOB wall/task-time
  * breakdown for one query, so "N seconds" decomposes into "which jobs,
  * how many stages/tasks, how much scheduler overhead". Not part of the
  * driver contract — a measurement tool for OPTIMIZATION_r*.md evidence.
  *
  * Usage: sbt "runMain graft.QueryProfile <query> [<query>…]"
  * Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench.
  */
object QueryProfile {

  private final class JobLog extends SparkListener {
    case class Job(id: Int, desc: String, t0: Long,
        var t1: Long = 0L, var stages: Int = 0, var tasks: Int = 0,
        var taskTimeMs: Long = 0L)
    val jobs = mutable.LinkedHashMap[Int, Job]()
    private val stageToJob = mutable.HashMap[Int, Int]()
    override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
      val desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .getOrElse("")
      jobs(e.jobId) = Job(e.jobId, desc, e.time)
      e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
      jobs(e.jobId).stages = e.stageIds.size
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
      jobs.get(e.jobId).foreach(_.t1 = e.time)
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
      stageToJob.get(e.stageId).flatMap(jobs.get).foreach { j =>
        j.tasks += 1
        if (e.taskInfo != null) j.taskTimeMs += e.taskInfo.duration
      }
    }
    def clear(): Unit = synchronized { jobs.clear(); stageToJob.clear() }
    def report(): String = synchronized {
      val total = jobs.values.map(j => math.max(0L, j.t1 - j.t0)).sum
      val lines = jobs.values.toSeq.sortBy(j => -(j.t1 - j.t0)).take(40).map { j =>
        f"  job ${j.id}%4d ${(j.t1 - j.t0) / 1000.0}%7.2fs stages=${j.stages}%3d " +
          f"tasks=${j.tasks}%5d taskTime=${j.taskTimeMs / 1000.0}%8.2fs  ${j.desc.take(80)}"
      }
      (f"  jobs=${jobs.size} sumJobWall=${total / 1000.0}%.2fs" +: lines).mkString("\n")
    }
  }

  /** Aggregates StreamingQueryProgress durationMs across every trigger
    * of every stream started while profiling one query — decomposes the
    * `ss_*` drains' NON-job driver time (incremental planning, offset/
    * commit WAL, state commit) that the JobLog cannot see. */
  private final class TriggerLog
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    val totals = mutable.LinkedHashMap[String, Long]()
    var triggers = 0
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = synchronized {
      triggers += 1
      e.progress.durationMs.forEach((k, v) =>
        totals(k) = totals.getOrElse(k, 0L) + v)
    }
    def clear(): Unit = synchronized { totals.clear(); triggers = 0 }
    def report(): String = synchronized {
      if (triggers == 0) ""
      else s"  triggers=$triggers  " + totals.map { case (k, v) =>
        f"$k=${v / 1000.0}%.2fs" }.mkString(" ")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val log = new JobLog
    spark.sparkContext.addSparkListener(log)
    val trig = new TriggerLog
    spark.streams.addListener(trig)
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    args.foreach { name =>
      // warm-up (JIT + footer caches), unprofiled
      try exec(SparkEntry.queries(name)(spark, sfDir))
      catch { case t: Throwable => println(s"$name WARMUP FAILED: $t") }
      log.clear()
      trig.clear()
      val t0 = System.nanoTime()
      try exec(SparkEntry.queries(name)(spark, sfDir))
      catch { case t: Throwable => println(s"$name FAILED: $t") }
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async — give it a moment to drain before reading
      Thread.sleep(500)
      println(f"== $name wall=$wall%.2fs")
      val tr = trig.report()
      if (tr.nonEmpty) println(tr)
      println(log.report())
    }
    spark.stop()
  }
}
