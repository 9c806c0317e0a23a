package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SketchQueries
import graft.sources.Tables

/** The persisted sketch-rollup store (SketchQueries.sketchStore): the
  * sketch warehouse's lifecycle contracts.
  *
  *  - store-only plans: neither report may scan the events table
  *  - per-day idempotent commit: re-committing a present day is a no-op
  *    (the Theta union would absorb duplicate users, the exact n_events
  *    would double — so the guard is on the COUNT, the honest column)
  *  - committed days answer identically to a from-scratch rebuild that
  *    included them (partial-merge ≡ recompute)
  *  - content-stamp invalidation: a regenerated fixture rebuilds the
  *    store instead of serving stale partials
  */
class SketchStoreSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = GraftSession.local(4)

  // a private fixture COPY so commits/touches cannot disturb other specs
  // (the store is content-addressed on the fixture dir string + stamp)
  private lazy val fixDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_sketchspec").toFile
    dir.deleteOnExit()
    org.apache.commons.io.FileUtils.copyFileToDirectory(
      new java.io.File(s"$sfDir/events.parquet"), dir)
    dir.getAbsolutePath
  }

  test("rollup and window plans read the store only — no events scan") {
    Seq("op_sketch_rollup", "op_sketch_window").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("events.parquet"), s"$q scans events:\n$plan")
      assert(plan.contains("sketch_store_"), s"$q does not read the store:\n$plan")
    }
  }

  /** Synthetic day-31 batch: 40 events from 25 known users + 5 new ones. */
  private def day31(): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = (0 until 40).map { i =>
      org.apache.spark.sql.Row(
        1000000L + i, Timestamp.valueOf(f"2024-01-31 12:00:${i % 60}%02d"),
        (if (i < 35) i % 25 else 9000 + i).toLong, "click", 100.0 + i, "{}")
    }
    spark.createDataFrame(rows.asJava, Tables.load(spark, fixDir, "events").schema)
  }

  private def windowRows(): Map[String, (Long, Long)] =
    SketchQueries.sketchStore(spark, fixDir)
      .select(to_date(col("day")).as("sday"), col("n_events"), col("tsk"))
      .withColumn("day", explode(expr("sequence(sday, date_add(sday, 6))")))
      .groupBy(col("day"))
      .agg(sum(col("n_events")).as("n7"),
        expr("theta_sketch_estimate(theta_union_agg(tsk, 17))").as("mau7"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("n7"), col("mau7"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("commit folds a new day in; re-commit is a no-op; merge ≡ recompute") {
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(SketchQueries.sketchStorePath(spark, fixDir)))
    assert(SketchQueries.sketchStore(spark, fixDir).count() == 30)

    SketchQueries.sketchStoreCommit(spark, fixDir, day31())
    val store = SketchQueries.sketchStore(spark, fixDir)
    assert(store.count() == 31)

    // the trailing-7-day row for day 31 from MERGED sketches must equal
    // the recompute over raw events of days 25..30 plus the new batch
    val (n7, mau7) = windowRows()("2024-01-31")
    val window = Tables.load(spark, fixDir, "events")
      .filter(date_format(col("ts"), "yyyy-MM-dd") >= "2024-01-25")
      .select(col("user_id")).union(day31().select(col("user_id")))
    assert(mau7 == window.distinct().count(), "merged MAU != recompute")
    assert(n7 == window.count(), "merged n7 != recompute")

    // idempotence: committing the same day again changes nothing
    SketchQueries.sketchStoreCommit(spark, fixDir, day31())
    assert(SketchQueries.sketchStore(spark, fixDir).count() == 31)
    assert(windowRows()("2024-01-31") == ((n7, mau7)))
  }

  test("regenerated fixture invalidates the store (content stamp)") {
    // self-contained: make sure a non-fixture day-31 partial is present,
    // so a rebuild is observable as its disappearance
    SketchQueries.sketchStore(spark, fixDir)
    SketchQueries.sketchStoreCommit(spark, fixDir, day31())
    assert(SketchQueries.sketchStore(spark, fixDir).count() == 31)
    val f = new java.io.File(s"$fixDir/events.parquet")
    assert(f.setLastModified(f.lastModified() + 60000))
    // stamp mismatch ⇒ rebuild from the fixture: the committed day-31
    // partial (not part of the fixture) is gone
    assert(SketchQueries.sketchStore(spark, fixDir).count() == 30)
  }
}
