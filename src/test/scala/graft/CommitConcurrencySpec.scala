package graft

import java.sql.Timestamp
import java.util.concurrent.CyclicBarrier

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{DedupQueries, SketchQueries}
import graft.sources.Tables

/** Commit-path concurrency for the persisted stores (StoreLock): two
  * at-least-once schedulers committing the SAME day/batch concurrently
  * must serialize, so the read-check-then-append idempotence holds under
  * a race, not just sequentially. Every racer starts on a CyclicBarrier
  * so both threads are inside the commit call when the lock is contended
  * — without StoreLock these tests double-append nondeterministically
  * (the check-then-act window is the whole day-list read). */
class CommitConcurrencySpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = GraftSession.local(4)

  private def freshFixture(tables: String*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_commitrace").toFile
    dir.deleteOnExit()
    tables.foreach { t =>
      org.apache.commons.io.FileUtils.copyFileToDirectory(
        new java.io.File(s"$sfDir/$t.parquet"), dir)
    }
    dir.getAbsolutePath
  }

  /** Run `body` on n threads released together; rethrow the first failure. */
  private def race(n: Int)(body: => Unit): Unit = {
    val barrier = new CyclicBarrier(n)
    @volatile var failure: Option[Throwable] = None
    val threads = (1 to n).map { _ =>
      new Thread(() => {
        barrier.await()
        try body catch { case t: Throwable => failure = failure.orElse(Some(t)) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    failure.foreach(throw _)
  }

  private def day31(fixDir: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = (0 until 40).map { i =>
      org.apache.spark.sql.Row(
        1000000L + i, Timestamp.valueOf(f"2024-01-31 12:00:${i % 60}%02d"),
        (if (i < 35) i % 25 else 9000 + i).toLong, "click", 100.0 + i, "{}")
    }
    spark.createDataFrame(rows.asJava, Tables.load(spark, fixDir, "events").schema)
  }

  test("sketch store: two schedulers committing the same day append it once") {
    val fixDir = freshFixture("events")
    assert(SketchQueries.sketchStore(spark, fixDir).count() == 30)
    race(2) { SketchQueries.sketchStoreCommit(spark, fixDir, day31(fixDir)) }
    val store = SketchQueries.sketchStore(spark, fixDir)
    assert(store.count() == 31, "racing commits double-appended a day row")
    val d31 = store.filter(col("day") === "2024-01-31")
      .select(col("n_events")).collect()
    assert(d31.length == 1 && d31.head.getLong(0) == 40L,
      s"day-31 partial wrong after race: ${d31.toSeq}")
  }

  test("sketch store: racing two DIFFERENT days commits both exactly once") {
    val fixDir = freshFixture("events")
    assert(SketchQueries.sketchStore(spark, fixDir).count() == 30)
    val feb1 = day31(fixDir).withColumn("ts",
      col("ts") + expr("interval 1 day")).withColumn("event_id", col("event_id") + 100)
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
    batches.add(day31(fixDir)); batches.add(feb1)
    race(2) { SketchQueries.sketchStoreCommit(spark, fixDir, batches.poll()) }
    val store = SketchQueries.sketchStore(spark, fixDir)
    assert(store.count() == 32, "independent-day commits must not block each other out")
    assert(store.select(col("day")).distinct().count() == 32, "duplicate day rows")
  }

  test("near store: two schedulers committing the same batch append each doc once") {
    val fixDir = freshFixture("documents")
    DedupQueries.nearStore(spark, fixDir) // build the corpus store first
    race(2) { DedupQueries.nearStoreCommitNew(spark, fixDir) }
    val storePath = DedupQueries.nearStorePath(spark, fixDir)
    val sigs = spark.read.parquet(storePath + "/sigs")
    val total = sigs.count()
    val distinct = sigs.select(col("corpus_id")).distinct().count()
    assert(total == distinct,
      s"racing near-store commits duplicated sigs: $total rows, $distinct distinct docs")
    // the anti-join makes the commit idempotent per doc, so after the race
    // a re-screen classifies the whole batch as already-known: no `new`
    val verdicts = SparkEntry.queries("dd_incremental_near")(spark, fixDir)
      .groupBy(col("verdict")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(verdicts.getOrElse("new", 0L) == 0L &&
      verdicts.getOrElse("dup_in_batch", 0L) == 0L,
      s"post-race re-screen still finds uncommitted docs: $verdicts")
    assert(!new java.io.File(storePath + "/_staging_commit").exists(),
      "commit staging dir must be cleaned up")
  }

  test("lock exclusivity is real: a second channel is refused while the lock is held") {
    // the same probe StoreLock runs once per path at first acquisition —
    // asserted here explicitly so a filesystem whose advisory locks are
    // no-ops (the object-store seam BASELINE.md documents) fails loudly
    val dir = java.nio.file.Files.createTempDirectory("graft_lockprobe").toFile
    dir.deleteOnExit()
    val store = dir.getAbsolutePath + "/store"
    graft.operators.StoreLock.withLock(store) {
      val lf = java.nio.file.Paths.get(store + ".lock")
      assert(java.nio.file.Files.exists(lf), "lock file must be the store's SIBLING")
      val ch2 = java.nio.channels.FileChannel.open(lf,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val second =
          try Option(ch2.tryLock())
          catch { case _: java.nio.channels.OverlappingFileLockException => None }
        second.foreach(_.release())
        assert(second.isEmpty,
          "a second channel acquired the exclusive lock while it was held")
      } finally ch2.close()
    }
    // and the lock survives a store-directory rebuild (the round-12 hole:
    // the in-dir lock file was deleted with the store)
    graft.operators.StoreLock.withLock(store) {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(store))
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(store + ".lock")),
        "deleting the store directory must not delete the held lock file")
    }
  }
}
