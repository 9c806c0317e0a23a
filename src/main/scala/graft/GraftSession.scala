package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession configuration for the graft engine.
  *
  * Every entry point (Verify, Bench, tests, streaming runtime) goes through
  * here so the engine behaves identically everywhere:
  *  - `spark.sql.shuffle.partitions` sized for local[32] (not the 200 default);
  *    on a real cluster this is overridden by AQE coalescing anyway.
  *  - AQE on: runtime shuffle-partition coalescing, skew-join splitting —
  *    the knobs that make the same plan survive a 100x scale-up.
  *  - `nanosAsLong`: the driver fixtures carry TIMESTAMP(NANOS) parquet
  *    columns (events.ts) which Spark does not natively read; we read them
  *    as long and convert at the source layer (see [[graft.sources.Tables]]).
  *  - UTC session timezone for oracle (DuckDB) parity.
  */
object GraftSession {

  /** Apply graft defaults onto an existing builder. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Runtime row-level filtering: when a shuffle join's creation side is
    // small and selective, inject a bloom filter into the application
    // side's scan — at 100 TB this is the difference between shuffling
    // the whole fact table and shuffling the ~matching fraction. The
    // size thresholds stay at Spark defaults (creation <= 10 MB,
    // application >= 10 GB scan) so it arms exactly where it pays;
    // PlanSpec forces the thresholds down to prove the injection fires.
    .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // Graft's SQL functions + the interval-join rewrite rule (the rule is
    // a no-op until spark.graft.intervalJoin.bucketWidth arms it). Only
    // takes effect for sessions built fresh through this builder; specs
    // attaching to an existing session use experimental.extraOptimizations.
    .config("spark.sql.extensions", "graft.GraftExtensions")
    // Fixture timestamps are written without isAdjustedToUTC; read them as
    // TIMESTAMP (LTZ) rather than TIMESTAMP_NTZ so the whole engine keeps a
    // single timestamp type. Under the UTC session timezone this is
    // value-identical to what DuckDB's naive read of the same parquet sees.
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    .config("spark.sql.parquet.filterPushdown", "true")
    .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
    .config("spark.ui.enabled", "false")

  /** Standalone local session (tests / ad-hoc). */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = configure(
      SparkSession.builder()
        .master(s"local[$cores]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions", math.max(cores, 4).toString)
        // saveAsTable (bucketed-join tests) must not litter the repo cwd
        .config("spark.sql.warehouse.dir",
          java.nio.file.Files.createTempDirectory("graft-warehouse").toString))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
