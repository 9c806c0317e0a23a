package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source layer: the driver's deterministic parquet fixtures (TESTDATA.md).
  *
  * The reference engine has no storage layer at all — data arrives through a
  * pluggable receiver (`/root/reference/src/main/scala/com/yahoo/bullet/spark/DataProducer.scala:47-58`).
  * Our Spark-native equivalent is the DataSource V2 parquet reader: scans get
  * predicate pushdown, column pruning and vectorized decoding for free, which
  * is what makes the same query viable at 100 TB.
  *
  * `events.ts` is TIMESTAMP(NANOS) in parquet; Spark reads it as long (with
  * `spark.sql.legacy.parquet.nanosAsLong=true`) and we normalize to
  * TimestampType (microseconds, truncating) here so the rest of the engine
  * never sees the raw nanos. Integer division (`div`) is deliberate: ns epoch
  * values exceed 2^53 so a double-division would lose precision.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Defensive: entry points set this at build time; setting it again at
    // runtime is a no-op but protects ad-hoc sessions (it is a runtime conf).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val df = spark.read.parquet(path(sfDir, name))
    // Normalize events.ts to TimestampType (micros, LTZ) whatever the
    // fixture generation wrote: TIMESTAMP(NANOS) arrives as a raw long
    // (nanosAsLong).
    if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType) {
      // Unreachable when the confs above took effect before the read (NTZ
      // inference is off); kept as defense-in-depth for exotic session
      // setups. The NTZ->LTZ cast reinterprets wall-clock fields in the
      // SESSION timezone, so it is value-identical only under UTC — and
      // mutating the session timezone here would silently change every
      // other timezone-dependent expression in the session, so fail fast
      // instead and let the caller fix the session setup.
      require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
        "events.ts arrived as TIMESTAMP_NTZ in a non-UTC session; the NTZ->LTZ " +
          "normalization is only value-preserving under UTC. Build the session " +
          "through GraftSession.configure (which pins UTC) or set " +
          "spark.sql.session.timeZone=UTC before loading tables.")
      df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    } else df
  }

  /** Register every fixture table as a temp view (for spark.sql paths). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
