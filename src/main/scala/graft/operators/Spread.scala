package graft.operators

import org.apache.spark.sql.DataFrame

/** Guarded round-robin spread of a scan-narrow frame across the executor
  * slots (guide §2.6 — idle capacity).
  *
  * The sf fixture parquets are a single row group → ONE scan partition, so
  * a CPU-heavy per-row pass downstream (codec decode, n² cosine,
  * tokenize+hash explode) serializes on one core while the rest sit idle;
  * an explicit round-robin repartition to `defaultParallelism` fixes that.
  * But the fix must NOT fire when the scan is already wide: on a 100 TB
  * corpus the input is thousands of partitions and the exchange would
  * round-robin the full (id, text/embedding) projection — shuffle bytes
  * that scale with the DATA, not with the partition count. The guard reads
  * the frame's physical partitioning at plan time (a driver-side
  * operation, no job) and spreads only when the input is genuinely
  * narrower than the session's parallelism.
  */
object Spread {

  /** `df` repartitioned round-robin to `defaultParallelism` iff its
    * physical plan currently yields fewer partitions than that — a no-op
    * passthrough on inputs that are already core-wide. */
  def toCores(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
