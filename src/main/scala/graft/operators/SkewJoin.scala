package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting — the manual fallback for joins whose
  * skew AQE cannot fix (e.g. a single hot key holding >> one partition's
  * worth of rows on BOTH sides, where AQE's skew-join split only handles
  * the probe side).
  *
  * Shape: the skewed (large) side gets a random-but-deterministic salt in
  * [0, n); the small side is replicated n times with every salt value; the
  * join key becomes (key, salt), spreading a hot key over n partitions.
  * Replication cost is n * |small side| — use for dimension-sized right
  * sides.
  *
  * GraftSession enables AQE skew-join splitting by default
  * (`spark.sql.adaptive.skewJoin.enabled`); reach for this only when the
  * plan still funnels a hot key into one task.
  */
object SkewJoin {

  /** Deterministic per-row salt (hash of the whole row modulo n — stable
    * across retries, unlike rand()). */
  private def salt(df: DataFrame, n: Int): Column =
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(n))

  /** Inner equi-join `large.key == small.key` with an n-way salted key. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, n: Int): DataFrame = {
    require(n >= 1)
    val l = large.withColumn("__salt", salt(large, n))
    val s = small.withColumn("__salt", explode(lit((0 until n).toArray)))
    l.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Skewed aggregation: two-phase count/sum via salted pre-aggregation —
    * partial per (key, salt), then final per key. Catalyst already does
    * partial+final for algebraic aggregates; this explicit form is for
    * when the PARTIAL itself is the problem (e.g. collect-heavy payloads
    * per key), and documents the pattern. */
  def saltedCount(df: DataFrame, key: String, n: Int): DataFrame = {
    require(n >= 1)
    df.withColumn("__salt", salt(df, n))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(key))
      .agg(sum(col("__c")).as("cnt"))
  }
}
