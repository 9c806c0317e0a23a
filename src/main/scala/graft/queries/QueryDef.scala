package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-verifiable query: a Spark implementation plus (optionally) the
  * equivalent ANSI SQL the driver runs on DuckDB over the same parquet
  * tables. `oracle = None` → driver records a weaker rows-only check (used
  * for sketch/LSH results that are not SQL-expressible).
  *
  * Conventions that make the hash-compare deterministic:
  *  - every output column is explicitly aliased, identically on both sides;
  *  - every query has a total ORDER BY on both sides;
  *  - double-typed aggregates are either exact (sums of integer-valued
  *    doubles), decimal-cast (money sums), or rounded (averages) so that
  *    summation order cannot flip the hash.
  */
final case class QueryDef(
    name: String,
    oracle: Option[String])(
    val run: (SparkSession, String) => DataFrame)

/** The order-insensitive document fingerprint shared by `tx_fingerprint`
  * and `dd_cross_dedup` (md5 over the sorted distinct token set — catches
  * shuffled copies byte-hashing misses). ONE definition, expressed for
  * both engines, so the two queries cannot silently diverge from each
  * other or from their oracles. */
private[graft] object Fingerprints {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  val sql: String =
    "md5(array_to_string(list_sort(list_distinct(string_split(text,' '))),' '))"

  def tokenSetFp(toks: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(toks))))
}

object QueryDef {
  /** Build the (queries, oracleSql) maps SparkEntry exposes. */
  def toMaps(qs: Seq[QueryDef])
      : (Map[String, (SparkSession, String) => DataFrame], Map[String, String]) = {
    val queries = qs.map(q => q.name -> q.run).toMap
    require(queries.size == qs.size, {
      val dup = qs.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
      s"duplicate query names: ${dup.mkString(", ")}"
    })
    val oracles = qs.collect { case q if q.oracle.isDefined => q.name -> q.oracle.get }.toMap
    (queries, oracles)
  }
}
