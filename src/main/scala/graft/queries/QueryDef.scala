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
