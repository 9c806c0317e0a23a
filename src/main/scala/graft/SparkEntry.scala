package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as a named query
  * over the driver's parquet fixtures, with a DuckDB oracle where the
  * semantics are ANSI-SQL-expressible (sketch estimates and LSH bucketing are
  * checked rows-only instead).
  */
object SparkEntry {

  private val allDefs: Seq[QueryDef] =
    CoreQueries.defs ++ SketchQueries.defs ++ TextQueries.defs ++
      DedupQueries.defs ++ SimilarityQueries.defs ++ BqlQueries.defs ++
      MultimodalQueries.defs ++ OperatorQueries.defs ++ FunctionQueries.defs ++
      SamplingQueries.defs ++ SearchQueries.defs ++ StreamingQueries.defs ++
      SourceQueries.defs ++ PipelineQueries.defs ++ ForgetStoreQueries.defs

  private val (queryMap, oracleMap) = QueryDef.toMaps(allDefs)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queryMap("b5_group_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = queryMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = oracleMap
}
