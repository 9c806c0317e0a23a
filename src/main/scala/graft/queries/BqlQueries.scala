package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.bql.Compiler
import graft.sources.Tables

/** BQL end-to-end under the driver's oracle gate: each entry is a BQL text
  * parsed by graft.bql.Parser, compiled to a Catalyst plan by
  * graft.bql.Compiler, and run against the parquet fixtures — proving the
  * full text → AST → Column → result path (the layer the reference
  * outsources to Bullet's web service; SURVEY.md §3.2 step 3).
  */
object BqlQueries {

  private def bql(s: SparkSession, d: String, table: String, text: String): DataFrame =
    Compiler.compile(text)._2(Tables.load(s, d, table))

  val defs: Seq[QueryDef] = Seq(

    QueryDef("bql_filter_project", Some(
      """SELECT event_id, user_id, value * 2 AS v2 FROM events
        |WHERE event_type = 'click' AND value >= 50 ORDER BY event_id""".stripMargin)) { (s, d) =>
      bql(s, d, "events",
        "SELECT event_id, user_id, value * 2 AS v2 FROM STREAM " +
          "WHERE event_type == 'click' AND value >= 50 ORDER BY event_id")
    },

    QueryDef("bql_group_agg", Some(
      """SELECT event_type, count(*) AS cnt, min(value) AS mn, max(value) AS mx
        |FROM events WHERE user_id % 2 = 0 GROUP BY event_type
        |ORDER BY event_type""".stripMargin)) { (s, d) =>
      bql(s, d, "events",
        "SELECT event_type, COUNT(*) AS cnt, MIN(value) AS mn, MAX(value) AS mx " +
          "FROM STREAM WHERE user_id % 2 == 0 GROUP BY event_type ORDER BY event_type")
    },

    QueryDef("bql_count_distinct", Some(
      """SELECT count(DISTINCT user_id) AS n_users FROM events
        |WHERE event_type IN ('click','view')""".stripMargin)) { (s, d) =>
      bql(s, d, "events",
        "SELECT COUNT(DISTINCT user_id) AS n_users FROM STREAM " +
          "WHERE event_type IN ('click', 'view')")
    },

    QueryDef("bql_topk", Some(
      """SELECT event_type, count(*) AS cnt FROM events
        |GROUP BY event_type ORDER BY cnt DESC, event_type LIMIT 3""".stripMargin)) { (s, d) =>
      bql(s, d, "events", "SELECT TOP(3, event_type) AS cnt FROM STREAM")
    },

    QueryDef("bql_having_expr", Some(
      """SELECT event_type, count(*) AS cnt, avg(user_id) AS avg_uid
        |FROM events GROUP BY event_type HAVING count(*) > 150
        |ORDER BY cnt DESC, event_type""".stripMargin)) { (s, d) =>
      // AVG over an integer column: the double sum stays exact (< 2^53),
      // so Spark's avg and DuckDB's avg are bit-identical. Float-typed
      // AVGs go through the decimal-sum pattern instead (CoreQueries).
      bql(s, d, "events",
        "SELECT event_type, COUNT(*) AS cnt, AVG(user_id) AS avg_uid FROM STREAM " +
          "GROUP BY event_type HAVING cnt > 150 ORDER BY cnt DESC, event_type")
    },

    // LATERAL VIEW EXPLODE (bullet-bql's explode surface): unnest a
    // list-typed field to one row per element, with the alias visible to
    // WHERE/SELECT. CAST to DOUBLE is an exact float32 widening on both
    // engines, so the hash compare is deterministic with no float math.
    QueryDef("bql_explode", Some(
      """SELECT vec_id, CAST(e AS DOUBLE) AS ev, label
        |FROM (SELECT vec_id, label, unnest(embedding) AS e FROM embeddings)
        |WHERE e >= 0.3 ORDER BY vec_id, ev""".stripMargin)) { (s, d) =>
      bql(s, d, "embeddings",
        "SELECT vec_id, CAST(e, DOUBLE) AS ev, label FROM STREAM " +
          "LATERAL VIEW EXPLODE(embedding) AS e " +
          "WHERE e >= 0.3 ORDER BY vec_id, ev")
    }
  )
}
