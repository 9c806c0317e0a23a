package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Scalar-function breadth (SURVEY.md §2.C: the reference has NO date/time
  * functions — time is epoch longs — and no string/math library beyond B3;
  * our engine exposes Spark's function library, sampled here under the
  * oracle).
  *
  * Function choice is deliberately restricted to cross-engine-deterministic
  * operations: date part extraction, string surgery, integer math, and
  * sqrt (IEEE-754 requires correct rounding for sqrt — unlike ln/exp/pow,
  * which vary by libm and are kept out of oracle-checked outputs).
  */
object FunctionQueries {

  val defs: Seq[QueryDef] = Seq(

    QueryDef("fn_datetime", Some(
      """SELECT event_id,
        |  CAST(year(ts) AS BIGINT) AS y, CAST(month(ts) AS BIGINT) AS mo,
        |  CAST(day(ts) AS BIGINT) AS d, CAST(hour(ts) AS BIGINT) AS h,
        |  strftime(ts, '%Y-%m-%d') AS dday,
        |  CAST(epoch_ms(date_trunc('second', ts)) / 1000 AS BIGINT) AS epoch_s
        |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin)) { (s, d) =>
      Tables.load(s, d, "events")
        .filter(col("event_id") < 2000)
        .select(
          col("event_id"),
          year(col("ts")).cast(LongType).as("y"),
          month(col("ts")).cast(LongType).as("mo"),
          dayofmonth(col("ts")).cast(LongType).as("d"),
          hour(col("ts")).cast(LongType).as("h"),
          date_format(col("ts"), "yyyy-MM-dd").as("dday"),
          unix_timestamp(date_trunc("second", col("ts"))).as("epoch_s"))
        .orderBy(col("event_id"))
    },

    QueryDef("fn_string_math", Some(
      """SELECT event_id,
        |  substr(event_type, 1, 2) AS pre,
        |  replace(event_type, 'c', 'k') AS repl,
        |  reverse(event_type) AS rev,
        |  lpad(CAST(user_id AS VARCHAR), 6, '0') AS padded,
        |  concat(event_type, '-', CAST(user_id AS VARCHAR)) AS tag,
        |  CAST(floor(value) AS BIGINT) AS fl, CAST(ceil(value) AS BIGINT) AS ce,
        |  event_id % 7 AS m7,
        |  sqrt(CAST(user_id AS DOUBLE)) AS sq
        |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin)) { (s, d) =>
      Tables.load(s, d, "events")
        .filter(col("event_id") < 2000)
        .select(
          col("event_id"),
          substring(col("event_type"), 1, 2).as("pre"),
          regexp_replace(col("event_type"), "c", "k").as("repl"),
          reverse(col("event_type")).as("rev"),
          lpad(col("user_id").cast(StringType), 6, "0").as("padded"),
          concat(col("event_type"), lit("-"), col("user_id").cast(StringType)).as("tag"),
          floor(col("value")).cast(LongType).as("fl"),
          ceil(col("value")).cast(LongType).as("ce"),
          (col("event_id") % 7).as("m7"),
          sqrt(col("user_id").cast(DoubleType)).as("sq"))
        .orderBy(col("event_id"))
    }
  )
}
