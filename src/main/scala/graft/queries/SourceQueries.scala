package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** File-format breadth through the engine's reader/writer plumbing.
  *
  * The reference ingests whatever its pluggable deserializer emits
  * (`/root/reference/src/main/scala/com/yahoo/bullet/spark/DataProducer.scala:47-58`);
  * our batch equivalent is Spark's DataSource framework, and these queries
  * prove the non-parquet text formats ROUND-TRIP exactly: read the parquet
  * fixture, write it through the format under test, read it back with the
  * declared schema, and hash-compare against the parquet oracle. A format
  * that loses timestamp precision, double digits, or string escaping fails
  * the driver's hash gate — that is the point.
  *
  * Determinism notes:
  *  - timestamps are written/parsed with an explicit micros pattern
  *    (`yyyy-MM-dd HH:mm:ss.SSSSSS`) — the CSV default is millis and WOULD
  *    truncate; the test exists to pin that config;
  *  - doubles survive because Java's `Double.toString` emits the shortest
  *    round-trippable decimal and both parsers are correctly rounded;
  *  - the scratch dir lives under `target/` keyed by the input dir's hash,
  *    overwritten per run — the query stays a pure function of the input.
  *
  * Scale: a round-trip is two linear passes (write, read), both
  * partition-parallel; the bounded filter is fixture hygiene, not a
  * requirement of the shape.
  */
object SourceQueries {

  private def scratch(fmt: String, d: String): String =
    s"target/roundtrip/${fmt}_${Integer.toHexString(d.hashCode)}"

  private val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  val defs: Seq[QueryDef] = Seq(

    QueryDef("src_csv_roundtrip", Some(
      """SELECT event_id, ts, user_id, event_type, value
        |FROM events WHERE event_id < 5000 ORDER BY event_id""".stripMargin)) { (s, d) =>
      val src = Tables.load(s, d, "events")
        .filter(col("event_id") < 5000)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      val out = scratch("csv", d)
      src.write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", TsFmt)
        .csv(out)
      s.read.schema(src.schema)
        .option("header", "true")
        .option("timestampFormat", TsFmt)
        .csv(out)
        .orderBy(col("event_id"))
    },

    QueryDef("src_json_roundtrip", Some(
      """SELECT doc_id, lang, source, n_chars, text
        |FROM documents WHERE doc_id < 3000 ORDER BY doc_id""".stripMargin)) { (s, d) =>
      val src = Tables.load(s, d, "documents")
        .filter(col("doc_id") < 3000)
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_chars"), col("text"))
      val out = scratch("json", d)
      src.write.mode("overwrite").json(out)
      s.read.schema(src.schema).json(out)
        .orderBy(col("doc_id"))
    },

    // ORC — the columnar sibling: binary encoding, so timestamps and
    // doubles carry full precision without format options; the embedding
    // ARRAY<FLOAT> column rides along to prove nested types survive. ORC
    // keeps its own stripe statistics, so at scale this is also the
    // predicate-pushdown-capable interchange format next to parquet.
    QueryDef("src_orc_roundtrip", Some(
      """SELECT vec_id, label,
        |  CAST(len(embedding) AS INTEGER) AS dim,
        |  CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT) AS e0_micros
        |FROM embeddings ORDER BY vec_id""".stripMargin)) { (s, d) =>
      val src = Tables.load(s, d, "embeddings")
      val out = scratch("orc", d)
      src.write.mode("overwrite").orc(out)
      s.read.schema(src.schema).orc(out)
        .select(col("vec_id"), col("label"),
          size(col("embedding")).as("dim"),
          floor(element_at(col("embedding"), 1).cast("double") * 1000000)
            .cast("long").as("e0_micros"))
        .orderBy(col("vec_id"))
    },

    // SCHEMA EVOLUTION — a long-lived event log's schemas drift: the first
    // half of the month was written before the `value` column existed, the
    // second half carries it. The reader must (a) union the drops by NAME
    // with the missing column as null (`mergeSchema=true` — set explicitly;
    // the default samples ONE footer and which one is scan-order luck) and
    // (b) surface the directory layer (v=1/v=2) as a discovered partition
    // column. The oracle recomputes the same per-type profile from the raw
    // fixture with the v1 rows' values nulled — a reader that filled the
    // missing column with anything but null, or dropped v1 rows, fails the
    // hash. Scale: schema merge is a FOOTER operation (O(files) driver-side
    // listing, not a data scan), and the aggregate is one linear pass.
    QueryDef("src_schema_evolution", Some(
      """SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(CASE WHEN CAST(ts AS DATE) > DATE '2024-01-15'
        |             THEN value END) AS BIGINT) AS n_value,
        |  CAST(sum(CASE WHEN CAST(ts AS DATE) > DATE '2024-01-15'
        |           THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT)
        |    AS value_cents
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)) { (s, d) =>
      val out = scratch("evolve", d)
      val e = Tables.load(s, d, "events")
      // v1 drop: pre-`value` schema (the column does not exist on disk)
      e.filter(to_date(col("ts")) <= lit("2024-01-15"))
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
        .write.mode("overwrite").parquet(s"$out/v=1")
      // v2 drop: the evolved schema carries `value`
      e.filter(to_date(col("ts")) > lit("2024-01-15"))
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .write.mode("overwrite").parquet(s"$out/v=2")
      s.read.option("mergeSchema", "true").parquet(out)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("value")).as("n_value"),
          sum(round(col("value") * 100, 0).cast("long"))
            .cast("long").as("value_cents"))
        .orderBy(col("event_type"))
    }
  )
}
