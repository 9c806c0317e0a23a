package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** End-to-end corpus curation as ONE composed declarative plan — the
  * integration proof that the engine's stages actually chain: a user runs
  * dedup → quality filter → per-language length clamp → budget sample as a
  * single DataFrame expression and Catalyst plans the whole funnel
  * (SURVEY.md §2.D; each stage is an already-oracle-proven primitive —
  * dd_exact, tx_quality, fn_winsorize's bounds, samp_hash_sample's draw —
  * re-stated here verbatim so the composition is checkable end to end).
  *
  * Scale shape of the funnel: the dedup stage is one md5-keyed aggregate +
  * id join; quality is a shuffle-free codegen predicate; the per-language
  * bounds are a |langs|-row KLL frame broadcast back; the budget draw is a
  * row-local md5 16-bit acceptance — so the composed plan carries exactly
  * TWO corpus-keyed exchanges (fingerprint groupBy, kept-id join) plus the
  * oracle-only final sort, and every stage prunes the corpus before the
  * next touches it.
  */
object PipelineQueries {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.load(s, d, "documents")
  private val toks: Column = split(col("text"), " ")

  val defs: Seq[QueryDef] = Seq(

    QueryDef("pipe_curate", Some(
      """WITH dedup AS (
        |  SELECT d.* FROM documents d
        |  JOIN (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)) k
        |    ON d.doc_id = k.doc_id),
        |q AS (SELECT * FROM dedup
        |  WHERE (CASE WHEN n_chars BETWEEN 100 AND 5000 THEN 1 ELSE 0 END
        |       + CASE WHEN len(list_distinct(string_split(text,' '))) * 2
        |              >= len(string_split(text,' ')) THEN 1 ELSE 0 END
        |       + CASE WHEN len(list_filter(string_split(text,' '),
        |              t -> list_contains(['the','a'], t))) > 0 THEN 1 ELSE 0 END) >= 2),
        |r AS (SELECT lang, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n FROM dedup),
        |b AS (SELECT lang,
        |    min(CASE WHEN rn >= ceil(0.05 * n) THEN n_chars END) AS lo,
        |    min(CASE WHEN rn >= ceil(0.95 * n) THEN n_chars END) AS hi
        |  FROM r GROUP BY lang)
        |SELECT q.doc_id, q.source, q.lang, q.n_chars
        |FROM q JOIN b USING (lang)
        |WHERE q.n_chars BETWEEN b.lo AND b.hi
        |  AND ((strpos('0123456789abcdef', substr(md5(concat('pipe|', CAST(q.doc_id AS VARCHAR))),1,1))-1)*4096
        |     + (strpos('0123456789abcdef', substr(md5(concat('pipe|', CAST(q.doc_id AS VARCHAR))),2,1))-1)*256
        |     + (strpos('0123456789abcdef', substr(md5(concat('pipe|', CAST(q.doc_id AS VARCHAR))),3,1))-1)*16
        |     + (strpos('0123456789abcdef', substr(md5(concat('pipe|', CAST(q.doc_id AS VARCHAR))),4,1))-1)) < 32768
        |ORDER BY q.doc_id""".stripMargin)) { (s, d) =>
      val base = docs(s, d)
      // stage 1: exact dedup — keep each text's first occurrence
      val keepIds = base.groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
      val dedup = base.join(keepIds, Seq("doc_id"))
      // stage 2: composite quality gate (tx_quality's score >= 2)
      val stops = size(filter(toks, t => t.isInCollection(Seq("the", "a"))))
      val quality = (when(col("n_chars").between(100, 5000), 1).otherwise(0)
        + when(size(array_distinct(toks)) * 2 >= size(toks), 1).otherwise(0)
        + when(stops > 0, 1).otherwise(0))
      val qualified = dedup.filter(quality >= 2)
      // stage 3: per-language [p05, p95] length clamp — bounds from the
      // DEDUPED corpus (pre-quality, so a quality change cannot move the
      // length distribution under the filter), broadcast back
      val bounds = dedup.groupBy(col("lang"))
        .agg(expr("kll_sketch_get_quantile_double(" +
          "kll_sketch_agg_double(CAST(n_chars AS DOUBLE), 65535), array(0.05D, 0.95D))").as("qs"))
        .select(col("lang"),
          element_at(col("qs"), 1).cast(LongType).as("lo"),
          element_at(col("qs"), 2).cast(LongType).as("hi"))
      val clamped = qualified.join(broadcast(bounds), Seq("lang"))
        .filter(col("n_chars").between(col("lo"), col("hi")))
      // stage 4: deterministic 50% budget draw (16-bit md5 acceptance)
      val draw = conv(substring(
        md5(concat(lit("pipe|"), col("doc_id").cast(StringType))), 1, 4), 16, 10)
        .cast(LongType)
      clamped.filter(draw < 32768)
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    }
  )
}
