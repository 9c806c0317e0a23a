package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Lexical (keyword) search over the `documents` table — the retrieval
  * twin of the vector paths in [[SimilarityQueries]]. A corpus pipeline
  * needs both: embedding search for semantic lookups, BM25 for exact
  * keyword audits (find every doc mentioning X, rank quality probes,
  * build retrieval baselines).
  *
  * Scale shape: scoring is one linear codegen'd pass — per-doc term
  * frequencies come from `size(filter(tokens, ...))` (no explode, no
  * shuffle of the corpus), and the corpus statistics BM25 needs (N,
  * avgdl, per-term document frequency) are a single 1-row aggregate that
  * rides in as a broadcast cross join. Top-k is TakeOrderedAndProject
  * (per-partition heaps), never a global sort. At 100 TB the stats pass
  * and the scoring pass are two linear scans; a deployment would persist
  * the stats frame once per corpus snapshot and amortize it across every
  * query.
  */
object SearchQueries {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.load(s, d, "documents")

  private val toks: Column = split(col("text"), " ")

  /** Fixed query terms (fixture vocabulary). A served system would bind
    * these per request; the engine-side plan is identical. */
  private val Terms = Seq("spark", "merge", "window")
  private val K1 = 1.2
  private val B = 0.75
  private val TopK = 25

  val defs: Seq[QueryDef] = Seq(

    // Okapi BM25 top-k: idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)),
    // tf-saturated and length-normalized. The output score is
    // floor(raw·10⁶) as BIGINT — discretized because ln may differ by an
    // ulp between runtimes, floored rather than rounded because Spark and
    // DuckDB systematically disagree on .xx5 round ties (HALF_UP on the
    // shortest decimal repr vs half-away-from-zero on the scaled binary).
    // Ranking uses the raw score with doc_id as a total tiebreak: docs
    // with identical (tf*, dl) profiles produce bit-identical raws in
    // both engines, so the tiebreak is deterministic.
    QueryDef("srch_bm25", Some({
      val tfs = Terms.map(t => s"len(list_filter(t, x -> x = '$t')) AS tf_$t").mkString(",\n  ")
      val dfs = Terms.map(t => s"count(*) FILTER (WHERE list_contains(t, '$t')) AS df_$t").mkString(",\n  ")
      val score = Terms.map(t =>
        s"""ln(1 + (n_docs - df_$t + 0.5)/(df_$t + 0.5))
           |    * tf_$t * ${K1 + 1} / (tf_$t + $K1 * (1 - $B + $B * dl / avgdl))""".stripMargin)
        .mkString(" + ")
      s"""WITH d AS (SELECT doc_id, string_split(text,' ') AS t,
         |    len(string_split(text,' ')) AS dl FROM documents),
         |st AS (SELECT count(*) AS n_docs,
         |  CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
         |  $dfs
         |  FROM d),
         |scored AS (
         |  SELECT doc_id, $score AS raw
         |  FROM (SELECT doc_id, dl, $tfs FROM d) CROSS JOIN st),
         |top AS (SELECT doc_id, raw,
         |    row_number() OVER (ORDER BY raw DESC, doc_id) AS rank
         |  FROM scored)
         |SELECT doc_id, rank, CAST(floor(raw * 1000000) AS BIGINT) AS score_micro FROM top
         |WHERE rank <= $TopK ORDER BY rank""".stripMargin
    })) { (s, d) =>
      val base = docs(s, d).select(col("doc_id"), toks.as("t"),
        size(toks).cast(LongType).as("dl"))
      val statCols =
        (sum(col("dl")).cast(DoubleType) / count(lit(1))).as("avgdl") +:
          Terms.map(t => sum(when(array_contains(col("t"), t), 1L).otherwise(0L)).as(s"df_$t"))
      val stats = base.agg(count(lit(1)).as("n_docs"), statCols: _*)
      val tf = Terms.map(t =>
        size(filter(col("t"), x => x === t)).cast(DoubleType).as(s"tf_$t"))
      val scored = base
        .select(col("doc_id") +: col("dl") +: tf: _*)
        .crossJoin(broadcast(stats))
      val raw = Terms.map { t =>
        val idf = log(lit(1) + (col("n_docs") - col(s"df_$t") + 0.5) / (col(s"df_$t") + 0.5))
        idf * col(s"tf_$t") * (K1 + 1) /
          (col(s"tf_$t") + lit(K1) * (lit(1) - B + lit(B) * col("dl") / col("avgdl")))
      }.reduce(_ + _)
      val top = scored.select(col("doc_id"), raw.as("raw"))
        .orderBy(col("raw").desc, col("doc_id"))
        .limit(TopK)
      // rank over the already-top-K rows: a K-row single-partition window,
      // not a corpus-wide one
      top.withColumn("rank",
          row_number().over(Window.orderBy(col("raw").desc, col("doc_id"))))
        .select(col("doc_id"), col("rank"),
          floor(col("raw") * 1000000).cast(LongType).as("score_micro"))
        .orderBy(col("rank"))
    }
  )
}
