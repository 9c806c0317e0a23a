package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic sampling and dataset splitting — the selection ops a
  * training-data pipeline runs constantly. Randomness comes from a
  * content hash, not an RNG: the same row lands in the same
  * sample/split on every engine, every run, every cluster size (an RNG
  * sample is neither reproducible across partitionings nor
  * oracle-checkable). Hex-string comparison on md5 gives a uniform
  * selector available identically in Spark and DuckDB.
  */
object SamplingQueries {

  val defs: Seq[QueryDef] = Seq(

    // ~10% deterministic sample: md5 hex < '1a' (26/256 of the first-byte
    // space ≈ 10.2%). Content-hash keyed → stable under repartitioning.
    QueryDef("samp_hash_sample", Some(
      """SELECT doc_id, lang FROM documents
        |WHERE substr(md5(text), 1, 2) < '1a' ORDER BY doc_id""".stripMargin)) { (s, d) =>
      Tables.load(s, d, "documents")
        .filter(substring(md5(col("text")), 1, 2) < "1a")
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    },

    // Train/val/test split (80/10/10) keyed on content hash; per-split
    // per-language counts — the split-manifest a data pipeline materializes.
    QueryDef("samp_train_val_test", Some(
      """SELECT split, lang, count(*) AS n FROM (
        |  SELECT lang,
        |    CASE WHEN substr(md5(text), 1, 2) < 'cd' THEN 'train'
        |         WHEN substr(md5(text), 1, 2) < 'e7' THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |GROUP BY split, lang ORDER BY split, lang""".stripMargin)) { (s, d) =>
      val h = substring(md5(col("text")), 1, 2)
      Tables.load(s, d, "documents")
        .withColumn("split",
          when(h < "cd", "train").when(h < "e7", "val").otherwise("test"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("split"), col("lang"))
    }
  )
}
