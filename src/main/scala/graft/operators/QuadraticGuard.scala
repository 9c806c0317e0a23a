package graft.operators

import org.apache.spark.sql.DataFrame

/** Refusal guard for the intentionally-quadratic exact baselines
  * (`dd_ngram_jaccard`'s post-shuffle pair expansion, `dd_embed_cosine`'s
  * cartesian verify). These exist as ground truth for the approximate
  * variants' recall specs — at fixture scale they are fine, but at data
  * scale an O(n²) pair expansion is a cluster-killer, so above the row
  * threshold they refuse with a pointer at the scale-safe twin
  * (`dd_minhash_lsh` / `ann_lsh_topk`) unless the caller explicitly opts
  * in.
  *
  * The threshold and opt-in are runtime conf, so a deployment can widen or
  * disable the guard per session:
  *   - `spark.graft.quadraticMaxRows` (default 50000)
  *   - `spark.graft.allowQuadratic`  (default false)
  *
  * The count is a parquet-metadata-only job on the guarded inputs —
  * negligible next to the quadratic work it gatekeeps.
  */
object QuadraticGuard {
  val DefaultMaxRows = 50000L
  val MaxRowsKey = "spark.graft.quadraticMaxRows"
  val OptInKey = "spark.graft.allowQuadratic"

  /** Pass `df` through unchanged if it is small enough for the quadratic
    * `op`; throw with the scale-safe `alternative` otherwise. */
  def check(df: DataFrame, op: String, alternative: String): DataFrame = {
    val conf = df.sparkSession.conf
    if (!conf.get(OptInKey, "false").toBoolean) {
      val maxRows = conf.get(MaxRowsKey, DefaultMaxRows.toString).toLong
      val n = df.count()
      if (n > maxRows)
        throw new IllegalStateException(
          s"$op is O(n²) by design (exact baseline) and its input has $n rows " +
            s"(> $maxRows). At this scale use $alternative instead, raise " +
            s"$MaxRowsKey, or set $OptInKey=true to run it anyway.")
    }
    df
  }
}
