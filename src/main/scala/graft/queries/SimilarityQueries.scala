package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{cosine_sim, dot_product, lsh_bucket}
import graft.sources.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * Two paths, per the standard ANN playbook:
  *  - brute-force cosine top-k: the exact baseline. The query side is tiny
  *    (a handful of probe vectors) so Catalyst broadcasts it; the corpus
  *    side streams through one codegen'd pass — no shuffle of the corpus,
  *    linear scale-out across executors.
  *  - LSH-bucketed: random-hyperplane buckets (graft.functions.lsh_bucket)
  *    turn the all-pairs problem into an equi-join on bucket; multi-probe
  *    (flipping one bit) trades recall for fan-out. At 100 TB only
  *    (id, bucket, vec) pairs reach the join, and each probe touches
  *    ~corpus/2^nBits vectors.
  */
object SimilarityQueries {

  private def emb(s: SparkSession, d: String): DataFrame = Tables.load(s, d, "embeddings")

  private val K = 10
  private val NQueries = 5

  val defs: Seq[QueryDef] = Seq(

    // Brute-force cosine top-k per probe vector (exact ANN baseline).
    // Output is (query id, rank, neighbor id): integer-only, hash-stable.
    QueryDef("ann_brute_topk", Some(
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < $NQueries),
         |  c AS (SELECT q.qid, e.vec_id,
         |    list_sum(list_transform(list_zip(q.qe, e.embedding), x -> CAST(x[1] AS DOUBLE) * x[2]))
         |      / sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * x))
         |           * list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * x))) AS cos
         |  FROM q, embeddings e WHERE e.vec_id <> q.qid)
         |SELECT qid, rank, vec_id FROM (
         |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
         |  FROM c) WHERE rank <= $K ORDER BY qid, rank""".stripMargin)) { (s, d) =>
      val e = emb(s, d).select(col("vec_id"), col("embedding"),
        dot_product(col("embedding"), col("embedding")).as("nsq"))
      val q = e.select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nsq").as("qn"))
        .filter(col("qid") < NQueries)
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      e.join(broadcast(q), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          (dot_product(col("qe"), col("embedding")) / sqrt(col("qn") * col("nsq"))).as("cos"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= K)
        .select(col("qid"), col("rank"), col("vec_id"))
        .orderBy(col("qid"), col("rank"))
    },

    // LSH-bucketed ANN: multi-table random-hyperplane LSH (L tables x b
    // bits, 1-bit multi-probe on the query side). Bits per table scale
    // with log(corpus/bucket-target) — 4 bits suits the 500-5000-vector
    // fixtures; a 100 TB corpus raises b, not the plan shape. Approximate
    // → rows-only driver check; recall vs brute force in ApproxSuiteSpec.
    QueryDef("ann_lsh_topk", None) { (s, d) =>
      val nBits = 4
      val nTables = 6
      val e = emb(s, d)
      // corpus side: one (table, bucket) row per table per vector.
      val corpus = e.select(col("vec_id"), col("embedding"),
        explode(array((0 until nTables).map(tb =>
          struct(lit(tb).as("tb"),
            lsh_bucket(col("embedding"), 100L + tb, nBits).as("bucket"))): _*)).as("cb"))
        .select(col("vec_id"), col("embedding"), col("cb.tb").as("tb"), col("cb.bucket").as("bucket"))
      // query side: own bucket + every 1-bit-flipped bucket, per table.
      val masks = 0 +: (0 until nBits).map(1 << _)
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          explode(array((for (tb <- 0 until nTables; m <- masks) yield
            struct(lit(tb).as("tb"),
              lsh_bucket(col("embedding"), 100L + tb, nBits).bitwiseXOR(m).as("probe"))): _*)).as("qb"))
        .select(col("qid"), col("qe"), col("qb.tb").as("qtb"), col("qb.probe").as("probe"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      corpus.join(broadcast(q),
          col("tb") === col("qtb") && col("bucket") === col("probe") && col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), cosine_sim(col("qe"), col("embedding")).as("cos"))
        .distinct()
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= K)
        .select(col("qid"), col("rank"), col("vec_id"))
        .orderBy(col("qid"), col("rank"))
    },

    // Centroid-grouped similarity stats (IVF-style coarse quantization over
    // LSH buckets): per-bucket counts + mean pairwise proximity proxy —
    // the bucket-size histogram an IVF index build would produce.
    QueryDef("ann_bucket_stats", None) { (s, d) =>
      emb(s, d)
        .select(lsh_bucket(col("embedding"), 7L, 6).as("bucket"), col("label"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_vecs"), countDistinct(col("label")).as("n_labels"))
        .orderBy(col("bucket"))
    }
  )
}
