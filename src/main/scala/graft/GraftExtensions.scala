package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** SparkSessionExtensions entry point: registers graft's custom Catalyst
  * expressions as SQL functions, so `spark.sql("SELECT cosine_sim(a, b)")`
  * works next to the Column API. Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    // Optimizer rule: inequality interval-overlap joins -> bucketized
    // equi-join (no-op until spark.graft.intervalJoin.bucketWidth is set).
    e.injectOptimizerRule(_ => graft.plans.IntervalJoinRewrite)
    // Optimizer rule: row_number-over-window top-N -> bounded-heap
    // topk_min aggregate (no-op until spark.graft.topk.rewriteMaxK arms it).
    e.injectOptimizerRule(_ => graft.plans.TopKWindowRewrite)
    // Optimizer rule: COUNT(DISTINCT x) -> Theta sketch estimate — the
    // reference's B6 semantic as a session mode (no-op until
    // spark.graft.approxDistinct=theta arms it).
    e.injectOptimizerRule(_ => graft.plans.ApproxDistinctRewrite)
    // Optimizer rule: exact percentile/median -> KLL sketch estimate —
    // the reference's B7 semantic as a session mode (no-op until
    // spark.graft.approxPercentile=kll arms it).
    e.injectOptimizerRule(_ => graft.plans.ApproxPercentileRewrite)
    // Optimizer rule: GROUP BY + ORDER BY count DESC + LIMIT k ->
    // approx_top_k frequent-items sketch — the reference's B8 semantic
    // as a session mode (no-op until spark.graft.approxTopK=freq).
    e.injectOptimizerRule(_ => graft.plans.TopKFrequentRewrite)
    e.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float arrays"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two float arrays"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(tokens[, w, k]) - MinHash signature of a token array"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => MinHashSig(t, 3, 64)
        case Seq(t, w, k) => MinHashSig(t,
          w.eval().asInstanceOf[Number].intValue(), k.eval().asInstanceOf[Number].intValue())
        case _ => throw new IllegalArgumentException("minhash_sig(tokens[, w, k])")
      }))
    e.injectFunction((FunctionIdentifier("ngram_hashes"),
      info("ngram_hashes", "ngram_hashes(tokens, w) - distinct w-token shingle hashes"),
      (args: Seq[Expression]) => NgramHashesExpr(args(0),
        args(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((FunctionIdentifier("top_ngram"),
      info("top_ngram", "top_ngram(tokens, w) - most frequent w-gram as struct(ngram, cnt)"),
      (args: Seq[Expression]) => TopNgramExpr(args(0),
        args(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of a token array"),
      (args: Seq[Expression]) => SimHash(args.head)))
    e.injectFunction((FunctionIdentifier("lsh_bucket"),
      info("lsh_bucket", "lsh_bucket(vec[, seed, bits]) - hyperplane LSH bucket"),
      (args: Seq[Expression]) => args match {
        case Seq(v) => HyperplaneLshBucket(v, 7L, 8)
        case Seq(v, s, b) => HyperplaneLshBucket(v,
          s.eval().asInstanceOf[Number].longValue(), b.eval().asInstanceOf[Number].intValue())
        case _ => throw new IllegalArgumentException("lsh_bucket(vec[, seed, bits])")
      }))
    // the bounded-heap top-k aggregate, SQL-callable: the analyzer wraps
    // a bare AggregateFunction in its AggregateExpression
    e.injectFunction((FunctionIdentifier("topk_min"),
      info("topk_min", "topk_min(expr, k) - k smallest values of expr as an ascending array (partial+final bounded heap)"),
      (args: Seq[Expression]) => args match {
        case Seq(c, k) => TopKMin(c, k.eval().asInstanceOf[Number].intValue())
        case _ => throw new IllegalArgumentException("topk_min(expr, k)")
      }))
    e.injectFunction((FunctionIdentifier("topk_max"),
      info("topk_max", "topk_max(expr, k) - k largest values of expr as a descending array (comparator-flipped topk_min: works for any orderable type, no negation encoding)"),
      (args: Seq[Expression]) => args match {
        case Seq(c, k) => TopKMin(c, k.eval().asInstanceOf[Number].intValue(), reverse = true)
        case _ => throw new IllegalArgumentException("topk_max(expr, k)")
      }))
  }
}
