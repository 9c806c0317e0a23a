package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnBridge

/** Column-API surface for graft's custom Catalyst expressions. */
package object functions {

  private def col(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    ColumnBridge.column(e)

  /** Cosine similarity of two `array<float>` columns (codegen'd, one pass). */
  def cosine_sim(a: Column, b: Column): Column =
    col(CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Dot product of two `array<float>` columns (codegen'd). `dot(v,v)` is
    * the squared norm; `dot(a,b)/sqrt(dot(a,a)*dot(b,b))` is bit-identical
    * to [[cosine_sim]]. */
  def dot_product(a: Column, b: Column): Column =
    col(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** MinHash signature (`array<bigint>`, length k) of a token array over
    * w-token shingles. */
  def minhash_sig(tokens: Column, shingleWidth: Int = 3, k: Int = 64): Column =
    col(MinHashSig(ColumnBridge.expression(tokens), shingleWidth, k))

  /** Hashing-trick token histogram: non-zero md5 buckets of a token array
    * as `array<struct<bucket,cnt>>`, bucket ascending — one imperative
    * O(tokens) pass per row, oracle-checkable (md5, not seeded hashes). */
  def md5_bucket_counts(tokens: Column, nBuckets: Int): Column =
    col(Md5BucketCounts(ColumnBridge.expression(tokens), nBuckets))

  /** Distinct w-token shingle hashes (`array<bigint>`, sorted) of a token
    * array — shingle strings never materialize. */
  def ngram_hashes(tokens: Column, width: Int): Column =
    col(NgramHashesExpr(ColumnBridge.expression(tokens), width))

  /** Per-row most-frequent w-gram: `struct<ngram, cnt>`, null below w
    * tokens. */
  def top_ngram(tokens: Column, width: Int): Column =
    col(TopNgramExpr(ColumnBridge.expression(tokens), width))

  /** 64-bit SimHash fingerprint of a token array. */
  def simhash64(tokens: Column): Column =
    col(SimHash(ColumnBridge.expression(tokens)))

  /** Random-hyperplane LSH bucket (int, nBits sign bits) of an
    * `array<float>` embedding. */
  def lsh_bucket(vec: Column, seed: Long = 7L, nBits: Int = 8): Column =
    col(HyperplaneLshBucket(ColumnBridge.expression(vec), seed, nBits))

  /** Bounded-heap top-k aggregate: the k SMALLEST values of `e` as an
    * ascending array. Partial+final (each map task keeps <= k per group),
    * so per-group ranking never shuffles the full candidate set — the
    * scale-path replacement for `row_number().over(partitionBy(...))`.
    * Encode descending keys by negation: `topk_min(struct(-score, id), k)`
    * ranks by score desc, id asc. */
  def topk_min(e: Column, k: Int): Column =
    col(TopKMin(ColumnBridge.expression(e), k).toAggregateExpression())

  /** The k LARGEST values of `e` as a DESCENDING array — `topk_min` with
    * the comparator flipped (no negation encoding, so it exists for every
    * orderable type and NaN keeps Spark's greatest-first placement). */
  def topk_max(e: Column, k: Int): Column =
    col(TopKMin(ColumnBridge.expression(e), k, reverse = true).toAggregateExpression())

  /** Bloom filter over a LONG column (hash first: `bloom_filter_agg(
    * xxhash64(c), n, bits)`) as one binary value — Spark's own
    * `BloomFilterAggregate`, the expression AQE's runtime-filter rule
    * injects, exposed for CROSS-JOB use: build the filter once from a
    * bounded key set (eval fingerprints, tombstones), persist/broadcast
    * the bytes, and prefilter any later scan with [[bloom_might_contain]].
    * The sketch is partial+final mergeable (bitwise OR). */
  def bloom_filter_agg(e: Column, expectedItems: Long, numBits: Long): Column =
    col(new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
      ColumnBridge.expression(e),
      org.apache.spark.sql.catalyst.expressions.Literal(expectedItems),
      org.apache.spark.sql.catalyst.expressions.Literal(numBits))
      .toAggregateExpression())

  /** Membership probe against a CONSTANT bloom filter binary (Spark's
    * `BloomFilterMightContain` requires a foldable filter side — pass the
    * collected bytes via `lit(...)`). False positives at the configured
    * rate, never false negatives. */
  def bloom_might_contain(filterBytes: Column, e: Column): Column =
    col(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      ColumnBridge.expression(filterBytes), ColumnBridge.expression(e)))
}
