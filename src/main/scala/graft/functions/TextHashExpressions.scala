package graft.functions

import java.util.SplittableRandom

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass per-row text fingerprinting expressions for the dedup suite.
  *
  * Design: each document's signature is computed row-locally (no explode, no
  * shuffle) inside whole-stage codegen via one static helper call; only the
  * tiny signatures then participate in the LSH band shuffle. At 100 TB this
  * means the wide `text` column is read once, never materialized into
  * |docs| x |shingles| exploded rows.
  *
  * Hashing is FNV-1a 64-bit over UTF-8 bytes — self-contained, stable across
  * JVMs/partitionings, and cheap enough to be memory-bound.
  */
private[functions] object TextHash {
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  def fnv1a(bytes: Array[Byte], seed: Long): Long = {
    var h = FnvOffset ^ seed
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** Hash of the w-token shingle tokens[i, i+w), with a separator byte
    * folded in between tokens. SQL-surface hardening: a null array
    * element hashes like an empty token instead of crashing codegen. */
  def shingleHash(tokens: ArrayData, i: Int, w: Int): Long = {
    var h = FnvOffset
    var j = 0
    while (j < w) {
      if (!tokens.isNullAt(i + j)) {
        val b = tokens.getUTF8String(i + j).getBytes
        var k = 0
        while (k < b.length) {
          h ^= (b(k) & 0xffL)
          h *= FnvPrime
          k += 1
        }
      }
      // token separator so ("ab","c") != ("a","bc")
      h ^= 0x1fL
      h *= FnvPrime
      j += 1
    }
    h
  }
}

object MinHashSig {
  /** Fixed affine transforms (a_i * h + b_i) of the single shingle hash —
    * the standard one-hash MinHash family. Deterministic: seeded generator,
    * odd multipliers. */
  private val MaxK = 128
  private val (as, bs) = {
    val r = new SplittableRandom(42L)
    val a = Array.fill(MaxK)(r.nextLong() | 1L)
    val b = Array.fill(MaxK)(r.nextLong())
    (a, b)
  }

  def compute(tokens: ArrayData, shingleWidth: Int, k: Int): ArrayData = {
    val n = tokens.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    val nShingles = math.max(n - shingleWidth + 1, 0)
    var i = 0
    while (i < nShingles) {
      val h = TextHash.shingleHash(tokens, i, shingleWidth)
      var j = 0
      while (j < k) {
        val v = as(j) * h + bs(j)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** MinHash signature of a token array: `array<bigint>` of length k over
  * w-token shingles. Jaccard(doc_a, doc_b) ≈ fraction of equal signature
  * slots (property of the min-wise hash family). */
case class MinHashSig(child: Expression, shingleWidth: Int, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(shingleWidth >= 1 && k >= 1 && k <= 128)

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], shingleWidth, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.compute($c, $shingleWidth, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object NgramHashes {
  /** Sorted distinct hashes of all w-token shingles. Distinctness via
    * sort+dedupe in place — order is irrelevant to every caller (the
    * hashes feed joins and cardinality counts), and it avoids a hash-set
    * allocation per row. */
  def compute(tokens: ArrayData, w: Int): ArrayData = {
    val n = math.max(tokens.numElements() - w + 1, 0)
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = TextHash.shingleHash(tokens, i, w); i += 1 }
    java.util.Arrays.sort(hs)
    var out = 0
    var j = 0
    while (j < n) {
      if (j == 0 || hs(j) != hs(j - 1)) { hs(out) = hs(j); out += 1 }
      j += 1
    }
    new GenericArrayData(if (out == n) hs else java.util.Arrays.copyOf(hs, out))
  }
}

/** Distinct w-token shingle hashes (`array<bigint>`) of a token array —
  * the join/count currency of the exact dedup family. Computing the hash
  * directly from the token slice inside codegen means shingle STRINGS are
  * never materialized: at 100 TB the wide text column is read once and
  * only 8-byte hashes explode into the pair join. */
case class NgramHashesExpr(child: Expression, width: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(width >= 1)

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"

  override def nullSafeEval(input: Any): Any =
    NgramHashes.compute(input.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramHashes.compute($c, $width);")

  override protected def withNewChildInternal(newChild: Expression): NgramHashesExpr =
    copy(child = newChild)
}

object TopNgram {
  /** Most frequent w-token shingle with its count; ties break to the
    * binary-smallest shingle (the same `ORDER BY cnt DESC, ngram` rule a
    * relational argmax uses, so results match an exploded groupBy and the
    * DuckDB oracle exactly). Returns null when the doc has no w-grams. */
  def compute(tokens: ArrayData, w: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val n = tokens.numElements() - w + 1
    if (n <= 0) return null
    val counts = new java.util.HashMap[String, Integer]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        // null element renders as empty, mirroring shingleHash
        if (!tokens.isNullAt(i + j)) sb.append(tokens.getUTF8String(i + j).toString)
        j += 1
      }
      counts.merge(sb.toString, 1, (a, b) => Integer.valueOf(a + b))
      i += 1
    }
    var best: String = null
    var bestC = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.intValue()
      // binary UTF-8 comparison (UTF8String), not String's UTF-16 order —
      // matches Spark and DuckDB string sort
      if (c > bestC || (c == bestC &&
          UTF8String.fromString(e.getKey).compareTo(UTF8String.fromString(best)) < 0)) {
        best = e.getKey; bestC = c
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(UTF8String.fromString(best), bestC.toLong)
  }
}

/** Per-row most-frequent w-gram: `struct<ngram string, cnt bigint>`, null
  * if the doc has fewer than w tokens. Replaces the explode → groupBy →
  * per-doc rank-1 → join-back argmax with ONE codegen'd projection — at
  * 100 TB that removes two corpus-sized shuffles from the repetition
  * metrics. */
case class TopNgramExpr(child: Expression, width: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(width >= 1)

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("ngram", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "top_ngram"

  override def nullSafeEval(input: Any): Any =
    TopNgram.compute(input.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TopNgram.compute($c, $width);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): TopNgramExpr =
    copy(child = newChild)
}

object SimHash64 {
  /** 64-bit SimHash: per-token 64-bit hash votes per bit; sign of the vote
    * sum forms the fingerprint. Near-dup docs differ in few bits. */
  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      // null element votes like an empty token (SQL-surface hardening)
      val h =
        if (tokens.isNullAt(i)) TextHash.fnv1a(Array.emptyByteArray, 0L)
        else TextHash.fnv1a(tokens.getUTF8String(i).getBytes, 0L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** SimHash fingerprint (`bigint`) of a token array. */
case class SimHash(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.SimHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object Md5BucketCounts {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Per-row histogram of md5-hashed tokens over `nBuckets` buckets:
    * array<struct<bucket, cnt>> with only the non-zero buckets, bucket
    * ascending. The bucket function is the first 4 md5 hex chars mod
    * nBuckets (= first two digest bytes as an unsigned big-endian int) —
    * bit-identical to the declarative
    * `conv(substring(md5(t), 1, 4), 16, 10) % nBuckets`, so the DuckDB
    * oracle reproduces it from strpos arithmetic. One imperative pass:
    * O(tokens) with a mutable long[nBuckets], vs the O(nBuckets·tokens)
    * filter-per-bucket HOF shape this replaced. */
  def compute(tokens: ArrayData, nBuckets: Int): ArrayData = {
    val md = digest.get()
    val counts = new Array[Long](nBuckets)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      md.reset()
      val d = md.digest(t.getBytes)
      val bucket = (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % nBuckets
      counts(bucket) += 1
      i += 1
    }
    var nz = 0
    var b = 0
    while (b < nBuckets) { if (counts(b) != 0) nz += 1; b += 1 }
    val out = new Array[Any](nz)
    var o = 0
    b = 0
    while (b < nBuckets) {
      if (counts(b) != 0) {
        out(o) = org.apache.spark.sql.catalyst.InternalRow(b.toLong, counts(b))
        o += 1
      }
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** Hashing-trick token histogram (`array<struct<bucket,cnt>>`, non-zero
  * buckets only, ascending) — the row-local core of `fn_feature_hash`.
  * Buckets are md5-derived so the result is oracle-checkable cross-engine
  * (xxhash64/murmur seeds differ per engine; md5 does not). */
case class Md5BucketCounts(child: Expression, nBuckets: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(nBuckets >= 1 && nBuckets <= 65536)

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(new StructType()
    .add("bucket", LongType, nullable = false)
    .add("cnt", LongType, nullable = false), containsNull = false)
  override def prettyName: String = "md5_bucket_counts"

  override def nullSafeEval(input: Any): Any =
    Md5BucketCounts.compute(input.asInstanceOf[ArrayData], nBuckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5BucketCounts.compute($c, $nBuckets);")

  override protected def withNewChildInternal(newChild: Expression): Md5BucketCounts =
    copy(child = newChild)
}
