package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Model-inference seam — the "run a model over the corpus" plumbing a
  * 100 TB embedding/scoring pass needs, with the model pluggable by
  * classname config exactly like the ingest-side Deserializer seam
  * (sources/Deserializer.scala; the reference's config-classname pattern,
  * /root/reference/src/main/scala/com/yahoo/bullet/spark/DataProducer.scala:47-58):
  *
  *   spark.graft.infer.class      fully-qualified InferKernel impl
  *                                (default: the deterministic built-in)
  *   spark.graft.infer.batchSize  rows per inferBatch call (default 64)
  *
  * Execution shape: ONE mapPartitions pass — the documented (d)-tier
  * escape hatch, used here because the semantics genuinely are imperative:
  * the kernel (a model runtime) must be instantiated once per task, fed
  * FIXED-SIZE batches (accelerator-shaped), and applied order-preserving
  * 1:1. No shuffle, no driver involvement, memory bounded by batchSize ×
  * row width; everything before and after this operator stays a normal
  * declarative plan. Batch boundaries MUST NOT change results — the
  * kernel contract (BatchInferSpec proves it for the built-in and the
  * classname-loaded test kernel).
  */
object BatchInfer {

  /** One model: maps a bounded batch of texts to exactly one vector per
    * input, order-preserving. Implementations must be deterministic
    * per-input (no cross-batch state) — that is what makes the corpus
    * pass reproducible under any partitioning. */
  trait InferKernel extends Serializable {
    def inferBatch(texts: Seq[String]): Seq[Array[Float]]
  }

  /** Deterministic built-in: 16-dim hashed bag-of-words counts (bucket =
    * first 4 md5 hex chars mod 16 — the fn_feature_hash function at
    * width 16, so the result is oracle-checkable cross-engine). Stands in
    * for a real encoder the way the PPM kernel stands in for a codec. */
  class HashEmbedKernel extends InferKernel {
    override def inferBatch(texts: Seq[String]): Seq[Array[Float]] = {
      val md = MessageDigest.getInstance("MD5")
      texts.map { t =>
        val v = new Array[Float](16)
        // limit -1: keep trailing empty tokens — Java's default split
        // drops them, Spark's split()/DuckDB's string_split keep them
        t.split(" ", -1).foreach { tok =>
          md.reset()
          val hex = md.digest(tok.getBytes("UTF-8"))
            .take(2).map(b => f"$b%02x").mkString
          v(Integer.parseInt(hex, 16) % 16) += 1f
        }
        v
      }
    }
  }

  /** Append `outCol` (array<float>) to `df` by batched kernel inference
    * over `textCol`. Null handling is defined AT THE SEAM: a null text
    * never reaches the kernel — it maps to a null vector ("null in, null
    * out", the same contract Spark's own scalar functions keep), so
    * kernels only ever see real strings and a sparse null column can't
    * turn into a per-task NPE storm. Batch slots stay full-size: nulls
    * are carved out AFTER grouping, so accelerator-shaped batching is
    * unchanged. */
  def embed(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val conf = df.sparkSession.conf
    val clsName = conf.get("spark.graft.infer.class", classOf[HashEmbedKernel].getName)
    val batchSize = conf.get("spark.graft.infer.batchSize", "64").toInt
    require(batchSize > 0, s"spark.graft.infer.batchSize must be > 0, got $batchSize")
    // fail fast on the driver for a bad classname (clear error, not a
    // per-task stack trace storm); tasks re-instantiate their own copy
    instantiate(clsName)
    val idx = df.schema.fieldIndex(textCol)
    val outSchema = df.schema.add(outCol, ArrayType(FloatType, containsNull = false))
    df.mapPartitions { rows =>
      val kernel = instantiate(clsName)
      rows.grouped(batchSize).flatMap { batch =>
        val present = batch.filter(!_.isNullAt(idx))
        val outs =
          if (present.isEmpty) Seq.empty
          else kernel.inferBatch(present.map(_.getString(idx)))
        require(outs.size == present.size,
          s"$clsName broke the 1:1 contract: ${present.size} in, ${outs.size} out")
        val it = outs.iterator
        batch.map { r =>
          val o = if (r.isNullAt(idx)) null else it.next().toSeq
          Row.fromSeq(r.toSeq :+ o)
        }
      }
    }(Encoders.row(outSchema))
  }

  private def instantiate(clsName: String): InferKernel =
    try Class.forName(clsName).getDeclaredConstructor().newInstance()
      .asInstanceOf[InferKernel]
    catch {
      case e: Exception => throw new IllegalArgumentException(
        s"spark.graft.infer.class=$clsName is not a constructible InferKernel", e)
    }
}
