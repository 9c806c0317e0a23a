package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BatchInfer

/** A batch-doubling kernel for the classname seam test. */
class DoublingKernel extends BatchInfer.InferKernel {
  override def inferBatch(texts: Seq[String]): Seq[Array[Float]] =
    texts.map(t => Array(2f * t.length))
}

/** A kernel that breaks the 1:1 contract, to prove the guard fires. */
class DroppingKernel extends BatchInfer.InferKernel {
  override def inferBatch(texts: Seq[String]): Seq[Array[Float]] =
    texts.drop(1).map(t => Array(t.length.toFloat))
}

/** BatchInfer: the model-inference seam. The kernel contract (1:1,
  * order-preserving, per-input deterministic) must make the corpus pass
  * invariant to batch boundaries and partitioning; the classname config
  * must load arbitrary kernels and reject broken ones loudly. */
class BatchInferSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4)

  private def docs = {
    import spark.implicits._
    (0 until 500).map(i => (i.toLong, s"tok$i alpha beta ${"x" * (i % 7)}"))
      .toDF("id", "text")
  }

  private def result(): Seq[(Long, Seq[Float])] =
    BatchInfer.embed(docs, "text", "v")
      .select(col("id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq.sortBy(_._1)

  test("results are invariant to batch size and partitioning") {
    val baseline = result()
    assert(baseline.size == 500 && baseline.head._2.size == 16)
    Seq("1", "7", "10000").foreach { bs =>
      spark.conf.set("spark.graft.infer.batchSize", bs)
      try assert(result() == baseline, s"batchSize=$bs changed the output")
      finally spark.conf.unset("spark.graft.infer.batchSize")
    }
    val repartitioned = BatchInfer.embed(docs.repartition(13), "text", "v")
      .select(col("id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq.sortBy(_._1)
    assert(repartitioned == baseline)
  }

  test("the built-in kernel matches the declarative md5-bucket fold") {
    val viaKernel = result().map { case (id, v) => (id, v.map(_.toLong).toSeq) }
    val declared = docs.select(col("id"),
        transform(sequence(lit(0), lit(15)), b =>
          size(filter(split(col("text"), " "),
            t => conv(substring(md5(t), 1, 4), 16, 10).cast("long") % 16 === b.cast("long")))
            .cast("long")).as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq.sortBy(_._1)
    assert(viaKernel == declared)
  }

  test("classname config loads a custom kernel") {
    spark.conf.set("spark.graft.infer.class", classOf[DoublingKernel].getName)
    try {
      val got = BatchInfer.embed(docs, "text", "v")
        .select(col("id"), element_at(col("v"), 1)).collect()
        .map(r => (r.getLong(0), r.getFloat(1))).toMap
      val want = docs.collect().map(r => (r.getLong(0), 2f * r.getString(1).length)).toMap
      assert(got == want)
    } finally spark.conf.unset("spark.graft.infer.class")
  }

  test("a bad classname fails fast on the driver; a 1:1 violation fails the task") {
    spark.conf.set("spark.graft.infer.class", "no.such.Kernel")
    try {
      val e = intercept[IllegalArgumentException] {
        BatchInfer.embed(docs, "text", "v")
      }
      assert(e.getMessage.contains("no.such.Kernel"))
    } finally spark.conf.unset("spark.graft.infer.class")

    spark.conf.set("spark.graft.infer.class", classOf[DroppingKernel].getName)
    try {
      val e = intercept[Exception] {
        BatchInfer.embed(docs, "text", "v").collect()
      }
      assert(e.getMessage.contains("1:1") ||
        Option(e.getCause).exists(_.getMessage.contains("1:1")))
    } finally spark.conf.unset("spark.graft.infer.class")
  }

  test("null texts never reach the kernel: null in, null out, neighbors unchanged") {
    import spark.implicits._
    val withNulls = (0 until 100).map(i =>
        (i.toLong, if (i % 9 == 0) null else s"tok$i alpha"))
      .toDF("id", "text")
    // tiny batches so null-bearing and null-free batches both occur
    spark.conf.set("spark.graft.infer.batchSize", "4")
    try {
      val got = BatchInfer.embed(withNulls, "text", "v")
        .select(col("id"), col("v")).collect()
        .map(r => (r.getLong(0), Option(r.getSeq[Float](1)))).toMap
      assert(got.size == 100)
      (0 until 100).foreach { i =>
        if (i % 9 == 0) assert(got(i.toLong).isEmpty, s"row $i: null text must yield null vector")
        else assert(got(i.toLong).exists(_.size == 16), s"row $i lost its embedding")
      }
      // the non-null rows embed exactly as they would without the nulls
      val clean = BatchInfer.embed(
          withNulls.filter(col("text").isNotNull), "text", "v")
        .select(col("id"), col("v")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
      clean.foreach { case (id, v) => assert(got(id).contains(v)) }
    } finally spark.conf.unset("spark.graft.infer.batchSize")
  }
}
