package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-wise per partition.
  *
  * The container has no media codecs, so the decode kernel is a STUB — a
  * deterministic fake (byte histogram / strided sampling) standing in for
  * libjpeg/ffmpeg — but everything Spark-side is real and tested: the
  * schema contract, the per-partition batch iteration (the Scala analog of
  * `mapInPandas` batches: one buffer reused per partition, codec state
  * initialized once per partition, not per row), partition sizing, and the
  * feature-column output shape that downstream ANN/dedup consume.
  *
  * At 100 TB: payloads stay in binary columns (parquet keeps them
  * page-compressed, column pruning means metadata-only queries never read
  * them), decode parallelism = partition count, and the expensive kernel
  * runs exactly once per row with no driver involvement.
  */
object Multimodal {

  /** Metadata carried alongside every payload (content-addressed id,
    * format tag, byte size). */
  val metaSchema: StructType = StructType(Seq(
    StructField("content_id", StringType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  val featureDim = 16

  /** Wrap a text/binary source column into the multimodal ingest contract:
    * (payload binary, metadata struct). */
  def ingest(df: DataFrame, payloadCol: String, format: String): DataFrame =
    df.withColumn("payload", col(payloadCol).cast(BinaryType))
      .withColumn("meta", struct(
        md5(col("payload")).as("content_id"),
        lit(format).as("format"),
        length(col("payload")).cast(LongType).as("n_bytes")))

  /** STUB decode kernel: 16-bin byte histogram, L1-normalized. A real
    * deployment swaps this body for the codec call (libjpeg/ffmpeg/…);
    * the signature — bytes in, fixed-dim float feature out — is the
    * contract the pipeline tests. */
  def decodeToFeatures(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](featureDim)
    if (payload == null || payload.isEmpty) return hist
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) / featureDim) += 1f
      i += 1
    }
    var j = 0
    while (j < featureDim) { hist(j) /= payload.length; j += 1 }
    hist
  }

  /** STUB frame sampler: every `stride`-th window of `frameBytes` bytes —
    * the shape of video frame extraction (n_frames × frame payload). */
  def sampleFrames(payload: Array[Byte], frameBytes: Int, stride: Int): Seq[Array[Byte]] = {
    if (payload == null || payload.length < frameBytes) return Seq.empty
    (0 until (payload.length - frameBytes + 1) by (frameBytes * stride))
      .map(off => java.util.Arrays.copyOfRange(payload, off, off + frameBytes))
  }

  /** Batch feature extraction over partitions. Per-partition setup happens
    * once (where a codec context would be created), then rows stream
    * through — identical execution shape to `mapInPandas`. */
  def extractFeatures(spark: SparkSession, df: DataFrame): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val payloadIdx = df.schema.fieldIndex("payload")
    val out: Dataset[Row] = df.mapPartitions { rows =>
      // per-partition init (codec context stand-in)
      rows.map { r =>
        val feats = decodeToFeatures(r.getAs[Array[Byte]](payloadIdx))
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(enc)
    out
  }
}
