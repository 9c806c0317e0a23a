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

  /** PPM format tag (the one format this container CAN decode for real —
    * pure JVM, no codec libs). */
  val PpmFormat = "image/x-portable-pixmap"

  /** Minimal PPM (P6) encoder: ASCII header + packed RGB triplets
    * (maxval 255). Real format, real bytes — the fixture generator for
    * the oracle-backed decode query, and a usable writer in its own
    * right. */
  def encodePpmP6(w: Int, h: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == w * h * 3, s"need ${w * h * 3} bytes, got ${pixels.length}")
    s"P6\n$w $h\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ pixels
  }

  /** REAL decode kernel for PPM (P6): parses the whitespace/comment-
    * tolerant header and the packed maxval≤255 RGB raster. Features are
    * integer-valued floats — [w, h, maxval, sumR, sumG, sumB, nPixels,
    * 0…] — so downstream checks are hash-stable with no float math.
    * Malformed payloads decode to the zero vector (a pipeline drops
    * them; it must never crash an executor). */
  /** P6 header parse shared by the feature and resize kernels:
    * Some((w, h, maxval, rasterOffset)) for a well-formed maxval≤255
    * payload with a complete raster, None otherwise. */
  def decodePpmHeader(payload: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (payload == null || payload.length < 2 || payload(0) != 'P' || payload(1) != '6') return None
    var pos = 2
    def nextInt(): Int = {
      while (pos < payload.length &&
          (payload(pos).toChar.isWhitespace || payload(pos) == '#')) {
        if (payload(pos) == '#')
          while (pos < payload.length && payload(pos) != '\n') pos += 1
        else pos += 1
      }
      var v = -1
      while (pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9') {
        v = math.max(v, 0) * 10 + (payload(pos) - '0'); pos += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    pos += 1 // exactly one whitespace byte after maxval, per the P6 spec
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return None
    if (payload.length - pos < w * h * 3) return None
    Some((w, h, maxval, pos))
  }

  def decodePpmP6(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](featureDim)
    decodePpmHeader(payload) match {
      case None => out
      case Some((w, h, maxval, pos)) =>
        val n = w * h
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < n) {
          sr += payload(pos + 3 * i) & 0xff
          sg += payload(pos + 3 * i + 1) & 0xff
          sb += payload(pos + 3 * i + 2) & 0xff
          i += 1
        }
        out(0) = w; out(1) = h; out(2) = maxval
        out(3) = sr; out(4) = sg; out(5) = sb; out(6) = n
        out
    }
  }

  /** REAL nearest-neighbor resize over a decoded P6 payload: output pixel
    * (x, y) samples source (x*w/outW, y*h/outH) — integer floor, the
    * standard NN convention. Returns the resized packed RGB raster, or
    * None for malformed payloads (dropped, never a crash). The kernel is
    * O(outW*outH) per image regardless of source size — the thumbnail
    * pass of an image pipeline. */
  def resizePpmNearest(payload: Array[Byte], outW: Int, outH: Int): Option[Array[Byte]] =
    decodePpmHeader(payload).map { case (w, h, _, pos) =>
      val out = new Array[Byte](outW * outH * 3)
      var y = 0
      while (y < outH) {
        val sy = y * h / outH
        var x = 0
        while (x < outW) {
          val si = pos + (sy * w + x * w / outW) * 3
          val di = (y * outW + x) * 3
          out(di) = payload(si); out(di + 1) = payload(si + 1); out(di + 2) = payload(si + 2)
          x += 1
        }
        y += 1
      }
      out
    }

  /** Format dispatch: a real decoder where pure JVM suffices (PPM); the
    * documented stub histogram for codec-requiring formats. */
  def decode(payload: Array[Byte], format: String): Array[Float] =
    if (format == PpmFormat) decodePpmP6(payload) else decodeToFeatures(payload)

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
    val metaIdx = df.schema.fieldIndex("meta")
    val formatIdx = metaSchema.fieldIndex("format")
    val out: Dataset[Row] = df.mapPartitions { rows =>
      // per-partition init (codec context stand-in); per-row format
      // dispatch picks the real decoder where one exists
      rows.map { r =>
        val fmt = r.getStruct(metaIdx).getString(formatIdx)
        val feats = decode(r.getAs[Array[Byte]](payloadIdx), fmt)
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(enc)
    out
  }
}
