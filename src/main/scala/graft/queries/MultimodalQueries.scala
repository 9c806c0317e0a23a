package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.multimodal.Multimodal
import graft.sources.Tables

/** Multimodal pipeline under the driver gate. The payloads are the
  * documents' text bytes standing in for media blobs (the container has no
  * codecs — see graft.multimodal.Multimodal); metadata and plumbing are
  * real and oracle-checked where SQL-expressible.
  */
object MultimodalQueries {

  val defs: Seq[QueryDef] = Seq(

    // Ingest contract: payload + typed metadata. Metadata is
    // SQL-expressible → full oracle (md5 of the bytes == md5 of the text
    // for our ascii stand-in payloads).
    QueryDef("mm_ingest_meta", Some(
      """SELECT doc_id, md5(text) AS content_id, 'text/plain' AS format,
        |  CAST(length(text) AS BIGINT) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin)) { (s, d) =>
      Multimodal.ingest(Tables.load(s, d, "documents"), "text", "text/plain")
        .select(col("doc_id"), col("meta.content_id").as("content_id"),
          col("meta.format").as("format"), col("meta.n_bytes").as("n_bytes"))
        .orderBy(col("doc_id"))
    },

    // Feature extraction through the per-partition batch kernel; the
    // features feed the same ANN machinery as the embeddings table.
    // Kernel output isn't SQL-expressible → rows-only + MultimodalSpec.
    QueryDef("mm_features", None) { (s, d) =>
      val ingested = Multimodal.ingest(Tables.load(s, d, "documents"), "text", "text/plain")
      Multimodal.extractFeatures(s, ingested)
        .select(col("doc_id"), col("features"))
        .withColumn("top_bin",
          expr("array_position(features, array_max(features))").cast(IntegerType))
        .select(col("doc_id"), col("top_bin"), size(col("features")).as("dim"))
        .orderBy(col("doc_id"))
    },

    // Frame-sampling shape over binary payloads (video stand-in):
    // per-doc frame counts, oracle-checked via the equivalent arithmetic.
    QueryDef("mm_frame_count", Some(
      """SELECT doc_id,
        |  CASE WHEN length(text) < 64 THEN 0
        |       ELSE CAST(floor((length(text) - 64) / 128) + 1 AS BIGINT) END AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin)) { (s, d) =>
      val frameBytes = 64
      val stride = 2 // stride * frameBytes = 128-byte hop
      val ingested = Multimodal.ingest(Tables.load(s, d, "documents"), "text", "text/plain")
      val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
        StructField("doc_id", LongType), StructField("n_frames", LongType))))
      val idIdx = ingested.schema.fieldIndex("doc_id")
      val pIdx = ingested.schema.fieldIndex("payload")
      ingested.mapPartitions { rows =>
        rows.map { r =>
          val frames = Multimodal.sampleFrames(r.getAs[Array[Byte]](pIdx), frameBytes, stride)
          org.apache.spark.sql.Row(r.getLong(idIdx), frames.size.toLong)
        }
      }(enc).orderBy(col("doc_id"))
    }
  )
}
