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

  /** Deterministic two-tone PPM (P6) fixture shared by the decode and
    * resize queries: per doc, a (4+id%5) × (3+id%4) image whose first
    * half of pixels is color A(id) and second half B(id) — every channel
    * value is a closed form of doc_id, so SQL oracles can reproduce the
    * decoded arithmetic exactly. */
  private def ppmPayloads(s: org.apache.spark.sql.SparkSession, d: String) = {
    val docs = Tables.load(s, d, "documents").select(col("doc_id"))
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType))))
    docs.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val w = (4 + id % 5).toInt; val h = (3 + id % 4).toInt
        val n = w * h; val na = n / 2
        val px = new Array[Byte](n * 3)
        var i = 0
        while (i < n) {
          px(3 * i) = (if (i < na) id % 256 else (id * 3) % 256).toByte
          px(3 * i + 1) = (if (i < na) (id * 7) % 256 else (id * 11) % 256).toByte
          px(3 * i + 2) = (if (i < na) (id * 13) % 256 else (id * 17) % 256).toByte
          i += 1
        }
        org.apache.spark.sql.Row(id, Multimodal.encodePpmP6(w, h, px))
      }
    }(enc)
  }

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

    // The REAL decode path: deterministic two-tone PPM (P6) images are
    // synthesized per doc (left half color A(id), right half B(id), w/h
    // varying with id to exercise header parsing), round-tripped through
    // the pure-JVM PPM decoder, and the decoded dimensions + channel sums
    // are oracle-checked against the closed form — encode→decode must
    // reproduce the generator's arithmetic exactly. This retires the
    // "stub kernel" caveat for formats a JVM can decode; the stub remains
    // only for codec-requiring formats (jpeg/ffmpeg absent here).
    QueryDef("mm_features_ppm", Some(
      """WITH m AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
        |    (4 + doc_id % 5) * (3 + doc_id % 4) AS n,
        |    ((4 + doc_id % 5) * (3 + doc_id % 4)) // 2 AS na
        |  FROM documents)
        |SELECT doc_id, w, h, CAST(255 AS BIGINT) AS maxval,
        |  na * (doc_id % 256) + (n - na) * ((doc_id * 3) % 256) AS sum_r,
        |  na * ((doc_id * 7) % 256) + (n - na) * ((doc_id * 11) % 256) AS sum_g,
        |  na * ((doc_id * 13) % 256) + (n - na) * ((doc_id * 17) % 256) AS sum_b
        |FROM m ORDER BY doc_id""".stripMargin)) { (s, d) =>
      val ingested = Multimodal.ingest(ppmPayloads(s, d), "payload", Multimodal.PpmFormat)
      Multimodal.extractFeatures(s, ingested)
        .select(col("doc_id"),
          element_at(col("features"), 1).cast(LongType).as("w"),
          element_at(col("features"), 2).cast(LongType).as("h"),
          element_at(col("features"), 3).cast(LongType).as("maxval"),
          element_at(col("features"), 4).cast(LongType).as("sum_r"),
          element_at(col("features"), 5).cast(LongType).as("sum_g"),
          element_at(col("features"), 6).cast(LongType).as("sum_b"))
        .orderBy(col("doc_id"))
    },

    // The REAL resize path (the thumbnail pass): decode the P6 header,
    // nearest-neighbor downsample to 2×2, emit the resized channel sums.
    // NN sampling picks source pixel (x*w/2, y*h/2) for output (x, y) —
    // the oracle enumerates those four sample positions and reproduces
    // each sampled channel value from the generator's closed form, so
    // the resize KERNEL (index arithmetic included) is what the hash
    // compare certifies. O(4) per image whatever the source size; the
    // payload column never shuffles (per-partition map, then a 3-long
    // projection into the ORDER BY).
    QueryDef("mm_resize_ppm", Some(
      """WITH m AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
        |    ((4 + doc_id % 5) * (3 + doc_id % 4)) // 2 AS na
        |  FROM documents),
        |p AS (SELECT doc_id, na, ((y * h) // 2) * w + ((x * w) // 2) AS idx
        |      FROM m CROSS JOIN (VALUES (0, 0), (0, 1), (1, 0), (1, 1)) t(x, y))
        |SELECT doc_id, CAST(2 AS BIGINT) AS out_w, CAST(2 AS BIGINT) AS out_h,
        |  CAST(sum(CASE WHEN idx < na THEN doc_id % 256 ELSE (doc_id * 3) % 256 END) AS BIGINT) AS sum_r,
        |  CAST(sum(CASE WHEN idx < na THEN (doc_id * 7) % 256 ELSE (doc_id * 11) % 256 END) AS BIGINT) AS sum_g,
        |  CAST(sum(CASE WHEN idx < na THEN (doc_id * 13) % 256 ELSE (doc_id * 17) % 256 END) AS BIGINT) AS sum_b
        |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin)) { (s, d) =>
      val payloads = ppmPayloads(s, d)
      val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
        StructField("doc_id", LongType), StructField("out_w", LongType),
        StructField("out_h", LongType), StructField("sum_r", LongType),
        StructField("sum_g", LongType), StructField("sum_b", LongType))))
      payloads.mapPartitions { rows =>
        rows.flatMap { r =>
          Multimodal.resizePpmNearest(r.getAs[Array[Byte]](1), 2, 2).map { rz =>
            var sr = 0L; var sg = 0L; var sb = 0L
            var i = 0
            while (i < 4) {
              sr += rz(3 * i) & 0xff; sg += rz(3 * i + 1) & 0xff; sb += rz(3 * i + 2) & 0xff
              i += 1
            }
            org.apache.spark.sql.Row(r.getLong(0), 2L, 2L, sr, sg, sb)
          }
        }
      }(enc).orderBy(col("doc_id"))
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
