package graft.queries

import org.apache.spark.sql.expressions.Window
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

  /** doc_id scan spread across the executor slots: the fixture parquet is
    * a single row group → ONE scan partition, which ran every
    * per-partition codec pass (PPM/PNG/GIF/AVI/VP8L encode+decode) as a
    * single task — profiling showed these queries serial on one core.
    * The spread is GUARDED ([[graft.operators.Spread]]): it fires only
    * when the scan is actually narrower than the session's parallelism,
    * so a corpus-scale input that is already thousands of splits wide
    * never pays the exchange at all. */
  private def docIds(s: org.apache.spark.sql.SparkSession, d: String,
      spread: Boolean = true) = {
    val ids = Tables.load(s, d, "documents").select(col("doc_id"))
    // A/B-measured per consumer: the heavy codecs (VP8L, MJPEG, GIF, PNG,
    // pHash) win 1.5-9x from the spread; the sub-second paths (PPM, WAV,
    // raw AVI frame walks) lose to the extra stage + per-task overhead,
    // so they keep the single-partition scan.
    if (spread) graft.operators.Spread.toCores(ids) else ids
  }

  /** Deterministic two-tone PPM (P6) fixture shared by the decode and
    * resize queries: per doc, a (4+id%5) × (3+id%4) image whose first
    * half of pixels is color A(id) and second half B(id) — every channel
    * value is a closed form of doc_id, so SQL oracles can reproduce the
    * decoded arithmetic exactly. */
  private def ppmPayloads(s: org.apache.spark.sql.SparkSession, d: String) = {
    val docs = docIds(s, d, spread = false)
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

  /** The PPM fixture's PNG twin: identical closed-form two-tone raster,
    * encoded through the JDK's ImageIO PNG codec instead of a hand-rolled
    * header. PNG is lossless, so the decode query's oracle is the same
    * closed form — what the hash compare certifies is a REAL codec
    * round-trip (zlib deflate → inflate → pixel access), not string
    * plumbing. */
  private def pngPayloads(s: org.apache.spark.sql.SparkSession, d: String) = {
    val docs = docIds(s, d)
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
        org.apache.spark.sql.Row(id, Multimodal.encodePng(w, h, px))
      }
    }(enc)
  }

  /** Perceptual-hash fixture: families of 4 consecutive doc_ids share one
    * grayscale two-tone base image (dims and tone pattern derived from the
    * family id, tones 40/200, r=g=b so the decoded luma (r+2g+b)/4 is
    * exact); variants v=1..3 flip exactly ONE pixel's tone each, at
    * family-derived positions. So within a family every pair is Hamming
    * ≤ 2 on the average-hash while cross-family hashes differ in ~half
    * their bits — the planted near-dup structure the banded join must
    * recover, and every byte is a closed form of doc_id the SQL oracle
    * reproduces. */
  private def phashPayloads(s: org.apache.spark.sql.SparkSession, d: String) = {
    val docs = docIds(s, d)
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType))))
    docs.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val fam = id - id % 4
        val v = (id % 4).toInt
        val w = (4 + (fam / 4) % 5).toInt; val h = (3 + (fam / 4) % 4).toInt
        val n = w * h
        val flipPos = if (v > 0) (((fam / 4) * 3 + v * 7) % n).toInt else -1
        val px = new Array[Byte](n * 3)
        var i = 0
        while (i < n) {
          val t0 = ((fam * 1000003L + i * 40503L) >> 7) & 1L
          val bit = if (i == flipPos) 1L - t0 else t0
          val g = (40 + 160 * bit).toByte
          px(3 * i) = g; px(3 * i + 1) = g; px(3 * i + 2) = g
          i += 1
        }
        org.apache.spark.sql.Row(id, Multimodal.encodePpmP6(w, h, px))
      }
    }(enc)
  }

  /** Deterministic PCM fixture for the audio decode query: per doc, a
    * mono s16le WAV of (8 + id%33) samples at (8000 + (id%4)*4000) Hz
    * with s_i = ((id*31 + i*17) mod 2048) - 1024 — every sample is a
    * closed form of (doc_id, i), so the oracle reproduces the decoded
    * feature arithmetic exactly. */
  private def wavPayloads(s: org.apache.spark.sql.SparkSession, d: String) = {
    val docs = docIds(s, d, spread = false)
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType))))
    docs.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val n = (8 + id % 33).toInt
        val rate = (8000 + (id % 4) * 4000).toInt
        val samples = Array.tabulate[Short](n)(i =>
          ((id * 31 + i * 17) % 2048 - 1024).toShort)
        org.apache.spark.sql.Row(id, Multimodal.encodeWavPcm16(rate, samples))
      }
    }(enc)
  }

  val defs: Seq[QueryDef] = Seq(

    // The REAL audio decode path — the WAV twin of mm_features_ppm:
    // deterministic mono PCM s16le WAVs are synthesized per doc (RIFF
    // container, closed-form samples), round-tripped through the
    // pure-JVM RIFF/PCM parser, and the decoded rate/count/sum/peak/
    // zero-crossing features are oracle-checked against the generator's
    // arithmetic — encode→parse→feature must reproduce it exactly, all
    // integer math. With PPM (image) and WAV (audio) both real, the
    // stub kernel remains only for formats that need native codecs.
    QueryDef("mm_audio_wav", Some(
      """WITH m AS (SELECT doc_id, 8 + doc_id % 33 AS n,
        |    8000 + (doc_id % 4) * 4000 AS rate
        |  FROM documents),
        |s AS (SELECT doc_id, n, rate, unnest(range(0, n)) AS i FROM m),
        |v AS (SELECT doc_id, n, rate, i,
        |    (doc_id * 31 + i * 17) % 2048 - 1024 AS sv FROM s),
        |w AS (SELECT *, lag(sv) OVER (PARTITION BY doc_id ORDER BY i) AS prev FROM v)
        |SELECT doc_id, any_value(rate) AS sample_rate,
        |  CAST(1 AS BIGINT) AS channels, any_value(n) AS n_samples,
        |  CAST(sum(sv) AS BIGINT) AS sum_s, CAST(max(abs(sv)) AS BIGINT) AS max_abs,
        |  CAST(sum(CASE WHEN prev IS NOT NULL AND (sv < 0) <> (prev < 0)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS zero_x
        |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin)) { (s, d) =>
      val ingested = Multimodal.ingest(wavPayloads(s, d), "payload", Multimodal.WavFormat)
      Multimodal.extractFeatures(s, ingested)
        .select(col("doc_id"),
          element_at(col("features"), 1).cast(LongType).as("sample_rate"),
          element_at(col("features"), 2).cast(LongType).as("channels"),
          element_at(col("features"), 3).cast(LongType).as("n_samples"),
          element_at(col("features"), 4).cast(LongType).as("sum_s"),
          element_at(col("features"), 5).cast(LongType).as("max_abs"),
          element_at(col("features"), 6).cast(LongType).as("zero_x"))
        .orderBy(col("doc_id"))
    },

    // Energy-based voice-activity segmentation — the audio twin of
    // sessionize: decode the SAME synthesized WAVs through the real RIFF
    // parser to the raw sample stream, frame them (8 samples/frame), mark
    // frames active when integer energy Σs² ≥ 2.8M (the uniform-noise
    // mean 2048²/12 ≈ 350k per sample), and merge consecutive active
    // frames into segments with the gaps-and-islands window. All integer
    // math end to end, so the oracle recomputes every segment from the
    // fixture's closed form. Scale: one bounded explode (|samples| per
    // payload), frame energies map-side combined, the island window runs
    // per-doc over |frames| rows — never per-sample — and the final
    // aggregate is per-segment.
    QueryDef("mm_audio_vad", Some(
      """WITH m AS (SELECT doc_id, 8 + doc_id % 33 AS n FROM documents),
        |s AS (SELECT doc_id, unnest(range(0, n)) AS i FROM m),
        |v AS (SELECT doc_id, i, (doc_id * 31 + i * 17) % 2048 - 1024 AS sv FROM s),
        |f AS (SELECT doc_id, i // 8 AS frame, CAST(sum(sv * sv) AS BIGINT) AS e
        |      FROM v GROUP BY 1, 2),
        |a AS (SELECT doc_id, frame, e,
        |      CASE WHEN e >= 2800000 THEN 1 ELSE 0 END AS act FROM f),
        |g AS (SELECT *, CASE WHEN act = 1 AND COALESCE(lag(act) OVER w, 0) = 0
        |      THEN 1 ELSE 0 END AS new_seg
        |      FROM a WINDOW w AS (PARTITION BY doc_id ORDER BY frame)),
        |sg AS (SELECT *, sum(new_seg) OVER (PARTITION BY doc_id ORDER BY frame
        |       ROWS UNBOUNDED PRECEDING) AS seg FROM g)
        |SELECT doc_id, CAST(seg AS BIGINT) AS seg_id,
        |  CAST(min(frame) AS BIGINT) AS start_frame,
        |  CAST(count(*) AS BIGINT) AS n_frames,
        |  CAST(sum(e) AS BIGINT) AS seg_energy
        |FROM sg WHERE act = 1 GROUP BY doc_id, seg
        |ORDER BY doc_id, seg_id""".stripMargin)) { (s, d) =>
      val decoded = Multimodal.decodeWavSamples(
        Multimodal.ingest(wavPayloads(s, d), "payload", Multimodal.WavFormat),
        "doc_id")
      val frames = decoded
        .select(col("doc_id"), posexplode(col("samples")).as(Seq("i", "sv")))
        .groupBy(col("doc_id"), expr("CAST(i div 8 AS BIGINT)").as("frame"))
        .agg(sum(col("sv") * col("sv")).as("e"))
        .withColumn("act", when(col("e") >= 2800000L, 1).otherwise(0))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("frame"))
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      frames
        .withColumn("new_seg",
          when(col("act") === 1 && coalesce(lag(col("act"), 1).over(w), lit(0)) === 0, 1)
            .otherwise(0))
        .withColumn("seg", sum(col("new_seg")).over(cum))
        .filter(col("act") === 1)
        .groupBy(col("doc_id"), col("seg"))
        .agg(min(col("frame")).as("start_frame"),
          count(lit(1)).as("n_frames"),
          sum(col("e")).as("seg_energy"))
        .select(col("doc_id"), col("seg").cast(LongType).as("seg_id"),
          col("start_frame"), col("n_frames"), col("seg_energy"))
        .orderBy(col("doc_id"), col("seg_id"))
    },

    // Spatial TILING — the patch operator of a vision pipeline: each
    // decoded image splits into 2×2 quadrants (tile = (2y div h)·2 +
    // (2x div w), pure integer so odd dims split deterministically) and
    // per (doc, tile) the pixel count and integer luma sum/min/max come
    // out. The REAL P6 decode feeds it through the same raster seam as
    // the pHash query; the oracle recomputes every pixel from the
    // fixture's closed form, so the tile aggregates are hash-exact.
    // Scale: one bounded explode (n = w·h pixels per payload), the tile
    // aggregate map-side combines to 4 rows per doc, no shuffle beyond
    // the final (doc, tile) hash.
    QueryDef("mm_tile_stats", Some(
      """WITH m AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
        |    (4 + doc_id % 5) * (3 + doc_id % 4) AS n,
        |    ((4 + doc_id % 5) * (3 + doc_id % 4)) // 2 AS na
        |  FROM documents),
        |px AS (SELECT doc_id, w, h, na, unnest(range(0, n)) AS i FROM m),
        |g AS (SELECT doc_id, w, h, i, i % w AS x, i // w AS y,
        |    CASE WHEN i < na
        |      THEN (doc_id % 256 + 2 * ((doc_id * 7) % 256) + (doc_id * 13) % 256) // 4
        |      ELSE ((doc_id * 3) % 256 + 2 * ((doc_id * 11) % 256) + (doc_id * 17) % 256) // 4
        |    END AS luma
        |  FROM px),
        |t AS (SELECT doc_id, (2 * y) // h * 2 + (2 * x) // w AS tile, luma FROM g)
        |SELECT doc_id, CAST(tile AS INT) AS tile,
        |  count(*) AS n_px, CAST(sum(luma) AS BIGINT) AS luma_sum,
        |  CAST(min(luma) AS BIGINT) AS luma_min, CAST(max(luma) AS BIGINT) AS luma_max
        |FROM t GROUP BY doc_id, tile
        |ORDER BY doc_id, tile""".stripMargin)) { (s, d) =>
      val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
        StructField("doc_id", LongType), StructField("w", IntegerType),
        StructField("h", IntegerType),
        StructField("px", ArrayType(IntegerType, containsNull = false)))))
      val decoded = ppmPayloads(s, d).mapPartitions { rows =>
        rows.flatMap { r =>
          Multimodal.decodePpmLuma(r.getAs[Array[Byte]](1)).map { case (w, h, g) =>
            org.apache.spark.sql.Row(r.getLong(0), w, h, g.toSeq)
          }
        }
      }(enc)
      decoded
        .select(col("doc_id"), col("w"), col("h"),
          posexplode(col("px")).as(Seq("i", "luma")))
        .withColumn("tile",
          expr("CAST((2 * (i div w)) div h * 2 + (2 * (i % w)) div w AS INT)"))
        .groupBy(col("doc_id"), col("tile"))
        .agg(count(lit(1)).as("n_px"),
          sum(col("luma")).as("luma_sum"),
          min(col("luma")).cast(LongType).as("luma_min"),
          max(col("luma")).cast(LongType).as("luma_max"))
        .orderBy(col("doc_id"), col("tile"))
    },

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

    // The JDK-codec decode path: the same two-tone fixture as
    // mm_features_ppm, but written as REAL PNG bytes (BufferedImage →
    // ImageIO zlib-deflate encode) and decoded back through
    // javax.imageio's pure-Java PNG codec. Lossless format → the decoded
    // dimensions + channel sums hash-match the same closed form, so the
    // certificate covers a full compressed-codec round trip. This retires
    // the "stub kernel for anything non-PPM" caveat: PNG/JPEG/BMP/GIF all
    // dispatch to ImageIO now; the stub remains only for formats needing
    // native libs (video, webp, …).
    QueryDef("mm_features_png", Some(
      """WITH m AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
        |    (4 + doc_id % 5) * (3 + doc_id % 4) AS n,
        |    ((4 + doc_id % 5) * (3 + doc_id % 4)) // 2 AS na
        |  FROM documents)
        |SELECT doc_id, w, h, CAST(255 AS BIGINT) AS maxval,
        |  na * (doc_id % 256) + (n - na) * ((doc_id * 3) % 256) AS sum_r,
        |  na * ((doc_id * 7) % 256) + (n - na) * ((doc_id * 11) % 256) AS sum_g,
        |  na * ((doc_id * 13) % 256) + (n - na) * ((doc_id * 17) % 256) AS sum_b
        |FROM m ORDER BY doc_id""".stripMargin)) { (s, d) =>
      val ingested = Multimodal.ingest(pngPayloads(s, d), "payload", Multimodal.PngFormat)
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

    // The COMPRESSED-codec thumbnail pipeline: decode real PNG bytes
    // through javax.imageio, nearest-neighbor downsample to 2×2, emit the
    // resized channel sums. Identical index arithmetic (and so identical
    // oracle SQL) to mm_resize_ppm — what this adds is the full
    // decode→transform composition over an actual deflate-compressed
    // format, the real thumbnail pass a multimodal ingest runs.
    QueryDef("mm_resize_png", Some(
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
      val payloads = pngPayloads(s, d)
      val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
        StructField("doc_id", LongType), StructField("out_w", LongType),
        StructField("out_h", LongType), StructField("sum_r", LongType),
        StructField("sum_g", LongType), StructField("sum_b", LongType))))
      payloads.mapPartitions { rows =>
        rows.flatMap { r =>
          Multimodal.resizeImageNearest(r.getAs[Array[Byte]](1), 2, 2).map { rz =>
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

    // The REAL multi-frame decode path — animated GIF through ImageIO's
    // pure-JVM reader (getNumImages(true)/read(i)): per doc, an
    // nf-frame (2 + id%3) w×h GIF whose frame f is the solid gray
    // (3·id + 7·f) mod 256, encoded TYPE_BYTE_INDEXED over an explicit
    // 256-gray palette (lossless — the palette IS the value space) and
    // decoded back frame by frame. Frame count, dimensions and per-frame
    // channel sums are oracle-checked against the closed form, so the
    // certificate covers a true multi-frame container round trip — the
    // mm_features_png playbook applied to FRAMES. This narrows the stub
    // frame sampler's scope to formats needing native codecs (video,
    // webp). Scale shape: per-partition decode map, payloads never
    // shuffle; the ORDER BY is oracle determinism only.
    QueryDef("mm_frames_gif", Some(
      """WITH m AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
        |    2 + doc_id % 3 AS nf
        |  FROM documents),
        |f AS (SELECT doc_id, w, h, nf, unnest(range(0, nf)) AS fi FROM m)
        |SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
        |  CAST(nf AS BIGINT) AS n_frames,
        |  CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
        |  CAST(w * h * ((doc_id * 3 + fi * 7) % 256) AS BIGINT) AS sum_gray
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin)) { (s, d) =>
      val docsDf = docIds(s, d)
      val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
        StructField("doc_id", LongType), StructField("frame_idx", LongType),
        StructField("n_frames", LongType), StructField("w", LongType),
        StructField("h", LongType), StructField("sum_gray", LongType))))
      docsDf.mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val w = (4 + id % 5).toInt; val h = (3 + id % 4).toInt
          val nf = (2 + id % 3).toInt
          val frames = (0 until nf).map { fi =>
            Array.fill[Byte](w * h)(((id * 3 + fi * 7) % 256).toByte)
          }
          val gif = Multimodal.encodeGifFrames(w, h, frames)
          val decoded = Multimodal.decodeGifFrames(gif)
          decoded.map { f =>
            // gray palette: r = g = b, so sum_gray is any one channel
            org.apache.spark.sql.Row(id, f(0), decoded.size.toLong, f(1), f(2), f(3))
          }
        }
      }(enc).orderBy(col("doc_id"), col("frame_idx"))
    },

    // REAL VIDEO — the round-14 inventory's one documented stub closed
    // for the container format a JVM can honestly own: synthesized gray
    // frames round-trip through a REAL AVI (RIFF avih/strh/strf headers,
    // movi '00db' uncompressed bottom-up BGR24 DIB chunks, idx1 — any
    // player opens the bytes) and are decoded back by the pure-JVM RIFF
    // walk. Raw DIB is byte-deterministic, so frame count, dims and
    // per-frame channel sums are ORACLE-exact against the fixture's
    // closed form — the mm_frames_gif certificate applied to VIDEO.
    // Inter-frame codecs (H.264/VP9/webp) still need native libraries
    // and remain the documented out-of-scope. Scale shape: per-partition
    // decode map, payloads never shuffle; ORDER BY is oracle determinism.
    QueryDef("mm_video_frames", Some(
      """WITH m AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
        |    2 + doc_id % 3 AS nf
        |  FROM documents),
        |f AS (SELECT doc_id, w, h, nf, unnest(range(0, nf)) AS fi FROM m)
        |SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
        |  CAST(nf AS BIGINT) AS n_frames,
        |  CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
        |  CAST(w * h * ((doc_id * 5 + fi * 11) % 256) AS BIGINT) AS sum_gray
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin)) { (s, d) =>
      val docsDf = docIds(s, d, spread = false)
      val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
        StructField("doc_id", LongType), StructField("frame_idx", LongType),
        StructField("n_frames", LongType), StructField("w", LongType),
        StructField("h", LongType), StructField("sum_gray", LongType))))
      docsDf.mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val w = (4 + id % 5).toInt; val h = (3 + id % 4).toInt
          val nf = (2 + id % 3).toInt
          val frames = (0 until nf).map { fi =>
            Array.fill[Byte](w * h)(((id * 5 + fi * 11) % 256).toByte)
          }
          val avi = Multimodal.encodeAviGray(w, h, frames)
          val decoded = Multimodal.decodeAviFrames(avi)
          decoded.map { f =>
            // gray frames: r = g = b, so sum_gray is any one channel
            org.apache.spark.sql.Row(id, f(0), decoded.size.toLong, f(1), f(2), f(3))
          }
        }
      }(enc).orderBy(col("doc_id"), col("frame_idx"))
    },

    // Video frame SAMPLING on the real container: decode every 2nd frame
    // of the AVI, SKIPPING the others without decoding them (DIB/MJPEG
    // frames are independently decodable; the RIFF chunk walk is
    // O(bytes), the decode is the cost — sampling 1-in-k pays 1/k of
    // the decode, the claim a video preprocessing pipeline relies on).
    // Oracle: the same closed form restricted to even frame indices.
    QueryDef("mm_video_sample", Some(
      """WITH m AS (SELECT doc_id, 4 + doc_id % 3 AS w, 3 + doc_id % 3 AS h,
        |    4 + doc_id % 5 AS nf
        |  FROM documents),
        |f AS (SELECT doc_id, w, h, nf, unnest(range(0, nf)) AS fi FROM m)
        |SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
        |  CAST(w * h * ((doc_id * 7 + fi * 13) % 256) AS BIGINT) AS sum_gray
        |FROM f WHERE fi % 2 = 0 ORDER BY doc_id, frame_idx""".stripMargin)) { (s, d) =>
      val docsDf = docIds(s, d, spread = false)
      val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
        StructField("doc_id", LongType), StructField("frame_idx", LongType),
        StructField("sum_gray", LongType))))
      docsDf.mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val w = (4 + id % 3).toInt; val h = (3 + id % 3).toInt
          val nf = (4 + id % 5).toInt
          val frames = (0 until nf).map { fi =>
            Array.fill[Byte](w * h)(((id * 7 + fi * 13) % 256).toByte)
          }
          val avi = Multimodal.encodeAviGray(w, h, frames)
          Multimodal.decodeAviFrames(avi, stride = 2).map { f =>
            org.apache.spark.sql.Row(id, f(0), f(3))
          }
        }
      }(enc).orderBy(col("doc_id"), col("frame_idx"))
    },

    // MJPEG — the real LOSSY video path: one JDK-encoded JPEG per movi
    // chunk ('00dc', fourcc MJPG), decoded back through the same RIFF
    // walk + JPEG codec. DCT quantization makes pixel sums non-oracle;
    // the machine gates hold instead: frame count and dims EXACT, and
    // each constant-gray frame's mean within JPEG DC-quantization of
    // the source (GateCheck: max |mean - source| <= 2 gray levels).
    QueryDef("mm_video_mjpeg", None) { (s, d) =>
      val docsDf = docIds(s, d)
      val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
        StructField("doc_id", LongType), StructField("n_frames", LongType),
        StructField("nf_expected", LongType), StructField("w", LongType),
        StructField("h", LongType), StructField("max_mean_dev", LongType))))
      docsDf.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val w = (8 + id % 5).toInt; val h = (8 + id % 4).toInt
          val nf = (2 + id % 3).toInt
          def gray(fi: Int): Int = ((id * 5 + fi * 11) % 256).toInt
          val frames = (0 until nf).map(fi =>
            Array.fill[Byte](w * h)(gray(fi).toByte))
          val avi = Multimodal.encodeAviGray(w, h, frames, mjpeg = true)
          val decoded = Multimodal.decodeAviFrames(avi)
          val dev = decoded.map { f =>
            val mean = (f(3) + f(4) + f(5)) / (3L * f(1) * f(2))
            math.abs(mean - gray(f(0).toInt))
          }
          org.apache.spark.sql.Row(id, decoded.size.toLong, nf.toLong,
            decoded.headOption.map(_(1)).getOrElse(0L),
            decoded.headOption.map(_(2)).getOrElse(0L),
            if (dev.isEmpty) Long.MaxValue else dev.max)
        }
      }(enc).orderBy(col("doc_id"))
    },

    // REAL WEBP (VP8L lossless) — the webp half of the round-14 stub
    // closed for the LOSSLESS coding: per-doc synthetic ARGB images
    // (>256 distinct colors → the SUBTRACT_GREEN + canonical-prefix-code
    // path, constant head rows → distance-1 run LZ77) round-trip through
    // a real RIFF/WEBP/VP8L container (graft.multimodal.Vp8l) and are
    // decoded back by the pure-JVM bitstream walk. Losslessness makes
    // the per-channel sums ORACLE-exact against the closed form. Lossy
    // webp (VP8) stays with H.264/VP9 in the native-codec out-of-scope.
    // Scale shape: per-partition codec map, payloads never shuffle.
    QueryDef("mm_webp_roundtrip", Some(
      """WITH m AS (SELECT doc_id, 24 + doc_id % 5 AS w, 14 + doc_id % 3 AS h
        |  FROM documents),
        |fx AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM m),
        |px AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM fx),
        |v AS (SELECT doc_id, w, h,
        |    CASE WHEN y < 2 THEN doc_id % 200
        |         ELSE (y * w + x + doc_id) % 256 END AS r,
        |    CASE WHEN y < 2 THEN doc_id % 200
        |         ELSE (((y * w + x) // 256) * 97 + doc_id) % 256 END AS g,
        |    CASE WHEN y < 2 THEN doc_id % 200
        |         ELSE ((y * w + x) * 13 + doc_id) % 256 END AS b
        |  FROM px)
        |SELECT doc_id, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
        |  CAST(SUM(r) AS BIGINT) AS sum_r, CAST(SUM(g) AS BIGINT) AS sum_g,
        |  CAST(SUM(b) AS BIGINT) AS sum_b,
        |  CAST(255 * w * h AS BIGINT) AS sum_a
        |FROM v GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin)) { (s, d) =>
      val docsDf = docIds(s, d)
      val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
        StructField("doc_id", LongType), StructField("w", LongType),
        StructField("h", LongType), StructField("sum_r", LongType),
        StructField("sum_g", LongType), StructField("sum_b", LongType),
        StructField("sum_a", LongType))))
      docsDf.mapPartitions { rows =>
        rows.map { row =>
          val id = row.getLong(0)
          val w = (24 + id % 5).toInt; val h = (14 + id % 3).toInt
          val argb = Array.tabulate(w * h) { i =>
            val y = i / w
            if (y < 2) {
              val c = (id % 200).toInt
              0xff000000 | (c << 16) | (c << 8) | c
            } else {
              val r = ((i + id) % 256).toInt
              val g = (((i / 256) * 97 + id) % 256).toInt
              val b = ((i * 13 + id) % 256).toInt
              0xff000000 | (r << 16) | (g << 8) | b
            }
          }
          val decoded = graft.multimodal.Vp8l
            .decode(graft.multimodal.Vp8l.encode(w, h, argb))
            .map(_._3).getOrElse(Array.empty[Int])
          var sr = 0L; var sg = 0L; var sb = 0L; var sa = 0L
          decoded.foreach { p =>
            sr += (p >>> 16) & 0xff; sg += (p >>> 8) & 0xff
            sb += p & 0xff; sa += (p >>> 24) & 0xff
          }
          org.apache.spark.sql.Row(id, w.toLong, h.toLong, sr, sg, sb, sa)
        }
      }(enc).orderBy(col("doc_id"))
    },

    // WEBP palette path: 4-color images run the COLOR_INDEXING transform
    // with 2-bit pixel bundling (4 indices per byte, odd widths exercise
    // the trailing partial bundle). Oracle-exact per-channel sums.
    QueryDef("mm_webp_palette", Some(
      """WITH m AS (SELECT doc_id, 9 + doc_id % 4 AS w, 6 + doc_id % 3 AS h
        |  FROM documents),
        |fx AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM m),
        |px AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM fx),
        |v AS (SELECT doc_id, w, h, (x + y + doc_id) % 4 AS k FROM px)
        |SELECT doc_id, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
        |  CAST(SUM(CASE k WHEN 0 THEN 16 WHEN 1 THEN 200 WHEN 2 THEN 5
        |    ELSE 99 END) AS BIGINT) AS sum_r,
        |  CAST(SUM(CASE k WHEN 0 THEN 32 WHEN 1 THEN 100 WHEN 2 THEN 250
        |    ELSE 66 END) AS BIGINT) AS sum_g,
        |  CAST(SUM(CASE k WHEN 0 THEN 48 WHEN 1 THEN 50 WHEN 2 THEN 125
        |    ELSE 33 END) AS BIGINT) AS sum_b,
        |  CAST(SUM(CASE k WHEN 3 THEN 128 ELSE 255 END) AS BIGINT) AS sum_a
        |FROM v GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin)) { (s, d) =>
      val docsDf = docIds(s, d)
      val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
        StructField("doc_id", LongType), StructField("w", LongType),
        StructField("h", LongType), StructField("sum_r", LongType),
        StructField("sum_g", LongType), StructField("sum_b", LongType),
        StructField("sum_a", LongType))))
      val pal = Array(0xff102030, 0xffc86432, 0xff05fa7d, 0x80634221)
      docsDf.mapPartitions { rows =>
        rows.map { row =>
          val id = row.getLong(0)
          val w = (9 + id % 4).toInt; val h = (6 + id % 3).toInt
          val argb = Array.tabulate(w * h) { i =>
            pal(((i % w + i / w + id) % 4).toInt)
          }
          val decoded = graft.multimodal.Vp8l
            .decode(graft.multimodal.Vp8l.encode(w, h, argb))
            .map(_._3).getOrElse(Array.empty[Int])
          var sr = 0L; var sg = 0L; var sb = 0L; var sa = 0L
          decoded.foreach { p =>
            sr += (p >>> 16) & 0xff; sg += (p >>> 8) & 0xff
            sb += p & 0xff; sa += (p >>> 24) & 0xff
          }
          org.apache.spark.sql.Row(id, w.toLong, h.toLong, sr, sg, sb, sa)
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
    },

    // Frame-sample CONTENT check — the other half of the video stand-in:
    // mm_frame_count proves how many frames the sampler picks,
    // this proves it picks the right BYTES. Every sampled 64-byte frame
    // (stride 128) explodes to a row with its byte sum; the oracle
    // recomputes the identical sum from codepoint arithmetic over the
    // same substring (fixture text is ASCII, so byte == codepoint).
    // Row-local flatMap — zero shuffles, the ORDER BY is oracle
    // determinism; at 100 TB this is the per-file frame-extraction map
    // of a video preprocessing pipeline with the decoder swapped in for
    // the byte-slicer.
    QueryDef("mm_frame_sample", Some(
      """WITH f AS (SELECT doc_id, text,
        |    CASE WHEN length(text) < 64 THEN 0
        |         ELSE CAST(floor((length(text) - 64) / 128) + 1 AS BIGINT) END AS nf
        |  FROM documents),
        |e AS (SELECT doc_id, text, unnest(range(0, nf)) AS fi FROM f)
        |SELECT doc_id, fi AS frame_idx,
        |  CAST(list_sum(list_transform(range(1, 65),
        |    j -> ord(substr(text, CAST(fi * 128 AS BIGINT) + j, 1)))) AS BIGINT) AS frame_sum
        |FROM e ORDER BY doc_id, frame_idx""".stripMargin)) { (s, d) =>
      val frameBytes = 64
      val stride = 2
      val ingested = Multimodal.ingest(Tables.load(s, d, "documents"), "text", "text/plain")
      val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
        StructField("doc_id", LongType), StructField("frame_idx", LongType),
        StructField("frame_sum", LongType))))
      val idIdx = ingested.schema.fieldIndex("doc_id")
      val pIdx = ingested.schema.fieldIndex("payload")
      ingested.mapPartitions { rows =>
        rows.flatMap { r =>
          val frames = Multimodal.sampleFrames(r.getAs[Array[Byte]](pIdx), frameBytes, stride)
          frames.iterator.zipWithIndex.map { case (f, i) =>
            org.apache.spark.sql.Row(r.getLong(idIdx), i.toLong,
              f.foldLeft(0L)((acc, b) => acc + (b & 0xFF)))
          }
        }
      }(enc).orderBy(col("doc_id"), col("frame_idx"))
    },

    // PERCEPTUAL-HASH IMAGE NEAR-DUP — the image twin of dd_minhash_lsh,
    // oracle-exact end to end: synthesized PPMs go through the REAL
    // encode→decode round trip (header parse + raster walk), the decoded
    // luma raster folds into an average-hash (bit i = luma_i·n > Σluma,
    // a cross-multiplication — no float, no mean rounding; MSB-first
    // fold, acc·2+bit), the 64-bit-at-most hash splits into 3 disjoint
    // bands of ⌈n/3⌉ bits, candidates pair on (dims, band, value) — the
    // pigeonhole guarantee: Hamming ≤ 2 leaves ≥1 band untouched — and
    // survivors pass an exact bit_count(xor) ≤ 2 filter. The DuckDB
    // oracle recomputes hashes from the fixture's closed form and runs
    // the SAME band join, so membership AND distances hash-match; what
    // the Spark side certifies is that the real codec round trip feeds
    // them. Scale: per-doc decode is the documented imperative seam;
    // everything after is codegen (HOF aggregate, 3-row explode, equi
    // hash join on band keys); no quadratic pass anywhere — the classic
    // pHash-dedup shape for an image corpus.
    QueryDef("mm_phash_neardup", Some(
      s"""WITH $phashPairCte
        |SELECT doc_a, doc_b,
        |  CAST(bit_count(xor(hash_a, hash_b)) AS BIGINT) AS hamming
        |FROM c WHERE bit_count(xor(hash_a, hash_b)) <= 2
        |ORDER BY doc_a, doc_b""".stripMargin)) { (s, d) =>
      phashPairs(s, d).orderBy(col("doc_a"), col("doc_b"))
    },

    // Image DUP CLUSTERS: the pHash pair graph closed into connected
    // components — dd_dup_clusters' treatment applied to the multimodal
    // family, so an image corpus gets the same cluster/canonicalize
    // machinery text gets. The pair source is the SHARED phashPairs
    // helper (cluster and pair queries cannot drift); clustering
    // delegates to the shared ConnectedComponents operator (driver
    // union-find below the conf cap, distributed min-label /
    // alternating-stars above it). The oracle closes the same pair
    // graph with a recursive transitive-closure CTE and labels each
    // node with its min reachable id — exactly the CC contract.
    QueryDef("mm_phash_clusters", Some(
      s"""WITH RECURSIVE $phashPairCte,
        |p AS (SELECT doc_a, doc_b FROM c
        |      WHERE bit_count(xor(hash_a, hash_b)) <= 2),
        |eg AS (SELECT doc_a AS a, doc_b AS b FROM p
        |       UNION SELECT doc_b, doc_a FROM p),
        |reach(a, b) AS (SELECT a, b FROM eg
        |  UNION SELECT r.a, eg.b FROM reach r JOIN eg ON r.b = eg.a),
        |lab AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
        |        FROM reach GROUP BY a)
        |SELECT doc_id, cluster_id FROM lab ORDER BY doc_id""".stripMargin)) { (s, d) =>
      graft.operators.ConnectedComponents
        .components(phashPairs(s, d).select(col("doc_a"), col("doc_b")))
        .select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
        .orderBy(col("doc_id"))
    }
  )

  /** Oracle CTE body shared by the pHash pair and cluster queries: the
    * closed-form hash recomputation, 3-band split and banded equi-join —
    * ends at `c` = candidate pairs with both hashes. (Lazy: referenced
    * from `defs`, which initializes first.) */
  private lazy val phashPairCte: String =
      """m AS (SELECT doc_id, doc_id - doc_id % 4 AS fam, doc_id % 4 AS v
        |           FROM documents),
        |d AS (SELECT doc_id, fam, v,
        |    4 + (fam // 4) % 5 AS w, 3 + (fam // 4) % 4 AS h,
        |    (4 + (fam // 4) % 5) * (3 + (fam // 4) % 4) AS n FROM m),
        |px AS (SELECT doc_id, w, h, n, fam, v, unnest(range(0, n)) AS i FROM d),
        |g AS (SELECT doc_id, w, h, n, i,
        |    40 + 160 * (((((fam * 1000003 + i * 40503) >> 7) & 1)
        |      + CASE WHEN v > 0 AND i = ((fam // 4) * 3 + v * 7) % n
        |             THEN 1 ELSE 0 END) % 2) AS gray
        |  FROM px),
        |sgs AS (SELECT doc_id, w, h, n, i, gray,
        |    sum(gray) OVER (PARTITION BY doc_id) AS gsum FROM g),
        |hs AS (SELECT doc_id, any_value(w) AS w, any_value(h) AS h,
        |    any_value(n) AS n,
        |    CAST(sum(CASE WHEN gray * n > gsum
        |         THEN CAST(1 AS BIGINT) << CAST(n - 1 - i AS INT)
        |         ELSE 0 END) AS BIGINT) AS hash
        |  FROM sgs GROUP BY doc_id),
        |e AS (SELECT doc_id, w, h, hash,
        |    bb, (hash >> CAST(bb * ((n + 2) // 3) AS INT))
        |      & ((CAST(1 AS BIGINT) << CAST((n + 2) // 3 AS INT)) - 1) AS bv
        |  FROM hs CROSS JOIN (SELECT unnest([0, 1, 2]) AS bb)),
        |c AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    a.hash AS hash_a, b.hash AS hash_b
        |  FROM e a JOIN e b ON a.w = b.w AND a.h = b.h AND a.bb = b.bb
        |    AND a.bv = b.bv AND a.doc_id < b.doc_id)""".stripMargin

  /** Shared pHash pair machinery: real P6 decode → average-hash fold →
    * 3-band split → banded equi-join → exact Hamming ≤ 2 filter.
    * Returns (doc_a, doc_b, hamming), doc_a < doc_b, unordered. */
  private def phashPairs(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("doc_id", LongType), StructField("w", IntegerType),
      StructField("h", IntegerType),
      StructField("px", ArrayType(IntegerType, containsNull = false)))))
    val decoded = phashPayloads(s, d).mapPartitions { rows =>
      rows.flatMap { r =>
        Multimodal.decodePpmLuma(r.getAs[Array[Byte]](1)).map { case (w, h, g) =>
          org.apache.spark.sql.Row(r.getLong(0), w, h, g.toSeq)
        }
      }
    }(enc)
    val hashed = decoded
      .withColumn("n", col("w") * col("h"))
      .withColumn("gsum", expr("aggregate(px, 0L, (a, x) -> a + CAST(x AS BIGINT))"))
      .withColumn("hash", expr(
        "aggregate(px, 0L, (a, x) -> a * 2L + " +
          "IF(CAST(x AS BIGINT) * CAST(n AS BIGINT) > gsum, 1L, 0L))"))
      .withColumn("wb", expr("CAST((n + 2) div 3 AS INT)"))
      .select(col("doc_id"), col("w"), col("h"), col("hash"), col("wb"))
    val banded = hashed
      .withColumn("bb", explode(array(lit(0), lit(1), lit(2))))
      .withColumn("bv", expr("shiftright(hash, bb * wb) & (shiftleft(1L, wb) - 1L)"))
    val la = banded.select(col("doc_id").as("doc_a"), col("w").as("w_a"),
      col("h").as("h_a"), col("bb").as("bb_a"), col("bv").as("bv_a"),
      col("hash").as("hash_a"))
    val lb = banded.select(col("doc_id").as("doc_b"), col("w").as("w_b"),
      col("h").as("h_b"), col("bb").as("bb_b"), col("bv").as("bv_b"),
      col("hash").as("hash_b"))
    la.join(lb, col("w_a") === col("w_b") && col("h_a") === col("h_b") &&
        col("bb_a") === col("bb_b") && col("bv_a") === col("bv_b") &&
        col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("hash_a"), col("hash_b"))
      .distinct()
      .withColumn("hamming", expr("CAST(bit_count(hash_a ^ hash_b) AS BIGINT)"))
      .filter(col("hamming") <= 2)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}
