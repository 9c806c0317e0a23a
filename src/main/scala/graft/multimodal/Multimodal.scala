package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-wise per partition.
  *
  * Decode is REAL wherever a JVM can do it without native libs — PPM and
  * WAV by hand-rolled container parsing, PNG/JPEG/BMP/GIF through
  * `javax.imageio`'s pure-Java codecs — and a STUB (deterministic byte
  * histogram standing in for ffmpeg et al.) only for formats that
  * genuinely need native codecs. Everything Spark-side is real and tested: the
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

  /** Decoded luma raster for a P6 payload: (w, h, gray) with the integer
    * luma (r + 2g + b)/4 per pixel — exact (no rounding) when the three
    * channels are equal, which is what the perceptual-hash fixture
    * guarantees. None for malformed payloads (dropped, never a crash). */
  def decodePpmLuma(payload: Array[Byte]): Option[(Int, Int, Array[Int])] =
    decodePpmHeader(payload).map { case (w, h, _, pos) =>
      val n = w * h
      val g = new Array[Int](n)
      var i = 0
      while (i < n) {
        g(i) = ((payload(pos + 3 * i) & 0xff) + 2 * (payload(pos + 3 * i + 1) & 0xff) +
          (payload(pos + 3 * i + 2) & 0xff)) / 4
        i += 1
      }
      (w, h, g)
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

  /** Nearest-neighbor resize for any ImageIO-decodable payload — the
    * compressed-codec twin of [[resizePpmNearest]] with the identical
    * index arithmetic (source pixel (x·w/outW, y·h/outH)), so the same
    * closed-form oracle certifies decode→transform for a REAL format.
    * Malformed payloads resize to None — dropped, never a crash. */
  def resizeImageNearest(payload: Array[Byte], outW: Int, outH: Int): Option[Array[Byte]] = {
    if (payload == null || payload.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null) return None
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Byte](outW * outH * 3)
    var y = 0
    while (y < outH) {
      val sy = y * h / outH
      var x = 0
      while (x < outW) {
        val rgb = img.getRGB(x * w / outW, sy)
        val di = (y * outW + x) * 3
        out(di) = ((rgb >> 16) & 0xff).toByte
        out(di + 1) = ((rgb >> 8) & 0xff).toByte
        out(di + 2) = (rgb & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some(out)
  }

  /** Formats the JDK's pure-Java ImageIO codecs decode for real — no
    * native libs needed. PNG is lossless, so encode→decode round-trips
    * byte-exactly and the feature oracle can be closed-form; JPEG decodes
    * too but lossily (no exact oracle), so the PNG path is the
    * oracle-gated one. */
  val PngFormat = "image/png"
  val ImageIOFormats: Set[String] = Set(PngFormat, "image/jpeg", "image/bmp", "image/gif")

  // Never spill decode scratch to tmp files on executors: ImageIO's
  // default disk cache turns every decode into file I/O.
  javax.imageio.ImageIO.setUseCache(false)

  /** PNG encoder via the JDK codec: packed RGB triplets (the PPM raster
    * layout) → TYPE_INT_RGB BufferedImage → ImageIO. Real PNG bytes — any
    * image tool reads the output — and the fixture generator for the
    * oracle-backed ImageIO decode query. */
  def encodePng(w: Int, h: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == w * h * 3, s"need ${w * h * 3} bytes, got ${pixels.length}")
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < w * h) {
      img.setRGB(i % w, i / w,
        ((pixels(3 * i) & 0xff) << 16) | ((pixels(3 * i + 1) & 0xff) << 8) | (pixels(3 * i + 2) & 0xff))
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL decode kernel for JDK-decodable image formats (PNG/JPEG/BMP/GIF)
    * via `javax.imageio` — pure-Java codecs shipped in every JDK. Same
    * feature contract as the PPM path: integer-valued floats
    * [w, h, 255, sumR, sumG, sumB, nPixels, 0…]. Malformed payloads
    * (ImageIO returns null / throws) decode to the zero vector — a
    * pipeline drops them; it must never crash an executor. */
  def decodeImageIOFeatures(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](featureDim)
    if (payload == null || payload.isEmpty) return out
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null) return out
    val w = img.getWidth; val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    out(0) = w; out(1) = h; out(2) = 255
    out(3) = sr; out(4) = sg; out(5) = sb; out(6) = w.toLong * h
    out
  }

  /** WAV format tag — the audio modality's real pure-JVM decode path
    * (RIFF/PCM needs no codec, only container parsing). */
  val WavFormat = "audio/wav"

  /** Minimal WAV (RIFF, PCM s16le, mono) encoder: canonical 44-byte
    * header + little-endian samples. Real format — any audio tool reads
    * the output — and the fixture generator for the oracle-backed audio
    * decode query. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** REAL WAV decode: walks the RIFF chunk list (tolerating extra chunks
    * before `data`, as real encoders emit), validates PCM s16le mono, and
    * returns (sampleRate, samples). None for anything malformed — a
    * pipeline drops bad blobs, it never crashes an executor. */
  def decodeWavPcm16(payload: Array[Byte]): Option[(Int, Array[Short])] = {
    if (payload == null || payload.length < 44) return None
    val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = { val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII") }
    if (tag() != "RIFF") return None
    bb.getInt // riff size (untrusted; we bound by the actual buffer)
    if (tag() != "WAVE") return None
    var rate = -1
    var ok = false
    while (bb.remaining() >= 8) {
      val id = tag(); val len = bb.getInt
      if (len < 0 || len > bb.remaining()) return None
      if (id == "fmt ") {
        if (len < 16) return None
        val p0 = bb.position()
        val fmt = bb.getShort; val ch = bb.getShort; rate = bb.getInt
        bb.getInt; bb.getShort
        val bits = bb.getShort
        if (fmt != 1 || ch != 1 || bits != 16) return None
        ok = true
        bb.position(p0 + len)
      } else if (id == "data") {
        if (!ok || rate <= 0) return None // fmt must precede data
        val n = len / 2
        val out = new Array[Short](n)
        var i = 0
        while (i < n) { out(i) = bb.getShort; i += 1 }
        return Some((rate, out))
      } else bb.position(bb.position() + len + (len & 1)) // skip, pad to even
    }
    None
  }

  /** Audio feature kernel over a decoded PCM stream — integer-exact
    * features (all magnitudes < 2^24, so their Float carriage is exact):
    * [rate, channels, n, sum, maxAbs, zeroCrossings, 0…]. */
  def decodeWavFeatures(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](featureDim)
    decodeWavPcm16(payload) match {
      case None => out
      case Some((rate, s)) =>
        var sum = 0L; var maxAbs = 0L; var zx = 0L
        var i = 0
        while (i < s.length) {
          sum += s(i)
          if (math.abs(s(i).toLong) > maxAbs) maxAbs = math.abs(s(i).toLong)
          if (i > 0 && (s(i) < 0) != (s(i - 1) < 0)) zx += 1
          i += 1
        }
        out(0) = rate; out(1) = 1; out(2) = s.length
        out(3) = sum; out(4) = maxAbs; out(5) = zx
        out
    }
  }

  /** Format dispatch: real decoders where pure JVM suffices (PPM raster,
    * PNG/JPEG/BMP/GIF via ImageIO, WAV audio, AVI video via
    * [[decodeAviFrames]]); the documented stub histogram only for
    * formats that genuinely need native codecs (inter-frame video —
    * H.264/VP9 — and webp). */
  def decode(payload: Array[Byte], format: String): Array[Float] =
    if (format == PpmFormat) decodePpmP6(payload)
    else if (ImageIOFormats.contains(format)) decodeImageIOFeatures(payload)
    else if (format == WavFormat) decodeWavFeatures(payload)
    else decodeToFeatures(payload)

  /** Animated-GIF encoder via the JDK codec: each frame is a w×h GRAYSCALE
    * raster (one byte per pixel), written TYPE_BYTE_INDEXED over an
    * explicit 256-gray palette so the GIF's LZW-compressed indexed data
    * round-trips byte-exactly (no quantization — the palette IS the value
    * space). Real multi-frame GIF bytes — any image tool plays the
    * output — and the fixture generator for the oracle-backed multi-frame
    * decode query. */
  def encodeGifFrames(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    val gray = Array.tabulate[Byte](256)(i => i.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, gray, gray, gray)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { px =>
      require(px.length == w * h, s"need ${w * h} gray bytes, got ${px.length}")
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      val raster = img.getRaster
      var i = 0
      while (i < px.length) {
        raster.setSample(i % w, i / w, 0, px(i) & 0xff)
        i += 1
      }
      // the JDK GIF writer defaults to INTERLACED frames whose row order
      // does not survive its own reader at small heights — force
      // sequential rows (observed: middle rows decode as palette 0)
      val p = writer.getDefaultWriteParam
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), p)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  /** REAL multi-frame decode via ImageIO's GIF reader
    * (`getNumImages(true)` / `read(i)` — pure JVM): per frame,
    * [frame_idx, w, h, sumR, sumG, sumB]. Malformed payloads decode to an
    * empty frame list — a pipeline drops them; it must never crash an
    * executor. */
  def decodeGifFrames(payload: Array[Byte]): Seq[Array[Long]] = {
    if (payload == null || payload.isEmpty) return Seq.empty
    val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    if (!readers.hasNext) return Seq.empty
    val reader = readers.next()
    // Memory-backed stream, NOT ImageIO.createImageInputStream: the default
    // is a FileCacheImageInputStream whose temp cache file survives until GC
    // if never closed — a per-row disk/handle leak in executors. The source
    // is already an in-memory byte array, so cache to heap and close it in
    // the same finally as reader.dispose().
    val stream = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      // seekForwardOnly must be FALSE: getNumImages(true) needs to search
      reader.setInput(stream, false)
      val n = reader.getNumImages(true)
      (0 until n).map { fi =>
        val img = reader.read(fi)
        val w = img.getWidth; val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        Array(fi.toLong, w.toLong, h.toLong, sr, sg, sb)
      }
    } catch {
      case _: Exception => Seq.empty
    } finally {
      reader.dispose()
      try stream.close() catch { case _: Exception => () }
    }
  }

  // ---------------------------------------------------------------------
  // REAL VIDEO: AVI (RIFF) container with uncompressed-DIB or MJPEG
  // frames — both pure JVM. Raw DIB ('00db' BI_RGB bottom-up BGR24) is
  // byte-deterministic, so frame stats are ORACLE-exact; MJPEG ('00dc'
  // JPEG-per-frame via the JDK codec) is the real-world lossy path,
  // machine-gated (frame count/dims exact, constant-gray frames decode
  // within JPEG DC-quantization of the source). This retires the
  // round-14 inventory's one documented stub for the video container
  // format a JVM can honestly own; modern inter-frame codecs (H.264,
  // VP9, webp) still need native libraries and stay out of scope.
  // ---------------------------------------------------------------------

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def le32(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  /** Encode gray frames (one byte per pixel, row-major top-down) as a
    * REAL AVI: proper avih/strh/strf headers + movi chunks + idx1, so
    * any player opens the output. `mjpeg=false` writes uncompressed
    * bottom-up BGR24 DIB frames (deterministic — the oracle path);
    * `mjpeg=true` writes one real JPEG per frame (the lossy path). */
  def encodeAviGray(w: Int, h: Int, frames: Seq[Array[Byte]],
      mjpeg: Boolean = false): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    val rowBytes = (w * 3 + 3) / 4 * 4 // DIB rows pad to 4 bytes
    def dibFrame(px: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](rowBytes * h)
      var y = 0
      while (y < h) {
        val srcRow = h - 1 - y // bottom-up
        var x = 0
        while (x < w) {
          val v = px(srcRow * w + x)
          val o = y * rowBytes + x * 3
          out(o) = v; out(o + 1) = v; out(o + 2) = v // B G R
          x += 1
        }
        y += 1
      }
      out
    }
    def jpegFrame(px: Array[Byte]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var i = 0
      while (i < px.length) {
        val v = px(i) & 0xff
        img.setRGB(i % w, i / w, (v << 16) | (v << 8) | v)
        i += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val payloads = frames.map { px =>
      require(px.length == w * h, s"need ${w * h} gray bytes, got ${px.length}")
      if (mjpeg) jpegFrame(px) else dibFrame(px)
    }
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
      fourcc(id) ++ le32(data.length) ++ data ++ pad
    }
    def list(kind: String, data: Array[Byte]): Array[Byte] =
      chunk("LIST", fourcc(kind) ++ data)
    val frameId = if (mjpeg) "00dc" else "00db"
    val maxBuf = payloads.map(_.length).max
    val avih = le32(33333) ++ le32(maxBuf * 30) ++ le32(0) ++ le32(0x10) ++
      le32(frames.size) ++ le32(0) ++ le32(1) ++ le32(maxBuf) ++
      le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = fourcc("vids") ++
      (if (mjpeg) fourcc("MJPG") else le32(0)) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(1) ++ le32(30) ++ le32(0) ++
      le32(frames.size) ++ le32(maxBuf) ++ le32(-1) ++ le32(0) ++
      // rcFrame: 4 little-endian shorts (left, top, right, bottom)
      java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putShort(0).putShort(0)
        .putShort(w.toShort).putShort(h.toShort).array()
    val strf = le32(40) ++ le32(w) ++ le32(h) ++
      java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putShort(1.toShort).putShort(24.toShort).array() ++
      (if (mjpeg) fourcc("MJPG") else le32(0)) ++
      le32(rowBytes * h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++
        list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val moviChunks = payloads.map(p => chunk(frameId, p))
    val movi = list("movi", moviChunks.flatten.toArray)
    // idx1: one entry per frame (offset relative to movi list's kind tag)
    var off = 4
    val idx = payloads.zip(moviChunks).flatMap { case (p, c) =>
      val e = fourcc(frameId) ++ le32(0x10) ++ le32(off) ++ le32(p.length)
      off += c.length
      e
    }.toArray
    val body = fourcc("AVI ") ++ hdrl ++ movi ++ chunk("idx1", idx)
    fourcc("RIFF") ++ le32(body.length) ++ body
  }

  /** REAL AVI multi-frame decode — pure-JVM RIFF walk: parse strf for
    * the frame geometry, iterate the movi list's '..db'/'..dc' chunks,
    * decode raw-DIB frames by walking the bottom-up BGR rows and MJPEG
    * frames through the JDK JPEG codec. `stride` > 1 SKIPS frames
    * without decoding them (the chunk walk is O(bytes scanned), the
    * decode is the cost — the honest video frame-sampling claim: MJPEG/
    * DIB frames are independently decodable, so sampling 1-in-k pays
    * 1/k of the decode). Per frame: [frame_idx, w, h, sumR, sumG, sumB];
    * malformed payloads decode to an empty list, never a crash. */
  def decodeAviFrames(payload: Array[Byte], stride: Int = 1): Seq[Array[Long]] = {
    if (payload == null || payload.length < 12) return Seq.empty
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def str(off: Int, n: Int): String =
      if (off + n > payload.length) ""
      else new String(payload, off, n, "US-ASCII")
    if (str(0, 4) != "RIFF" || str(8, 4) != "AVI ") return Seq.empty
    try {
      var w = 0; var h = 0; var bpp = 24
      val frames = Vector.newBuilder[(Int, Int)] // (offset, length) per chunk
      // depth-first RIFF walk: LIST chunks recurse, strf fills geometry,
      // movi children register frame chunk positions
      def walk(start: Int, end: Int): Unit = {
        var p = start
        while (p + 8 <= end) {
          val id = str(p, 4)
          val sz = bb.getInt(p + 4)
          if (sz < 0 || p + 8 + sz > end) return
          if (id == "LIST") walk(p + 12, p + 8 + sz)
          else if (id == "strf" && sz >= 40) {
            w = bb.getInt(p + 8 + 4)
            h = bb.getInt(p + 8 + 8)
            bpp = bb.getShort(p + 8 + 14).toInt
          } else if (id.length == 4 && (id.endsWith("db") || id.endsWith("dc"))) {
            frames += ((p + 8, sz))
          }
          p += 8 + sz + (sz % 2) // chunks are word-aligned
        }
      }
      walk(12, payload.length)
      if (w <= 0 || h <= 0) return Seq.empty
      val rowBytes = (w * (bpp / 8) + 3) / 4 * 4
      frames.result().zipWithIndex.collect {
        case ((off, len), fi) if fi % stride == 0 =>
          var sr = 0L; var sg = 0L; var sb = 0L
          if (len >= 2 && (payload(off) & 0xff) == 0xff &&
              (payload(off + 1) & 0xff) == 0xd8) {
            // MJPEG frame: JDK JPEG decode
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(
                java.util.Arrays.copyOfRange(payload, off, off + len)))
            if (img == null)
              throw new java.io.IOException("undecodable MJPEG frame")
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
                x += 1
              }
              y += 1
            }
          } else {
            // raw DIB: bottom-up BGR rows, 4-byte row padding
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val o = off + y * rowBytes + x * (bpp / 8)
                sb += payload(o) & 0xff
                sg += payload(o + 1) & 0xff
                sr += payload(o + 2) & 0xff
                x += 1
              }
              y += 1
            }
          }
          Array(fi.toLong, w.toLong, h.toLong, sr, sg, sb)
      }
    } catch {
      case _: Exception => Seq.empty
    }
  }

  /** STUB frame sampler: every `stride`-th window of `frameBytes` bytes —
    * the shape of video frame extraction (n_frames × frame payload). */
  def sampleFrames(payload: Array[Byte], frameBytes: Int, stride: Int): Seq[Array[Byte]] = {
    if (payload == null || payload.length < frameBytes) return Seq.empty
    (0 until (payload.length - frameBytes + 1) by (frameBytes * stride))
      .map(off => java.util.Arrays.copyOfRange(payload, off, off + frameBytes))
  }

  /** REAL WAV decode to the raw sample stream: (doc_id, sample_rate,
    * samples int[]) — the imperative seam for sample-level audio ops
    * (VAD, resampling); everything downstream of it stays declarative
    * DataFrame ops. Malformed payloads are dropped, matching the decode
    * contract (a pipeline skips bad blobs, it never crashes an executor). */
  def decodeWavSamples(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("samples", ArrayType(IntegerType, containsNull = false))))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeWavPcm16(r.getAs[Array[Byte]](payloadIdx)).map { case (rate, ss) =>
          Row(r.getLong(idIdx), rate, ss.map(_.toInt).toSeq)
        }
      }
    }(enc)
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
