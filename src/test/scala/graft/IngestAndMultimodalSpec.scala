package graft

import java.nio.file.Files

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Multimodal, Vp8l}
import graft.sources.{AvroProducer, BytesDslProducer, DataProducer, Deserializer, Ingest, Tables}

/** A test deserializer loadable by classname (the DSL middle stage). */
class SpecDeserializer extends Deserializer {
  override def deserialize(raw: Array[Byte]): Iterator[String] =
    new String(raw, "UTF-8").linesIterator.filter(_.nonEmpty).map { line =>
      val Array(id, tpe) = line.split(',')
      s"""{"event_id":$id,"event_type":"$tpe"}"""
    }
}

/** Source-format round-trips (A2/A3 analog) and multimodal kernel specs. */
class IngestAndMultimodalSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = GraftSession.local(4)

  private def tmpDir(): String =
    Files.createTempDirectory("graft_ingest").toString

  test("csv round-trip preserves events content") {
    val ev = Tables.load(spark, sfDir, "events")
      .select("event_id", "user_id", "event_type", "value")
    val dir = tmpDir() + "/ev_csv"
    ev.write.option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    val back = Ingest.batch(spark, "csv", dir, Some(schema))
    assert(back.count() == ev.count())
    assert(back.agg(sum("event_id")).head().getLong(0) ==
      ev.agg(sum("event_id")).head().getLong(0))
  }

  test("json round-trip + from_json converter pipeline") {
    val ev = Tables.load(spark, sfDir, "events")
      .select("event_id", "event_type", "props")
    val dir = tmpDir() + "/ev_json"
    ev.write.json(dir)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("event_type", StringType),
      StructField("props", StringType)))
    val back = Ingest.batch(spark, "json", dir, Some(schema))
    assert(back.count() == ev.count())
    // DSL converter analog: raw JSON payload column → typed columns
    val propsSchema = StructType(Seq(StructField("k", LongType)))
    val converted = Ingest.convertJson(
      back.select(col("event_id"), col("props").as("raw")), "raw", propsSchema)
    assert(converted.columns.toSet == Set("event_id", "k"))
    assert(converted.filter(col("k").isNotNull).count() > 0)
  }

  test("streaming file source feeds the multi-query engine") {
    val ev = Tables.load(spark, sfDir, "events").select("event_id", "event_type", "value")
    val dir = tmpDir() + "/ev_stream"
    ev.write.parquet(dir)
    val stream = Ingest.stream(spark, "parquet", dir, ev.schema)
    assert(stream.isStreaming)
    val engine = new graft.streaming.MultiQueryEngine(spark)
    engine.submit("s1", "SELECT COUNT(*) AS cnt FROM STREAM WINDOWING EVERY(1, RECORD, ALL)")
    val q = engine.attach(stream, triggerMs = 50L)
    try q.processAllAvailable() finally q.stop()
    val counts = engine.drainResults().map(_.clip.records.head("cnt").asInstanceOf[Long])
    assert(counts.lastOption.contains(ev.count()), s"got $counts")
  }

  /** Write the events fixture as one Avro object-container file. */
  private def writeEventsAvro(dir: String): (java.io.File, Seq[Row]) = {
    import org.apache.avro.SchemaBuilder
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = SchemaBuilder.record("Event").fields()
      .requiredLong("event_id").requiredLong("user_id")
      .requiredString("event_type").requiredDouble("value").endRecord()
    val rows = Tables.load(spark, sfDir, "events")
      .select("event_id", "user_id", "event_type", "value").collect().toSeq
    val f = new java.io.File(dir, "events.avro")
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, f)
    rows.foreach { r =>
      val rec = new GenericData.Record(schema)
      rec.put("event_id", r.getLong(0)); rec.put("user_id", r.getLong(1))
      rec.put("event_type", r.getString(2)); rec.put("value", r.getDouble(3))
      w.append(rec)
    }
    w.close()
    (f, rows)
  }

  private val eventsDdl = "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"

  test("avro container ingestion round-trips the events fixture (batch)") {
    val dir = tmpDir() + "/ev_avro"
    Files.createDirectories(java.nio.file.Paths.get(dir))
    val (_, rows) = writeEventsAvro(dir)
    val back = Ingest.batchAvro(spark, dir, StructType.fromDDL(eventsDdl))
    assert(back.columns.toSeq == Seq("event_id", "user_id", "event_type", "value"))
    val got = back.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet
    val want = rows.map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet
    assert(got == want, s"got ${got.size} distinct rows, want ${want.size}")
  }

  test("avro producer streams decoded records into the engine (A2/A3)") {
    val dir = tmpDir() + "/ev_avro_stream"
    Files.createDirectories(java.nio.file.Paths.get(dir))
    val (_, rows) = writeEventsAvro(dir)
    // streaming: AvroProducer through the classname seam, memory sink
    val stream = DataProducer.produce(spark, Map(
      DataProducer.ClassKey -> classOf[AvroProducer].getName,
      "graft.producer.path" -> dir,
      "graft.producer.recordSchema" -> eventsDdl))
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("avro_e2e").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("avro_e2e").count() == rows.size)
    // end-to-end through the multi-query engine on the batch-decoded frame
    val engine = new graft.streaming.MultiQueryEngine(spark)
    val t = new graft.streaming.InMemoryTransport
    new graft.streaming.TransportBridge(engine, t)
    engine.submit("av1", "SELECT event_id, event_type FROM STREAM LIMIT 5")
    engine.processBatch(Ingest.batchAvro(spark, dir, StructType.fromDDL(eventsDdl)))
    val clips = t.poll("graft.clips")
    assert(clips.map(_._1) == Seq("av1"))
    assert(clips.head._2.startsWith("Complete\t"))
    assert(clips.head._2.contains("\"event_type\""))
  }

  test("deserializer plugin loads by classname between connector and converter (A3)") {
    val dir = tmpDir() + "/dsl_bytes"
    Files.createDirectories(java.nio.file.Paths.get(dir))
    Files.write(java.nio.file.Paths.get(dir, "batch1.csvish"),
      "7,click\n8,view\n\n9,click\n".getBytes("UTF-8"))
    val stream = DataProducer.produce(spark, Map(
      DataProducer.ClassKey -> classOf[BytesDslProducer].getName,
      Deserializer.ClassKey -> classOf[SpecDeserializer].getName,
      "graft.producer.path" -> dir,
      "graft.producer.recordSchema" -> "event_id BIGINT, event_type STRING"))
    assert(stream.isStreaming)
    assert(stream.columns.toSeq == Seq("event_id", "event_type"))
    val q = stream.writeStream.format("memory").queryName("dsl_bytes").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("dsl_bytes").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((7L, "click"), (8L, "view"), (9L, "click")))
    // misconfiguration fails fast with the offending key in the message
    val bad = intercept[IllegalArgumentException] {
      Ingest.deserialize(
        Ingest.batch(spark, "binaryFile", dir), "content", "graft.NoSuchDeser")
    }
    assert(bad.getMessage.contains("graft.NoSuchDeser"))
    val notA = intercept[IllegalArgumentException] {
      Ingest.deserialize(
        Ingest.batch(spark, "binaryFile", dir), "content", classOf[SpecProducer].getName)
    }
    assert(notA.getMessage.contains("does not implement"))
  }

  test("N parallel producers union into one stream (A2)") {
    val ev = Tables.load(spark, sfDir, "events").select("event_id", "event_type")
    val parts = (0 until 3).map(i => ev.filter(col("event_id") % 3 === i))
    val unioned = Ingest.unionAll(parts)
    assert(unioned.count() == ev.count())
    assert(unioned.agg(sum("event_id")).head().getLong(0) ==
      ev.agg(sum("event_id")).head().getLong(0))
  }

  test("decode kernel: deterministic, normalized, fixed dim") {
    val f1 = Multimodal.decodeToFeatures("hello world".getBytes)
    val f2 = Multimodal.decodeToFeatures("hello world".getBytes)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == Multimodal.featureDim)
    assert(math.abs(f1.sum - 1.0f) < 1e-5)
    assert(Multimodal.decodeToFeatures(Array.empty).toSeq == Seq.fill(16)(0f))
  }

  test("animated GIF: multi-frame encode→decode roundtrip via ImageIO, malformed safety") {
    // 3 frames of 4x3 with distinct gray values: frame count, dims and
    // per-frame sums must survive the LZW/palette round trip exactly
    val frames = Seq[Array[Byte]](
      Array.fill(12)(17.toByte), Array.fill(12)(200.toByte), Array.fill(12)(0.toByte))
    val gif = Multimodal.encodeGifFrames(4, 3, frames)
    // real GIF container: magic bytes
    assert(new String(gif.take(6), "US-ASCII").startsWith("GIF8"))
    val decoded = Multimodal.decodeGifFrames(gif)
    assert(decoded.size == 3)
    decoded.zip(Seq(17L, 200L, 0L)).zipWithIndex.foreach { case ((f, g), i) =>
      assert(f.toSeq == Seq(i.toLong, 4L, 3L, 12 * g, 12 * g, 12 * g),
        s"frame $i decoded ${f.toSeq}")
    }
    // a non-uniform frame: per-pixel fidelity, not just solid colors
    val px = Array.tabulate[Byte](12)(i => (i * 20).toByte)
    val one = Multimodal.decodeGifFrames(Multimodal.encodeGifFrames(4, 3, Seq(px)))
    assert(one.head(3) == px.map(_ & 0xff).sum.toLong)
    // malformed payloads decode to no frames, never throw
    assert(Multimodal.decodeGifFrames("not a gif".getBytes).isEmpty)
    assert(Multimodal.decodeGifFrames(Array.empty).isEmpty)
    assert(Multimodal.decodeGifFrames(gif.take(20)).isEmpty)
  }

  test("AVI video: raw-DIB encode→decode roundtrip, stride sampling, malformed safety") {
    // 4 frames of 5x3 with distinct grays: a REAL RIFF/AVI container
    // (headers + movi + idx1) whose uncompressed frames round-trip exactly
    val grays = Seq(17, 200, 0, 99)
    val frames = grays.map(g => Array.fill[Byte](15)(g.toByte))
    val avi = Multimodal.encodeAviGray(5, 3, frames)
    assert(new String(avi.take(4), "US-ASCII") == "RIFF" &&
      new String(avi.slice(8, 12), "US-ASCII") == "AVI ", "real AVI magic")
    val decoded = Multimodal.decodeAviFrames(avi)
    assert(decoded.size == 4)
    decoded.zip(grays).zipWithIndex.foreach { case ((f, g), i) =>
      assert(f.toSeq == Seq(i.toLong, 5L, 3L, 15L * g, 15L * g, 15L * g),
        s"frame $i decoded ${f.toSeq}")
    }
    // non-uniform frame: per-pixel fidelity through the padded DIB rows
    val px = Array.tabulate[Byte](15)(i => (i * 17).toByte)
    val one = Multimodal.decodeAviFrames(Multimodal.encodeAviGray(5, 3, Seq(px)))
    assert(one.head(3) == px.map(_ & 0xff).sum.toLong)
    // stride sampling decodes exactly frames 0 and 2
    val sampled = Multimodal.decodeAviFrames(avi, stride = 2)
    assert(sampled.map(_(0)).toSeq == Seq(0L, 2L))
    assert(sampled.map(f => f(3) / 15).toSeq == Seq(17L, 0L))
    // malformed payloads decode to no frames, never throw
    assert(Multimodal.decodeAviFrames("not an avi".getBytes).isEmpty)
    assert(Multimodal.decodeAviFrames(Array.empty).isEmpty)
    assert(Multimodal.decodeAviFrames(avi.take(40)).isEmpty)
  }

  test("AVI MJPEG: real lossy codec round trip preserves structure; constant frames within DC quantization") {
    val grays = Seq(30, 180, 250)
    val frames = grays.map(g => Array.fill[Byte](12 * 8)(g.toByte))
    val avi = Multimodal.encodeAviGray(12, 8, frames, mjpeg = true)
    val decoded = Multimodal.decodeAviFrames(avi)
    assert(decoded.size == 3, "frame count exact through the JPEG path")
    decoded.zip(grays).foreach { case (f, g) =>
      assert(f(1) == 12L && f(2) == 8L, "dims exact")
      val mean = (f(3) + f(4) + f(5)) / (3L * 12 * 8)
      assert(math.abs(mean - g) <= 2,
        s"constant-gray mean $mean within DC quantization of $g")
    }
  }

  test("VP8L webp: subtract-green gradient roundtrip is bit-exact; container is real RIFF/WEBP") {
    // >256 distinct colors forces the SUBTRACT_GREEN path; two constant
    // rows exercise the distance-1 run LZ77
    val w = 24; val h = 14
    val argb = Array.tabulate(w * h) { i =>
      val y = i / w
      if (y < 2) 0xff000000 | (77 << 16) | (77 << 8) | 77
      else {
        val r = (i + 3) % 256
        val g = ((i / 256) * 97 + 3) % 256
        val b = (i * 13 + 3) % 256
        0xff000000 | (r << 16) | (g << 8) | b
      }
    }
    val webp = Vp8l.encode(w, h, argb)
    assert(new String(webp.take(4), "US-ASCII") == "RIFF" &&
      new String(webp.slice(8, 12), "US-ASCII") == "WEBP", "real container magic")
    val Some((dw, dh, out)) = Vp8l.decode(webp)
    assert(dw == w && dh == h)
    assert(out.toSeq == argb.toSeq, "lossless: every ARGB pixel bit-exact")
  }

  test("VP8L webp: palette paths at all four bundling widths are bit-exact") {
    // palette sizes 2/4/16/17 → 8/4/2/1 pixels per byte; odd widths
    // exercise the partial trailing bundle
    for ((nColors, w, h) <- Seq((2, 11, 5), (4, 9, 6), (16, 13, 4), (17, 7, 9))) {
      val pal = Array.tabulate(nColors)(k =>
        ((if (k % 3 == 0) 0xff else 0x80) << 24) | ((k * 37 % 256) << 16) |
          ((k * 91 % 256) << 8) | (k * 53 % 256))
      val argb = Array.tabulate(w * h)(i => pal((i * 7 + i / w) % nColors))
      val Some((dw, dh, out)) = Vp8l.decode(Vp8l.encode(w, h, argb))
      assert(dw == w && dh == h, s"dims at $nColors colors")
      assert(out.toSeq == argb.toSeq, s"palette size $nColors bit-exact")
    }
    // 1x1 and translucent alpha
    val one = Array(0x7f123456)
    assert(Vp8l.decode(Vp8l.encode(1, 1, one)).get._3.toSeq == one.toSeq)
  }

  test("VP8L webp: long runs hit the LZ77 length cap and stay exact; malformed payloads are safe") {
    val w = 128; val h = 40 // 5120 identical pixels → runs beyond the 4095 cap
    val argb = Array.fill(w * h)(0xff336699)
    val webp = Vp8l.encode(w, h, argb)
    assert(webp.length < 200, s"runs must compress (got ${webp.length} bytes)")
    assert(Vp8l.decode(webp).get._3.toSeq == argb.toSeq)
    assert(Vp8l.decode(Array.empty).isEmpty)
    assert(Vp8l.decode("not a webp at all".getBytes).isEmpty)
    assert(Vp8l.decode(webp.take(20)).isEmpty)
    assert(Vp8l.decode(webp.take(40)).isEmpty)
    val corrupt = webp.clone(); corrupt(25) = (corrupt(25) ^ 0x55).toByte
    Vp8l.decode(corrupt) // any result, but never a crash
  }

  test("VP8L webp: crafted color-cache stream decodes through the cache path") {
    val px = 0xff0a6414 // a=255 r=10 g=100 b=20
    val idx = (0x1e35a7bd * px) >>> 28 // 4-bit cache hash
    val bw = new Vp8l.BitWriter
    bw.bits(0x2f, 8); bw.bits(3, 14); bw.bits(0, 14); bw.bits(0, 1); bw.bits(0, 3)
    bw.bits(0, 1) // no transforms
    bw.bits(1, 1); bw.bits(4, 4) // color cache, 4 bits
    bw.bits(0, 1) // no meta-prefix
    val gLens = new Array[Int](256 + 24 + 16)
    gLens(100) = 1; gLens(256 + 24 + idx) = 1
    Vp8l.writeCode(bw, gLens, gLens.length)
    def single(sym: Int, alphabet: Int): Unit = {
      val l = new Array[Int](alphabet); l(sym) = 1
      Vp8l.writeCode(bw, l, alphabet)
    }
    single(10, 256); single(20, 256); single(255, 256); single(0, 40)
    val gC = Vp8l.canonicalCodes(gLens)
    bw.code(gC(100), 1) // literal (r/b/a are degenerate 0-bit codes)
    bw.code(gC(256 + 24 + idx), 1) // three cache hits
    bw.code(gC(256 + 24 + idx), 1)
    bw.code(gC(256 + 24 + idx), 1)
    val Some((w, h, out)) = Vp8l.decode(Vp8l.wrapRiff(bw.toBytes))
    assert(w == 4 && h == 1)
    assert(out.toSeq == Seq(px, px, px, px))
  }

  test("VP8L webp: crafted LZ77 with a neighborhood-map distance code") {
    // 2x2: two literals then a len-2 copy at map code (0,1) → dist = width
    val p0 = 0xff102030; val p1 = 0xff405060
    val bw = new Vp8l.BitWriter
    bw.bits(0x2f, 8); bw.bits(1, 14); bw.bits(1, 14); bw.bits(0, 1); bw.bits(0, 3)
    bw.bits(0, 1); bw.bits(0, 1); bw.bits(0, 1) // no transforms/cache/meta
    val gLens = new Array[Int](256 + 24)
    gLens(0x20) = 1; gLens(0x50) = 2; gLens(257) = 2 // len-2 symbol
    Vp8l.writeCode(bw, gLens, gLens.length)
    def pair(a: Int, b: Int): Array[Int] = {
      val l = new Array[Int](256); l(a) = 1; l(b) = 1; l
    }
    val rLens = pair(0x10, 0x40); Vp8l.writeCode(bw, rLens, 256)
    val bLens = pair(0x30, 0x60); Vp8l.writeCode(bw, bLens, 256)
    val aLens = new Array[Int](256); aLens(255) = 1; Vp8l.writeCode(bw, aLens, 256)
    val dLens = new Array[Int](40); dLens(0) = 1; Vp8l.writeCode(bw, dLens, 40)
    val gC = Vp8l.canonicalCodes(gLens)
    val rC = Vp8l.canonicalCodes(rLens)
    val bC = Vp8l.canonicalCodes(bLens)
    bw.code(gC(0x20), 1); bw.code(rC(0x10), 1); bw.code(bC(0x30), 1)
    bw.code(gC(0x50), 2); bw.code(rC(0x40), 1); bw.code(bC(0x60), 1)
    bw.code(gC(257), 2) // length 2, distance symbol is 0-bit degenerate
    val Some((w, h, out)) = Vp8l.decode(Vp8l.wrapRiff(bw.toBytes))
    assert(w == 2 && h == 2)
    assert(out.toSeq == Seq(p0, p1, p0, p1))
  }

  test("VP8L webp: crafted predictor transform applies mode/edge rules") {
    val bw = new Vp8l.BitWriter
    bw.bits(0x2f, 8); bw.bits(1, 14); bw.bits(1, 14); bw.bits(0, 1); bw.bits(0, 3)
    bw.bits(1, 1); bw.bits(0, 2); bw.bits(0, 3) // PREDICTOR, sizeBits=2 → one 4x4 tile
    def singleImage(px: Int): Unit = {
      bw.bits(0, 1) // no cache (sub-image: no meta bit)
      def single(sym: Int, alphabet: Int): Unit = {
        val l = new Array[Int](alphabet); l(sym) = 1
        Vp8l.writeCode(bw, l, alphabet)
      }
      single((px >>> 8) & 0xff, 256 + 24); single((px >>> 16) & 0xff, 256)
      single(px & 0xff, 256); single((px >>> 24) & 0xff, 256); single(0, 40)
      // all five codes are degenerate → the tile pixel costs zero data bits
    }
    singleImage(0x00000100) // tile mode = green = 1 (predict from LEFT)
    bw.bits(0, 1) // end of transforms
    // residual 2x2 image: distinct per-channel values, emitted as literals
    val res = Seq(0x00010203, 0x00010101, 0x00050505, 0x00010001)
    bw.bits(0, 1); bw.bits(0, 1) // no cache, no meta
    def lensOf(vals: Seq[Int], alphabet: Int): Array[Int] = {
      val l = new Array[Int](alphabet)
      val d = vals.distinct.sorted
      d.length match {
        case 1 => l(d.head) = 1
        case 2 => l(d(0)) = 1; l(d(1)) = 1
        case 3 => l(d(0)) = 1; l(d(1)) = 2; l(d(2)) = 2
        case _ => d.take(4).foreach(s => l(s) = 2) // complete at exactly 4
      }
      l
    }
    val gs = res.map(p => (p >>> 8) & 0xff)
    val rs = res.map(p => (p >>> 16) & 0xff)
    val bs = res.map(p => p & 0xff)
    val gLens = lensOf(gs, 256 + 24); Vp8l.writeCode(bw, gLens, 256 + 24)
    val rLens = lensOf(rs, 256); Vp8l.writeCode(bw, rLens, 256)
    val bLens = lensOf(bs, 256); Vp8l.writeCode(bw, bLens, 256)
    val aLens = new Array[Int](256); aLens(0) = 1; Vp8l.writeCode(bw, aLens, 256)
    val dLens = new Array[Int](40); dLens(0) = 1; Vp8l.writeCode(bw, dLens, 40)
    val gC = Vp8l.canonicalCodes(gLens)
    val rC = Vp8l.canonicalCodes(rLens)
    val bC = Vp8l.canonicalCodes(bLens)
    res.foreach { p =>
      bw.code(gC((p >>> 8) & 0xff), gLens((p >>> 8) & 0xff))
      bw.code(rC((p >>> 16) & 0xff), rLens((p >>> 16) & 0xff))
      bw.code(bC(p & 0xff), bLens(p & 0xff))
    }
    val Some((w, h, out)) = Vp8l.decode(Vp8l.wrapRiff(bw.toBytes))
    assert(w == 2 && h == 2)
    // (0,0): + black; (1,0): row 0 → LEFT; (0,1): col 0 → TOP; (1,1): mode 1 → LEFT
    assert(out(0) == 0xff010203, f"px0 ${out(0)}%08x")
    assert(out(1) == 0xff020304, f"px1 ${out(1)}%08x")
    assert(out(2) == 0xff060708, f"px2 ${out(2)}%08x")
    assert(out(3) == 0xff070709, f"px3 ${out(3)}%08x")
  }

  test("VP8L webp: crafted color transform inverts the cross-channel deltas") {
    val bw = new Vp8l.BitWriter
    bw.bits(0x2f, 8); bw.bits(1, 14); bw.bits(1, 14); bw.bits(0, 1); bw.bits(0, 3)
    bw.bits(1, 1); bw.bits(1, 2); bw.bits(0, 3) // COLOR, sizeBits=2 → one tile
    def single(sym: Int, alphabet: Int): Unit = {
      val l = new Array[Int](alphabet); l(sym) = 1
      Vp8l.writeCode(bw, l, alphabet)
    }
    // cte: g2r=2 (blue-lane byte), g2b=3 (green lane), r2b=4 (red lane)
    bw.bits(0, 1) // tile sub-image: no cache
    single(3, 256 + 24); single(4, 256); single(2, 256); single(0, 256); single(0, 40)
    bw.bits(0, 1) // end of transforms
    // main 2x2, all pixels 0xff0a4014 (r'=10 g=64 b'=20), all-degenerate codes
    bw.bits(0, 1); bw.bits(0, 1)
    single(0x40, 256 + 24); single(0x0a, 256); single(0x14, 256)
    single(0xff, 256); single(0, 40)
    val Some((w, h, out)) = Vp8l.decode(Vp8l.wrapRiff(bw.toBytes))
    assert(w == 2 && h == 2)
    // r = 10 + (2*64>>5) = 14; b = 20 + (3*64>>5) + (4*14>>5) = 27
    assert(out.forall(_ == 0xff0e401b), f"${out(0)}%08x")
  }

  test("codec mutation fuzz: corrupted AVI/WEBP/GIF/WAV/PPM payloads never crash a decoder") {
    // deterministic LCG over byte positions/values: every decoder must
    // treat arbitrary corruption as data, not control flow — at 100 TB
    // a task retry storm from one bad blob is an outage
    var seed = 0x9e3779b97f4a7c15L
    def nxt(n: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % n).toInt + n) % n
    }
    val gray = Array.fill[Byte](48)(77)
    val avi = Multimodal.encodeAviGray(8, 6, Seq(gray, gray))
    val webp = Vp8l.encode(8, 6, Array.tabulate(48)(i => 0xff000000 | (i * 5429)))
    val gif = Multimodal.encodeGifFrames(8, 6, Seq(gray))
    val wav = Multimodal.encodeWavPcm16(8000, Array.tabulate[Short](64)(i => (i * 321).toShort))
    val ppm = Multimodal.encodePpmP6(8, 6, Array.fill[Byte](144)(50))
    (1 to 200).foreach { _ =>
      def mutate(payload: Array[Byte]): Array[Byte] = {
        val m = payload.clone()
        (0 until 1 + nxt(3)).foreach { _ =>
          m(nxt(m.length)) = nxt(256).toByte
        }
        if (nxt(4) == 0) m.take(nxt(m.length)) else m
      }
      Multimodal.decodeAviFrames(mutate(avi))
      Vp8l.decode(mutate(webp))
      Multimodal.decodeGifFrames(mutate(gif))
      Multimodal.decodeWavPcm16(mutate(wav))
      Multimodal.decodePpmP6(mutate(ppm))
    }
  }

  test("PPM P6 decoder: encode→decode roundtrip, comments, malformed safety") {
    // 2x2 image, known channel sums
    val px = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    val enc = Multimodal.encodePpmP6(2, 2, px)
    val f = Multimodal.decodePpmP6(enc)
    assert(f.take(7).toSeq == Seq(2f, 2f, 255f, (10 + 40 + 70 + 100).toFloat,
      (20 + 50 + 80 + 110).toFloat, (30 + 60 + 90 + 120).toFloat, 4f))
    // header comments (the netpbm spec allows them) parse through
    val withComment = ("P6\n# a comment line\n2 2\n255\n".getBytes("US-ASCII") ++ px)
    assert(Multimodal.decodePpmP6(withComment).toSeq == f.toSeq)
    // malformed payloads decode to the zero vector, never throw
    assert(Multimodal.decodePpmP6("P6\n2 2\n255\nshort".getBytes).toSeq == Seq.fill(16)(0f))
    assert(Multimodal.decodePpmP6("P5\n2 2\n255\n".getBytes).toSeq == Seq.fill(16)(0f))
    assert(Multimodal.decodePpmP6(Array.empty).toSeq == Seq.fill(16)(0f))
    assert(Multimodal.decodePpmP6(null).toSeq == Seq.fill(16)(0f))
    // format dispatch: PPM format takes the real decoder, others the stub
    assert(Multimodal.decode(enc, Multimodal.PpmFormat).toSeq == f.toSeq)
    assert(Multimodal.decode(enc, "text/plain").toSeq ==
      Multimodal.decodeToFeatures(enc).toSeq)
  }

  test("PNG via ImageIO: lossless encode→decode roundtrip, malformed safety, dispatch") {
    val px = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    val enc = Multimodal.encodePng(2, 2, px)
    // real PNG bytes: magic signature
    assert((enc(0) & 0xff) == 0x89 && enc(1) == 'P' && enc(2) == 'N' && enc(3) == 'G')
    val f = Multimodal.decodeImageIOFeatures(enc)
    assert(f.take(7).toSeq == Seq(2f, 2f, 255f, (10 + 40 + 70 + 100).toFloat,
      (20 + 50 + 80 + 110).toFloat, (30 + 60 + 90 + 120).toFloat, 4f))
    // same raster through the PPM path decodes to identical features
    assert(Multimodal.decodePpmP6(Multimodal.encodePpmP6(2, 2, px)).toSeq == f.toSeq)
    // malformed payloads decode to the zero vector, never throw
    assert(Multimodal.decodeImageIOFeatures("not a png".getBytes).toSeq == Seq.fill(16)(0f))
    assert(Multimodal.decodeImageIOFeatures(enc.take(12)).toSeq == Seq.fill(16)(0f))
    assert(Multimodal.decodeImageIOFeatures(Array.empty).toSeq == Seq.fill(16)(0f))
    assert(Multimodal.decodeImageIOFeatures(null).toSeq == Seq.fill(16)(0f))
    // dispatch: every ImageIO format tag routes to the real decoder
    for (fmt <- Multimodal.ImageIOFormats)
      assert(Multimodal.decode(enc, fmt).toSeq == f.toSeq, fmt)
    assert(Multimodal.decode(enc, "text/plain").toSeq ==
      Multimodal.decodeToFeatures(enc).toSeq)
  }

  test("WAV PCM decoder: roundtrip, chunk walking, malformed safety") {
    val samples = Array[Short](100, -200, 300, -400, 0, 500)
    val enc = Multimodal.encodeWavPcm16(16000, samples)
    assert(enc.length == 44 + samples.length * 2)
    val Some((rate, dec)) = Multimodal.decodeWavPcm16(enc)
    assert(rate == 16000 && dec.toSeq == samples.toSeq)
    // feature kernel: integer-exact rate/ch/n/sum/peak/zero-crossings
    val f = Multimodal.decodeWavFeatures(enc)
    assert(f.take(6).toSeq == Seq(16000f, 1f, 6f, 300f, 500f, 4f))
    // real encoders put extra chunks (LIST/INFO) before data — the chunk
    // walk must skip them, including the odd-length pad byte
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3, 0) // len 3 + pad
    val withChunk = enc.take(12) ++ extra ++ enc.drop(12)
    // fix RIFF size (not load-bearing for our parser, but keep it honest)
    val Some((r2, d2)) = Multimodal.decodeWavPcm16(withChunk)
    assert(r2 == 16000 && d2.toSeq == samples.toSeq)
    // malformed payloads decode to None / zero features, never throw
    assert(Multimodal.decodeWavPcm16("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Multimodal.decodeWavPcm16("not a riff file at all....................................".getBytes).isEmpty)
    assert(Multimodal.decodeWavPcm16(enc.take(30)).isEmpty) // truncated
    assert(Multimodal.decodeWavPcm16(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeWavPcm16(null).isEmpty)
    // a data chunk claiming more bytes than the buffer holds must fail
    val lied = enc.clone()
    lied(40) = 127 // inflate data-chunk length field
    assert(Multimodal.decodeWavPcm16(lied).isEmpty)
    // stereo / non-PCM / non-16-bit are rejected (fmt gate)
    val stereo = enc.clone()
    stereo(22) = 2 // channels field
    assert(Multimodal.decodeWavPcm16(stereo).isEmpty)
    // format dispatch routes WAV to the real decoder
    assert(Multimodal.decode(enc, Multimodal.WavFormat).toSeq == f.toSeq)
  }

  test("decodeWavSamples seam: valid rows decode, malformed rows drop") {
    val s = spark
    import s.implicits._
    val good = Multimodal.encodeWavPcm16(8000, Array[Short](7, -8, 9))
    val bad = "definitely not a RIFF container, way past 44 bytes....".getBytes
    val truncated = good.take(20)
    val df = Seq((1L, good), (2L, bad), (3L, truncated), (4L, good))
      .toDF("doc_id", "payload")
    val out = Multimodal.decodeWavSamples(df, "doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 4L), s"malformed rows must drop: ${out.toSeq}")
    assert(out.forall { case (_, rate, ss) => rate == 8000 && ss == Seq(7, -8, 9) })
  }

  test("PPM P6 nearest-neighbor resize: exact sample positions, malformed safety") {
    // 4x2 source with distinct per-pixel values; resize to 2x2 samples
    // (x*4/2, y*2/2) = source pixels (0,0),(2,0),(0,1),(2,1)
    val px = Array.tabulate[Byte](4 * 2 * 3)(i => (i + 1).toByte)
    val enc = Multimodal.encodePpmP6(4, 2, px)
    val rz = Multimodal.resizePpmNearest(enc, 2, 2).get
    def pixel(x: Int, y: Int) = px.slice((y * 4 + x) * 3, (y * 4 + x) * 3 + 3).toSeq
    assert(rz.toSeq == (pixel(0, 0) ++ pixel(2, 0) ++ pixel(0, 1) ++ pixel(2, 1)))
    // identity resize reproduces the raster exactly
    assert(Multimodal.resizePpmNearest(enc, 4, 2).get.toSeq == px.toSeq)
    // upscale repeats source pixels, never reads out of bounds
    val up = Multimodal.resizePpmNearest(enc, 8, 4).get
    assert(up.length == 8 * 4 * 3)
    assert(up.take(3).toSeq == pixel(0, 0))
    // malformed payloads resize to None, never throw
    assert(Multimodal.resizePpmNearest("P6\n2 2\n255\nshort".getBytes, 2, 2).isEmpty)
    assert(Multimodal.resizePpmNearest(Array.empty, 2, 2).isEmpty)
    assert(Multimodal.resizePpmNearest(null, 2, 2).isEmpty)
  }

  test("frame sampler shape") {
    val payload = Array.tabulate[Byte](300)(_.toByte)
    val frames = Multimodal.sampleFrames(payload, frameBytes = 64, stride = 2)
    // offsets 0 and 128 fit (+64 <= 300); 256+64 > 300 excluded... 256+64=320>301
    assert(frames.size == 2)
    assert(frames.forall(_.length == 64))
    assert(Multimodal.sampleFrames(Array.empty[Byte], 64, 2).isEmpty)
  }

  test("feature extraction distributes and matches the kernel") {
    val docs = Tables.load(spark, sfDir, "documents")
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.ingest(docs, "text", "text/plain").repartition(5))
      .select(col("doc_id"), col("features"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val local = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Multimodal.decodeToFeatures(r.getString(1).getBytes).toSeq).toMap
    assert(feats == local)
  }

  test("multimodal payload pruning: metadata query does not read payload") {
    val ingested = Multimodal.ingest(Tables.load(spark, sfDir, "documents"), "text", "text/plain")
    val metaOnly = ingested.select(col("doc_id"), col("meta.n_bytes"))
    // payload must not survive into the optimized plan's output
    assert(!metaOnly.queryExecution.optimizedPlan.output.map(_.name).contains("payload"))
  }

  test("multimodal features feed the ANN machinery end-to-end") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.dot_product
    // decode-kernel features are array<float> — the exact currency the
    // similarity suite's codegen expressions consume; prove the loop:
    // binary ingest → feature extraction → brute-force cosine top-k
    val docs = Tables.load(spark, sfDir, "documents")
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.ingest(docs, "text", "text/plain"))
      .select(col("doc_id"), col("features"),
        dot_product(col("features"), col("features")).as("nsq"))
    val probes = feats.filter(col("doc_id") < 3)
      .select(col("doc_id").as("qid"), col("features").as("qf"), col("nsq").as("qn"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("doc_id"))
    val topk = feats.join(broadcast(probes), col("doc_id") =!= col("qid"))
      .select(col("qid"), col("doc_id"),
        (dot_product(col("qf"), col("features")) / sqrt(col("qn") * col("nsq"))).as("cos"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2)))
    assert(topk.length == 9, "3 probes x top-3 neighbors")
    assert(topk.forall { case (q, _, n, c) => q != n && c >= -1.0001 && c <= 1.0001 })
    // histogram features of same-vocabulary docs are highly aligned
    assert(topk.filter(_._2 == 1).forall(_._4 > 0.5), "rank-1 neighbors must be close")
  }
}
