package graft

import java.nio.file.Files

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.sources.{Ingest, Tables}

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
}
