package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Multi-format ingestion layer — our equivalent of the reference's
  * pluggable DataProducer / DSL connector→deserializer→converter pipeline
  * (`/root/reference/src/main/scala/com/yahoo/bullet/spark/DataProducer.scala:47-58`,
  * `DSLDataProducer.scala:27-29`: receiver → deserialize → convert).
  *
  * Spark-native mapping: the "connector" is a DataSource V2 format
  * (parquet/csv/json/kafka/rate/socket), the "deserializer+converter" is a
  * declarative column pipeline (`from_json` + select) that Catalyst fuses
  * into the scan — so conversion costs one codegen'd projection, not a
  * per-record plugin call. Batch and streaming share schemas and the
  * conversion step (`readStream` variants).
  */
object Ingest {

  /** Explicit schemas: streaming sources cannot infer, and at 100 TB
    * inference is a full extra pass — schemas are always declared. */
  def batch(spark: SparkSession, format: String, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.format(format)
    val withSchema = schema.map(r.schema).getOrElse(r)
    format match {
      case "csv" => withSchema.option("header", "true").load(path)
      case _ => withSchema.load(path)
    }
  }

  def stream(spark: SparkSession, format: String, path: String,
      schema: StructType): DataFrame = {
    val r = spark.readStream.format(format).schema(schema)
    format match {
      case "csv" => r.option("header", "true").load(path)
      case _ => r.load(path)
    }
  }

  /** Fan-in of N parallel producers (the reference unions its producer
    * streams, `QueryDataUnioning.scala:85-91`); schemas must match. */
  def unionAll(sources: Seq[DataFrame]): DataFrame =
    sources.reduce(_.union(_))

  /** Rate source: the built-in load generator (the analog of the
    * reference's test DataProducer). */
  def rateStream(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()

  /** DSL "converter" step: parse a raw JSON payload column against a
    * declared schema and flatten it — the from_json analog of the
    * reference's MapBulletRecordConverter. */
  def convertJson(df: DataFrame, payloadCol: String, schema: StructType): DataFrame = {
    val parsed = df.withColumn("__rec", from_json(col(payloadCol), schema))
    schema.fieldNames.foldLeft(parsed) { (d, f) =>
      d.withColumn(f, col(s"__rec.$f"))
    }.drop("__rec", payloadCol)
  }

  /** DSL "deserializer" step: run a classname-configured [[Deserializer]]
    * over a binary payload column, yielding one `value` string row per
    * decoded record. The plugin is instantiated once per partition on the
    * executor (classnames serialize; decoder state need not), so the cost
    * is one object per task plus the per-record virtual call the plugin
    * seam inherently is. Works identically on batch and streaming frames
    * (`mapPartitions` is stateless). */
  /** Reserved output column of [[deserialize]] — a name no record schema
    * will claim, so the converter's drop can never eat a record field. */
  val RawPayloadCol = "__graft_raw_payload"

  def deserialize(df: DataFrame, payloadCol: String, deserializerClass: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    Deserializer.load(deserializerClass) // fail fast on the driver
    df.select(col(payloadCol)).as[Array[Byte]].mapPartitions { it =>
      val d = Deserializer.load(deserializerClass)
      it.flatMap(d.deserialize)
    }.toDF(RawPayloadCol)
  }

  /** Batch Avro container-file ingestion: binaryFile connector (one row
    * per file, decode parallel across files) → Avro deserializer →
    * declared-schema converter. */
  def batchAvro(spark: SparkSession, path: String, schema: StructType): DataFrame =
    convertJson(
      deserialize(batch(spark, "binaryFile", path), "content",
        classOf[AvroContainerDeserializer].getName),
      RawPayloadCol, schema)

  /** Kafka source/sink configuration (no broker in this container; the
    * option surface is the tested contract). */
  def kafkaStream(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "latest")
      .load()
}
