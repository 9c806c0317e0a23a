package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Pluggable data producer loaded by classname config (A3) — the analog of
  * the reference's `DataProducer.getProducer`, which reflects a
  * user-supplied class out of YAML config
  * (`/root/reference/src/main/scala/com/yahoo/bullet/spark/DataProducer.scala:22-36`,
  * `bullet_spark_defaults.yaml:5-13`).
  *
  * A producer owns the connector→deserializer→converter chain for one
  * source and returns a STREAMING DataFrame in the engine's record schema;
  * deployments point `graft.producer.class` at their implementation and
  * pass the rest of the config map through. Implementations must have a
  * no-arg constructor. */
trait DataProducer {
  def stream(spark: SparkSession, config: Map[String, String]): DataFrame
}

object DataProducer {
  val ClassKey = "graft.producer.class"

  /** Reflectively instantiate the configured producer class. */
  def load(config: Map[String, String]): DataProducer = {
    val cn = config.getOrElse(ClassKey,
      throw new IllegalArgumentException(s"missing $ClassKey"))
    val cls =
      try Class.forName(cn)
      catch {
        case _: ClassNotFoundException =>
          throw new IllegalArgumentException(s"$ClassKey=$cn: class not found")
      }
    if (!classOf[DataProducer].isAssignableFrom(cls))
      throw new IllegalArgumentException(
        s"$ClassKey=$cn does not implement ${classOf[DataProducer].getName}")
    cls.getDeclaredConstructor().newInstance().asInstanceOf[DataProducer]
  }

  /** Load + run: the one-call config seam a deployment's main uses. */
  def produce(spark: SparkSession, config: Map[String, String]): DataFrame =
    load(config).stream(spark, config)
}

/** Built-in: the rate load generator (`graft.producer.rowsPerSecond`). */
final class RateProducer extends DataProducer {
  override def stream(spark: SparkSession, config: Map[String, String]): DataFrame =
    Ingest.rateStream(spark, config.getOrElse("graft.producer.rowsPerSecond", "100").toInt)
}

/** Built-in: file-stream connector + declared schema
  * (`graft.producer.format`, `graft.producer.path`,
  * `graft.producer.schema` as DDL). */
final class FileStreamProducer extends DataProducer {
  override def stream(spark: SparkSession, config: Map[String, String]): DataFrame =
    Ingest.stream(spark,
      config.getOrElse("graft.producer.format", "parquet"),
      config("graft.producer.path"),
      StructType.fromDDL(config("graft.producer.schema")))
}

/** Built-in DSL chain: any raw source with a string payload column,
  * deserialized against a declared record schema via `Ingest.convertJson`
  * (`graft.producer.payloadColumn`, `graft.producer.recordSchema` as DDL)
  * — the from_json analog of the reference's converter step, fused by
  * Catalyst into the scan projection. Subclass and override [[raw]] to
  * swap the connector. */
class JsonDslProducer extends DataProducer {
  protected def raw(spark: SparkSession, config: Map[String, String]): DataFrame =
    Ingest.stream(spark,
      config.getOrElse("graft.producer.format", "text"),
      config("graft.producer.path"),
      StructType.fromDDL(config.getOrElse("graft.producer.rawSchema", "value STRING")))

  override def stream(spark: SparkSession, config: Map[String, String]): DataFrame =
    Ingest.convertJson(
      raw(spark, config),
      config.getOrElse("graft.producer.payloadColumn", "value"),
      StructType.fromDDL(config("graft.producer.recordSchema")))
}

/** Full DSL chain with the pluggable deserializer stage in the middle —
  * connector → deserializer → converter, the reference's
  * `DSLDataProducer.scala:27-29` shape end to end:
  *
  *  - connector: a `binaryFile` file stream over `graft.producer.path`
  *    (each arriving file is one raw payload; decode parallelism is
  *    per-file). On a message bus the same chain applies with the bus's
  *    binary `value` column as `graft.producer.payloadColumn`.
  *  - deserializer: `graft.producer.deserializer.class` (default
  *    [[Utf8Deserializer]]), bytes → record payload strings, loaded by
  *    classname on the executors.
  *  - converter: `from_json` against `graft.producer.recordSchema` DDL.
  */
class BytesDslProducer extends DataProducer {
  protected def raw(spark: SparkSession, config: Map[String, String]): DataFrame = {
    // binaryFile's schema is fixed but (like every file stream source)
    // must still be declared for readStream
    val reader = spark.readStream.format("binaryFile").schema(StructType.fromDDL(
      "path STRING, modificationTime TIMESTAMP, length BIGINT, content BINARY"))
    config.get("graft.producer.globFilter")
      .fold(reader)(g => reader.option("pathGlobFilter", g))
      .load(config("graft.producer.path"))
  }

  override def stream(spark: SparkSession, config: Map[String, String]): DataFrame =
    Ingest.convertJson(
      Ingest.deserialize(
        raw(spark, config),
        config.getOrElse("graft.producer.payloadColumn", "content"),
        config.getOrElse(Deserializer.ClassKey, classOf[Utf8Deserializer].getName)),
      Ingest.RawPayloadCol,
      StructType.fromDDL(config("graft.producer.recordSchema")))
}

/** Built-in: Avro record ingestion — [[BytesDslProducer]] pinned to the
  * [[AvroContainerDeserializer]]. Config: `graft.producer.path` (directory
  * of `.avro` container files) and `graft.producer.recordSchema` (DDL of
  * the record fields to type out of the self-describing containers). */
final class AvroProducer extends BytesDslProducer {
  override def stream(spark: SparkSession, config: Map[String, String]): DataFrame =
    super.stream(spark,
      config + (Deserializer.ClassKey -> classOf[AvroContainerDeserializer].getName))
}
