package graft.sources

/** Deserializer plugin stage — the middle link of the reference's DSL
  * connector→deserializer→converter chain
  * (`/root/reference/src/main/scala/com/yahoo/bullet/spark/DSLDataProducer.scala:27-29`,
  * where a configured BulletDeserializer runs between the receiver and the
  * record converter).
  *
  * A deserializer turns one raw payload (bytes from the connector — a
  * whole ingested file, a message-bus record value, …) into zero or more
  * record payload strings in the form the converter step understands
  * (JSON matching the declared record schema; see `Ingest.convertJson`).
  * Implementations run ON EXECUTORS: they are loaded reflectively by
  * classname once per partition (so non-serializable decoder state is
  * fine) and must have a public no-arg constructor.
  *
  * This is deliberately the only per-record plugin point in the engine:
  * the built-in columnar paths (parquet/csv/json direct) never pay it,
  * and even here the decode is fused into one `mapPartitions` pass with
  * the JSON conversion handled by the codegen'd `from_json` projection
  * that follows. */
trait Deserializer extends Serializable {
  /** Decode one raw payload into record payload strings. */
  def deserialize(raw: Array[Byte]): Iterator[String]
}

object Deserializer {
  val ClassKey = "graft.producer.deserializer.class"

  /** Reflectively instantiate a deserializer class (driver-side for
    * validation, executor-side at partition open). */
  def load(className: String): Deserializer = {
    val cls =
      try Class.forName(className)
      catch {
        case _: ClassNotFoundException =>
          throw new IllegalArgumentException(
            s"$ClassKey=$className: class not found")
      }
    if (!classOf[Deserializer].isAssignableFrom(cls))
      throw new IllegalArgumentException(
        s"$ClassKey=$className does not implement ${classOf[Deserializer].getName}")
    cls.getDeclaredConstructor().newInstance().asInstanceOf[Deserializer]
  }
}

/** Identity deserializer: the payload already is one UTF-8 record. */
final class Utf8Deserializer extends Deserializer {
  override def deserialize(raw: Array[Byte]): Iterator[String] =
    Iterator(new String(raw, "UTF-8"))
}

/** UTF-8 lines deserializer: one record per non-empty line (the shape of
  * a log-file connector whose converter expects JSON-lines). */
final class LinesDeserializer extends Deserializer {
  override def deserialize(raw: Array[Byte]): Iterator[String] =
    new String(raw, "UTF-8").linesIterator.filter(_.nonEmpty)
}

/** Avro object-container deserializer (reference parity: avro records are
  * first-class inputs there — avro dependency `pom.xml:131-134`, kryo
  * registration `BulletSparkKryoRegistrator.scala:13-16`). One payload is
  * one Avro container file (self-describing: the writer schema travels in
  * the header, so no schema config is needed); each Avro record renders
  * to its canonical JSON form (`GenericRecord.toString`), which the
  * declared-schema converter then types. Built on the plain Java Avro
  * library on the classpath — there is no spark-avro module here. */
final class AvroContainerDeserializer extends Deserializer {
  override def deserialize(raw: Array[Byte]): Iterator[String] = {
    val reader = new org.apache.avro.file.DataFileStream(
      new java.io.ByteArrayInputStream(raw),
      new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    new Iterator[String] {
      override def hasNext: Boolean = {
        val h = reader.hasNext
        if (!h) reader.close()
        h
      }
      override def next(): String = reader.next().toString
    }
  }
}
