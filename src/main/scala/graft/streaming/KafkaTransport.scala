package graft.streaming

/** [[Transport]] over Apache Kafka — the deployable broker binding of
  * the reference's network PubSub edge
  * (`/root/reference/src/main/scala/com/yahoo/bullet/spark/QueryReceiver.scala:21-68`,
  * `ResultPublisher.scala:78-99`): channels map to topics, `send` is a
  * flushed produce (at-least-once out), `poll` drains one consumer-group
  * read with a synchronous offset commit after the batch is in hand.
  *
  * BINDING: this container ships no broker and no kafka-clients jar
  * (zero egress), so the adapter binds `org.apache.kafka.clients.*`
  * REFLECTIVELY — the file compiles and is contract-shaped here, and a
  * deployment that puts `kafka-clients` on the classpath (every Spark
  * distro with the Kafka connector already does) gets a working
  * transport with no code change. Constructing it without the jar
  * throws immediately with a clear message; [[KafkaTransport.available]]
  * lets callers (and TransportContractSpec, which runs the shared
  * contract against it when present) probe first.
  *
  * Semantics, stated like SocketTransport's: a `send` retried after a
  * lost ack can duplicate (at-least-once); a crash between `poll`'s
  * return and the caller acting on it re-delivers on restart (the commit
  * happens inside `poll`, so losing the RESULT of a poll loses those
  * messages to this group — same at-most-once-after-commit window every
  * auto-commit consumer has). One consumer per channel, single-threaded
  * access per instance (synchronized verbs), `close` releases both ends.
  */
final class KafkaTransport(
    bootstrapServers: String,
    groupId: String,
    pollTimeoutMs: Long = 500L) extends Transport with AutoCloseable {
  import KafkaTransport._

  require(available,
    "kafka-clients is not on the classpath; KafkaTransport binds it " +
      "reflectively at runtime — add org.apache.kafka:kafka-clients to " +
      "the deployment classpath")

  private val producer: AnyRef = {
    val props = new java.util.Properties()
    props.put("bootstrap.servers", bootstrapServers)
    props.put("key.serializer", StringSer)
    props.put("value.serializer", StringSer)
    cls(ProducerCls).getConstructor(classOf[java.util.Properties])
      .newInstance(props).asInstanceOf[AnyRef]
  }
  private val sendMethod = cls(ProducerCls)
    .getMethod("send", cls(ProducerRecordCls))
  private val flushMethod = cls(ProducerCls).getMethod("flush")
  private val recordCtor = cls(ProducerRecordCls).getConstructor(
    classOf[String], classOf[Object], classOf[Object])

  // one consumer per channel, created on first poll of that channel
  private val consumers = scala.collection.mutable.Map.empty[String, AnyRef]

  private def consumerFor(channel: String): AnyRef =
    consumers.getOrElseUpdate(channel, {
      val props = new java.util.Properties()
      props.put("bootstrap.servers", bootstrapServers)
      props.put("group.id", groupId)
      props.put("key.deserializer", StringDeser)
      props.put("value.deserializer", StringDeser)
      props.put("auto.offset.reset", "earliest")
      props.put("enable.auto.commit", "false")
      val c = cls(ConsumerCls).getConstructor(classOf[java.util.Properties])
        .newInstance(props).asInstanceOf[AnyRef]
      cls(ConsumerCls)
        .getMethod("subscribe", classOf[java.util.Collection[_]])
        .invoke(c, java.util.Collections.singletonList(channel))
      c
    })

  override def send(channel: String, key: String, payload: String): Unit =
    synchronized {
      val record = recordCtor.newInstance(channel, key, payload)
        .asInstanceOf[AnyRef]
      sendMethod.invoke(producer, record)
      flushMethod.invoke(producer) // ack-before-return, the contract's send
    }

  override def poll(channel: String): Seq[(String, String)] = synchronized {
    val c = consumerFor(channel)
    val records = cls(ConsumerCls)
      .getMethod("poll", classOf[java.time.Duration])
      .invoke(c, java.time.Duration.ofMillis(pollTimeoutMs))
    val it = records.getClass.getMethod("iterator").invoke(records)
      .asInstanceOf[java.util.Iterator[AnyRef]]
    val out = Vector.newBuilder[(String, String)]
    while (it.hasNext) {
      val r = it.next()
      val k = r.getClass.getMethod("key").invoke(r)
      val v = r.getClass.getMethod("value").invoke(r)
      out += ((if (k == null) "" else k.toString,
        if (v == null) "" else v.toString))
    }
    cls(ConsumerCls).getMethod("commitSync").invoke(c)
    out.result()
  }

  override def close(): Unit = synchronized {
    consumers.values.foreach(c =>
      try cls(ConsumerCls).getMethod("close").invoke(c)
      catch { case _: Throwable => () })
    consumers.clear()
    try cls(ProducerCls).getMethod("close").invoke(producer)
    catch { case _: Throwable => () }
  }
}

object KafkaTransport {
  private val ProducerCls = "org.apache.kafka.clients.producer.KafkaProducer"
  private val ProducerRecordCls = "org.apache.kafka.clients.producer.ProducerRecord"
  private val ConsumerCls = "org.apache.kafka.clients.consumer.KafkaConsumer"
  private val StringSer = "org.apache.kafka.common.serialization.StringSerializer"
  private val StringDeser = "org.apache.kafka.common.serialization.StringDeserializer"

  private def cls(name: String): Class[_] = Class.forName(name)

  /** True iff kafka-clients is loadable on this classpath. */
  def available: Boolean =
    try { Class.forName(ProducerCls); true }
    catch { case _: ClassNotFoundException => false }
}
