package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Pluggable message transport — the deployable analog of the reference's
  * PubSub publishers: CLIP results out, FEEDBACK signals back in
  * (`/root/reference/src/main/scala/com/yahoo/bullet/spark/ResultEmitter.scala:19-30`,
  * `LoopedReceiver.scala:20-35`).
  *
  * The engine's driver is the single publication point (results are
  * already driver-held partials, O(sketch) per query), so a transport is
  * two driver-side verbs: `send` on a channel and `poll` to drain one.
  * Implementations adapt to anything with those verbs — a Kafka
  * producer/consumer pair, HTTP, a file queue. No broker ships in this
  * container, so the in-memory implementation is the tested one; the
  * trait is the contract. */
trait Transport {
  def send(channel: String, key: String, payload: String): Unit
  /** Drain pending (key, payload) messages on `channel`, oldest first. */
  def poll(channel: String): Seq[(String, String)]
}

/** Loopback transport for tests and single-process embedding. */
final class InMemoryTransport extends Transport {
  private val channels = TrieMap.empty[String, ConcurrentLinkedQueue[(String, String)]]

  override def send(channel: String, key: String, payload: String): Unit =
    channels.getOrElseUpdate(channel, new ConcurrentLinkedQueue).add(key -> payload)

  override def poll(channel: String): Seq[(String, String)] =
    channels.get(channel) match {
      case None => Seq.empty
      case Some(q) =>
        val out = Vector.newBuilder[(String, String)]
        var m = q.poll()
        while (m != null) { out += m; m = q.poll() }
        out.result()
    }

  def peek(channel: String): Seq[(String, String)] =
    channels.get(channel).map(_.asScala.toVector).getOrElse(Vector.empty)
}

/** File-backed transport: one directory per channel, one file per message
  * (atomic temp-write + rename), names ordered by a monotonic sequence so
  * `poll` drains oldest-first. Works across processes over any shared
  * filesystem — the zero-dependency deployable transport for this
  * container; a Kafka implementation is the same two verbs over a
  * producer/consumer pair. Message files hold `key \n payload` (Clip JSON
  * escapes control characters, so the first newline is the separator). */
final class FileTransport(root: String) extends Transport {
  private val seq = new java.util.concurrent.atomic.AtomicLong()
  private val id = java.lang.Long.toHexString(System.nanoTime())

  private def dir(channel: String): java.nio.file.Path = {
    val p = java.nio.file.Paths.get(root, channel)
    java.nio.file.Files.createDirectories(p)
    p
  }

  override def send(channel: String, key: String, payload: String): Unit = {
    val d = dir(channel)
    val name = f"${System.currentTimeMillis()}%013d-$id-${seq.incrementAndGet()}%09d"
    val tmp = d.resolve(s".$name.tmp")
    java.nio.file.Files.write(tmp, s"$key\n$payload".getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, d.resolve(name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Concurrent consumers are safe: each message is claimed by an atomic
    * rename to a consumer-private hidden name before it is read, so a
    * message is delivered to exactly one poller (the loser's move fails
    * and the file is skipped). */
  override def poll(channel: String): Seq[(String, String)] = {
    val d = dir(channel)
    val listing = java.nio.file.Files.list(d)
    val names = Vector.newBuilder[java.nio.file.Path]
    try {
      val files = listing.iterator()
      while (files.hasNext) {
        val f = files.next()
        if (!f.getFileName.toString.startsWith(".")) names += f
      }
    } finally listing.close()
    names.result().sortBy(_.getFileName.toString).flatMap { f =>
      val claimed = f.resolveSibling(s".claim-$id-${f.getFileName}")
      val won =
        try { java.nio.file.Files.move(f, claimed); true }
        catch { case _: java.io.IOException => false }
      if (!won) None
      else {
        val s = new String(java.nio.file.Files.readAllBytes(claimed), "UTF-8")
        java.nio.file.Files.deleteIfExists(claimed)
        val i = s.indexOf('\n')
        Some(if (i < 0) (s, "") else (s.substring(0, i), s.substring(i + 1)))
      }
    }
  }
}

/** Bridges a [[MultiQueryEngine]] onto a [[Transport]]:
  *
  *  - every result message is published to `clipChannel` as
  *    `kind \t clip-json`, keyed by query id (the reference's CLIP
  *    channel);
  *  - [[pump]] drains `feedbackChannel` and applies
  *    `submit`/`kill` feedback payloads (`action \t query_id \t bql`) to
  *    the engine — the reference's FEEDBACK loop, through which a remote
  *    frontend kills or re-issues queries.
  *
  * Call [[pump]] once per batch tick (the engine's `attach` cadence) or on
  * any schedule the transport's latency budget wants. */
final class TransportBridge(
    engine: MultiQueryEngine,
    transport: Transport,
    clipChannel: String = "graft.clips",
    feedbackChannel: String = "graft.feedback") {

  engine.addSink(new ResultSink {
    override def publish(m: ResultMessage): Unit =
      transport.send(clipChannel, m.queryId, s"${m.kind}\t${m.clip.asJson}")
  })

  /** Apply pending feedback to the engine. Malformed payloads are dropped
    * (transport noise must not kill the driver loop). */
  def pump(): Unit =
    transport.poll(feedbackChannel).foreach { case (_, payload) =>
      payload.split('\t') match {
        case Array(action, id, rest @ _*) => action.toLowerCase match {
          case "kill" => engine.kill(id)
          case "submit" => engine.submit(id, rest.mkString("\t"))
          case _ => ()
        }
        case _ => ()
      }
    }
}
