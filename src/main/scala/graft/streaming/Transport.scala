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

/** Length-prefixed frame codec shared by the socket server and client:
  * a frame is a 4-byte big-endian byte length followed by that many bytes
  * of UTF-8 text. */
private[streaming] object Frames {
  /** Upper bound on one frame; a CLIP is O(sketch) so 64 MiB is generous.
    * Guards the reader against a garbage length from a corrupt peer. */
  val MaxFrameBytes: Int = 64 * 1024 * 1024

  def write(out: java.io.DataOutputStream, s: String): Unit = {
    val b = s.getBytes("UTF-8")
    out.writeInt(b.length)
    out.write(b)
  }

  def read(in: java.io.DataInputStream): String = {
    val n = in.readInt()
    if (n < 0 || n > MaxFrameBytes)
      throw new java.io.IOException(s"bad frame length $n")
    val b = new Array[Byte](n)
    in.readFully(b)
    new String(b, "UTF-8")
  }
}

/** Socket-based transport broker — the stand-in for the reference's
  * network PubSub backplane
  * (`/root/reference/src/main/scala/com/yahoo/bullet/spark/QueryReceiver.scala:21-68`,
  * `ResultPublisher.scala:23-56`) in a container with no broker on the
  * classpath. The server owns the channel queues (an [[InMemoryTransport]]
  * store) and speaks a two-request protocol over length-prefixed frames:
  *
  *  - `SEND \t channel \t key \t payload` → `OK`
  *  - `POLL \t channel` → count frame, then one `key \n payload` frame per
  *    message (oldest first)
  *
  * Channel names and keys must not contain tab/newline; payloads are
  * arbitrary (the frame is length-delimited). One daemon thread accepts,
  * one daemon thread per connection serves — fine for the handful of
  * frontends a driver talks to; this is a control/result plane, not a data
  * plane. */
final class SocketTransportServer(requestedPort: Int = 0) extends AutoCloseable {
  private val store = new InMemoryTransport
  private val server = new java.net.ServerSocket()
  server.setReuseAddress(true) // restart-on-same-port must not hit TIME_WAIT
  server.bind(new java.net.InetSocketAddress(requestedPort))
  @volatile private var running = true
  private val conns =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.net.Socket]()

  /** The bound port (useful when constructed with port 0). */
  def port: Int = server.getLocalPort

  private def serve(sock: java.net.Socket): Unit = {
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(sock.getInputStream))
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(sock.getOutputStream))
    try {
      while (running) {
        Frames.read(in).split("\t", 4) match {
          case Array("SEND", ch, key, payload) =>
            store.send(ch, key, payload)
            Frames.write(out, "OK")
          case Array("POLL", ch) =>
            val msgs = store.poll(ch)
            Frames.write(out, msgs.size.toString)
            msgs.foreach { case (k, p) => Frames.write(out, s"$k\n$p") }
          case _ =>
            Frames.write(out, "ERR")
        }
        out.flush()
      }
    } catch {
      case _: java.io.IOException => () // client went away; its queue stays
    } finally { conns.remove(sock); sock.close() }
  }

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        conns.add(sock)
        if (!running) sock.close() // raced with close(); don't serve
        else {
          val t = new Thread(() => serve(sock), s"graft-socket-serve-$port")
          t.setDaemon(true)
          t.start()
        }
      } catch {
        case _: java.io.IOException => () // closed during accept
      }
    }
  }, s"graft-socket-accept-$port")
  acceptor.setDaemon(true)
  acceptor.start()

  /** Stops accepting AND severs live connections — a closed broker must
    * look dead to clients immediately, or a lingering handler could keep
    * acking sends into a store nobody will ever poll again. */
  override def close(): Unit = {
    running = false
    server.close()
    conns.forEach(s => try s.close() catch { case _: java.io.IOException => () })
  }
}

/** Reconnecting socket client for [[SocketTransportServer]]. Each verb is
  * one request/response exchange on a single pooled connection
  * (synchronized — callers on many threads interleave whole frames, never
  * bytes). On any I/O failure the connection is torn down and the request
  * retried on a fresh connect, up to `maxRetries` with `retryDelayMs`
  * backoff, so a server restart is invisible to the engine loop.
  *
  * Delivery semantics under connection loss are the usual pubsub
  * tradeoffs, stated honestly: a retried `send` whose first ack was lost
  * can duplicate (at-least-once out), and a `poll` whose response is cut
  * mid-stream loses the already-dequeued remainder (at-most-once in).
  * Within one healthy connection both verbs are exact. */
final class SocketTransport(
    host: String,
    port: Int,
    maxRetries: Int = 20,
    retryDelayMs: Long = 50L) extends Transport with AutoCloseable {

  private var sock: java.net.Socket = null
  private var in: java.io.DataInputStream = null
  private var out: java.io.DataOutputStream = null

  private def disconnect(): Unit = {
    if (sock != null) {
      try sock.close() catch { case _: java.io.IOException => () }
    }
    sock = null; in = null; out = null
  }

  private def ensureConnected(): Unit =
    if (sock == null || sock.isClosed) {
      val s = new java.net.Socket(host, port)
      s.setTcpNoDelay(true)
      sock = s
      in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(s.getInputStream))
      out = new java.io.DataOutputStream(
        new java.io.BufferedOutputStream(s.getOutputStream))
    }

  private def exchange[A](request: String)(readResponse: java.io.DataInputStream => A): A =
    synchronized {
      var attempt = 0
      var result: Option[A] = None
      while (result.isEmpty) {
        try {
          ensureConnected()
          Frames.write(out, request)
          out.flush()
          result = Some(readResponse(in))
        } catch {
          case e: java.io.IOException =>
            disconnect()
            attempt += 1
            if (attempt > maxRetries) throw e
            Thread.sleep(retryDelayMs)
        }
      }
      result.get
    }

  override def send(channel: String, key: String, payload: String): Unit =
    exchange(s"SEND\t$channel\t$key\t$payload") { in =>
      val r = Frames.read(in)
      if (r != "OK") throw new java.io.IOException(s"unexpected send ack: $r")
    }

  override def poll(channel: String): Seq[(String, String)] =
    exchange(s"POLL\t$channel") { in =>
      val n = Frames.read(in).toInt
      (0 until n).map { _ =>
        val m = Frames.read(in)
        val i = m.indexOf('\n')
        if (i < 0) (m, "") else (m.substring(0, i), m.substring(i + 1))
      }
    }

  override def close(): Unit = synchronized(disconnect())
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
