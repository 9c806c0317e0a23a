package graft.operators

import java.nio.channels.FileChannel
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.concurrent.ConcurrentHashMap

/** Commit-path mutual exclusion for the persisted stores (sketch
  * warehouse, near-dup signature store). Two at-least-once schedulers
  * committing the same day concurrently must serialize, so the
  * read-check-then-append idempotence pattern actually holds — without
  * this, both read "day absent" and both append (the check-then-act
  * race).
  *
  * Two layers, both required:
  *  - a per-path JVM monitor (`java.nio` FileLock throws
  *    OverlappingFileLockException for two threads of ONE JVM, so
  *    in-process callers synchronize first), and
  *  - an OS file lock on `<store>/_commit.lock` (serializes commits
  *    across JVMs sharing one store directory; `FileChannel.lock` blocks
  *    until the peer releases).
  *
  * The lock file is contention metadata, never data: store readers
  * ignore it, and a crashed holder's lock releases with its process (OS
  * advisory locks die with the owner — no stale-lock recovery needed).
  * On a warehouse deployment the same contract is an object-store
  * conditional put / a metastore transaction; the seam is this one
  * function. */
object StoreLock {

  private val jvmLocks = new ConcurrentHashMap[String, Object]()

  def withLock[T](storePath: String)(body: => T): T = {
    val monitor = jvmLocks.computeIfAbsent(storePath, _ => new Object)
    monitor.synchronized {
      Files.createDirectories(Paths.get(storePath))
      val ch = FileChannel.open(Paths.get(storePath, "_commit.lock"),
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      try {
        val lock = ch.lock()
        try body finally lock.release()
      } finally ch.close()
    }
  }
}
