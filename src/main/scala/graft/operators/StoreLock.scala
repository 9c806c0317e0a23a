package graft.operators

import java.nio.channels.{FileChannel, OverlappingFileLockException}
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
  *  - an OS file lock on the SIBLING file `<store>.lock` (serializes
  *    commits across JVMs sharing one store directory;
  *    `FileChannel.lock` blocks until the peer releases). The lock file
  *    lives OUTSIDE the store directory on purpose: rebuild paths delete
  *    the store directory wholesale, and deleting a lock file a peer
  *    holds open would let a third process create-and-lock a fresh one,
  *    silently breaking the mutual exclusion.
  *
  * The lock file is contention metadata, never data: store readers
  * ignore it, and a crashed holder's lock releases with its process (OS
  * advisory locks die with the owner — no stale-lock recovery needed).
  *
  * The first acquisition per store path also PROBES exclusivity: while
  * the lock is held, a `tryLock` from a second channel must be refused
  * (null, or the JVM's own overlap exception). A filesystem whose
  * advisory locks are granted unconditionally fails fast here instead of
  * silently running unserialized commits. The probe is cheap (one extra
  * open+tryLock, once per path per JVM) and exercises the JVM-overlap
  * layer; a remote filesystem that drops locks across MACHINES is beyond
  * what one process can observe — on such deployments (object stores,
  * NFS without lockd) replace this seam with a conditional put or a
  * metastore transaction, as BASELINE.md's deployment note states. */
object StoreLock {

  private val jvmLocks = new ConcurrentHashMap[String, Object]()
  private val probed = ConcurrentHashMap.newKeySet[String]()

  private def lockFile(storePath: String) = {
    val p = Paths.get(storePath.stripSuffix("/") + ".lock")
    Option(p.getParent).foreach(Files.createDirectories(_))
    p
  }

  /** While holding `held` on `path`, a second channel's tryLock must NOT
    * succeed — advisory locking that hands out overlapping exclusive
    * locks would void every commit-idempotence guarantee downstream. */
  private def probeExclusive(path: java.nio.file.Path): Unit = {
    val ch2 = FileChannel.open(path, StandardOpenOption.WRITE)
    try {
      val second =
        try Option(ch2.tryLock())
        catch { case _: OverlappingFileLockException => None }
      second.foreach { l =>
        l.release()
        throw new IllegalStateException(
          s"advisory file locks are no-ops on ${path.getParent}: a second " +
            "channel acquired an exclusive lock while one was held — store " +
            "commits cannot be serialized on this filesystem; use an " +
            "object-store conditional put / metastore transaction seam")
      }
    } finally ch2.close()
  }

  def withLock[T](storePath: String)(body: => T): T = {
    val monitor = jvmLocks.computeIfAbsent(storePath, _ => new Object)
    monitor.synchronized {
      val lf = lockFile(storePath)
      val ch = FileChannel.open(lf,
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      try {
        val lock = ch.lock()
        try {
          if (probed.add(storePath)) probeExclusive(lf)
          Files.createDirectories(Paths.get(storePath))
          body
        } finally lock.release()
      } finally ch.close()
    }
  }
}
