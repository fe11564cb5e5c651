package graft.storage

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Cross-process mutual exclusion for store maintenance, via an
  * exclusively-created lock FILE next to the table.
  *
  * The JVM-local `AstarteStore.lockFor` monitors serialize writers
  * within one driver process; two driver PROCESSES sharing a store
  * root (an ingest job plus a separate vacuum job) never see each
  * other's monitors. Maintenance (sweep/compaction) is the only part
  * of the protocol that needs cross-process exclusion — appends are
  * made safe structurally by [[AstarteStore.appendAtomic]]'s
  * unique-tmp-then-rename commit, and the reference gets both for
  * free from Cassandra's server-side per-cell LWW
  * (`queries.ex:87-155`).
  *
  * Protocol: `create(overwrite = false)` — atomic on local FS and
  * HDFS — wins the lock; the file body records owner + acquire time
  * for diagnosis. A crashed owner's lock goes STALE and is broken
  * after `staleMs` (maintenance is idempotent and crash-recoverable
  * by design — adopt-and-retire converges on rerun — so breaking a
  * stale lock is safe; the stale window only delays, never corrupts).
  * On object stores without atomic create, swap this for the store's
  * conditional-put primitive.
  */
object ProcessLock {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Run `body` holding the cross-process lock file at `lockPath`.
    * Polls up to `waitMs` for a held lock, breaking it if older than
    * `staleMs`; throws if the lock cannot be acquired in time (the
    * caller's maintenance run is skipped loudly, not silently).
    */
  def withLock[A](fs: FileSystem, lockPath: HPath,
      staleMs: Long = 10 * 60 * 1000L, waitMs: Long = 60 * 1000L)(body: => A): A = {
    val deadline = System.currentTimeMillis() + waitMs
    var acquired = false
    while (!acquired) {
      acquired = tryAcquire(fs, lockPath)
      if (!acquired) {
        breakIfStale(fs, lockPath, staleMs)
        if (System.currentTimeMillis() > deadline)
          throw new java.io.IOException(
            s"could not acquire maintenance lock $lockPath within ${waitMs}ms — " +
              "another process holds it; rerun after it finishes")
        Thread.sleep(200)
      }
    }
    try body finally {
      try fs.delete(lockPath, false)
      catch { case e: java.io.IOException =>
        log.warn(s"failed to release lock $lockPath: $e — it will go stale") }
    }
  }

  private def tryAcquire(fs: FileSystem, lockPath: HPath): Boolean =
    try {
      val parent = lockPath.getParent
      if (parent != null) fs.mkdirs(parent)
      val out = fs.create(lockPath, /* overwrite = */ false)
      try out.write(
        s"pid=${ProcessHandle.current().pid()} acquired_ms=${System.currentTimeMillis()}\n"
          .getBytes("UTF-8"))
      finally out.close()
      true
    } catch {
      case _: java.io.IOException => false // exists (held) or transient FS error
    }

  private def breakIfStale(fs: FileSystem, lockPath: HPath, staleMs: Long): Unit =
    try {
      val st = fs.getFileStatus(lockPath)
      if (System.currentTimeMillis() - st.getModificationTime > staleMs) {
        log.warn(s"breaking stale maintenance lock $lockPath " +
          s"(age ${System.currentTimeMillis() - st.getModificationTime}ms)")
        fs.delete(lockPath, false)
      }
    } catch { case _: java.io.IOException => () } // vanished between check and stat
}
