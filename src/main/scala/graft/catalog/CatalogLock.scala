package graft.catalog

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}

/** Cross-process catalog write lock — the filesystem stand-in for the
  * row transactions the reference gets from Postgres
  * (app/crud/base.py:20-40, server-side unique constraints at
  * app/models/hyperfile.py:43).
  *
  * Every [[MetaStore]] mutator is a read-modify-overwrite of a whole
  * registry table; a JVM-local mutex only serializes writers INSIDE one
  * process. Two driver processes (or two store instances) over the same
  * catalog root could interleave read-modify-write and silently lose an
  * update. This lock closes that: one `_catalog.lock` file under the
  * root, taken around every mutation, on any Hadoop filesystem.
  *
  * Protocol (create-exclusive + stale takeover):
  *  1. JVM tier: one monitor per qualified lock path serializes threads
  *     and store instances within this process, so the filesystem only
  *     ever sees ONE contender per process. Reentrant per thread (a
  *     mutator that allocates an id mid-mutation must not deadlock on
  *     its own lock).
  *  2. FS tier: `create(path, overwrite=false)` of the lock file with a
  *     unique holder token. Local filesystems implement non-overwrite
  *     create as exists-then-create (a TOCTOU window two processes can
  *     both pass), so acquisition is CONFIRMED by reading the file back
  *     after a short settle: only the contender whose token survived
  *     proceeds; the loser loops.
  *  3. Stale takeover: a holder that died without releasing would stall
  *     writers forever, so a lock older than `staleMs` is evicted — by
  *     RENAME to a unique grave (at most one evictor wins the rename;
  *     losers loop to the create race), then a re-check of the moved
  *     file's age. A file that turned out FRESH (replaced between the
  *     age check and the rename by another evictor's takeover+create —
  *     a milliseconds window on a lock that was already minutes old) is
  *     renamed straight back.
  *  4. Release: delete only if the file still carries OUR token — a
  *     holder whose lock was evicted (a >staleMs GC pause) must not
  *     release the NEXT holder's lock.
  *
  * Honest residual: like every lease-less lock file, a holder paused
  * longer than `staleMs` loses mutual exclusion for the remainder of
  * its critical section (the evictor can't tell a dead holder from a
  * stalled one). Catalog commits are sub-second parquet writes of
  * driver-sized tables; the default window is two orders of magnitude
  * above them. Deployments with minutes-long worst-case pauses should
  * raise `staleMs` accordingly.
  */
object CatalogLock {

  /** Default stale-lock eviction window, ~100× a catalog commit. */
  val StaleMsDefault: Long = 120000L

  /** Lock file name under the catalog root. */
  private[catalog] val LockName = "_catalog.lock"

  // one monitor per qualified lock path: threads and store INSTANCES in
  // this process contend here, so at most one reaches the filesystem
  private val jvmMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  // lock paths held by the current thread — reentrant acquisition
  // (createOrGetUser's nextId inside mutate) must be a pass-through,
  // not a self-deadlock that resolves by stealing our own lock
  private val heldByThread = new ThreadLocal[scala.collection.mutable.Set[String]] {
    override def initialValue(): scala.collection.mutable.Set[String] =
      scala.collection.mutable.Set.empty
  }

  def withLock[T](fs: FileSystem, root: Path,
                  staleMs: Long = StaleMsDefault)(body: => T): T = {
    val lockPath = new Path(root, LockName)
    val key = fs.makeQualified(lockPath).toString
    if (heldByThread.get.contains(key)) return body // reentrant
    val monitor = jvmMonitors.computeIfAbsent(key, _ => new Object)
    monitor.synchronized {
      val mine = acquire(fs, lockPath, staleMs)
      heldByThread.get += key
      try body
      finally {
        heldByThread.get -= key
        release(fs, lockPath, mine)
      }
    }
  }

  /** Unique holder token (pid + nonce); file CONTENT only, never a path
    * component (Hadoop `Path` mis-parses ':' as a scheme separator).
    */
  private def token(): String =
    s"${ProcessHandle.current().pid()}:${java.util.UUID.randomUUID()}"

  private def readToken(fs: FileSystem, lockPath: Path): Option[String] =
    try {
      val in = fs.open(lockPath)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), UTF_8))
      finally in.close()
    } catch { case _: java.io.IOException => None }

  /** Blocks until the lock is held; returns the holder token written. */
  private def acquire(fs: FileSystem, lockPath: Path, staleMs: Long): String = {
    val parent = lockPath.getParent
    if (!fs.exists(parent)) { fs.mkdirs(parent); () }
    val mine = token()
    var held = false
    var backoffMs = 20L
    while (!held) {
      val created =
        try {
          val out = fs.create(lockPath, false)
          try out.write(mine.getBytes(UTF_8)) finally out.close()
          true
        } catch { case _: java.io.IOException => false }
      if (created) {
        // settle + read-back confirms the create was genuinely exclusive
        // (see protocol step 2): only the surviving token's owner holds
        Thread.sleep(10)
        held = readToken(fs, lockPath).contains(mine)
      }
      if (!held) {
        val st = try Some(fs.getFileStatus(lockPath))
        catch { case _: java.io.IOException => None }
        st match {
          case Some(s)
            if System.currentTimeMillis() - s.getModificationTime > staleMs =>
            evictStale(fs, lockPath, staleMs)
          case _ =>
            Thread.sleep(backoffMs)
            backoffMs = math.min(backoffMs * 2, 500L)
        }
      }
    }
    mine
  }

  /** Evict a stale lock by renaming it to a unique grave (one winner),
    * re-verifying age on the moved file, restoring it if it was fresh.
    */
  private def evictStale(fs: FileSystem, lockPath: Path, staleMs: Long): Unit = {
    val grave = new Path(lockPath.getParent,
      s".${lockPath.getName}.stale.${java.util.UUID.randomUUID()}")
    val renamed =
      try fs.rename(lockPath, grave)
      catch { case _: java.io.IOException => false }
    if (renamed) {
      val fresh =
        try System.currentTimeMillis() -
          fs.getFileStatus(grave).getModificationTime <= staleMs
        catch { case _: java.io.IOException => false }
      try {
        if (fresh) { fs.rename(grave, lockPath); () }
        else { fs.delete(grave, false); () }
      } catch { case _: java.io.IOException => () }
    }
  }

  /** Delete the lock only while it still carries OUR token (step 4). */
  private def release(fs: FileSystem, lockPath: Path, mine: String): Unit =
    try {
      if (readToken(fs, lockPath).contains(mine)) { fs.delete(lockPath, false); () }
    } catch { case _: java.io.IOException => () }
}
