package graft.incremental

import java.util.ConcurrentModificationException

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Advisory single-maintainer lock for a [[SnapshotTable]] store
  * directory — the enforcement the zero-grace maintenance path needs.
  *
  * [[SnapshotTable.vacuum]] with `graceMs = 0` reclaims EVERY
  * unreferenced data file, including another writer's just-staged (not
  * yet committed) files: staging is invisible by design, so only age or
  * mutual exclusion can protect it. The grace window is the
  * age-based protection; this lock is the mutual-exclusion one, for
  * maintainers that want immediate reclamation (right-to-be-forgotten
  * audits byte counts — a grace window would report 0 bytes reclaimed
  * and leave the forgotten text on disk until the next pass).
  *
  * Protocol: create-exclusive `_maintenance.lock` under the store dir
  * (the same filesystem primitive the manifest claim rests on), body,
  * delete in a finally. A lock older than `staleMs` by the FILESYSTEM
  * clock (probe-file mtime, the [[SnapshotTable.vacuum]] discipline) is
  * a crashed maintainer's leftover and is broken — ATOMICALLY, by
  * renaming it to a unique tombstone: of two maintainers that both
  * observe the same stale lock, only one rename can succeed, so only
  * one proceeds to re-acquire (delete-then-create would let the second
  * breaker's delete remove the first's FRESH lock, putting both inside
  * the critical section — the double-vacuum the lock exists to
  * prevent). A breaker that renamed a lock which turned out FRESH
  * (stale observed, then released and re-acquired before the rename —
  * a delayed breaker) restores it by renaming back and reports the
  * lock held; if the restore loses a race with a new create-exclusive
  * acquirer, the tombstone is left as debris (never read as a lock)
  * and the breaker still reports held — the one residual interleaving,
  * needing THREE maintainers inside one staleness window.
  *
  * SIZE `staleMs` ABOVE THE LONGEST EXPECTED PASS — or let RENEWAL
  * carry it: `renewEveryMs > 0` starts a daemon that refreshes the
  * lock's mtime (filesystem-clock, same probe discipline) on that
  * cadence, so a LIVE maintainer never ages into breakability no
  * matter how long its pass runs, while a CRASHED one stops renewing
  * and is broken within `staleMs` as before. graft's own entry points
  * renew at `staleMs / 3`, making the window a crash-detection latency
  * instead of a must-exceed-the-pass estimate. A renewal that finds
  * the lock gone or owned by someone else (a breaker raced a renewal
  * gap) stops renewing and raises a flag the release checks — the pass
  * still finishes, but the violation is loud, not silent. The default
  * window reads `SPARK_GRAFT_LOCK_STALE_MS` (env or
  * system property) so deployments size it per store without touching
  * every entry point; absent, 30 minutes.
  * ADVISORY: it
  * serializes writers that TAKE it (graft's own maintenance entry
  * points — CorpusForget, CorpusRun's publish block); a foreign writer
  * that ignores it is the caller's deployment problem, same as the
  * create-exclusive filesystem assumption documented on
  * [[SnapshotTable]].
  */
object StoreLock {

  /** Deployment-sized staleness window: `SPARK_GRAFT_LOCK_STALE_MS`
    * (system property first — test seam — then env), else 30 minutes.
    * Every graft maintenance entry point inherits it, so one knob sizes
    * the window to the store's longest pass. */
  def defaultStaleMs: Long =
    sys.props.get("SPARK_GRAFT_LOCK_STALE_MS")
      .orElse(sys.env.get("SPARK_GRAFT_LOCK_STALE_MS"))
      .map(_.toLong).getOrElse(30L * 60 * 1000)

  /** Test seam: runs after this maintainer observed a stale lock and
    * before its atomic rename-break — the window where a competing
    * maintainer can break + re-acquire first. No-op in production. */
  private[graft] var onBeforeBreak: () => Unit = () => ()

  /** Run `body` holding the store's maintenance lock; throws
    * [[ConcurrentModificationException]] if another maintainer holds a
    * fresh lock. `renewEveryMs > 0` keeps the lock's mtime fresh on
    * that cadence while `body` runs (see class doc) — pass
    * `staleMs / 3` so a live pass of ANY length stays unbreakable. */
  def withLock[A](spark: SparkSession, dir: String, owner: String,
      staleMs: Long = defaultStaleMs, renewEveryMs: Long = 0L)(body: => A): A = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new Path(s"$dir/_maintenance.lock")
    if (!fs.exists(new Path(dir))) fs.mkdirs(new Path(dir))
    // filesystem-clock now (see SnapshotTable.vacuum: never compare a
    // remote mtime to the local clock)
    def fsNow: Long = {
      val probe = new Path(dir, s".lock-probe-${java.util.UUID.randomUUID()}")
      fs.create(probe, true).close()
      val t = fs.getFileStatus(probe).getModificationTime
      fs.delete(probe, false)
      t
    }
    def held(cause: Throwable = null) = new ConcurrentModificationException(
      s"maintenance lock at $p is held — another maintainer is mutating this store",
      cause)
    // staleness probe, tolerant of a holder releasing between the
    // exists check and the stat (FileNotFound = lock gone, proceed)
    val staleMtime =
      try {
        if (!fs.exists(p)) None
        else Some(fs.getFileStatus(p).getModificationTime)
          .filter(mt => fsNow - mt > staleMs)
      } catch { case _: java.io.FileNotFoundException => None }
    staleMtime.foreach { observedMtime =>
      onBeforeBreak()
      // ATOMIC break: rename the stale lock to a unique tombstone — at
      // most one breaker's rename succeeds; the loser falls through to
      // create-exclusive and fails loudly there if the winner holds
      val tomb = new Path(dir, s"_maintenance.lock.broken-${java.util.UUID.randomUUID()}")
      val renamed =
        try fs.rename(p, tomb)
        catch { case _: java.io.IOException => false }
      if (renamed) {
        // rename preserves mtime: if the renamed file is FRESH, a new
        // holder acquired between our staleness probe and the rename —
        // we just stole a live maintainer's lock; put it back and yield
        val tombMtime =
          try fs.getFileStatus(tomb).getModificationTime
          catch { case _: java.io.FileNotFoundException => observedMtime }
        if (fsNow - tombMtime > staleMs) fs.delete(tomb, false) // genuinely crashed
        else {
          val restored = try fs.rename(tomb, p)
            catch { case _: java.io.IOException => false }
          // restore can only fail if yet another acquirer claimed the
          // path meanwhile — their lock stands, our tombstone is debris
          if (!restored) fs.delete(tomb, false)
          throw held()
        }
      }
    }
    // the lock body carries owner + a per-acquisition token, so a
    // renewal (and the release) can tell OUR lock from a breaker's
    val token = s"$owner ${java.util.UUID.randomUUID()}\n"
    val out =
      try fs.create(p, false)
      catch { case e: java.io.IOException => throw held(e) }
    try out.write(token.getBytes("UTF-8")) finally out.close()
    def content(): Option[String] =
      try {
        val in = fs.open(p)
        try {
          val acc = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](256)
          var n = in.read(buf)
          while (n > 0) { acc.write(buf, 0, n); n = in.read(buf) }
          Some(new String(acc.toByteArray, "UTF-8"))
        } finally in.close()
      } catch { case _: java.io.IOException => None }
    @volatile var renewing = true
    @volatile var lost = false
    val renewer =
      if (renewEveryMs <= 0) None
      else {
        val t = new Thread(() => {
          try {
            while (renewing) {
              Thread.sleep(renewEveryMs)
              if (renewing) {
                // refresh mtime on the FILESYSTEM clock; a lock that is
                // gone or re-owned means a breaker raced a renewal gap —
                // stop renewing and flag, never renew someone else's lock
                if (content().contains(token)) fs.setTimes(p, fsNow, -1)
                else { lost = true; renewing = false }
              }
            }
          } catch { case _: InterruptedException => () }
        }, s"storelock-renew-$owner")
        t.setDaemon(true)
        t.start()
        Some(t)
      }
    try body
    finally {
      renewing = false
      renewer.foreach { t => t.interrupt(); t.join(1000) }
      if (lost) System.err.println(s"[storelock] WARNING: maintenance lock at $p " +
        s"was broken under live owner $owner mid-pass — staleMs too small for an " +
        "unrenewed stretch, or a foreign breaker; mutual exclusion was violated")
      // release only OUR lock: after a mid-pass break the path may hold
      // another maintainer's fresh lock, which must survive our exit
      if (content().contains(token)) fs.delete(p, false)
    }
  }
}
