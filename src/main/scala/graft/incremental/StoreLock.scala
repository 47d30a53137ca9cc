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
  * a crashed maintainer's leftover and is broken. SIZE `staleMs` ABOVE
  * THE LONGEST EXPECTED PASS: a live maintainer that outlives the
  * staleness window has its lock broken under it, and the zero-grace
  * vacuum race this lock exists to prevent comes back — at a scale
  * where a publish takes hours, pass hours (the cost of a too-large
  * value is only how long a CRASHED maintainer blocks the next one).
  * ADVISORY: it
  * serializes writers that TAKE it (graft's own maintenance entry
  * points — CorpusForget, CorpusRun's publish block); a foreign writer
  * that ignores it is the caller's deployment problem, same as the
  * create-exclusive filesystem assumption documented on
  * [[SnapshotTable]].
  */
object StoreLock {

  /** Run `body` holding the store's maintenance lock; throws
    * [[ConcurrentModificationException]] if another maintainer holds a
    * fresh lock. */
  def withLock[A](spark: SparkSession, dir: String, owner: String,
      staleMs: Long = 30L * 60 * 1000)(body: => A): A = {
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
    if (fs.exists(p) && fsNow - fs.getFileStatus(p).getModificationTime > staleMs)
      fs.delete(p, false) // crashed maintainer's leftover
    val out =
      try fs.create(p, false)
      catch {
        case e: java.io.IOException =>
          throw new ConcurrentModificationException(
            s"maintenance lock at $p is held — another maintainer is mutating this store", e)
      }
    try out.write(s"$owner\n".getBytes("UTF-8")) finally out.close()
    try body finally fs.delete(p, false)
  }
}
