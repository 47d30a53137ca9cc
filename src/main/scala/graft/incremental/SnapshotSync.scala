package graft.incremental

import org.apache.spark.sql.functions._

/** Incremental table replication over the change feed — the consumer
  * [[SnapshotTable.changesBetween]] exists for, packaged: maintain a
  * MIRROR snapshot table that converges to the source by applying only
  * what changed since the last sync, never by re-copying the table.
  *
  * The sync CURSOR is the mirror's application tag (the source version
  * it reflects) — one fact riding the mirror's own commit, so a crash
  * between "apply" and "record cursor" is impossible by construction
  * (the [[SnapshotTable]] tag discipline, same as the incremental
  * pipeline's watermark). Re-running a sync whose cursor already equals
  * the source version is a no-op.
  *
  * One sync = ONE atomic mirror commit: removed-and-not-re-added keys
  * delete and added rows upsert together ([[SnapshotTable.applyDelta]]
  * — a single file-pruned copy-on-write pass over both key sets), so
  * mirror readers only ever observe consistent source versions, never
  * a half-applied feed. Both halves ride the feed, whose cost is ∝
  * LOGICAL churn — [[SnapshotTable.changesBetween]] decomposes the
  * interval at `optimize` commits, so a sync across the routine
  * compaction an accumulate-mode store auto-triggers reads the merges'
  * churn, never the compacted mass — a 100 TB mirror follows a trickle
  * of commits at trickle cost, compaction included. A rewrite-only
  * interval (optimize and nothing else) yields an empty feed, which
  * [[SnapshotTable.applyDelta]] applies as a tag-only cursor advance —
  * no contentless data version lands on the mirror. The mirror lags by
  * sync cadence.
  */
object SnapshotSync {

  /** Bring `mirror` up to `source`'s current version. Returns the
    * source version the mirror now reflects. Cold start (mirror absent)
    * copies the current snapshot once; warm syncs apply the feed. */
  def sync(source: SnapshotTable, mirror: SnapshotTable, key: String): Long = {
    val srcV = source.currentVersion.getOrElse(
      throw new IllegalStateException("source table has no committed version"))
    if (!mirror.exists) {
      mirror.create(source.readVersion(srcV), tag = s"sync:$srcV")
      return srcV
    }
    val cursor = mirror.currentTag
      .filter(_.startsWith("sync:")).map(_.stripPrefix("sync:").toLong)
      .getOrElse(throw new IllegalStateException(
        "mirror carries no sync cursor tag — was it created outside SnapshotSync?"))
    if (cursor == srcV) return srcV // already current: no-op, no commit
    // RETENTION FENCE: the feed needs the cursor version's manifest; a
    // source that retired past it (the forget two-step does exactly
    // this) forces a FULL REFRESH — an overwrite commit, after which
    // feed-following resumes. This is every change-feed's retention
    // caveat made explicit. NOTE for erasure-driven refreshes: the
    // mirror's own history still references pre-refresh files — a true
    // forget must retire+vacuum the MIRROR too (caller's job, same
    // two-step as the source).
    val feed0 =
      try source.changesBetween(cursor, srcV)
      catch {
        case _: IllegalStateException =>
          mirror.create(source.readVersion(srcV), tag = s"sync:$srcV")
          return srcV
      }
    val feed = feed0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val added = feed.filter(col("_change") === "added").drop("_change")
      val removed = feed.filter(col("_change") === "removed").drop("_change")
      // keys whose rows only disappeared (true deletes); an update's
      // removed half is subsumed by its added replacement (applyDelta's
      // upsert-wins rule)
      val doomed = removed.select(col(key))
        .join(added.select(col(key)), Seq(key), "left_anti").distinct()
      // ONE atomic mirror commit applies the whole feed — deletes and
      // upserts together ([[SnapshotTable.applyDelta]]), with the new
      // cursor riding it: mirror readers only ever see source versions,
      // never a half-applied feed, and a crash re-syncs from the old
      // cursor idempotently.
      mirror.applyDelta(added, doomed, tag = s"sync:$srcV")
      srcV
    } finally feed.unpersist(blocking = false)
  }
}
