package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.incremental.SnapshotTable

/** The corpus store as a STRUCTURED STREAMING SOURCE: a downstream
  * consumer (a trainer re-tokenizing only changed documents, an online
  * mirror, an index updater) `readStream`s the table's CDC feed instead
  * of polling snapshots —
  * {{{
  *   spark.readStream
  *     .format("org.apache.spark.sql.graft.SnapshotChangeFeedProvider")
  *     .option("path", storeDir).option("key", "doc_id")
  *     .load()            // schema: table columns + _change_type + _commit_version
  * }}}
  * OFFSETS ARE TABLE VERSIONS — the manifest log is the source's own
  * commit log, so there is no side-channel state to drift: a micro-batch
  * covering versions (from, to] is exactly
  * [[graft.incremental.SnapshotTable.changesKeyed]] over that interval
  * (insert/update post-images, delete pre-images), stamped with the
  * interval's end version. The feed is REWRITE-OP-AWARE (the interval
  * decomposes at `optimize` commits), so routine compaction of a 100 TB
  * store never floods the stream with rewritten mass — a consumer reads
  * churn, period. Batches re-derive from manifests on recovery, so the
  * checkpointed offset must stay within the table's retention window
  * ([[graft.incremental.SnapshotTable.retire]]) — the same fence
  * [[graft.incremental.SnapshotSync]] documents.
  *
  * Options: `path` (table dir, required), `key` (table key column,
  * required), `startingVersion` (first version ALREADY SEEN — a FRESH
  * stream delivers changes strictly after it; default: the current
  * version at stream start, i.e. tail-only; a RESTARTED stream always
  * resumes from its checkpointed version offset instead),
  * `maxVersionsPerBatch` (rate limit: each micro-batch spans at most
  * this many versions; best-effort on the first post-restart batch,
  * which catches up to the head it finds).
  *
  * This file lives under the `org.apache.spark.sql` package tree for
  * the same reason [[GraftSqlShim]] does: the v1 streaming source
  * seam (`Source`, `LongOffset`) and the isStreaming-tagged DataFrame
  * constructor it returns are `private[sql]`-adjacent internals — the
  * standard extension point every v1 connector uses, kept to this one
  * thin class; all change-feed logic is SnapshotTable's public API. */
final class SnapshotChangeFeedProvider extends StreamSourceProvider {

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val p = SnapshotChangeFeedSource.normalize(parameters)
    val tbl = SnapshotChangeFeedSource.handle(sqlContext.sparkSession, p)
    ("graft-snapshot-changes", SnapshotChangeFeedSource.feedSchema(tbl))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new SnapshotChangeFeedSource(sqlContext.sparkSession,
      SnapshotChangeFeedSource.normalize(parameters))
}

private[graft] object SnapshotChangeFeedSource {
  def normalize(parameters: Map[String, String]): Map[String, String] =
    parameters.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }

  def handle(spark: SparkSession, p: Map[String, String]): SnapshotTable = {
    val dir = p.getOrElse("path",
      throw new IllegalArgumentException("snapshot change feed needs option path=<table dir>"))
    val key = p.getOrElse("key",
      throw new IllegalArgumentException("snapshot change feed needs option key=<key column>"))
    new SnapshotTable(spark, dir, key, monotonicReads = true)
  }

  /** Table schema + the CDC rider columns. */
  def feedSchema(tbl: SnapshotTable): StructType = {
    val base = tbl.read().schema
    StructType(base.fields.toSeq :+
      StructField("_change_type", StringType, nullable = false) :+
      StructField("_commit_version", LongType, nullable = false))
  }
}

private[graft] final class SnapshotChangeFeedSource(
    spark: SparkSession, p: Map[String, String]) extends Source {

  private val tbl = SnapshotChangeFeedSource.handle(spark, p)
  private val startVersion: Long =
    p.get("startingversion").map(_.toLong).getOrElse(
      tbl.currentVersion.getOrElse(throw new IllegalStateException(
        s"no snapshot table at ${p("path")} — create() it before streaming its changes")))
  private val maxVersionsPerBatch: Long =
    p.get("maxversionsperbatch").map(_.toLong).getOrElse(Long.MaxValue)
  require(maxVersionsPerBatch >= 1, "maxVersionsPerBatch must be >= 1")

  /** Highest version this source has OFFERED — offers must never
    * regress, and the rate limit advances from here, not from the
    * table's head. */
  private var offered: Long = startVersion

  override val schema: StructType = SnapshotChangeFeedSource.feedSchema(tbl)

  override def getOffset: Option[Offset] = {
    val cur = tbl.currentVersion.getOrElse(return None)
    // cap the batch span without overflowing on the unbounded default
    val capped =
      if (cur - offered > maxVersionsPerBatch) offered + maxVersionsPerBatch else cur
    if (capped > offered) offered = capped
    // ALWAYS offer (never gate on startVersion): on recovery this
    // instance's startVersion is the current head, but the engine's
    // checkpointed offset may sit below it — the offer is what lets it
    // schedule the catch-up interval. A fresh stream whose head equals
    // startVersion just runs one empty first batch (from == to).
    Some(LongOffset(offered))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    def v(o: Offset): Long = o.json.trim.toLong
    val from = start.map(v).getOrElse(startVersion)
    val to = v(end)
    if (to > offered) offered = to // recovery: never re-offer below the checkpoint
    val batch =
      if (to <= from)
        tbl.read().limit(0) // recovery edge: an already-committed interval
          .withColumn("_change_type", org.apache.spark.sql.functions.lit("insert"))
          .withColumn("_commit_version", org.apache.spark.sql.functions.lit(to))
      else
        tbl.changesKeyed(from, to)
          .withColumn("_commit_version", org.apache.spark.sql.functions.lit(to))
    // a streaming source's schema is FIXED at stream start: when the
    // table evolved (added a nullable column) inside the interval, the
    // feed carries more columns than this stream declared — project to
    // the declared set (the standard source contract: restart the
    // stream to pick up new columns; nothing is lost on the table)
    val projected = batch.select(
      schema.fieldNames.map(org.apache.spark.sql.functions.col).toSeq: _*)
    GraftSqlShim.streamingFrame(projected)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
