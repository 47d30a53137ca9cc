package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns._

/** Streaming corpus ingest — the batch curation pipeline's admission
  * control run continuously over a document stream (doc_id, text,
  * ingest_ts): row-local quality scoring (identical formula to
  * [[graft.ops.TextOps.docQuality]] — the spec pins the equality), then
  * content-fingerprint dedup with state bounded by the watermark.
  *
  * Scale shape: scoring is a pure projection (no shuffle); the dedup
  * keys on the md5 of the NORMALIZED text, so a re-crawled byte-identical
  * or whitespace/case-variant document is dropped while the fingerprint
  * stays in state — and `dropDuplicatesWithinWatermark` ages
  * fingerprints out once the watermark passes, so dedup state is
  * (ingest rate × delay)-sized, never corpus-sized. A corpus-wide
  * exact dedup remains the batch operator's job
  * ([[graft.ops.TextOps.dedupExact]]); the stream handles the
  * redelivery/re-crawl window, the standard lambda split. */
object DocStream {

  def ingestFilter(docs: DataFrame, watermarkDelay: String = "1 hour",
      minQuality: Double = 0.5): DataFrame = {
    val toks = tokens(col("text"))
    val norm = normalize(col("text"))
    val nToks = size(toks)
    // the docQuality rule set, inlined so text/ingest_ts survive
    val lengthOk = nToks.between(20, 100000)
    val stopOk = (hitCount(toks, StopwordsEn).cast("double") / nToks) >= 0.001
    val punctOk = (size(regexp_extract_all(norm, lit("[^a-z0-9 ]"), lit(0))).cast("double")
      / greatest(length(norm), lit(1))) <= 0.2
    val digitOk = (size(regexp_extract_all(norm, lit("[0-9]"), lit(0))).cast("double")
      / greatest(length(norm), lit(1))) <= 0.3
    val quality = round((lengthOk.cast("double") + stopOk.cast("double")
      + punctOk.cast("double") + digitOk.cast("double")) / 4, 6)
    docs
      .withWatermark("ingest_ts", watermarkDelay)
      .select(col("doc_id"), col("ingest_ts"), col("text"),
        md5(norm).as("fp_md5"), quality.as("quality_score"))
      .filter(col("quality_score") >= minQuality)
      .dropDuplicatesWithinWatermark("fp_md5")
  }

  /** [[ingestFilter]] with corpus-level exact dedup in front: a
    * stream-static LEFT ANTI join against the published corpus's
    * fingerprint index (`TextOps.dedupExactIncremental`'s static half)
    * drops re-crawls of anything already held BEFORE the within-
    * watermark dedup handles redelivery inside the stream. State stays
    * rate×delay-sized; the corpus index never enters state.
    *
    * SNAPSHOT caveat: the static side's file listing pins when
    * `corpusFps` is planned, so index growth DURING the stream's
    * lifetime (an [[graft.incremental.IngestIndex.absorb]] by the batch
    * pipeline) is invisible until the query restarts — re-crawls of a
    * just-absorbed batch keep admitting. Right for a corpus that only
    * changes between deploys; for a live state use [[dropAdmitted]]
    * inside `foreachBatch`, which re-opens the index per micro-batch. */
  def ingestFilterIndexed(docs: DataFrame, corpusFps: DataFrame,
      watermarkDelay: String = "1 hour", minQuality: Double = 0.5): DataFrame =
    ingestFilter(docs, watermarkDelay, minQuality)
      .join(corpusFps.select(col("fp_md5")), Seq("fp_md5"), "left_anti")

  /** The LIVE-index half of indexed ingest, for `foreachBatch`: anti-
    * join one micro-batch (already [[ingestFilter]]ed — it carries
    * `fp_md5`) against a FRESHLY-OPENED snapshot of the persisted
    * fingerprint index ([[graft.incremental.IngestIndex
    * .corpusFpsSnapshot]]: base ∪ committed segments; read-only, so it
    * never races the single writer). Every absorb that committed before
    * this micro-batch is visible, closing [[ingestFilterIndexed]]'s
    * stale-snapshot window — the streaming analogue of the reference's
    * watermark discipline, where each run reads the state its
    * predecessors committed (etl_script_incremental_pandas.py:58-96).
    * Per-batch cost: one parquet re-list + a batch-keyed anti-join
    * (work ∝ batch; the index side streams, never enters stream state).
    *
    *   ingestFilter(stream).writeStream.foreachBatch { (b, _) =>
    *     sink(DocStream.dropAdmitted(stateDir)(b))
    *   }
    */
  def dropAdmitted(stateDir: String)(batch: DataFrame): DataFrame = {
    val idx = new graft.incremental.IngestIndex(batch.sparkSession, stateDir)
    batch.join(idx.corpusFpsSnapshot, Seq("fp_md5"), "left_anti")
  }

  /** Streaming duplicated-span probe — the ingest-time "is this new doc
    * copying the corpus?" alert ([[graft.ops.TextOps.docDupSpansIncremental]]
    * run continuously): each streamed doc's character windows semi-join
    * the STATIC corpus window-key index
    * ([[graft.ops.TextOps.dupSpanIndex]] — at scale a persisted,
    * periodically-refreshed table; stream-static joins re-read it per
    * micro-batch), hits re-group per doc under the watermark, and the
    * span merge runs as a ROW-LOCAL fold over the doc's sorted hit
    * offsets — a higher-order `aggregate`, because partition windows
    * don't exist on streams. Emits only CONTAMINATED docs (an alert
    * stream, append-mode); clean docs flow through [[ingestFilter]]
    * untouched. State = open (doc, ts) groups inside the watermark —
    * ingest-rate-sized, never corpus-sized. */
  def spanProbe(docs: DataFrame, corpusKeys: DataFrame, width: Int = 40,
      stride: Int = 10, watermarkDelay: String = "1 hour"): DataFrame = {
    val base = docs
      .withWatermark("ingest_ts", watermarkDelay)
      .select(col("doc_id"), col("ingest_ts"), normalize(col("text")).as("norm"))
      .select(col("doc_id"), col("ingest_ts"), col("norm"),
        length(col("norm")).as("len"))
      .filter(col("len") >= width)
    val hits = base
      .select(col("doc_id"), col("ingest_ts"), col("len"),
        explode(sequence(lit(1), col("len") - width + 1, lit(stride))).as("start"),
        col("norm"))
      .select(col("doc_id"), col("ingest_ts"), col("len"), col("start"),
        col("norm").substr(col("start"), lit(width)).as("w"))
      // the index may carry hashed (xxhash64) or raw substring keys —
      // match whichever the persisted frame holds
      .transform(ws => graft.ops.TextOps.matchSpanKey(ws, corpusKeys))
      .join(corpusKeys, Seq("w"), "left_semi")
    // group per doc (ingest_ts in the key keeps append-mode legal), then
    // merge [start, start+width) islands in one array fold
    val folded = hits
      .groupBy(col("doc_id"), col("ingest_ts"))
      .agg(first(col("len")).as("len"),
        sort_array(collect_list(col("start"))).as("starts"))
      .withColumn("acc", aggregate(
        col("starts"),
        struct(lit(0L).as("cnt"), lit(0L).as("chars"), lit(-1).as("cur_end")),
        (acc, s) => when(s > acc.getField("cur_end"), struct(
            (acc.getField("cnt") + 1).as("cnt"),
            (acc.getField("chars") + width).as("chars"),
            (s + width).as("cur_end")))
          .otherwise(struct(
            acc.getField("cnt").as("cnt"),
            (acc.getField("chars") + s + width - acc.getField("cur_end")).as("chars"),
            (s + width).as("cur_end")))))
    folded.select(
      col("doc_id"), col("ingest_ts"),
      col("acc.cnt").as("n_dup_spans"),
      col("acc.chars").as("dup_chars"),
      round(col("acc.chars").cast("double") / col("len"), 6).as("dup_frac"))
  }
}
