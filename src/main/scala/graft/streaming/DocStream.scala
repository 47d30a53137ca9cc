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
}
