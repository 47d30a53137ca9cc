package graft.incremental

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{BloomJoin, TextOps}

/** Persisted ingest-probe state: the corpus-side indexes of the delta
  * dedup probes, built ONCE and stored as parquet so each ingest batch
  * pays probe cost proportional to the DELTA, not to the corpus.
  *
  * The inline probes ([[TextOps.dedupExactIncremental]] and friends)
  * re-derive their corpus index every call — the right shape for a
  * one-shot check and for the DuckDB oracles, but at 100 TB it re-scans
  * the corpus per batch, the opposite of the reference's watermark
  * discipline (etl_script_incremental_pandas.py:58-96: state survives
  * runs). This class is that discipline applied to the probe indexes:
  *
  *   - `fp/`      (fp_md5 → dup_of)        [[TextOps.dedupExactIndex]]
  *   - `bloom/`   (idx → word)             the fp set as a bitset,
  *                                         rebuilt from `fp/` — KB-scale
  *   - `spans/`   (w)                      [[TextOps.dupSpanIndex]]
  *   - `winnow/`  (fp → capped postings)   [[TextOps.nearDupWinnowIndex]]
  *
  * Every write goes through [[StateStore]]'s write-then-swap commit, so
  * a failed build/absorb leaves the previous index intact (S7
  * semantics). Probes read the parquet directly — loading an index is a
  * metadata open, not a corpus scan, so warm probe cost is independent
  * of corpus size (the Bench `ingest_probe_warm` row measures exactly
  * this against the inline rebuild).
  *
  * [[absorb]] folds an ADMITTED batch into the state without touching
  * corpus text: each index merges with the delta's index rows and
  * re-aggregates — work ∝ |index| + |delta|, narrow keys only. (At 100 TB
  * the same merge runs as a partitioned compaction; the frames here are
  * the exact state it compacts.) The winnow postings keep their
  * saturation markers (see [[TextOps.nearDupWinnowIndex]]) so absorb
  * remains equivalent to a full rebuild.
  */
final class IngestIndex(spark: SparkSession, dir: String,
    width: Int = 40, stride: Int = 10,
    k: Int = 3, w: Int = 4, maxDf: Int = 100,
    bloomBits: Int = 1 << 20, bloomK: Int = 5) {

  private def store(sub: String) = new StateStore(spark, s"$dir/$sub")
  private def load(sub: String): DataFrame = spark.read.parquet(s"$dir/$sub")

  def exists: Boolean = store("fp").exists

  /** Full build from the current corpus — the once-per-corpus pass. */
  def build(corpus: DataFrame): Unit = {
    store("fp").overwrite(TextOps.dedupExactIndex(corpus))
    store("spans").overwrite(TextOps.dupSpanIndex(corpus, width, stride))
    store("winnow").overwrite(TextOps.nearDupWinnowIndex(corpus, k, w, maxDf))
    refreshBloom()
  }

  /** The bitset derives from the persisted fp index (never the corpus):
    * one aggregate over narrow keys, stored as (idx, word) longs. */
  private def refreshBloom(): Unit = {
    val bits = BloomJoin.bloomFilterBits(load("fp"), "fp_md5", bloomBits, bloomK)
    import spark.implicits._
    store("bloom").overwrite(
      bits.zipWithIndex.map { case (wd, i) => (i, wd) }.toSeq.toDF("idx", "word"))
  }

  private def bloomWords(): Array[Long] = {
    val rows = load("bloom").select(col("idx"), col("word")).collect()
    val arr = new Array[Long](bloomBits >> 6)
    rows.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Fold an admitted batch into the state. Corpus text is never read:
    * fp re-mins, span keys union-distinct, winnow postings merge under
    * the cap, bloom rebuilds from the merged fp keys. */
  def absorb(incoming: DataFrame): Unit = {
    store("fp").overwrite(
      load("fp").unionByName(TextOps.dedupExactIndex(incoming))
        .groupBy(col("fp_md5")).agg(min(col("dup_of")).as("dup_of")))
    store("spans").overwrite(
      load("spans").unionByName(TextOps.dupSpanIndex(incoming, width, stride))
        .distinct())
    val capped = udaf(graft.functions.BoundedList.postings(maxDf + 1))
    store("winnow").overwrite(
      load("winnow")
        .select(col("fp"), explode(col("ids")).as("e"))
        .select(col("fp"), col("e.doc_id").as("doc_id"))
        .unionByName(TextOps.docWinnow(incoming, k, w).select(col("fp"), col("doc_id")))
        .groupBy(col("fp")).agg(capped(col("doc_id"), lit(0)).as("ids")))
    refreshBloom()
  }

  // ---- probes: load-and-join, work ∝ delta ----

  /** [[TextOps.dedupExactIncremental]] against the persisted index. */
  def dedupExactProbe(incoming: DataFrame): DataFrame =
    TextOps.dedupExactProbe(load("fp"), incoming)

  /** [[TextOps.dedupExactIncrementalBloom]] against the persisted
    * index + bitset — the row-local fast path for the clean majority. */
  def dedupExactProbeBloom(incoming: DataFrame): DataFrame =
    TextOps.dedupExactProbeBloom(bloomWords(), load("fp"), incoming,
      bloomBits, bloomK)

  /** [[TextOps.docDupSpansIncremental]] against the persisted key set. */
  def dupSpansProbe(incoming: DataFrame): DataFrame =
    TextOps.docDupSpansProbe(load("spans"), incoming, width, stride)

  /** [[TextOps.nearDupWinnowIncremental]] against the persisted
    * postings. */
  def winnowProbe(incoming: DataFrame, minShared: Int = 2): DataFrame =
    TextOps.nearDupWinnowProbe(load("winnow"), incoming, k, w, minShared, maxDf)
}
