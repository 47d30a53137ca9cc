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
    bloomBits: Int = 1 << 20, bloomK: Int = 5,
    pruneThreshold: Long = 5000000L) {

  private def store(sub: String) = new StateStore(spark, s"$dir/$sub")
  private def load(sub: String): DataFrame = spark.read.parquet(s"$dir/$sub")

  def exists: Boolean = store("fp").exists

  /** Row-count stat persisted NEXT TO each index (underscore-prefixed,
    * so parquet readers skip it): build/absorb stamp it, probes read it
    * with one driver-side FS read — no Spark job — to make the
    * prune-or-not call below. */
  private def metaPath(sub: String) = new org.apache.hadoop.fs.Path(s"$dir/$sub/_graft_rows")
  private def fs = metaPath("fp").getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def stampRows(sub: String): Unit = {
    val n = load(sub).count() // parquet footer counts — metadata-cheap
    val out = fs.create(metaPath(sub), true)
    try out.write(n.toString.getBytes("UTF-8")) finally out.close()
  }
  private def indexRows(sub: String): Option[Long] =
    if (!fs.exists(metaPath(sub))) None
    else {
      val in = fs.open(metaPath(sub))
      try {
        val buf = new Array[Byte](32)
        val n = in.read(buf)
        Some(new String(buf, 0, math.max(n, 0), "UTF-8").trim.toLong)
      } finally in.close()
    }

  /** Full build from the current corpus — the once-per-corpus pass. */
  def build(corpus: DataFrame): Unit = {
    store("fp").overwrite(TextOps.dedupExactIndex(corpus))
    store("spans").overwrite(TextOps.dupSpanIndex(corpus, width, stride))
    store("winnow").overwrite(TextOps.nearDupWinnowIndex(corpus, k, w, maxDf))
    Seq("fp", "spans", "winnow").foreach(stampRows)
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
    Seq("fp", "spans", "winnow").foreach(stampRows)
    refreshBloom()
  }

  // ---- probes: load-and-join, work ∝ delta ----
  //
  // Past `pruneThreshold` index rows, each probe prunes the INDEX scan
  // with a bitset of the DELTA's keys before the join: a batch is
  // small, so its bloom is KB-scale and rides the plan as a literal,
  // evaluated row-locally while the index files stream — index rows
  // that cannot match never reach the join, collapsing the join's
  // shuffle to ≈ true hits + the fp tail (delta-proportional) instead
  // of index-proportional. One columnar, shuffle-free index SCAN
  // remains — the floor for a persisted index without physical key
  // partitioning. The decision is COST-BASED from the persisted row
  // stat (one driver FS read, no job): below the threshold the bloom
  // build's extra aggregate+collect jobs cost more than the small join
  // they save (measured: the unconditional form doubled the sf0.1 warm
  // probe, 2.1 → 4.2 s, while changing nothing at 100 TB where the
  // index shuffle dominates). No false negatives either way, so results
  // stay bit-identical to the inline operators (IngestIndexSpec pins
  // both regimes via a pruneThreshold = 0 twin).

  private def deltaPruned(index: DataFrame, deltaKeys: => DataFrame,
      key: String, sub: String): DataFrame =
    if (!indexRows(sub).exists(_ >= pruneThreshold)) index
    else {
      val bits = BloomJoin.bloomFilterBits(deltaKeys, key, bloomBits, bloomK)
      index.filter(BloomJoin.mightContain(bits, col(key), bloomBits, bloomK))
    }

  /** [[TextOps.dedupExactIncremental]] against the persisted index. */
  def dedupExactProbe(incoming: DataFrame): DataFrame = {
    val keys = TextOps.dedupExactIndex(incoming).select(col("fp_md5"))
    TextOps.dedupExactProbe(deltaPruned(load("fp"), keys, "fp_md5", "fp"), incoming)
  }

  /** [[TextOps.dedupExactIncrementalBloom]] against the persisted
    * index + bitset — BOTH sides prefilter row-locally: the corpus
    * bitset kills clean delta rows at the delta scan, the delta bitset
    * kills non-matching index rows at the index scan. */
  def dedupExactProbeBloom(incoming: DataFrame): DataFrame = {
    val keys = TextOps.dedupExactIndex(incoming).select(col("fp_md5"))
    TextOps.dedupExactProbeBloom(bloomWords(),
      deltaPruned(load("fp"), keys, "fp_md5", "fp"), incoming, bloomBits, bloomK)
  }

  /** [[TextOps.docDupSpansIncremental]] against the persisted key set. */
  def dupSpansProbe(incoming: DataFrame): DataFrame = {
    val idx = load("spans")
    val hashed =
      idx.schema("w").dataType == org.apache.spark.sql.types.LongType
    val keys = TextOps.dupSpanIndex(incoming, width, stride, hashKey = hashed)
    TextOps.docDupSpansProbe(deltaPruned(idx, keys, "w", "spans"), incoming, width, stride)
  }

  /** [[TextOps.nearDupWinnowIncremental]] against the persisted
    * postings. */
  def winnowProbe(incoming: DataFrame, minShared: Int = 2): DataFrame = {
    val keys = TextOps.docWinnow(incoming, k, w).select(col("fp")).distinct()
    TextOps.nearDupWinnowProbe(deltaPruned(load("winnow"), keys, "fp", "winnow"),
      incoming, k, w, minShared, maxDf)
  }
}
