package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-data export: deterministic pseudo-shuffled sharding.
  *
  * A training run wants the corpus (a) globally shuffled so batches are
  * i.i.d.-ish, (b) split into fixed shards so loaders stream without
  * coordination, and (c) DETERMINISTIC so re-exports are byte-identical
  * and resumable. A real `ORDER BY rand()` is none of those; the
  * standard trick is to sort by a seeded hash of the stable key. We use
  * a 31-bit LCG step on `doc_id` (odd multiplier ⇒ injective on any
  * doc_id range < 2³¹, so the "shuffle" is a permutation, not a
  * many-to-one bucketing) — plain BIGINT arithmetic, so the DuckDB
  * oracle replays it exactly. At 100 TB swap the LCG for
  * `xxhash64(doc_id, seed)` — same plan, wider hash; the LCG is chosen
  * here ONLY because the oracle must reproduce it in SQL.
  *
  * Plan shape at scale: shard assignment is row-local projection; the
  * manifest is one map-side-combined aggregate keyed on `nShards` values
  * (tiny); the writer is one shuffle (`repartition(nShards, shard)`) +
  * per-partition sort — the minimum any global re-shard must pay.
  */
object ExportOps {

  /** LCG step: h = (a·doc_id + c) mod 2³¹, a odd → injective. */
  private val MulA = 1103515245L
  private val AddC = 12345L
  private val Mod = 2147483648L

  /** (…doc cols, h, shard) — the row-local assignment every export
    * stage shares. */
  private[graft] def withShard(documents: DataFrame, nShards: Int): DataFrame =
    documents
      .withColumn("h", pmod(col("doc_id") * lit(MulA) + lit(AddC), lit(Mod)))
      .withColumn("shard", pmod(col("h"), lit(nShards.toLong)))

  /** Per-shard manifest: doc count, char mass, the first/last doc in
    * shuffle order (argmin/argmax by h — well-defined because the LCG is
    * injective), and a content-independent checksum (Σh) that changes iff
    * the doc_id set changes. One aggregate, `nShards` output rows. */
  def shardManifest(documents: DataFrame, nShards: Int = 8): DataFrame =
    withShard(documents, nShards)
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars_total"),
        min_by(col("doc_id"), col("h")).as("first_doc"),
        max_by(col("doc_id"), col("h")).as("last_doc"),
        sum(col("h")).as("h_checksum"))
      .orderBy(col("shard"))

  /** Materialize the shards: one file tree `dir/shard=S/…`, rows within
    * a shard in shuffle (h) order. `repartition(nShards, shard)` gives
    * one task per shard;
    * `sortWithinPartitions` makes the file content deterministic, so two
    * exports of the same corpus are row-identical (ExportOpsSpec pins
    * this). */
  def writeShards(documents: DataFrame, dir: String, nShards: Int = 8): Unit =
    withShard(documents, nShards)
      .repartition(nShards, col("shard"))
      // leading `shard` satisfies the partitioned-write's required
      // ordering, so FileFormatWriter does NOT insert its own (unstable)
      // sort and the h order reaches the files intact
      .sortWithinPartitions(col("shard"), col("h"))
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
}
