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
    * stage shares.
    *
    * DOMAIN CONTRACT, enforced row-locally: `doc_id ∈ [0, 2³¹)`. Outside
    * it the scheme silently breaks twice over — `doc_id·a` overflows
    * Long above ~8.4e9 (Spark's pmod of the wrapped negative stays
    * non-negative but a SQL `%` replay goes negative, so engines
    * diverge), and injectivity (which [[shardManifest]]'s min_by/max_by
    * first/last-doc claim rides on) only holds while the id range fits
    * under the modulus. A corpus with wider ids swaps in
    * `xxhash64(doc_id)` — same plan, no overflow — and must then rank
    * first/last by an explicit (h, doc_id) tie-break, since a 64-bit
    * hash is not injective on any domain. The guard turns the silent
    * divergence into a loud per-row error. */
  private[graft] def withShard(documents: DataFrame, nShards: Int): DataFrame =
    documents
      .withColumn("h",
        when(col("doc_id") < 0 || col("doc_id") >= Mod,
          raise_error(concat(
            lit(s"ExportOps LCG shuffle requires doc_id in [0, $Mod): got "),
            col("doc_id"))))
          .otherwise(pmod(col("doc_id") * lit(MulA) + lit(AddC), lit(Mod))))
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

  /** Length-balanced sharding: rank every doc globally by
    * (n_chars, doc_id) and deal round-robin — shard k takes every
    * nShards-th doc in length order, so per-shard char mass is tightly
    * balanced (each shard samples the whole length distribution), the
    * property that keeps training loaders in step when sequence packing
    * follows. Hash sharding ([[shardManifest]]) balances COUNTS;
    * length skew across its shards is whatever chance deals
    * (ExportOpsSpec quantifies the gap).
    *
    * The global rank uses the same two-level prefix sum as
    * `TextOps.packSequences` — range partition on the sort key, one
    * window per partition, per-partition counts collected once (bounded:
    * `nBuckets` rows) and folded back as base offsets. No 1-partition
    * global window anywhere, so the plan survives 100 TB. */
  def shardManifestBalanced(documents: DataFrame, nShards: Int = 8,
      nBuckets: Int = 32): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pid")).orderBy(col("n_chars"), col("doc_id"))
    val local = documents.select(col("doc_id"), col("n_chars"))
      .repartitionByRange(nBuckets, col("n_chars"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .withColumn("local_rn", row_number().over(w).cast("long"))
      .localCheckpoint(false)
    val counts = local.groupBy(col("pid")).agg(count(lit(1)).as("pcnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val bases = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _)).toMap
    val base = counts.map(_._1).foldRight(lit(0L)) { case (pid, rest) =>
      when(col("pid") === pid, lit(bases(pid))).otherwise(rest)
    }
    local
      .withColumn("shard", pmod(base + col("local_rn") - 1, lit(nShards.toLong)))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars_total"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("shard"))
  }

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
