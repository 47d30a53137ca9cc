package graft

import org.apache.spark.sql.functions._

import graft.incremental.{SnapshotTable, StoreLock}
import graft.ops.TextOps

/** The PERIODIC batch half of accumulate mode's near-dup lambda split.
  *
  * [[CorpusRun]] in accumulate mode merges each delta batch into the
  * growing corpus store with exact dedup enforced CROSS-batch (indexed
  * admission) but near-dup scope BATCH-local — a near-dup pair whose
  * members arrive in different batches survives both gates, the
  * standard speed-layer caveat. This main is the batch layer that
  * closes it: re-run the quality-aware transitive-cluster keeper
  * ([[TextOps.nearDupKeepBest]]) over the WHOLE accumulated store,
  * demote every cluster member that is not its cluster's keeper, and
  * re-derive the trainer-facing exports — so the accumulated corpus
  * CONVERGES to what a single monolithic run over the union would have
  * published, on the sweep's cadence.
  *
  * Usage: runMain graft.CorpusNearDupSweep <outDir>
  *
  * Demotion is a keyed DELETE on the store (file-pruned copy-on-write —
  * only files holding a demoted doc_id rewrite, the [[SnapshotTable]]
  * key-set prune), committed atomically and tagged with the demotion
  * count. Quality scores come from the store itself (published by the
  * funnel), so the sweep never re-runs the quality scan — its cost is
  * the pair/cluster pass plus the pruned rewrite. Runs under the
  * store's maintenance lock ([[StoreLock]]), like every other
  * mutate-then-export pass. A sweep that finds nothing demotes nothing
  * and commits nothing — idempotent at fixpoint, so "run it after every
  * K batches" needs no further coordination.
  */
object CorpusNearDupSweep {

  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val (spark, owned) = RunSession.obtain()
    GraftSession.install(spark)
    import spark.implicits._

    val store = new SnapshotTable(spark, s"$outDir/corpus", "doc_id")
    require(store.exists, s"no corpus store at $outDir/corpus — run CorpusRun first")

    // NO checkpoint on the corpus frame: a snapshot read is already a
    // stable, re-readable source (immutable files) — materializing the
    // full corpus (text included) to local disk would copy the table.
    // Only the ids-only DEMOTION frame below checkpoints, because it is
    // derived from the expensive pair/cluster pass and feeds two
    // actions (count + delete).
    val corpus = store.read()
    val total = corpus.count()
    // corpus-wide keeper pass; quality rides from the published rows
    val keepers = TextOps.nearDupKeepBest(corpus,
        precomputedQuality = Some(corpus.select(col("doc_id"), col("quality_score"))))
      .select("doc_id")
    val demoted = corpus.select("doc_id").join(keepers, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val nDemoted = demoted.count()

    if (nDemoted == 0) {
      println(s"[sweep] $total docs, no cross-batch near-dups — store unchanged " +
        s"(version ${store.currentVersion.get})")
    } else {
      StoreLock.withLock(spark, s"$outDir/corpus", "CorpusNearDupSweep") {
        store.delete(demoted, tag = s"neardup-sweep:$nDemoted")
        val published = store.read()
        graft.sources.Sources.clusteredWrite(published, s"$outDir/kept", "split")
        TextOps.packSequences(published.filter(col("split") === "train"))
          .write.mode("overwrite").parquet(s"$outDir/train_packed")
      }
      Seq(("neardup_sweep_demoted", nDemoted))
        .toDF("stage", "n_docs")
        .coalesce(1).write.mode("append").parquet(s"$outDir/report.parquet")
      println(s"[sweep] $total docs -> demoted $nDemoted cross-batch near-dups " +
        s"(version ${store.currentVersion.get}); kept/ + train_packed re-exported")
    }
    if (owned) spark.stop()
  }
}
