package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.incremental.IngestIndex

/** Direct-run entry for the persisted ingest-probe path: build the
  * corpus-side dedup indexes ONCE ([[graft.incremental.IngestIndex]]),
  * then probe an incoming batch against the parquet state — the
  * warm-ingest shape where per-batch cost is delta-proportional, vs the
  * inline operators that re-derive their corpus index per call.
  *
  * Usage: runMain graft.IngestRun <sfDir> <stateDir> [build|probe|absorb|compact]
  *
  *   build   corpus (doc_id % 10 != 0) → fp/bloom/spans/winnow state
  *   probe   delta (doc_id % 10 == 0) against the existing state: all
  *           four probes (exact, bloom-prefiltered exact, span, winnow).
  *           The bloom arm must return exactly the exact arm's rows (no
  *           false negatives; FPs die in the join) — divergence throws.
  *   absorb  fold the delta into the state (segment append — no corpus
  *           text read, no index rewrite)
  *   compact fold accumulated segments into the bucketed base
  *
  * The batch split mirrors the `dedup_exact_delta` / `doc_dup_spans_delta`
  * / `neardup_winnow_delta` query registrations, so the probe results
  * are the same frames those oracled queries produce — the persisted
  * path is pinned bit-identical to the inline path by IngestIndexSpec.
  */
object IngestRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val stateDir = args(1)
    val mode = if (args.length > 2) args(2) else "build"
    // embeddable main (same protocol as [[IncrementalRun]]): reuse an
    // active session UNTOUCHED ([[RunSession]] — the builder route would
    // reconfigure the caller's runtime SQL confs), signal failure by
    // throwing
    val (spark, owned) = RunSession.obtain()

    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val delta = docs.filter(col("doc_id") % 10 === 0)
    val index = new IngestIndex(spark, stateDir)

    mode match {
      case "build" =>
        index.build(corpus)
        println(s"[ingest] built fp/bloom/spans/winnow state at $stateDir")
      case "probe" =>
        require(index.exists, s"no ingest state at $stateDir — run build first")
        val exact = index.dedupExactProbe(delta).count()
        val bloom = index.dedupExactProbeBloom(delta).count()
        if (exact != bloom)
          throw new IllegalStateException(
            s"bloom probe diverged from exact probe: $bloom vs $exact rows")
        val spans = index.dupSpansProbe(delta).count()
        val winnow = index.winnowProbe(delta).count()
        println(s"[ingest] probe dedup=$exact bloom=$bloom spans=$spans winnow=$winnow")
      case "absorb" =>
        require(index.exists, s"no ingest state at $stateDir — run build first")
        index.absorb(delta)
        println(s"[ingest] absorbed delta into $stateDir (segment append)")
      case "compact" =>
        require(index.exists, s"no ingest state at $stateDir — run build first")
        index.compact()
        println(s"[ingest] compacted segments into $stateDir base")
      case other => throw new IllegalArgumentException(s"unknown mode: $other")
    }
    if (owned) spark.stop()
  }
}
