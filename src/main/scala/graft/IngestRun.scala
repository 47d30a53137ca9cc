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
  *   cycle   build → probe ×2 → absorb → compact → probe in one JVM
  *           with per-step wall times — the bench decomposition as an
  *           iteration loop
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
        // the four probes are independent read-only jobs — overlap them
        // (driver threads; same pattern a production ingest admission
        // uses, and the same one IngestIndex's own staging uses)
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.global
        val Seq(exact, bloom, spans, winnow) = Await.result(Future.sequence(Seq(
          Future(index.dedupExactProbe(delta).count()),
          Future(index.dedupExactProbeBloom(delta).count()),
          Future(index.dupSpansProbe(delta).count()),
          Future(index.winnowProbe(delta).count()))), Duration.Inf)
        if (exact != bloom)
          throw new IllegalStateException(
            s"bloom probe diverged from exact probe: $bloom vs $exact rows")
        println(s"[ingest] probe dedup=$exact bloom=$bloom spans=$spans winnow=$winnow")
      case "absorb" =>
        require(index.exists, s"no ingest state at $stateDir — run build first")
        index.absorb(delta)
        println(s"[ingest] absorbed delta into $stateDir (segment append)")
      case "compact" =>
        require(index.exists, s"no ingest state at $stateDir — run build first")
        index.compact()
        println(s"[ingest] compacted segments into $stateDir base")
      case "cycle" =>
        def timed(name: String)(body: => Unit): Unit = {
          val t0 = System.nanoTime()
          body
          println(f"[ingest-cycle] $name%-12s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
        }
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.global
        def probeAll(): Unit = Await.result(Future.sequence(Seq(
          Future(index.dedupExactProbe(delta).count()),
          Future(index.dedupExactProbeBloom(delta).count()),
          Future(index.dupSpansProbe(delta).count()),
          Future(index.winnowProbe(delta).count()))), Duration.Inf)
        timed("build")(index.build(corpus))
        timed("probe_cold")(probeAll())
        timed("probe_warm")(probeAll())
        timed("absorb")(index.absorb(delta))
        timed("probe_seg")(probeAll())
        timed("compact")(index.compact())
        timed("probe_post")(probeAll())
        // warm rebuild into a sibling dir: the JIT-warm build cost the
        // bench's operational row actually observes
        val warmIdx = new IngestIndex(spark, stateDir + "-warm")
        timed("build_warm")(warmIdx.build(corpus))
      case other => throw new IllegalArgumentException(s"unknown mode: $other")
    }
    if (owned) spark.stop()
  }
}
