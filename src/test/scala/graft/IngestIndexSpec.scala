package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.incremental.IngestIndex
import graft.ops.TextOps
import TestSpark._

/** The persisted ingest-probe state ([[IngestIndex]]) must be invisible
  * to results: every probe against the parquet state is bit-identical to
  * the inline operator that rebuilds its corpus index per call, and
  * absorbing an admitted batch is equivalent to rebuilding from the
  * grown corpus. (The point of the state is COST — delta-proportional
  * per-batch work — never semantics.)
  */
class IngestIndexSpec extends AnyFunSuite {
  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")
  private lazy val corpus = docs.filter(col("doc_id") % 10 =!= 0)
  private lazy val delta = docs.filter(col("doc_id") % 10 === 0)

  private def freshDir(): String =
    Files.createTempDirectory("graft-ingest").toString

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  test("persisted probes are bit-identical to the inline incremental operators") {
    val idx = new IngestIndex(spark, freshDir())
    idx.build(corpus)
    checkProbesMatchInline(idx)
  }

  test("delta-bloom-pruned probes (pruneThreshold = 0) are bit-identical too") {
    // the 100 TB regime forced on: the index scan is prefiltered by the
    // delta's bitset — no false negatives, so results cannot move
    val idx = new IngestIndex(spark, freshDir(), pruneThreshold = 0L)
    idx.build(corpus)
    checkProbesMatchInline(idx)
  }

  private def checkProbesMatchInline(idx: IngestIndex): Unit = {
    assert(rows(idx.dedupExactProbe(delta)) ==
      rows(TextOps.dedupExactIncremental(corpus, delta)))
    assert(rows(idx.dedupExactProbeBloom(delta)) ==
      rows(TextOps.dedupExactIncrementalBloom(corpus, delta)))
    assert(rows(idx.dupSpansProbe(delta)) ==
      rows(TextOps.docDupSpansIncremental(corpus, delta)))
    assert(rows(idx.winnowProbe(delta)) ==
      rows(TextOps.nearDupWinnowIncremental(corpus, delta)))
    // and the bloom arm returns exactly the exact arm (no false
    // negatives; false positives die in the verify join)
    assert(rows(idx.dedupExactProbeBloom(delta)) == rows(idx.dedupExactProbe(delta)))
  }

  test("absorb(batch) is equivalent to a full rebuild on the grown corpus") {
    val half1 = corpus.filter(col("doc_id") % 3 =!= 0)
    val half2 = corpus.filter(col("doc_id") % 3 === 0)
    val absorbed = new IngestIndex(spark, freshDir())
    absorbed.build(half1)
    absorbed.absorb(half2)
    val rebuilt = new IngestIndex(spark, freshDir())
    rebuilt.build(corpus)
    assert(rows(absorbed.dedupExactProbe(delta)) == rows(rebuilt.dedupExactProbe(delta)))
    assert(rows(absorbed.dedupExactProbeBloom(delta)) ==
      rows(rebuilt.dedupExactProbeBloom(delta)))
    assert(rows(absorbed.dupSpansProbe(delta)) == rows(rebuilt.dupSpansProbe(delta)))
    assert(rows(absorbed.winnowProbe(delta)) == rows(rebuilt.winnowProbe(delta)))
  }

  test("winnow saturation markers survive absorb (a stop key never re-identifies)") {
    val s = spark
    import s.implicits._
    // 5 docs sharing one boilerplate sentence saturate its fingerprints
    // at maxDf=3; a genuine near-pair (20, 21) stays identifiable.
    val boiler = "the quick brown fox jumps over the lazy dog again and again"
    val ex = (1L to 5L).map(i => (i, s"$boiler unique tail $i")).toDF("doc_id", "text")
    val longOriginal = "completely original content about distributed shuffle sizing " +
      "strategies where every executor keeps its partitions balanced and the " +
      "optimizer prunes columns before the scan ever touches remote storage"
    val pairDoc = (21L, longOriginal)
    val dir = freshDir()
    val idx = new IngestIndex(spark, dir, maxDf = 3)
    idx.build(ex)
    idx.absorb(Seq(pairDoc).toDF("doc_id", "text"))
    val probe = Seq(
      (30L, s"$boiler unique tail thirty"),
      (31L, longOriginal))
      .toDF("doc_id", "text")
    val got = idx.winnowProbe(probe).collect()
    // 31 pairs with 21; 30 pairs with nobody (boilerplate fps saturated)
    assert(got.forall(_.getLong(0) == 31L))
    assert(got.exists(r => r.getLong(1) == 21L))
    // rebuild on the same grown corpus agrees
    val rebuilt = new IngestIndex(spark, freshDir(), maxDf = 3)
    rebuilt.build(ex.unionByName(Seq(pairDoc).toDF("doc_id", "text")))
    assert(rows(idx.winnowProbe(probe)) == rows(rebuilt.winnowProbe(probe)))
  }
}
