package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFns
import graft.ops.TextOps
import TestSpark._

/** Dedup-operator semantics on the sf0.001 corpus (which contains planted
  * near-duplicate documents) plus hand-built exact-dup fixtures.
  */
class DedupSpec extends AnyFunSuite {
  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("exact dedup groups identical canonical text") {
    val s = spark
    import s.implicits._
    val fixture = Seq(
      (1L, "Hello   World"),
      (2L, "hello world"),    // same canonical form as 1
      (3L, "different text entirely"),
      (4L, "HELLO\tWORLD "))  // same canonical form as 1
      .toDF("doc_id", "text")
    val out = TextOps.dedupExact(fixture).collect()
    assert(out.length == 2)
    val groups = out.map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(groups(1L) == 3L) // keeper 1, three members
    assert(groups(3L) == 1L)
  }

  test("minhash LSH recovers the exact-jaccard near-dup pairs") {
    val exact = TextOps.nearDupJaccard(docs, minJaccard = 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = TextOps.nearDupMinhash(docs, minEstJaccard = 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    val recall = (exact & mh).size.toDouble / exact.size
    assert(recall >= 0.95, s"minhash recall $recall over ${exact.size} true pairs")
    // est-jaccard-filtered candidates shouldn't drown the true pairs
    assert(mh.size <= exact.size * 3, s"minhash precision: ${mh.size} pairs vs ${exact.size} true")
  }

  test("simhash banding finds the planted near-dups within hamming radius") {
    val exact = TextOps.nearDupJaccard(docs, minJaccard = 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = TextOps.nearDupSimhash(docs)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = (exact & sh).size.toDouble / exact.size
    assert(recall >= 0.9, s"simhash recall $recall over ${exact.size} true pairs")
  }

  test("minhash estimate approximates true jaccard on candidate pairs") {
    val joined = TextOps.nearDupMinhash(docs, minEstJaccard = 0.8).as("m")
      .join(TextOps.nearDupJaccard(docs, minJaccard = 0.5).as("j"),
        Seq("doc_a", "doc_b"))
      .select(abs(col("est_jaccard") - col("jaccard")).as("err"))
      .agg(max(col("err"))).head().getDouble(0)
    assert(joined <= 0.25, s"max |est - true| = $joined")
  }

  test("near-dup keep-list drops exactly the larger ids of qualifying pairs") {
    val pairs = TextOps.nearDupJaccard(docs).select("doc_b").distinct().count()
    val kept = TextOps.nearDupKeep(docs).count()
    assert(kept == docs.count() - pairs)
  }

  test("cluster dedup is transitive across a similarity chain") {
    val s = spark
    import s.implicits._
    // Sliding windows: consecutive docs overlap 24/30 words (jaccard
    // ~0.65), two apart only 18 (~0.4) — so 10~11 and 11~12 are edges
    // but 10~12 is NOT: only transitive closure groups all three.
    val words = (0 until 42).map(i => s"tok$i")
    def doc(i: Int) = words.slice(6 * i, 6 * i + 30).mkString(" ")
    val fixture = Seq(
      (10L, doc(0)), (11L, doc(1)), (12L, doc(2)),
      (20L, (100 until 140).map(i => s"word$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextOps.nearDupClusters(fixture, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val clustered = out.map(_._1).toSet
    assert(clustered == Set(10L, 11L, 12L), s"clustered=$clustered")
    assert(out.forall(_._2 == 10L), "min-label must win for the whole component")
    assert(out.forall(_._3 == 3L))
  }

  test("winnowing guarantee: a shared run of >= w+k-1 tokens shares a fingerprint") {
    val s = spark
    import s.implicits._
    // k=3, w=4: guarantee threshold is a 6-token shared run
    val shared = "alpha beta gamma delta epsilon zeta"
    val fixture = Seq(
      (1L, s"one two three $shared four five six"),
      (2L, s"seven eight $shared nine ten"),
      (3L, "totally disjoint words only here making up a document"))
      .toDF("doc_id", "text")
    val fps = TextOps.docWinnow(fixture).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byDoc = fps.groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).toSet }
    assert((byDoc(1L) & byDoc(2L)).nonEmpty, "guaranteed shared fingerprint missing")
    assert((byDoc(1L) & byDoc(3L)).isEmpty, "disjoint docs should not collide")
    // determinism
    val again = TextOps.docWinnow(fixture).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == fps.toSet)
  }

  test("incremental near-dup equals the batch recompute filtered to the delta") {
    val incoming = docs.filter(col("doc_id") % 10 === 0)
    val existing = docs.filter(col("doc_id") % 10 =!= 0)
    val inc = TextOps.nearDupJaccardIncremental(existing, incoming)
      .select("doc_a", "doc_b", "shared", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val incIds = incoming.select("doc_id").collect().map(_.getLong(0)).toSet
    val full = TextOps.nearDupJaccard(docs)
      .select("doc_a", "doc_b", "shared", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .filter(p => incIds(p._1) || incIds(p._2)).toSet
    assert(inc == full, s"inc-only=${inc -- full}, full-only=${full -- inc}")
    assert(inc.nonEmpty, "fixture split should contain cross-batch near-dups")
  }

  test("winnow blocking recovers the high-jaccard near-dup pairs") {
    val exact = TextOps.nearDupJaccard(docs, minJaccard = 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wn = TextOps.nearDupWinnow(docs)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = (exact & wn).size.toDouble / exact.size
    assert(recall >= 0.95, s"winnow recall $recall over ${exact.size} true pairs")
  }

  test("compiled winnowing expression matches the HOF formulation on the corpus") {
    val fast = TextOps.docWinnow(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val slow = TextOps.docWinnowHof(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == slow)
    assert(fast.nonEmpty)
  }

  test("nearDupClusters on a clean corpus returns an empty frame") {
    val s = spark
    import s.implicits._
    // no qualifying pairs: every doc disjoint vocabulary
    val fixture = (0L until 4L).map(i =>
      (i, (0 until 30).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextOps.nearDupClusters(fixture, minJaccard = 0.5)
    assert(out.collect().isEmpty)
    assert(out.columns.toSeq == Seq("doc_id", "cluster_id", "cluster_size"))
  }

  test("driver union-find clusters equal the distributed label-propagation clusters") {
    val onDriver = TextOps.nearDupClusters(docs, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val distributed = TextOps.nearDupClusters(docs, minJaccard = 0.5, driverEdgeLimit = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(onDriver == distributed,
      s"driver-only=${onDriver -- distributed}, dist-only=${distributed -- onDriver}")
    assert(onDriver.nonEmpty, "fixture corpus should contain near-dup clusters")
  }

  test("stratified sample rates land near the configured percentages") {
    val out = TextOps.sampleStratified(docs).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = out.getOrElse("en", 0L).toDouble / totals("en")
    assert(math.abs(enRate - 0.5) < 0.15, s"en sampled at $enRate, want ~0.5")
    // deterministic: same call, same rows
    val a = TextOps.sampleStratified(docs).select("doc_id").collect().map(_.getLong(0)).toSet
    val b = TextOps.sampleStratified(docs).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("shingles guard: fewer tokens than k yields empty, not garbage") {
    val s = spark
    import s.implicits._
    val tiny = Seq((1L, "only two")).toDF("doc_id", "text")
      .select(TextFns.shingles(TextFns.tokens(col("text")), 3).as("sh"))
      .head().getSeq[String](0)
    assert(tiny.isEmpty)
  }
}
