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

  test("shingles guard: fewer tokens than k yields empty, not garbage") {
    val s = spark
    import s.implicits._
    val tiny = Seq((1L, "only two")).toDF("doc_id", "text")
      .select(TextFns.shingles(TextFns.tokens(col("text")), 3).as("sh"))
      .head().getSeq[String](0)
    assert(tiny.isEmpty)
  }
}
