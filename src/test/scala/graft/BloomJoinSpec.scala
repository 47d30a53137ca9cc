package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.BloomJoin
import TestSpark._

class BloomJoinSpec extends AnyFunSuite {

  test("no false negatives: every build-side key passes the probe") {
    val s = spark
    import s.implicits._
    val keys = (1L to 2000L).map(i => i * 7919).toDF("k")
    val bloom = BloomJoin.bloomFilterBits(keys, "k", numBits = 1 << 14, k = 5)
    val missed = keys.filter(!BloomJoin.mightContain(bloom, col("k"), 1 << 14, 5))
    assert(missed.isEmpty)
  }

  test("false-positive rate on disjoint probes stays near the design point") {
    val s = spark
    import s.implicits._
    // build on evens, probe odds: zero true matches, survivors = FPs.
    // ~2000 keys in 2^14 bits with k=5 → theoretical fpp ≈ 1.2%
    val build = (1L to 2000L).map(_ * 2).toDF("k")
    val bloom = BloomJoin.bloomFilterBits(build, "k", numBits = 1 << 14, k = 5)
    val probes = (1L to 4000L).map(_ * 2 + 1).toDF("k")
    val fp = probes.filter(BloomJoin.mightContain(bloom, col("k"), 1 << 14, 5)).count()
    assert(fp < 4000 * 0.05, s"$fp false positives of 4000 — bitset is not filtering")
  }

  test("bloom-prefiltered join result equals the plain join") {
    val lineitem = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_suppkey"), col("l_extendedprice"))
    val small = Tables.supplier(spark, "/root/testdata/sf0.001")
      .filter(col("s_suppkey") % 10 === 0).select(col("s_suppkey"))
    val viaBloom = BloomJoin.bloomJoin(lineitem, small, "l_suppkey", "s_suppkey")
      .groupBy("s_suppkey").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = lineitem.join(small, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_suppkey").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaBloom == plain && plain.nonEmpty)
  }

  test("empty build side filters everything (semi-join with empty set)") {
    val s = spark
    import s.implicits._
    val big = (1L to 100L).toDF("k")
    val none = Seq.empty[Long].toDF("k2")
    assert(BloomJoin.bloomJoin(big, none, "k", "k2").isEmpty)
  }
}
