package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextExprs, TextFns}
import TestSpark._

/** The tight-loop expressions must be value-identical to the reference
  * HOF formulations they replace. */
class TextExprsSpec extends AnyFunSuite {
  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("WordShingles == HOF shingles") {
    TextExprs.register(spark)
    val toks = TextFns.tokens(col("text"))
    val diff = docs.select(
      TextExprs.wordShingles(toks, 3).as("a"),
      TextFns.shingles(toks, 3).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("MinHashSig == HOF minhashSignature") {
    TextExprs.register(spark)
    val toks = TextFns.tokens(col("text"))
    val sh = TextFns.shingles(toks, 3)
    val diff = docs.filter(size(sh) > 0).select(
      TextExprs.minhashSig(sh, 16).as("a"),
      TextFns.minhashSignature(sh, 16).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("SimHash64 == HOF simhash64") {
    TextExprs.register(spark)
    val toks = TextFns.tokens(col("text"))
    val diff = docs.select(
      TextExprs.simhash64(toks).as("a"),
      TextFns.simhash64(toks).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }
}
