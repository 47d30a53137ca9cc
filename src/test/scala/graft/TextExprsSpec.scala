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

  test("ChunkRows generator == compositional docChunks, bit for bit") {
    import graft.ops.TextOps
    val key = Seq("doc_id", "chunk_ix")
    // full-join compare: a row differing in ANY column (or present on
    // only one side) survives the filter
    val a = TextOps.docChunks(docs, chunkLen = 32, overlap = 8).as("a")
    val b = TextOps.docChunksGen(docs, chunkLen = 32, overlap = 8).as("b")
    val joined = a.join(b, key, "full_outer")
    assert(a.count() == b.count())
    val diff = joined.filter(
      col("a.start_tok") =!= col("b.start_tok") ||
      col("a.n_chunk_tokens") =!= col("b.n_chunk_tokens") ||
      col("a.chunk_md5") =!= col("b.chunk_md5") ||
      col("a.chunk_md5").isNull || col("b.chunk_md5").isNull).count()
    assert(diff == 0)
    // uneven tail: a 7-token doc at chunkLen=5/overlap=2 gives chunks
    // starting 1,4,7 with lengths 5,4,1
    val tiny = spark.createDataFrame(Seq((1L, "a b c d e f g"))).toDF("doc_id", "text")
    val rows = TextOps.docChunksGen(tiny, chunkLen = 5, overlap = 2)
      .orderBy("chunk_ix")
      .select("start_tok", "n_chunk_tokens").collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(rows.toSeq == Seq((1, 5), (4, 4), (7, 1)))
  }

  test("RepetitionStats expression == exploded-aggregation docRepetition, bit for bit") {
    import graft.ops.TextOps
    val a = TextOps.docRepetition(docs).as("a")
    val b = TextOps.docRepetitionHof(docs).as("b")
    val joined = a.join(b, Seq("doc_id"), "full_outer")
    assert(a.count() == b.count())
    val diff = joined.filter(
      col("a.n_tokens") =!= col("b.n_tokens") ||
      col("a.dup_token_frac") =!= col("b.dup_token_frac") ||
      col("a.top2_frac") =!= col("b.top2_frac") ||
      col("a.dup3_frac") =!= col("b.dup3_frac") ||
      col("a.n_tokens").isNull || col("b.n_tokens").isNull).count()
    assert(diff == 0)
    // tie-break pin: two bigrams at the same count -> the LONGER wins
    // ("bb cc" over "a a"); dup3 counts the repeated trigram's chars
    val s = spark
    import s.implicits._
    val tiny = Seq((1L, "a a x bb cc y a a z bb cc a a q bb cc"))
      .toDF("doc_id", "text")
    val r = TextOps.docRepetition(tiny).collect()(0)
    val rh = TextOps.docRepetitionHof(tiny).collect()(0)
    assert(r.getDouble(3) == rh.getDouble(3) && r.getDouble(4) == rh.getDouble(4))
  }

  test("custom expressions are first-class SQL functions") {
    // a user of the SQL surface gets every graft function without the
    // Column API: scalar, struct-returning, and the table generator
    TextExprs.register(spark)
    graft.functions.VecDot.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       simhash64(array('a', 'b', 'a')) AS sh,
        |       repetition_stats(array('a', 'a', 'a')).top2_cnt AS t2
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 11.0)
    val viaColumnApi = spark.range(1)
      .select(TextFns.simhash64(typedLit(Seq("a", "b", "a"))).as("h"))
      .collect()(0).getLong(0)
    assert(r.getLong(1) == viaColumnApi)
    assert(r.getLong(2) == 2L) // bigrams: "a a" twice
    // the Generator works as a SQL table function: 7 tokens at
    // chunkLen=5/overlap=2 emit chunks starting 1, 4, 7
    val chunks = spark.sql(
      "SELECT chunk_rows(array('a','b','c','d','e','f','g'), 5, 2)").collect()
    assert(chunks.length == 3)
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
