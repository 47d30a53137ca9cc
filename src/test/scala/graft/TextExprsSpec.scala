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

  test("forced codegen == interpreted eval, bit for bit (all eight expressions)") {
    // GenerateUnsafeProjection compiles the expression's doGenCode with
    // no fallback; expr.eval IS the interpreted path. Any divergence in
    // the codegen wiring (casts, null guards, reference objects) fails
    // here on the exact element.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String

    def arr(toks: String*): GenericArrayData =
      new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
    val fixtures: Seq[Any] = Seq(
      null, // null input → null out (codegen null guard)
      arr(), arr("a"), arr("a", "b"),
      arr("a", "b", "c", "a", "b", "c", "a", "b"),
      arr("the", "quick", "brown", "fox", "jumps", "over", "the", "lazy", "dog",
        "the", "quick", "brown", "fox"),
      arr(Seq.tabulate(64)(i => s"tok${i % 7}"): _*))
    val child = BoundReference(0, ArrayType(StringType), nullable = true)
    val exprs = Seq(
      TextExprs.WordShingles(child, 3),
      TextExprs.MinHashSig(child, 16),
      TextExprs.SimHash64(child),
      TextExprs.WordShingleHashes(child, 3),
      TextExprs.WinnowFps(child, 3, 4),
      TextExprs.RepetitionStats(child),
      TextExprs.BpeTokenCount(child, Seq("a", "b", "ab", "c")))
    for (e <- exprs; input <- fixtures) {
      val row = InternalRow(input)
      val expected = e.eval(row)
      val got = GenerateUnsafeProjection.generate(Seq(e)).apply(row).copy()
      val clue = s"${e.prettyName} on ${Option(input).fold("null")(_.toString)}"
      if (expected == null) assert(got.isNullAt(0), clue)
      else e.dataType match {
        case ArrayType(et, _) =>
          val a = got.getArray(0).toObjectArray(et).toSeq
          val b = expected.asInstanceOf[ArrayData].toObjectArray(et).toSeq
          assert(a == b, clue)
        case LongType => assert(got.getLong(0) == expected, clue)
        case st: StructType =>
          val g = got.getStruct(0, st.length)
          val x = expected.asInstanceOf[InternalRow]
          assert(g.getLong(0) == x.getLong(0) && g.getInt(1) == x.getInt(1) &&
            g.getLong(2) == x.getLong(2), clue)
        case other => fail(s"unhandled type $other")
      }
    }
    // ChunkRows (a Generator) — compare the emitted row seqs directly
    for (input <- fixtures) {
      val g = TextExprs.ChunkRows(child, 5, 2)
      val viaEval = g.eval(InternalRow(input)).iterator.map(_.copy()).toSeq
      val viaKernel = TextExprs
        .chunkKernel(input.asInstanceOf[ArrayData], 5, 2).iterator.map(_.copy()).toSeq
      assert(viaEval == viaKernel)
    }
  }

  test("no CodegenFallback: signature stages fuse into whole-stage codegen") {
    // The round-4 gap: every custom text expression broke whole-stage
    // fusion for its enclosing stage. Now the Project carrying the
    // expression AND the Generate node must sit inside a codegen stage
    // ([codegen id : N] in formatted explain).
    TextExprs.register(spark)
    val toks = TextFns.tokens(col("text"))
    def formatted(df: org.apache.spark.sql.DataFrame): String = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out))(df.explain("formatted"))
      out.toString
    }
    val scalarPlan = formatted(docs.select(
      TextExprs.simhash64(toks).as("sh"),
      TextExprs.minhashSig(TextExprs.wordShingles(toks, 3), 16).as("mh"),
      TextExprs.winnowFps(toks, 3, 4).as("wf"),
      TextExprs.repetitionStats(toks).as("rs")))
    // the detail section prints `(N) Project [codegen id : M]` for nodes
    // inside a whole-stage codegen span
    val projLine = scalarPlan.linesIterator
      .find(l => l.matches("""\(\d+\) Project.*""")).get
    assert(projLine.contains("codegen id"), s"Project not fused:\n$scalarPlan")
    val genPlan = formatted(
      docs.select(col("doc_id"), TextExprs.chunkRows(toks, 32, 8)))
    val genLine = genPlan.linesIterator
      .find(l => l.matches("""\(\d+\) Generate.*""")).get
    assert(genLine.contains("codegen id"), s"Generate not fused:\n$genPlan")
  }

  test("GraftSparkExtensions injects every graft function for pure-SQL clusters") {
    // a cluster configured with spark.sql.extensions only (no
    // GraftSession.install) must still resolve the whole function
    // surface — registerFunctions is the exact hook session creation
    // calls with the builtin registry
    import org.apache.spark.sql.SparkSessionExtensions
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
    val ext = new SparkSessionExtensions
    new graft.plans.GraftSparkExtensions().apply(ext)
    val reg = FunctionRegistry.builtin.clone()
    org.apache.spark.sql.graft.GraftSqlShim.applyInjectedFunctions(ext, reg)
    TextExprs.builders.map(_._1).foreach { name =>
      assert(reg.functionExists(FunctionIdentifier(name)), s"$name not injected")
    }
    assert(TextExprs.builders.map(_._1).contains("vec_dot"))
    // and the injected builder constructs a working expression
    val vd = reg.lookupFunction(FunctionIdentifier("vec_dot"),
      Seq(org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0, 2.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          Array(3.0, 4.0), org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType))))
    assert(vd.eval(null) == 11.0)
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
