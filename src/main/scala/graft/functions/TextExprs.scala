package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop Catalyst expressions for the per-document signature work.
  *
  * The higher-order-function formulations in [[TextFns]] are correct but
  * interpreted per element with InternalRow boxing per lambda call —
  * they made shingling/minhash/simhash the bench bottleneck. Each
  * expression here is one Scala loop per row, shared verbatim between
  * the interpreted path (`nullSafeEval`) and generated code: `doGenCode`
  * emits a single static call into the same kernel (the static
  * forwarders on this object), so the expression participates in
  * whole-stage codegen — no `CodegenFallback` stage split — while the
  * hot loop stays one JIT-compiled method instead of a giant janino
  * unit. Bit-for-bit parity of the two paths is pinned in TextExprsSpec
  * against the independent HOF formulations AND by forced
  * codegen-vs-interpreted projection in the same spec.
  * Hash functions reuse Spark's own Murmur3/XXH64 kernels with the same
  * seed as the built-in `hash()`/`xxhash64()`, so results are identical
  * to the HOF versions.
  */
object TextExprs {

  private def murmur3(s: UTF8String): Int =
    Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42)

  private def xxh64(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42)

  // ---------------------------------------------------------------------------
  // Kernels — one per expression, public so the static forwarder is callable
  // from generated code (`graft.functions.TextExprs.xxxKernel(...)`). Each is
  // the single implementation used by BOTH eval and codegen.
  // ---------------------------------------------------------------------------

  /** [[WordShingles]]: distinct space-joined word k-grams, insertion order. */
  def shinglesKernel(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = mutable.LinkedHashSet.empty[UTF8String]
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i <= n - k) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      seen += UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(seen.toArray[Any])
  }

  /** [[MinHashSig]]: murmur3 per shingle once, then the permutation family
    * inner loop. `params` is the (a,b) family flattened [a0,b0,a1,b1,…]. */
  def minhashKernel(shingles: ArrayData, params: Array[Long]): ArrayData = {
    val prime = TextFns.MinhashPrime
    val numPerms = params.length / 2
    val n = shingles.numElements()
    val mins = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h0 = murmur3(shingles.getUTF8String(i)).toLong
      val h = ((h0 % prime) + prime) % prime // pmod, as in the HOF version
      var p = 0
      while (p < numPerms) {
        val v = (params(2 * p) * h + params(2 * p + 1)) % prime
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** [[SimHash64]]: xxhash64 per token, 64 sign counters, packed sign bits. */
  def simhashKernel(toks: ArrayData): Long = {
    val n = toks.numElements()
    val counters = new Array[Long](64)
    var i = 0
    while (i < n) {
      val h = xxh64(toks.getUTF8String(i))
      var b = 0
      while (b < 64) {
        counters(b) += (if (((h >>> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** [[BpeTokenCount]]: greedy rank-ordered BPE merge application per
    * word, total token count per row. `merges` is the learned list
    * flattened [a0,b0,a1,b1,…]; each merge is the left-to-right
    * non-overlapping pass the trainer ([[graft.ops.TextOps.vocabBpe]])
    * applies, so encoding the training corpus reproduces the trainer's
    * final word states. One compiled loop per row — the nested
    * `aggregate` fold form this replaces paid an array copy per symbol
    * per merge (14.7 s vs 2.9 s end-to-end at sf0.1, train included). */
  def bpeTokenCountKernel(words: ArrayData, merges: Array[String]): Long = {
    val nm = merges.length / 2
    var total = 0L
    val nw = words.numElements()
    var wi = 0
    while (wi < nw) {
      val u = words.getUTF8String(wi)
      if (u != null && u.numBytes() > 0) {
        val w = u.toString
        // per-code-point symbols (split(w, "") parity on BMP text)
        var syms = new java.util.ArrayList[String](w.length)
        var ci = 0
        while (ci < w.length) {
          val n = Character.charCount(w.codePointAt(ci))
          syms.add(w.substring(ci, ci + n))
          ci += n
        }
        var mi = 0
        while (mi < nm && syms.size >= 2) {
          val a = merges(2 * mi)
          val b = merges(2 * mi + 1)
          val m = a + b
          val out = new java.util.ArrayList[String](syms.size)
          var i = 0
          while (i < syms.size) {
            if (i + 1 < syms.size && syms.get(i) == a && syms.get(i + 1) == b) {
              out.add(m); i += 2
            } else { out.add(syms.get(i)); i += 1 }
          }
          syms = out
          mi += 1
        }
        total += syms.size
      }
      wi += 1
    }
    total
  }

  /** [[WordShingleHashes]]: the [[shinglesKernel]] set with each shingle
    * collapsed to its 60-bit md5 prefix before it leaves the row. */
  def shingleHashesKernel(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val md = WinnowFps.digest.get()
    val sep = UTF8String.fromString(" ")
    val seen = mutable.LinkedHashSet.empty[Long]
    var i = 0
    while (i <= n - k) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      md.reset()
      seen += WinnowFps.hex15(md.digest(UTF8String.concatWs(sep, parts: _*).getBytes))
      i += 1
    }
    new GenericArrayData(seen.toArray[Any])
  }

  /** [[WinnowFps]]: positional k-gram md5-60 hashes, w-window minima,
    * distinct mins in first-seen order. */
  def winnowKernel(toks: ArrayData, k: Int, w: Int): ArrayData = {
    val n = toks.numElements()
    val nGrams = n - k + 1
    if (nGrams < w) return new GenericArrayData(Array.empty[Any])
    val md = WinnowFps.digest.get()
    val sep = UTF8String.fromString(" ")
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      md.reset()
      hashes(i) = WinnowFps.hex15(md.digest(UTF8String.concatWs(sep, parts: _*).getBytes))
      i += 1
    }
    val seen = mutable.LinkedHashSet.empty[Long]
    i = 0
    while (i <= nGrams - w) {
      var m = hashes(i)
      var j = 1
      while (j < w) { if (hashes(i + j) < m) m = hashes(i + j); j += 1 }
      seen += m
      i += 1
    }
    new GenericArrayData(seen.toArray[Any])
  }

  /** [[RepetitionStats]]: (top2_cnt, top2_len, dup3_chars) in one local
    * pass; ties on count go to the LONGER bigram. */
  def repStatsKernel(toks: ArrayData): InternalRow = {
    val n = toks.numElements()
    val sep = UTF8String.fromString(" ")
    def counts(k: Int): java.util.HashMap[UTF8String, Long] = {
      val m = new java.util.HashMap[UTF8String, Long]()
      var i = 0
      while (i <= n - k) {
        val parts = new Array[UTF8String](k)
        var j = 0
        while (j < k) { parts(j) = toks.getUTF8String(i + j); j += 1 }
        val g = UTF8String.concatWs(sep, parts: _*)
        m.merge(g, 1L, (a, b) => a + b)
        i += 1
      }
      m
    }
    var top2Cnt = 0L
    var top2Len = 0
    counts(2).forEach { (g, c) =>
      val len = g.numChars()
      if (c > top2Cnt || (c == top2Cnt && len > top2Len)) {
        top2Cnt = c; top2Len = len
      }
    }
    var dup3 = 0L
    counts(3).forEach { (g, c) => if (c >= 2) dup3 += c * g.numChars() }
    InternalRow(top2Cnt, top2Len, dup3)
  }

  /** [[ChunkRows]]: one row per overlapping chunk. Null-tolerant (null or
    * empty token array → empty) because the generator codegen path calls
    * `.iterator()` on the result unconditionally. */
  def chunkKernel(toks: ArrayData, chunkLen: Int, overlap: Int): IterableOnce[InternalRow] = {
    if (toks == null) return Iterator.empty
    val n = toks.numElements()
    if (n == 0) return Iterator.empty // unreachable via tokens(): split() never yields []
    val stride = chunkLen - overlap
    val md = WinnowFps.digest.get()
    val sep = UTF8String.fromString(" ")
    val numChunks = (n - 1) / stride + 1
    val out = new Array[InternalRow](numChunks)
    var ix = 0
    while (ix < numChunks) {
      val from = ix * stride
      val len = math.min(chunkLen, n - from)
      val parts = new Array[UTF8String](len)
      var j = 0
      while (j < len) { parts(j) = toks.getUTF8String(from + j); j += 1 }
      md.reset()
      val hex = UTF8String.fromString(
        org.apache.commons.codec.binary.Hex.encodeHexString(
          md.digest(UTF8String.concatWs(sep, parts: _*).getBytes)))
      out(ix) = InternalRow(ix, from + 1, len, hex)
      ix += 1
    }
    out
  }

  /** Distinct space-joined word k-grams — [[TextFns.shingles]] in one
    * pass with an insertion-ordered set. */
  case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "word_shingles"

    override def nullSafeEval(input: Any): Any =
      shinglesKernel(input.asInstanceOf[ArrayData], k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        c => s"${ev.value} = graft.functions.TextExprs.shinglesKernel($c, $k);")

    override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
  }

  /** MinHash signature — [[TextFns.minhashSignature]] in one pass:
    * murmur3 per shingle once, then the permutation family inner loop. */
  case class MinHashSig(child: Expression, numPerms: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sig"

    /** (a,b) permutation family flattened [a0,b0,a1,b1,…] — computed once
      * per expression instance, shipped into generated code as a
      * reference object. */
    @transient private lazy val flatParams: Array[Long] =
      (0 until numPerms).flatMap { p =>
        val (a, b) = TextFns.permParams(p); Seq(a, b)
      }.toArray

    override def nullSafeEval(input: Any): Any =
      minhashKernel(input.asInstanceOf[ArrayData], flatParams)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ps = ctx.addReferenceObj("minhashParams", flatParams, "long[]")
      nullSafeCodeGen(ctx, ev,
        c => s"${ev.value} = graft.functions.TextExprs.minhashKernel($c, $ps);")
    }

    override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  }

  /** 64-bit SimHash — [[TextFns.simhash64]] in one pass: xxhash64 per
    * token, 64 sign counters, packed sign bits. */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"

    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(simhashKernel(input.asInstanceOf[ArrayData]))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        c => s"${ev.value} = graft.functions.TextExprs.simhashKernel($c);")

    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  }

  /** Byte-gradient kernel for [[FrameDHash]] — TWO gradient scales
    * packed into one long (the multi-scale trick real dHash variants
    * use): bit j (j < 32) is the adjacent gradient byte[j] < byte[j+1];
    * bit 32+j (j < min(maxBits−32, 31)) is the skip-2 gradient
    * byte[j] < byte[j+2]. A 32-byte frame populates 61 bits (31
    * adjacent + 30 skip) instead of the 31 a single scale yields —
    * enough informative bits that 4×16-bit Hamming bands stay SPARSE
    * at corpus scale (the r9 soak measured the single-scale
    * alternative: 8-bit bands over 31 bits saturate every bucket past
    * ~25k frames at maxDf=100 and candidate recall collapses). Both
    * scales are order-relations, so the monotone-re-encode invariance
    * that defines the hash is untouched. */
  def frameDHashKernel(bytes: Array[Byte], maxBits: Int): Long = {
    var h = 0L
    val nAdj = math.min(bytes.length - 1, math.min(maxBits, 32))
    var j = 0
    while (j < nAdj) {
      if ((bytes(j) & 0xff) < (bytes(j + 1) & 0xff)) h |= (1L << j)
      j += 1
    }
    val nSkip = math.min(math.max(bytes.length - 2, 0), math.min(maxBits - 32, 31))
    j = 0
    while (j < nSkip) {
      if ((bytes(j) & 0xff) < (bytes(j + 2) & 0xff)) h |= (1L << (32 + j))
      j += 1
    }
    h
  }

  /** Perceptual hash of an opaque media frame, dHash-shaped: one sign
    * bit per adjacent-byte GRADIENT instead of a hash of the bytes
    * themselves. Invariant under any strictly order-preserving per-byte
    * transform — brightness offset, gain, quantizer shift — which is
    * exactly what defeats md5-exact frame matching
    * ([[graft.multimodal.Multimodal.mediaNearDupFrames]]): a re-encode
    * changes every byte but no gradient sign. Integer-exact (strict
    * unsigned compare, no floats), so the DuckDB oracle replays it via
    * `ord(substr(...))` over the ASCII stub payloads. A real image
    * pipeline computes the same shape over downsampled luma rows; this
    * expression is that kernel at the stub decoder's byte granularity.
    * ≤ `maxBits`+1 bytes contribute — 62 keeps the hash in a positive
    * long for frames up to 63 bytes (frameSize 32 uses 31 bits). */
  case class FrameDHash(child: Expression, maxBits: Int = 62) extends UnaryExpression {
    require(maxBits > 0 && maxBits <= 62, s"maxBits must be in (0,62], got $maxBits")
    override def dataType: DataType = LongType
    override def prettyName: String = "frame_dhash"

    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(
        frameDHashKernel(input.asInstanceOf[Array[Byte]], maxBits))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        c => s"${ev.value} = graft.functions.TextExprs.frameDHashKernel($c, $maxBits);")

    override protected def withNewChildInternal(c: Expression): FrameDHash = copy(child = c)
  }

  /** Distinct positional word k-grams as 60-bit md5 hashes — the
    * [[WordShingles]] set with each shingle collapsed to
    * `('0x'||substr(md5(g),1,15))::BIGINT` before it ever leaves the row.
    * The jaccard inverted index shuffles these 8-byte keys instead of
    * ~25-byte shingle strings (df aggregation, index join, posting
    * lists); the md5 prefix is portable, so the DuckDB oracle applies the
    * SAME hash and any collision (≈n²/2⁶¹ — none at realistic per-doc
    * vocabulary) affects both engines identically. */
  case class WordShingleHashes(child: Expression, k: Int) extends UnaryExpression {
    require(k > 0, s"shingle size must be positive, got $k")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "word_shingle_hashes"

    override def nullSafeEval(input: Any): Any =
      shingleHashesKernel(input.asInstanceOf[ArrayData], k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        c => s"${ev.value} = graft.functions.TextExprs.shingleHashesKernel($c, $k);")

    override protected def withNewChildInternal(c: Expression): WordShingleHashes =
      copy(child = c)
  }

  /** Winnowing fingerprints (Schleimer et al. 2003) in one pass: hash
    * every POSITIONAL k-gram (no dedup — winnowing is positional), slide
    * a `w`-window, keep each window's min, emit the distinct mins.
    * Hash = first 60 bits (15 hex chars) of md5 — chosen precisely so
    * the DuckDB oracle can write `('0x'||substr(md5(g),1,15))::BIGINT`
    * and match bit-for-bit. The interpreted HOF formulation of the same
    * math (conv(substring(md5…)) under two nested `transform`s) was 10×
    * slower than this loop at sf0.1. */
  case class WinnowFps(child: Expression, k: Int, w: Int) extends UnaryExpression {
    require(k > 0 && w > 0, s"gram size and window must be positive, got k=$k w=$w")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "winnow_fps"

    override def nullSafeEval(input: Any): Any =
      winnowKernel(input.asInstanceOf[ArrayData], k, w)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        c => s"${ev.value} = graft.functions.TextExprs.winnowKernel($c, $k, $w);")

    override protected def withNewChildInternal(c: Expression): WinnowFps = copy(child = c)
  }

  /** Per-document repetition statistics in ONE local pass — the signals
    * of [[graft.ops.TextOps.docRepetition]] without shuffling a single
    * gram: every 2-/3-gram of a document lives in its own row, so the
    * (doc, gram) count map is a per-eval local HashMap, not a corpus
    * aggregation. Returns struct(top2_cnt, top2_len, dup3_chars):
    *  - (top2_cnt, top2_len): count and char length of the most-repeated
    *    bigram, ties to the LONGER gram — exactly the compositional
    *    form's `max(cnt·2²⁴ + len)` encoding, decoded;
    *  - dup3_chars: Σ cnt·len over trigrams with cnt ≥ 2.
    * Gram keys are real UTF8String concatenations (no hashing), so the
    * counts are exact and the DuckDB oracle still matches bit-for-bit. */
  case class RepetitionStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("top2_cnt", LongType, nullable = false),
      StructField("top2_len", IntegerType, nullable = false),
      StructField("dup3_chars", LongType, nullable = false)))
    override def prettyName: String = "repetition_stats"

    override def nullSafeEval(input: Any): Any =
      repStatsKernel(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        c => s"${ev.value} = graft.functions.TextExprs.repStatsKernel($c);")

    override protected def withNewChildInternal(c: Expression): RepetitionStats =
      copy(child = c)
  }

  /** Row-to-many-rows chunker — the table-function (UDTF) extension
    * point: a custom Catalyst [[Generator]] that the analyzer's
    * ExtractGenerator rule rewrites into a `Generate` node, exactly like
    * the built-in `explode`. One pass over the token array emits one row
    * per overlapping chunk: `(chunk_ix, start_tok, n_chunk_tokens,
    * chunk_md5)` — bit-identical to the compositional
    * [[graft.ops.TextOps.docChunks]] (sequence+explode+slice+md5), which
    * stays as the cross-check. The generator form avoids materializing
    * the token array once per chunk row before slicing: the array is
    * read once and each chunk's md5 is computed in place.
    * Codegen: GenerateExec's `codeGenIterableOnce` path expects this
    * expression's generated value to be a non-null
    * `scala.collection.IterableOnce<InternalRow>` it can `.iterator()`
    * over — so `doGenCode` emits one null-tolerant static kernel call
    * and the whole Generate stage fuses into whole-stage codegen.
    * Scale shape: row-local, zero shuffle, output ∝ Σ tokens/stride. */
  case class ChunkRows(child: Expression, chunkLen: Int, overlap: Int)
      extends UnaryExpression with Generator {
    require(chunkLen >= 1 && overlap >= 0 && overlap < chunkLen,
      s"need 0 <= overlap($overlap) < chunkLen($chunkLen)")

    override def elementSchema: StructType = StructType(Seq(
      StructField("chunk_ix", IntegerType, nullable = false),
      StructField("start_tok", IntegerType, nullable = false),
      StructField("n_chunk_tokens", IntegerType, nullable = false),
      StructField("chunk_md5", StringType, nullable = false)))
    override def prettyName: String = "chunk_rows"

    override def eval(input: InternalRow): IterableOnce[InternalRow] =
      chunkKernel(child.eval(input).asInstanceOf[ArrayData], chunkLen, overlap)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val childGen = child.genCode(ctx)
      val rows = ctx.freshName("chunkRows")
      val code =
        code"""
              |${childGen.code}
              |scala.collection.IterableOnce<InternalRow> $rows =
              |  graft.functions.TextExprs.chunkKernel(
              |    ${childGen.isNull} ? null : ${childGen.value}, $chunkLen, $overlap);
              |""".stripMargin
      ExprCode(code, FalseLiteral,
        JavaCode.variable(rows, classOf[IterableOnce[_]]))
    }

    override protected def withNewChildInternal(c: Expression): ChunkRows = copy(child = c)
  }

  /** Per-row BPE token count under a learned merge list (the ENCODE half
    * of the tokenizer; see [[bpeTokenCountKernel]]). The merge list is a
    * KB-sized plan constant (Seq for structural equality; flattened to an
    * array once, shipped into generated code as a reference object). */
  case class BpeTokenCount(child: Expression, merges: Seq[String])
      extends UnaryExpression {
    require(merges.length % 2 == 0, "merges must be (left,right) pairs flattened")
    override def dataType: DataType = LongType
    override def prettyName: String = "bpe_token_count"

    @transient private lazy val flat: Array[String] = merges.toArray

    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(
        bpeTokenCountKernel(input.asInstanceOf[ArrayData], flat))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ps = ctx.addReferenceObj("bpeMerges", flat, "java.lang.String[]")
      nullSafeCodeGen(ctx, ev,
        c => s"${ev.value} = graft.functions.TextExprs.bpeTokenCountKernel($c, $ps);")
    }

    override protected def withNewChildInternal(c: Expression): BpeTokenCount =
      copy(child = c)
  }

  object WinnowFps {
    /** MessageDigest is stateful and NOT thread-safe; expression trees
      * can be shared across local-mode task threads. */
    private[functions] val digest: ThreadLocal[java.security.MessageDigest] =
      ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

    /** First 15 hex chars (60 bits) of a digest as a long — the exact
      * value of DuckDB `('0x'||substr(md5(x),1,15))::BIGINT`. */
    private[functions] def hex15(dig: Array[Byte]): Long = {
      var v = 0L
      var nib = 0
      while (nib < 15) {
        val b = dig(nib >> 1) & 0xff
        v = (v << 4) | (if ((nib & 1) == 0) b >>> 4 else b & 0xf)
        nib += 1
      }
      v
    }
  }

  /** name → expression builder: the SINGLE registration source, used by
    * [[register]] (session temp registry) and by
    * `GraftSparkExtensions.injectFunction` (the `spark.sql.extensions`
    * path, so a pure-SQL user gets every graft function without calling
    * into the Scala API). Int parameters travel as literal arguments. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "word_shingles" ->
      (exprs => WordShingles(exprs(0), exprs(1).eval().asInstanceOf[Int])),
    "minhash_sig" ->
      (exprs => MinHashSig(exprs(0), exprs(1).eval().asInstanceOf[Int])),
    "simhash64" -> (exprs => SimHash64(exprs(0))),
    "winnow_fps" ->
      (exprs => WinnowFps(exprs(0), exprs(1).eval().asInstanceOf[Int],
        exprs(2).eval().asInstanceOf[Int])),
    "word_shingle_hashes" ->
      (exprs => WordShingleHashes(exprs(0), exprs(1).eval().asInstanceOf[Int])),
    "chunk_rows" ->
      (exprs => ChunkRows(exprs(0), exprs(1).eval().asInstanceOf[Int],
        exprs(2).eval().asInstanceOf[Int])),
    "repetition_stats" -> (exprs => RepetitionStats(exprs(0))),
    "frame_dhash" ->
      (exprs => FrameDHash(exprs(0), exprs(1).eval().asInstanceOf[Int])),
    "bpe_token_count" -> (exprs => BpeTokenCount(exprs(0), {
      val ad = exprs(1).eval().asInstanceOf[ArrayData]
      (0 until ad.numElements()).map(i => ad.getUTF8String(i).toString)
    })),
    VecDot.FnName -> (exprs => VecDot(exprs(0), exprs(1))),
    VecRank.FnName -> VecRank.builder,
    VecRank.LshFnName -> VecRank.lshBuilder)

  /** Idempotent registration of all graft expressions (incl. [[VecDot]])
    * on a session's temp function registry — skipped when present (no
    * replace-warning spam from per-query installs). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }

  import org.apache.spark.sql.functions.lit
  def wordShingles(toks: Column, k: Int): Column =
    call_function("word_shingles", toks, lit(k))
  def minhashSig(shingles: Column, numPerms: Int): Column =
    call_function("minhash_sig", shingles, lit(numPerms))
  def simhash64(toks: Column): Column =
    call_function("simhash64", toks)
  def winnowFps(toks: Column, k: Int, w: Int): Column =
    call_function("winnow_fps", toks, lit(k), lit(w))
  def wordShingleHashes(toks: Column, k: Int): Column =
    call_function("word_shingle_hashes", toks, lit(k))
  def chunkRows(toks: Column, chunkLen: Int, overlap: Int): Column =
    call_function("chunk_rows", toks, lit(chunkLen), lit(overlap))
  def repetitionStats(toks: Column): Column =
    call_function("repetition_stats", toks)
  def frameDHash(frame: Column, maxBits: Int = 62): Column =
    call_function("frame_dhash", frame, lit(maxBits))
  def bpeTokenCount(words: Column, merges: Seq[(String, String)]): Column =
    call_function("bpe_token_count", words,
      org.apache.spark.sql.functions.typedLit(
        merges.flatMap(m => Seq(m._1, m._2))))
}
