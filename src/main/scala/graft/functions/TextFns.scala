package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the training-data-pipeline surface
  * (SURVEY.md §2.7 extended plan): tokenization, quality ratios,
  * stopword-profile language ID, fingerprints, shingles, MinHash and
  * SimHash signatures. Everything is built from codegen'd built-ins and
  * higher-order array functions — zero UDFs, so the whole hot path stays
  * inside whole-stage codegen.
  */
object TextFns {

  /** Whitespace-collapsed, lowercased canonical form. */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** MD5 content fingerprint of the canonical form — the exact-dedup key. */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Whitespace tokens of the canonical form. */
  def tokens(text: Column): Column = split(normalize(text), " ")

  /** BPE-ish subunit count: letter runs, digit runs, and single
    * punctuation marks each count as one token — a cheap, deterministic
    * proxy for an LLM tokenizer's token count. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(normalize(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  val StopwordsEn: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "for", "on", "with")
  val StopwordsEs: Seq[String] =
    Seq("el", "la", "los", "las", "de", "y", "en", "es", "un", "una", "que", "por")
  val StopwordsDe: Seq[String] =
    Seq("der", "die", "das", "und", "in", "ist", "ein", "eine", "zu", "mit", "von", "den")
  val StopwordsFr: Seq[String] =
    Seq("le", "la", "les", "de", "et", "en", "est", "un", "une", "que", "pour", "dans")

  /** #tokens ∈ `words` (array-contains over a broadcast-literal list). */
  def hitCount(toks: Column, words: Seq[String]): Column = {
    val wordArr = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(wordArr, t)))
  }

  /** Stopword-profile language guess over {en,es,de,fr}: argmax of hit
    * counts with a fixed preference order on ties, 'und' when no hits.
    * A deterministic n-gram-free heuristic — the point is the Spark
    * plumbing (oracle-expressible in plain SQL), not linguistic quality. */
  def langIdExprs(toks: Column): Seq[(String, Column)] = Seq(
    "en" -> hitCount(toks, StopwordsEn),
    "es" -> hitCount(toks, StopwordsEs),
    "de" -> hitCount(toks, StopwordsDe),
    "fr" -> hitCount(toks, StopwordsFr))

  def langId(toks: Column): Column = {
    val hits = langIdExprs(toks)
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.foldRight(lit("und")) { case ((name, h), rest) =>
      when(h > 0 && h === best, lit(name)).otherwise(rest)
    }
  }

  /** Distinct word k-gram shingles: `array_distinct(transform(...))`.
    * Guarded for < k tokens — Spark's `sequence(1, 0)` would DESCEND,
    * not return empty. */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      array_distinct(transform(
        sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k))))))
      .otherwise(array().cast("array<string>"))

  // ---- MinHash ----------------------------------------------------------

  /** Mersenne prime 2^31-1: products a*h stay < 2^62, so the modular
    * permutation math never overflows a long under ANSI mode. */
  val MinhashPrime: Long = (1L << 31) - 1

  /** Deterministic (a,b) permutation parameters via splitmix64-style
    * mixing of the permutation index — no RNG state, reproducible across
    * runs/partitions/engines. */
  def permParams(i: Int): (Long, Long) = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      z
    }
    val a = (mix(i.toLong * 2) & Long.MaxValue) % (MinhashPrime - 1) + 1
    val b = (mix(i.toLong * 2 + 1) & Long.MaxValue) % MinhashPrime
    (a, b)
  }

  /** MinHash signature (array<long>, length `numPerms`) over a shingle
    * array: sig[i] = min over shingles of (a_i * murmur3(s) + b_i) mod p.
    * Pure higher-order expressions — per-row sequential array math, no
    * shuffle, no UDF. */
  def minhashSignature(shingleCol: Column, numPerms: Int): Column = {
    val hashes = transform(shingleCol, s => pmod(hash(s).cast("long"), lit(MinhashPrime)))
    val perms = (0 until numPerms).map { i =>
      val (a, b) = permParams(i)
      array_min(transform(hashes, h =>
        pmod(h * lit(a) + lit(b), lit(MinhashPrime))))
    }
    array(perms: _*)
  }

  /** LSH band keys: signature split into `bands` contiguous bands hashed
    * to one long each; docs sharing any band key become candidates. */
  def minhashBands(sig: Column, bands: Int, numPerms: Int): Column = {
    val rowsPerBand = numPerms / bands
    array((0 until bands).map { b =>
      hash(lit(b), slice(sig, b * rowsPerBand + 1, rowsPerBand)).cast("long")
    }: _*)
  }

  /** Estimated jaccard from two signatures: fraction of agreeing mins. */
  def minhashEstimate(sigA: Column, sigB: Column): Column =
    aggregate(
      zip_with(sigA, sigB, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / size(sigA)

  // ---- SimHash ----------------------------------------------------------

  /** 64-bit SimHash over the token multiset: bit i of the result is the
    * sign of Σ_tokens (±1 depending on bit i of xxhash64(token)).
    * Computed as one `aggregate` over a 64-wide counter array — stays
    * row-local. */
  def simhash64(toks: Column): Column = {
    val bitIdx = sequence(lit(0), lit(63))
    val counters = aggregate(
      toks,
      transform(bitIdx, _ => lit(0L)),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, bitIdx, (a, i) =>
          a + when(call_function("shiftright", h, i.cast("int")).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      })
    // pack sign bits into one long
    aggregate(
      zip_with(counters, bitIdx, (c, i) =>
        when(c > 0, call_function("shiftleft", lit(1L), i.cast("int"))).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** Hamming distance between two packed 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Band keys for SimHash blocking: `bands` equal bit-slices of the
    * signature; a pair within hamming radius < bands must share a band. */
  def simhashBands(sig: Column, bands: Int): Column = {
    val width = 64 / bands
    array((0 until bands).map { b =>
      hash(lit(b), shiftright(sig, b * width).bitwiseAND((1L << width) - 1)).cast("long")
    }: _*)
  }
}
