package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextOps
import TestSpark._

/** Corpus-lifecycle operators: snapshot diff, PII redaction, BPE
  * tokenizer training. The BPE check is an independent single-threaded
  * replay of the algorithm (Sennrich et al. 2016) over collected word
  * counts — a second implementation route, so a bug in the distributed
  * fold/argmax can't self-confirm. */
class CorpusOpsSpec extends AnyFunSuite {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  // ---- corpusDiff -------------------------------------------------------

  test("corpusDiff classifies added/removed/changed/unchanged with char sums") {
    val v1 = docs(1L -> "alpha", 2L -> "beta", 3L -> "gamma")
    val v2 = docs(2L -> "beta", 3L -> "gamma EDITED", 4L -> "delta!")
    val got = TextOps.corpusDiff(v1, v2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(
      ("added", 1L, 6L),      // delta!
      ("changed", 1L, 12L),   // gamma EDITED (new version's chars)
      ("removed", 1L, 5L),    // alpha
      ("unchanged", 1L, 4L))) // beta
  }

  // ---- docPii -----------------------------------------------------------

  test("docPii counts planted PII and redacts it from the fingerprint") {
    val d = docs(
      1L -> "contact me at jane.doe+spam@example.org or bob@sub.example.co",
      2L -> "call +1-555-123-4567 tomorrow",
      3L -> "server at 10.0.255.7 paid with 4111 1111 1111 1111 ok",
      4L -> "nothing sensitive here")
    val got = TextOps.docPii(d).orderBy("doc_id").collect()
    assert(got(0).getAs[Int]("n_emails") === 2)
    assert(got(1).getAs[Int]("n_phones") === 1)
    assert(got(2).getAs[Int]("n_ips") === 1)
    assert(got(2).getAs[Int]("n_cards") === 1)
    assert(got(3).getAs[Int]("n_emails") === 0)

    // redaction removes the match: fingerprint equals md5 of the
    // expected redacted literal, and differs from the original's
    val expect3 = spark.range(1)
      .select(md5(lit("server at <IP> paid with <CARD> ok"))).head().getString(0)
    assert(got(2).getAs[String]("redacted_md5") === expect3)
    val orig3 = spark.range(1)
      .select(md5(lit("server at 10.0.255.7 paid with 4111 1111 1111 1111 ok")))
      .head().getString(0)
    assert(got(2).getAs[String]("redacted_md5") !== orig3)
    // clean doc: redacted fingerprint == original fingerprint
    val clean = spark.range(1)
      .select(md5(lit("nothing sensitive here"))).head().getString(0)
    assert(got(3).getAs[String]("redacted_md5") === clean)
  }

  // ---- vocabBpe ---------------------------------------------------------

  /** Reference replay: greedy BPE over a word-count map, merging left to
    * right, ties broken by (count desc, pair lexicographic). */
  private def replayBpe(wordCounts: Map[String, Long], n: Int): Seq[(String, String, Long)] = {
    def mergeLR(s: List[String], a: String, b: String, m: String): List[String] = {
      val buf = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { buf += m; i += 2 }
        else { buf += s(i); i += 1 }
      }
      buf.toList
    }
    var words: Map[List[String], Long] =
      wordCounts.map { case (w, c) => w.split("").filter(_.nonEmpty).toList -> c }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var round = 0
    var done = false
    while (round < n && !done) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- words; win <- syms.sliding(2) if win.size == 2)
        pairCounts((win(0), win(1))) = pairCounts.getOrElse((win(0), win(1)), 0L) + c
      if (pairCounts.isEmpty) done = true
      else {
        val ((a, b), cnt) = pairCounts.toSeq
          .sortBy { case ((x, y), k) => (-k, x, y) }.head
        out += ((a, b, cnt))
        words = words.map { case (syms, c) => mergeLR(syms, a, b, a + b) -> c }
        round += 1
      }
    }
    out.toSeq
  }

  test("distributed BPE equals the single-threaded greedy replay") {
    val corpus = docs(
      1L -> "low low low low low lower lower newest newest newest",
      2L -> "newest newest newest widest widest widest low lower",
      3L -> "the the the newest widest low")
    val wordCounts = corpus.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    val expected = replayBpe(wordCounts, 8)
    val got = TextOps.vocabBpe(corpus, 8)
      .map(m => (m.left, m.right, m.pair_count))
    assert(got === expected)
    // sanity on the classic example: 'e'+'s' or similar high-frequency
    // pair families appear among the merges
    assert(got.nonEmpty && got.head._3 >= got.last._3)
  }

  test("batched BPE rounds equal the strictly-sequential protocol on real data") {
    // batchK = 1 IS the per-merge protocol (one argmax, one accept);
    // the default batches a provably-safe prefix per round. The merge
    // SEQUENCES must be identical — same pairs, same order, same counts
    // — on the real corpus, where created-pair bounds and overlap stops
    // actually fire (the adversarial shapes live in replayBpe above).
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
    val sequential = TextOps.vocabBpe(corpus, 30, batchK = 1)
    val batched = TextOps.vocabBpe(corpus, 30)
    assert(batched.map(m => (m.rank, m.left, m.right, m.pair_count)) ===
      sequential.map(m => (m.rank, m.left, m.right, m.pair_count)))
    // the ADAPTIVE cap (rounds grow past 16 after conflict-free
    // acceptance) moves cost only — the learned sequence is identical
    val adaptive = TextOps.vocabBpe(corpus, 30, batchK = 256)
    assert(adaptive.map(m => (m.rank, m.left, m.right, m.pair_count)) ===
      sequential.map(m => (m.rank, m.left, m.right, m.pair_count)))
  }

  test("BPE batch acceptance stops on created-symbol collisions (both directions)") {
    // (a) candidate CONTAINS an accepted output: ('t','h') accepted,
    // ('th','e') later in the same top-K. Its pre-batch count is stale
    // (the accepted merge boosts it), so the scan must stop there even
    // though its SOURCE symbols are disjoint from {t,h}.
    val topA = Seq(("t", "h", 100L), ("x", "y", 90L), ("th", "e", 80L))
    assert(TextOps.bpeAcceptedPrefix(topA, batchK = 16, maxLen = 16) ===
      Seq(("t", "h", 100L), ("x", "y", 90L)))

    // (b) accepted INPUT equals a later candidate's output:
    // rule1=('xy','z') accepted, rule2=('x','y') later. The single
    // combined fold would fire rule1 on the 'xy' symbol rule2 creates
    // within the same pass; sequential greedy would not.
    val topB = Seq(("xy", "z", 100L), ("x", "y", 90L), ("p", "q", 70L))
    assert(TextOps.bpeAcceptedPrefix(topB, batchK = 16, maxLen = 16) ===
      Seq(("xy", "z", 100L)))

    // control: fully disjoint candidates with strict dominance over the
    // created-pair bound are all accepted
    val topC = Seq(("a", "b", 100L), ("c", "d", 90L), ("e", "f", 80L))
    assert(TextOps.bpeAcceptedPrefix(topC, batchK = 16, maxLen = 16) === topC)
    // maxLen caps the prefix
    assert(TextOps.bpeAcceptedPrefix(topC, batchK = 16, maxLen = 2) ===
      topC.take(2))
  }

  test("BPE merges shrink the corpus symbol count monotonically") {
    val corpus = docs(1L -> "aaab aaab aaab bbba bbba cab")
    val merges = TextOps.vocabBpe(corpus, 5)
    assert(merges.size === 5)
    // each recorded merge must have a positive corpus count, and counts
    // are the count AT MERGE TIME (so not necessarily monotone in rank;
    // just positive and bounded by total adjacent positions)
    merges.foreach(m => assert(m.pair_count > 0))
    // merged symbol concatenates its parts
    merges.foreach(m => assert(m.merged === m.left + m.right))
  }

  test("BPE stops early when no pairs remain") {
    val corpus = docs(1L -> "a b c d")
    val merges = TextOps.vocabBpe(corpus, 10)
    assert(merges.isEmpty) // all words are single symbols
  }

  // ---- bpeEncode --------------------------------------------------------

  test("BPE encode matches an independent greedy replay, incl. same-symbol runs") {
    // "aaaa"/"aaa" exercise the case where a naive string-replace encode
    // diverges from the greedy fold (run of a merged symbol): greedy
    // [a,a,a,a] -> [aa,aa], [a,a,a] -> [aa,a]
    val corpus = docs(
      1L -> "low low low lower lowest newest newest",
      2L -> "newest widest low lower aaa aaaa")
    val merges = TextOps.vocabBpe(corpus, 6)
    assert(merges.nonEmpty)
    def mergeLR(s: List[String], a: String, b: String, m: String): List[String] = {
      val buf = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { buf += m; i += 2 }
        else { buf += s(i); i += 1 }
      }
      buf.toList
    }
    def encodeWord(w: String): Int =
      merges.foldLeft(w.split("").filter(_.nonEmpty).toList) { (syms, mg) =>
        mergeLR(syms, mg.left, mg.right, mg.merged)
      }.length
    val texts = corpus.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextOps.bpeEncodeWith(corpus, merges).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    texts.foreach { case (id, text) =>
      val words = text.split(" ").filter(_.nonEmpty)
      val nChars = words.map(_.length.toLong).sum
      val nToks = words.map(encodeWord).map(_.toLong).sum
      assert(got(id)._1 == words.length, s"doc $id n_words")
      assert(got(id)._2 == nChars, s"doc $id n_chars")
      assert(got(id)._3 == nToks, s"doc $id n_bpe_tokens: got ${got(id)._3}, want $nToks")
      assert(got(id)._4 ==
        BigDecimal(nChars.toDouble / nToks).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble, s"doc $id chars_per_token")
    }
    // merges strictly compress: fewer tokens than characters
    got.values.foreach(v => assert(v._3 < v._2))
  }

  test("BPE encode with zero merges is character tokenization") {
    val corpus = docs(1L -> "ab cde f")
    val row = TextOps.bpeEncodeWith(corpus, Seq.empty).head()
    assert(row.getInt(1) == 3 && row.getLong(2) == 6L && row.getLong(3) == 6L)
  }
}
