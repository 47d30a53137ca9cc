package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextOps
import TestSpark._

/** Property harness for the span-dedup family: on random small-alphabet
  * corpora (dense natural window collisions, whitespace to exercise the
  * normalizer, lengths straddling the width cutoff), the distributed
  * operators must equal a brute-force driver replay of their declared
  * semantics — windows at stride offsets, cross-doc dup keys,
  * gaps-and-islands merge, canonical-keeps excision with segment
  * stitching. Raw ScalaCheck generators with fixed seeds (the
  * scalatest-scalacheck bridge isn't in the offline cache).
  */
class DupSpanPropertySpec extends AnyFunSuite {

  private val W = 6
  private val S = 2

  /** Random corpus: 2-8 docs, length 0-40, alphabet {a,b,space} with
    * runs — collisions and normalization collapses arise naturally. */
  private val corpusGen: Gen[List[(Long, String)]] =
    Gen.chooseNum(2, 8).flatMap { n =>
      Gen.sequence[List[(Long, String)], (Long, String)](
        (1 to n).map { id =>
          for {
            len <- Gen.chooseNum(0, 40)
            cs <- Gen.listOfN(len, Gen.frequency(
              (5, Gen.const('a')), (4, Gen.const('b')), (2, Gen.const(' '))))
          } yield (id.toLong, cs.mkString)
        }.toList)
    }

  private def corpora(count: Int): Seq[List[(Long, String)]] =
    (1 to count).flatMap { i =>
      corpusGen(Gen.Parameters.default, Seed(i.toLong * 7919)).toList
    }

  private def norm(t: String): String =
    t.replaceAll("\\s+", " ").trim.toLowerCase

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** (doc -> sorted dup-window starts, doc -> normalized text) under the
    * operator's exact window/dup semantics. */
  private def dupOcc(docs: List[(Long, String)],
      excise: Boolean): (Map[Long, Seq[Int]], Map[Long, String]) = {
    val ns = docs.map { case (id, t) => id -> norm(t) }.toMap
    val eligible = ns.filter(_._2.length >= W)
    val wins = eligible.toSeq.flatMap { case (id, n) =>
      (1 to (n.length - W + 1) by S).map(s => (id, s, n.substring(s - 1, s - 1 + W)))
    }
    val byKey = wins.groupBy(_._3)
    val occ = eligible.keys.map { id =>
      id -> wins.filter { case (wid, _, key) =>
        val g = byKey(key)
        val docsWithKey = g.map(_._1).distinct
        wid == id && docsWithKey.size >= 2 &&
          (!excise || id != docsWithKey.min)
      }.map(_._2).sorted
    }.toMap
    (occ, eligible)
  }

  /** Gaps-and-islands merge → (n_spans, covered_chars, spans). */
  private def islands(starts: Seq[Int]): (Long, Long, Seq[(Int, Int)]) = {
    var cnt = 0L; var chars = 0L; var curEnd = -1
    val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    starts.foreach { s =>
      if (s > curEnd) { cnt += 1; chars += W; spans += ((s, s + W)) }
      else {
        chars += s + W - curEnd
        val (ls, _) = spans.remove(spans.length - 1); spans += ((ls, s + W))
      }
      curEnd = s + W
    }
    (cnt, chars, spans.toSeq)
  }

  private def md5(x: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("docDupSpans equals the brute-force replay on random corpora") {
    val s = spark
    import s.implicits._
    corpora(12).zipWithIndex.foreach { case (docs, ci) =>
      val df = docs.toDF("doc_id", "text")
      val got = TextOps.docDupSpans(df, width = W, stride = S).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toMap
      val (occ, ns) = dupOcc(docs, excise = false)
      val want = occ.map { case (id, starts) =>
        val (cnt, chars, _) = islands(starts)
        id -> (cnt, chars, round6(chars.toDouble / ns(id).length))
      }
      assert(got == want, s"corpus $ci: got $got want $want docs=$docs")
    }
  }

  test("docDupExcise equals the brute-force stitch replay on random corpora") {
    val s = spark
    import s.implicits._
    corpora(12).zipWithIndex.foreach { case (docs, ci) =>
      val df = docs.toDF("doc_id", "text")
      val got = TextOps.docDupExcise(df, width = W, stride = S).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
        .toMap
      val (occ, ns) = dupOcc(docs, excise = true)
      val want = occ.map { case (id, starts) =>
        val n = ns(id)
        val (cnt, chars, spans) = islands(starts)
        val kept = if (spans.isEmpty) n
          else {
            val sb = new StringBuilder
            var pos = 1
            spans.foreach { case (st, en) =>
              sb.append(n.substring(pos - 1, st - 1)); pos = en
            }
            sb.append(n.substring(pos - 1)); sb.toString
          }
        id -> (cnt, chars, (n.length - chars), md5(kept))
      }
      assert(got == want, s"corpus $ci: got $got want $want docs=$docs")
      // cross-family invariant: excision can never remove more than the
      // symmetric span operator marks
      val marked = TextOps.docDupSpans(df, width = W, stride = S).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      got.foreach { case (id, (_, removed, _, _)) =>
        assert(removed <= marked(id), s"corpus $ci doc $id: removed $removed > marked ${marked(id)}")
      }
    }
  }
}
