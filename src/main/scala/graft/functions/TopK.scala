package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact bounded top-k as a typed `Aggregator` (SURVEY.md §2.10: the
  * custom-aggregate surface, `Aggregator[IN, BUF, OUT]` +
  * `functions.udaf`).
  *
  * The buffer is a size-≤k list kept sorted by `better`; `reduce` drops
  * a new row in O(1) when it can't place (the common case once the
  * buffer saturates), `merge` folds partition buffers. Because it is an
  * Aggregator, Spark runs it with MAP-SIDE PARTIAL AGGREGATION: each
  * task ships at most k rows per group key into the shuffle, so grouped
  * top-k at 100 TB moves O(tasks × groups × k) rows — unlike the
  * `row_number()` window formulation, which shuffles and SORTS every
  * input row per key before discarding all but k.
  */
class TopK[T](k: Int, better: (T, T) => Boolean)(
    implicit bufEnc: Encoder[Seq[T]])
    extends Aggregator[T, Seq[T], Seq[T]] {
  require(k > 0)

  override def zero: Seq[T] = Vector.empty

  private def insert(buf: Seq[T], e: T): Seq[T] =
    if (buf.size >= k && better(buf.last, e)) buf // can't place: O(1) reject
    else {
      val (hd, tl) = buf.span(b => better(b, e))
      ((hd :+ e) ++ tl).take(k)
    }

  override def reduce(buf: Seq[T], e: T): Seq[T] = insert(buf, e)
  override def merge(a: Seq[T], b: Seq[T]): Seq[T] = b.foldLeft(a)(insert)
  override def finish(buf: Seq[T]): Seq[T] = buf
  override def bufferEncoder: Encoder[Seq[T]] = bufEnc
  override def outputEncoder: Encoder[Seq[T]] = bufEnc
}

/** [[TopK]] that only admits rows passing `keep` — the aggregation-level
  * form of a branch filter, for plans that fold a filtered top-k into a
  * WIDER aggregation over the same exchange (a plain `.filter` before
  * the groupBy would constrain every sibling aggregate too). */
class TopKWhere[T](k: Int, keep: T => Boolean, better: (T, T) => Boolean)(
    implicit bufEnc: Encoder[Seq[T]])
    extends TopK[T](k, better) {
  override def reduce(buf: Seq[T], e: T): Seq[T] =
    if (keep(e)) super.reduce(buf, e) else buf
}

object TopK {
  /** One event row as the aggregator's typed input — field names double
    * as the UDAF's column-argument order. */
  final case class EventRow(event_id: Long, user_id: Long, value: Double)

  /** (value desc, event_id asc) — the events_topk ordering. */
  val byValueDesc: (EventRow, EventRow) => Boolean = (a, b) =>
    a.value > b.value || (a.value == b.value && a.event_id < b.event_id)

  implicit val eventRowEnc: Encoder[EventRow] = Encoders.product[EventRow]
  implicit val eventRowSeqEnc: Encoder[Seq[EventRow]] = ExpressionEncoder[Seq[EventRow]]()

  def eventsTopK(k: Int): TopK[EventRow] = new TopK[EventRow](k, byValueDesc)

  /** A (hash-key, id) pair for deterministic per-group sampling: keep
    * the k smallest hash keys — a uniform, reproducible sample. */
  final case class SampleRow(hk: String, doc_id: Long)

  /** (hk asc, doc_id asc) — hash order, id as the (never-hit for
    * distinct ids under md5) tiebreak. */
  val byHashAsc: (SampleRow, SampleRow) => Boolean = (a, b) =>
    a.hk < b.hk || (a.hk == b.hk && a.doc_id < b.doc_id)

  implicit val sampleRowEnc: Encoder[SampleRow] = Encoders.product[SampleRow]
  implicit val sampleRowSeqEnc: Encoder[Seq[SampleRow]] = ExpressionEncoder[Seq[SampleRow]]()

  def hashSampleK(k: Int): TopK[SampleRow] = new TopK[SampleRow](k, byHashAsc)

  /** A scored candidate for the contrastive-triplet negative pick:
    * `keep` carries the hard-negative band predicate so the top-k can
    * ride the SAME aggregation as the positive argmax (one exchange,
    * one scoring pass), ignoring out-of-band rows. */
  final case class NegRow(keep: Boolean, cos: Double, cand_id: Long)

  /** (cos desc, cand_id asc) — exactly the window order the neg branch
    * ranked with, so list position + 1 ≡ row_number. */
  val byCosDesc: (NegRow, NegRow) => Boolean = (a, b) =>
    a.cos > b.cos || (a.cos == b.cos && a.cand_id < b.cand_id)

  implicit val negRowEnc: Encoder[NegRow] = Encoders.product[NegRow]
  implicit val negRowSeqEnc: Encoder[Seq[NegRow]] = ExpressionEncoder[Seq[NegRow]]()

  def negBandTopK(k: Int): TopKWhere[NegRow] =
    new TopKWhere[NegRow](k, _.keep, byCosDesc)
}
