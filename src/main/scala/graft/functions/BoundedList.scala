package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Capped list accumulation as a typed `Aggregator` — the bounded-buffer
  * replacement for `collect_list` when a group's list is only USEFUL
  * below some size (inverted-index posting lists under a stop-key df
  * cap: a key with more than `maxDf` postings is discarded anyway).
  *
  * `reduce`/`merge` stop appending at `cap` elements, so no aggregation
  * buffer ever exceeds `cap` — a corpus-wide stop key costs `cap`
  * entries, not a corpus-sized list (the failure mode that forces the
  * classic two-pass df-prefilter + join plan). Callers set
  * `cap = maxDf + 1`: a result of size ≤ maxDf is EXACT (no truncation
  * below the cap), size = cap means "saturated, true df > maxDf" and is
  * filtered out. Saturated lists' CONTENT is partition-order-dependent;
  * that is fine precisely because they are discarded.
  */
class BoundedList[T](cap: Int)(implicit bufEnc: Encoder[Seq[T]])
    extends Aggregator[T, Seq[T], Seq[T]] {
  require(cap > 0)
  override def zero: Seq[T] = Vector.empty
  override def reduce(b: Seq[T], e: T): Seq[T] = if (b.size >= cap) b else b :+ e
  override def merge(a: Seq[T], b: Seq[T]): Seq[T] =
    if (a.size >= cap) a else (a ++ b).take(cap)
  override def finish(b: Seq[T]): Seq[T] = b
  override def bufferEncoder: Encoder[Seq[T]] = bufEnc
  override def outputEncoder: Encoder[Seq[T]] = bufEnc
}

object BoundedList {
  /** One inverted-index posting: document id + its shingle-set size
    * (rides along so jaccard needs no size re-join; see
    * [[graft.ops.TextOps.nearDupJaccard]]). */
  final case class Posting(doc_id: Long, n_sh: Int)

  implicit val postingEnc: Encoder[Posting] = Encoders.product[Posting]
  implicit val postingSeqEnc: Encoder[Seq[Posting]] = ExpressionEncoder[Seq[Posting]]()

  def postings(cap: Int): BoundedList[Posting] = new BoundedList[Posting](cap)

  /** Posting with a 64-bit payload slot — for indexes whose rider is a
    * full hash (Hamming banding carries the dHash itself so candidates
    * verify without a re-join; the Int slot of [[Posting]] would
    * truncate it). */
  final case class Posting64(doc_id: Long, h: Long)

  implicit val posting64Enc: Encoder[Posting64] = Encoders.product[Posting64]
  implicit val posting64SeqEnc: Encoder[Seq[Posting64]] =
    ExpressionEncoder[Seq[Posting64]]()

  def postings64(cap: Int): BoundedList[Posting64] = new BoundedList[Posting64](cap)
}
