package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed mergeable `Aggregator`
  * (Misra & Gries 1982; merge rule from Agarwal et al., "Mergeable
  * Summaries", PODS 2012).
  *
  * State: at most `k` (item → counter) pairs. `reduce` increments a
  * tracked item, opens a slot if one is free, else decrements ALL
  * counters (dropping zeros) — the classic frequent-items step. `merge`
  * adds counters pairwise, then subtracts the (k+1)-th largest counter
  * from every survivor and keeps the positive ones: the PODS'12 rule
  * that preserves the error bound under distributed partial
  * aggregation.
  *
  * Guarantees over a group of n rows (any split across partitions):
  *  - every item with true frequency > n/(k+1) SURVIVES in the sketch
  *  - every reported estimate ĉ satisfies c − n/(k+1) ≤ ĉ ≤ c
  * The sketch's exact counter values depend on merge order (Spark's
  * partial-agg schedule), so the driver query reports the sketch
  * rows-only; HeavyHittersSpec pins the two guarantees — the portable
  * contract — on adversarial splits.
  *
  * Scale shape: fixed k-sized state per group crossing the shuffle
  * (like TopK/BoundedList/HLL here), map-side partials — grouped
  * frequent-items at 100 TB without a per-item groupBy of the long
  * tail. The exact alternative (count + filter > n/(k+1)) costs a
  * full (group, item)-grain shuffle; this costs (tasks × groups × k).
  */
class HeavyHitters(k: Int)
    extends Aggregator[Long, Map[Long, Long], Seq[(Long, Long)]] {
  require(k >= 1, s"k=$k must be >= 1")

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(buf: Map[Long, Long], item: Long): Map[Long, Long] =
    buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1)
      case None if buf.size < k => buf.updated(item, 1L)
      case None => // decrement-all step; zeros vacate their slots
        buf.collect { case (i, c) if c > 1 => (i, c - 1) }
    }

  override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
    val sum = b.foldLeft(a) { case (m, (i, c)) =>
      m.updated(i, m.getOrElse(i, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest counter, keep positives
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      sum.collect { case (i, c) if c > cut => (i, c - cut) }
    }
  }

  /** (item, estimate) sorted by estimate desc, item asc — deterministic
    * PRESENTATION of an order-dependent sketch state. */
  override def finish(buf: Map[Long, Long]): Seq[(Long, Long)] =
    buf.toSeq.sortBy { case (i, c) => (-c, i) }

  override def bufferEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}

object HeavyHitters {
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong
  def apply(k: Int): HeavyHitters = new HeavyHitters(k)
}
