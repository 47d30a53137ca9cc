package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming distribution-drift monitor — the online twin of
  * [[graft.ops.TextOps.splitDriftPsi]]: every micro-batch's histogram
  * over a caller-supplied bin expression is compared to a FIXED
  * reference distribution by Population Stability Index, and batches
  * past the threshold are flagged. This is the DQ alarm a production
  * ingest runs continuously: the reference is "what the corpus looked
  * like when we shipped", the stream is today's data, and a drifted
  * batch is the early warning that upstream changed (new source,
  * schema decay, bot flood) BEFORE it poisons a training snapshot.
  *
  * Scale shape: the only distributed work per batch is one grouped
  * count over the bin expression (map-side combined); the histogram
  * collected to the driver is |bins| rows (bins are categories or
  * fixed-width buckets — bounded by construction). PSI is computed
  * driver-side over the union of reference and batch bins, add-α
  * smoothed so bins empty on either side contribute finite terms
  * (same smoothing contract as the batch operator). Readings accumulate
  * in the monitor object — the caller's alert channel.
  */
object DriftStream {

  /** One micro-batch verdict. */
  final case class Reading(batchId: Long, nRows: Long, psi: Double, drifted: Boolean)

  /** Driver-side monitor state: the fixed reference histogram and the
    * per-batch readings. foreachBatch invocations are serialized per
    * query; `readings` may be read concurrently from a monitor thread. */
  final class DriftMonitor(
      reference: Map[String, Long], alpha: Double = 0.5,
      threshold: Double = 0.25) {
    require(reference.nonEmpty && reference.values.forall(_ > 0),
      "reference histogram must be non-empty with positive counts")
    require(alpha > 0, s"alpha=$alpha must be > 0")
    require(threshold > 0, s"threshold=$threshold must be > 0")

    private val buf = mutable.ArrayBuffer.empty[Reading]
    def readings: Seq[Reading] = synchronized(buf.toSeq)

    /** Fold one batch histogram into a reading. Empty batches record
      * psi 0 (nothing arrived ≠ distribution moved). */
    def update(batchId: Long, counts: Map[String, Long]): Reading = synchronized {
      val n = counts.values.sum
      val psi =
        if (n == 0L) 0.0
        else {
          val bins = (reference.keySet ++ counts.keySet).toSeq.sorted
          val k = bins.size
          val refN = reference.values.sum
          bins.map { b =>
            val p = (counts.getOrElse(b, 0L) + alpha) / (n + alpha * k)
            val q = (reference.getOrElse(b, 0L) + alpha) / (refN + alpha * k)
            (p - q) * math.log(p / q)
          }.sum
        }
      val r = Reading(batchId, n, psi, psi > threshold)
      buf += r
      r
    }
  }

  /** Snapshot a static frame's histogram over `bin` — the "shipped
    * corpus" reference a monitor is built from. */
  def referenceHistogram(df: DataFrame, bin: Column): Map[String, Long] =
    df.groupBy(bin.cast("string").as("bin")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Wire a monitor onto a stream: per micro-batch, ONE grouped count
    * over the bin expression, histogram collected (|bins| rows), PSI
    * scored against the reference. */
  def monitorWriter(stream: DataFrame, bin: Column, monitor: DriftMonitor)
      : DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val counts = batch.groupBy(bin.cast("string").as("bin"))
          .agg(count(lit(1)).as("c"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val r = monitor.update(id, counts)
        if (r.drifted)
          println(f"[drift] batch ${r.batchId} psi=${r.psi}%.6f n=${r.nRows} DRIFTED")
      }
}
