package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.TextOps

/** Online refresh of the distilled quality classifier — the streaming
  * twin of [[TextOps.docQualityLogreg]], completing the symmetry the
  * k-means family already has ([[VectorStream]]): every micro-batch of
  * documents contributes ONE gradient step over its own rows
  * (mini-batch SGD with the same DECIMAL-exact gradient sums and
  * 6dp-rounded updates as batch training), so the model tracks a
  * drifting corpus without ever rescanning history.
  *
  * Exactness contract (pinned in ModelStreamSpec): a micro-batch IS one
  * [[TextOps.logregStep]], so replaying the full corpus n times
  * produces bit-for-bit the weights of `docQualityLogreg(iters = n)` —
  * the same "stream ≡ batch at end-of-log" discipline every stateful
  * operator in this repo carries.
  *
  * Scale shape: per batch one row-local feature projection + one fused
  * 5-sum aggregation; driver state is five doubles. */
object ModelStream {

  /** Driver-side model state. foreachBatch invocations are serialized
    * per query; `weights` may be read from a monitor thread. */
  final class LogregRefresh(lr: Double = 0.5) {
    require(lr > 0, s"lr=$lr must be > 0")
    @volatile private var w: Array[Double] = Array.fill(5)(0.0)
    @volatile private var batches: Long = 0L
    def weights: Array[Double] = w.clone()
    def batchesSeen: Long = batches

    def update(batch: DataFrame): Unit = synchronized {
      w = TextOps.logregStep(TextOps.logregFeatures(batch), w, lr)
      batches += 1
    }

    /** Score a static frame under the CURRENT weights — same output
      * columns as [[TextOps.docQualityLogreg]]. */
    def score(documents: DataFrame): DataFrame =
      TextOps.logregScore(TextOps.logregFeatures(documents), w)
  }

  /** Wire a refresh onto a documents stream (doc_id, text, …). */
  def refreshWriter(docStream: DataFrame, refresh: LogregRefresh)
      : DataStreamWriter[Row] =
    docStream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) => refresh.update(batch) }
}
