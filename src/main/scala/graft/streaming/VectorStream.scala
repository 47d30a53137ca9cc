package graft.streaming

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.VectorOps

/** Streaming k-means centroid refresh — mini-batch k-means (the
  * web-scale variant of Sculley 2010, and the same update rule as Spark
  * MLlib's StreamingKMeans) over an unbounded embedding stream
  * `(vec_id LONG, embedding ARRAY<FLOAT|DOUBLE>)`.
  *
  * Every micro-batch: assign the batch's vectors to their nearest
  * current centroid (identical rounded-cosine argmax as batch
  * [[VectorOps.kmeans]] — the SAME code path), fold the batch's
  * per-(cluster, dimension) EXACT DECIMAL sums + counts into driver
  * state, and re-derive centroids as running means. `decay` weights the
  * history when a batch arrives:
  *  - `decay = 1.0` (default): all history counts equally — the running
  *    global mean, the right refresh for an append-only corpus;
  *  - `decay = 0.0`: history is discarded, so one micro-batch performs
  *    EXACTLY one Lloyd iteration over its own rows. Replaying the full
  *    corpus n times at decay 0 IS batch kmeans with n iterations —
  *    the spec pins that equality bit-for-bit;
  *  - between: exponential forgetting for drifting corpora.
  *
  * Scale shape: the per-batch aggregation is k×d rows (KB) collected to
  * the driver — same discipline as batch kmeans' per-iteration collect;
  * the stream itself never shuffles beyond that one grouped
  * aggregation, and state is k×d running sums, independent of stream
  * volume. The exactness trick: sums are merged as unscaled DECIMALs
  * across batches and divided ONCE per refresh, so centroid drift from
  * repeated rounding never accumulates.
  */
object VectorStream {

  /** Mutable running state. Thread-safety: foreachBatch invocations are
    * serialized per query, but `centroids` may be read from a test/
    * monitor thread — state swaps are atomic reference writes. */
  final class CentroidRefresh(
      initial: Seq[(Int, Array[Double])], decay: Double = 1.0) {
    require(initial.nonEmpty, "need at least one initial centroid")
    require(decay >= 0.0 && decay <= 1.0, s"decay=$decay must be in [0,1]")

    @volatile private var cents: Seq[(Int, Array[Double])] = initial
    // (cid, dim) -> (exact sum, effective count)
    @volatile private var state: Map[(Int, Int), (JBigDecimal, Double)] = Map.empty
    @volatile private var batches: Long = 0L

    def centroids: Seq[(Int, Array[Double])] = cents
    def batchesSeen: Long = batches

    /** Fold one micro-batch (raw `(vec_id, embedding)` rows) into the
      * running centroids. Called from foreachBatch. */
    def update(batch: DataFrame): Unit = synchronized {
      val p = VectorOps.prepared(batch)
      val assigned = p.withColumn("cid",
        VectorOps.bestCentroid(cents).getField("cid"))
      val stats = VectorOps.lloydStats(assigned)
      if (stats.nonEmpty) {
        val d = JBigDecimal.valueOf(decay)
        val aged: Map[(Int, Int), (JBigDecimal, Double)] =
          if (decay == 0.0) Map.empty
          else if (decay == 1.0) state
          else state.view.mapValues { case (s, n) => (s.multiply(d), n * decay) }.toMap
        val merged = stats.foldLeft(aged) { case (acc, (cid, dim, s, n)) =>
          val (s0, n0) = acc.getOrElse((cid, dim), (JBigDecimal.ZERO, 0.0))
          acc.updated((cid, dim), (s0.add(s), n0 + n))
        }
        state = merged
        // same mean rule as VectorOps.centroidsFrom, over merged sums
        cents = merged.groupBy(_._1._1).map { case (cid, entries) =>
          val c = new Array[Double](entries.keys.map(_._2).max + 1)
          entries.foreach { case ((_, dim), (s, n)) =>
            c(dim) = JBigDecimal.valueOf(s.doubleValue / n)
              .setScale(6, RoundingMode.HALF_UP).doubleValue()
          }
          (cid, c)
        }.toSeq.sortBy(_._1)
      }
      batches += 1
    }

    /** Batch-assign a static frame with the CURRENT centroids — the
      * end-of-log read of the learned model (same output columns as
      * [[VectorOps.kmeans]]). */
    def assign(embeddings: DataFrame): DataFrame = {
      val p = VectorOps.prepared(embeddings)
      p.withColumn("b", VectorOps.bestCentroid(cents))
        .select(col("vec_id"), col("b.cid").as("cid"),
          (lit(0.0) - col("b.neg")).as("sim"))
    }
  }

  /** Wire a refresh onto an embedding stream. The sink is the state
    * object itself — callers read `refresh.centroids` / `.assign`.
    * Trigger is left to the caller (`.trigger(AvailableNow())` for a
    * catch-up run; default micro-batches for a resident refresher). */
  def refreshWriter(embStream: DataFrame, refresh: CentroidRefresh)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    embStream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) => refresh.update(batch) }
}
