package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic point-in-interval (range) join without a nested loop.
  *
  * Spark plans an inequality-only join as `BroadcastNestedLoopJoin` —
  * O(points × intervals) and a non-starter when both sides are large. The
  * standard scale-out reformulation buckets time to a coarse grain:
  * each interval explodes to every bucket it overlaps, each point maps to
  * exactly one bucket, and the join becomes an EQUI-join on bucket id
  * (hash-partitioned, AQE-skew-splittable) followed by the exact
  * containment filter. Each (point, interval) candidate pair arises in
  * exactly one bucket — the point's — so no post-join dedup is needed.
  *
  * Cost: shuffle volume ~ points + Σ interval spans / bucket; pick
  * `bucketSeconds` near the typical interval length so intervals explode
  * to O(1) buckets each. Correct for any choice (specs assert
  * bucket-size invariance); only performance changes.
  */
object RangeJoin {

  /** Join `points` to every `intervals` row whose
    * `[startCol, endCol]` (inclusive both ends) contains `pointTsCol`.
    * Column sets must be disjoint; timestamps compare at microsecond
    * precision. Output = point columns ++ interval columns, one row per
    * containing (point, interval) pair.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointTsCol: String, startCol: String, endCol: String,
      bucketSeconds: Long = 3600L): DataFrame = {
    val usec = bucketSeconds * 1000000L
    val ib = intervals.withColumn("_bucket",
      explode(sequence(
        floor(unix_micros(col(startCol)) / usec).cast("long"),
        floor(unix_micros(col(endCol)) / usec).cast("long"))))
    val pb = points.withColumn("_bucket",
      floor(unix_micros(col(pointTsCol)) / usec).cast("long"))
    pb.join(ib, Seq("_bucket"))
      .filter(col(pointTsCol).between(col(startCol), col(endCol)))
      .drop("_bucket")
  }

  /** Reference nested-loop formulation (inequality-only join) for
    * cross-checking the bucketized plan on small inputs. */
  def pointInIntervalNL(points: DataFrame, intervals: DataFrame,
      pointTsCol: String, startCol: String, endCol: String): DataFrame =
    points.join(intervals,
      col(pointTsCol) >= col(startCol) && col(pointTsCol) <= col(endCol))
}
