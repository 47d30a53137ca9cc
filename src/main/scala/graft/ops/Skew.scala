package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins — the manual fallback when AQE's
  * runtime skew-join split (`spark.sql.adaptive.skewJoin.*`, on by
  * default) can't help: e.g. a hot key joined against a non-broadcastable
  * build side, or a deliberately pinned shuffle plan.
  *
  * The big side's rows get a per-row salt in [0, n); the small side is
  * replicated n times; the join runs on (key, salt), spreading one hot
  * key over n reducers. Join RESULTS are salt-invariant — only the
  * shuffle distribution changes — which the spec asserts. Replication
  * multiplies the small side by n: keep n × |small| well under the
  * broadcast threshold or the executor working set.
  */
object Skew {

  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      n: Int,
      joinType: String = "inner"): DataFrame = {
    require(n > 0)
    // per-row deterministic-enough spread: hash of the whole row modulo n
    // (monotonically_increasing_id would also do; values don't matter,
    // only their distribution)
    val salted = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toSeq: _*), lit(n)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
