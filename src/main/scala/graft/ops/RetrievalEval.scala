package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Offline retrieval evaluation — the metrics layer a pipeline needs to
  * JUDGE its retrieval stages, not just run them: recall@k and
  * reciprocal rank of a candidate ranking against a per-query relevance
  * set. The canonical uses here: scoring the hashed-feature text
  * ranking against dense-embedding truth (how much does the cheap proxy
  * lose?), or an ANN method against the brute-force ranking (what did
  * the index trade for speed?). RRF/ANN stages plug in unchanged —
  * everything is rank-based.
  *
  * Scale shape: one semi-join of the top-k slice against the truth set
  * (both (query, doc)-keyed), one per-query aggregate — work is
  * |queries × k|, never corpus-sized. */
object RetrievalEval {

  /** @param ranked (query_id, doc_id, rank) — rank 1-based within query
    * @param truth  (query_id, doc_id) relevance pairs
    * @return per query: n_truth, n_hits (relevant in top `kTop`),
    *         recall_at_k, reciprocal_rank (0.0 when nothing relevant
    *         ranks) — queries with truth but NO ranked hits still get a
    *         row (the failure case an evaluation must surface). */
  def metrics(ranked: DataFrame, truth: DataFrame, kTop: Int = 10): DataFrame = {
    require(kTop >= 1, s"kTop=$kTop must be >= 1")
    val t = truth.select(col("query_id"), col("doc_id")).distinct()
    val tn = t.groupBy(col("query_id")).agg(count(lit(1)).as("n_truth"))
    val hits = ranked.filter(col("rank") <= kTop)
      .join(t, Seq("query_id", "doc_id"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("h"), min(col("rank")).as("first_rank"))
    tn.join(hits, Seq("query_id"), "left_outer")
      .select(col("query_id"), col("n_truth"),
        coalesce(col("h"), lit(0L)).as("n_hits"),
        round(coalesce(col("h"), lit(0L)).cast("double") / col("n_truth"), 6)
          .as("recall_at_k"),
        coalesce(round(lit(1.0) / col("first_rank"), 6), lit(0.0))
          .as("reciprocal_rank"))
  }
}
