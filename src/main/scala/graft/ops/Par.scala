package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism repair for unsplittable small inputs (optimization guide
  * §2.5 "input skew: one huge unsplittable file … repartition immediately
  * after the read").
  *
  * A single-row-group parquet file scans as ONE partition no matter the
  * cluster size, so every row-local heavy projection downstream of it
  * (regex normalize + tokenize + per-shingle md5 on documents, the
  * banded LSH explodes on embeddings) runs single-threaded and the first
  * shuffle's map side serializes the whole corpus through one task —
  * measured on the r19 baseline: `contrastive_triplets`' candidate
  * generation ran as 1 task for 1.8 s of its 3.4 s warm wall.
  *
  * [[fanned]] round-robin repartitions to the session default
  * parallelism, but ONLY when the plan would otherwise run on fewer
  * partitions — on a well-laid-out big table (scan partitions ≥ cores)
  * it is a provable no-op, so no payload is ever re-shuffled at scale.
  * Round-robin repartition local-sorts its input first
  * (`spark.sql.execution.sortBeforeRepartition`, default) so retried
  * tasks reproduce the same assignment — deterministic by construction,
  * and every registered query's values are partition-layout-independent
  * anyway (DECIMAL aggregation discipline + total-ordered windows).
  */
object Par {

  /** `df` spread across the session's default parallelism when its plan
    * would run on fewer partitions; `df` unchanged otherwise. Call it on
    * a NARROW projection (ids + the columns the heavy work needs), not a
    * wide row, so the repair shuffle moves minimal bytes. */
  def fanned(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
