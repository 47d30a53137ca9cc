package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecDot
import graft.functions.VectorFns._

/** Similarity search over the `embeddings` table (`vec_id`,
  * `embedding: array<float>`, `label`).
  *
  * - [[annBruteForce]] — exact top-k for a query set: broadcast the
  *   (small) query side, stream all candidates once. The baseline and
  *   the recall oracle.
  * - [[annLsh]] — random-hyperplane LSH: one pass computes a packed
  *   sign-bucket per vector; candidates co-reside in a bucket (with
  *   multi-probe via several independent tables). Sublinear pair count,
  *   shuffle keyed on (table, bucket) — the 100 TB path.
  * - [[nearDupEmbedding]] — exact all-pairs cosine above a threshold
  *   (the embedding near-dup cross-check; the LSH variant is the scale
  *   path, same pattern as MinHash vs exact jaccard for text).
  *
  * All pairwise math runs on the codegen'd [[VecDot]]; per-vector norms
  * are computed once per side, never per pair. `cos = dot/(na*nb)` is
  * arithmetically identical to the per-pair formulation, so the DuckDB
  * oracles still match bit-for-bit.
  */
object VectorOps {

  /** (vec_id, vd: array<double>, nrm) — embedding widened once, norm
    * precomputed. */
  private def prepared(embeddings: DataFrame): DataFrame = {
    VecDot.register(embeddings.sparkSession)
    embeddings.select(
      col("vec_id"),
      col("embedding").cast("array<double>").as("vd"),
      sqrt(VecDot(col("embedding"), col("embedding"))).as("nrm"))
  }

  /** Exact cosine top-k: queries = `vec_id < nQueries` (deterministic
    * sample), candidates = everything else. Cosine rounded to 6dp BEFORE
    * ranking so the rank order is reproducible across engines;
    * neighbor_id breaks ties. */
  def annBruteForce(embeddings: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val p = prepared(embeddings)
    val q = p.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("vd").as("qd"), col("nrm").as("qn"))
    val pairs = broadcast(q).join(p, col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id").as("neighbor_id"),
        round(VecDot(col("qd"), col("vd")) / (col("qn") * col("nrm")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** LSH-bucketed ANN: `tables` independent hash tables of `planes`-bit
    * sign buckets; a candidate must share ≥1 bucket with the query.
    * Exact cosine + top-k within the candidate set. */
  def annLsh(embeddings: DataFrame, nQueries: Int = 10, k: Int = 5,
      planes: Int = 10, tables: Int = 4, dims: Int = 64): DataFrame = {
    val p = prepared(embeddings)
    val withBuckets = p.select(
      col("vec_id"), col("vd"), col("nrm"),
      array((0 until tables).map(t =>
        struct(lit(t).as("t"),
          lshBucket(col("vd"), planes, dims, seed = t).as("b"))): _*).as("buckets"))
    val exploded = withBuckets
      .select(col("vec_id"), col("vd"), col("nrm"), explode(col("buckets")).as("tb"))
    val q = exploded.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("vd").as("qd"), col("nrm").as("qn"), col("tb"))
    val cand = q.join(exploded, Seq("tb"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qd"), col("qn"),
        col("vec_id").as("neighbor_id"), col("vd"), col("nrm"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    cand
      .select(col("query_id"), col("neighbor_id"),
        round(VecDot(col("qd"), col("vd")) / (col("qn") * col("nrm")), 6).as("cos_sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** Exact all-pairs near-dup: pairs with cosine ≥ `minCos`. Quadratic —
    * the cross-check for the LSH path, run on samples at scale. */
  def nearDupEmbedding(embeddings: DataFrame, minCos: Double = 0.45): DataFrame = {
    val p = prepared(embeddings)
    val a = p.select(col("vec_id").as("vec_a"), col("vd").as("da"), col("nrm").as("na"))
    val b = p.select(col("vec_id").as("vec_b"), col("vd").as("db"), col("nrm").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(VecDot(col("da"), col("db")) / (col("na") * col("nb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= minCos)
  }
}
