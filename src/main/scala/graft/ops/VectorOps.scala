package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  */
object VectorOps {

  /** Exact cosine top-k: queries = `vec_id < nQueries` (deterministic
    * sample), candidates = everything else. Cosine rounded to 6dp BEFORE
    * ranking so the rank order is reproducible across engines;
    * neighbor_id breaks ties. */
  def annBruteForce(embeddings: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val q = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val pairs = broadcast(q).join(embeddings, col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id").as("neighbor_id"),
        round(cosine(col("qe"), col("embedding")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** LSH-bucketed ANN: `tables` independent hash tables of `planes`-bit
    * sign buckets; a candidate must share ≥1 bucket with the query.
    * Exact cosine + top-k within the candidate set. */
  def annLsh(embeddings: DataFrame, nQueries: Int = 10, k: Int = 5,
      planes: Int = 10, tables: Int = 4, dims: Int = 64): DataFrame = {
    val withBuckets = embeddings.select(
      col("vec_id"), col("embedding"),
      array((0 until tables).map(t =>
        struct(lit(t).as("t"),
          lshBucket(col("embedding"), planes, dims, seed = t).as("b"))): _*).as("buckets"))
    val exploded = withBuckets
      .select(col("vec_id"), col("embedding"), explode(col("buckets")).as("tb"))
    val q = exploded.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("tb"))
    val cand = q.join(exploded, Seq("tb"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qe"), col("vec_id").as("neighbor_id"), col("embedding"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    cand
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qe"), col("embedding")), 6).as("cos_sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** Exact all-pairs near-dup: pairs with cosine ≥ `minCos`. Quadratic —
    * the cross-check for the LSH path, run on samples at scale. */
  def nearDupEmbedding(embeddings: DataFrame, minCos: Double = 0.45): DataFrame = {
    val a = embeddings.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = embeddings.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(cosine(col("ea"), col("eb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= minCos)
  }
}
