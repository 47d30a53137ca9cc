package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Blocked fuzzy (edit-distance) self-join — entity-resolution over
  * short strings (product names, titles, author fields).
  *
  * The all-pairs Levenshtein join is O(n²) and never survives scale;
  * the standard shape is BLOCKING: equi-join on a cheap blocking key so
  * the quadratic work happens only inside blocks, then the exact
  * edit-distance predicate inside each block. The join itself is a hash
  * equi-join on the block key (shuffle or broadcast — Catalyst's
  * choice), never a nested loop over the corpus; total work is
  * Σ|block|², controlled by the blocking-key selectivity. Skewed blocks
  * are the operator's one hazard at 100 TB — mitigate with a composite
  * key (as here: a token + a categorical) or AQE skew splitting.
  *
  * `levenshtein` is a codegen'd built-in on both engines (identical
  * unit-cost dynamic program — exact, portable to the DuckDB oracle).
  */
object FuzzyJoin {

  /** Near-identical part names within (last-name-token, p_size) blocks:
    * pairs of DISTINCT names at edit distance ≤ `maxDist` plus how many
    * part rows carry each name. */
  def partNameMatches(spark: SparkSession, dir: String,
      maxDist: Int = 4): DataFrame = {
    val names = Tables.part(spark, dir)
      .groupBy(col("p_name"), col("p_size"))
      .agg(count(lit(1)).as("n_parts"))
      // blocking key: the name's final token (product nouns cluster) +
      // the size attribute — cheap, high-selectivity, deterministic
      .withColumn("blk", element_at(split(col("p_name"), " "), -1))
    val a = names.select(col("blk"), col("p_size"),
      col("p_name").as("name_a"), col("n_parts").as("n_a"))
    val b = names.select(col("blk"), col("p_size"),
      col("p_name").as("name_b"), col("n_parts").as("n_b"))
    a.join(b, Seq("blk", "p_size"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("edit_dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("edit_dist") <= maxDist)
      .select(col("p_size"), col("name_a"), col("name_b"),
        col("edit_dist"), col("n_a"), col("n_b"))
  }
}
