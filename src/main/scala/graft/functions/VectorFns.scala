package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as pure higher-order
  * column expressions (SURVEY.md §2.7 extended plan): dot products via
  * `zip_with` + `aggregate` (a sequential left-to-right fold — bit-exact
  * reproducible, which the DuckDB oracles rely on), norms, cosine, and
  * deterministic random-hyperplane LSH for sublinear candidate
  * generation. No UDFs anywhere.
  */
object VectorFns {

  /** Σ aᵢ·bᵢ with double accumulation, left-to-right — the codegen'd
    * [[VecDot]] expression (bit-identical to [[dotHof]], ~40× faster on
    * all-pairs workloads). */
  def dot(a: Column, b: Column): Column = VecDot(a, b)

  /** Reference higher-order-function formulation of [[dot]]; interpreted
    * per element. Kept for the bit-parity spec and as the no-custom-
    * expression fallback. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** splitmix64 — the same deterministic parameter mixer as
    * [[TextFns.permParams]]. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Hyperplane coefficient for (seed, plane, dim), uniform in [-1, 1],
    * reproducible with no RNG state. `seed` gives independent hash
    * tables for multi-probe LSH. */
  def planeCoef(seed: Int, plane: Int, dim: Int): Double =
    ((mix((seed.toLong * 10007L + plane) * 1000003L + dim) >>> 11).toDouble
      / (1L << 53).toDouble) * 2.0 - 1.0

  /** Signed random-projection bucket id: `planes` sign bits packed into
    * one long. Vectors in the same bucket are ANN candidates. The plane
    * coefficients are plan literals — evaluated per row, no join against
    * a plane table. */
  def lshBucket(vec: Column, planes: Int, dims: Int, seed: Int = 0): Column = {
    val bits = (0 until planes).map { p =>
      val coefs = array((0 until dims).map(d => lit(planeCoef(seed, p, d))): _*)
      when(dot(vec, coefs) >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
