package graft.incremental

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER clustering for multi-dimension data skipping: map each
  * clustering column to a small rank bucket (quantile boundaries, so
  * skew cannot collapse the buckets), bit-interleave the buckets into
  * one z-value, and range-cluster the rewrite on it — files then carry
  * TIGHT [min,max] ranges in EVERY clustering dimension at once, so
  * manifest stats prune on each (`readRange`, `readWhere`, `scan()`
  * pushdown, `countWhere`). Single-column range clustering gives one
  * dimension perfect locality and every other dimension none; at
  * 100 TB, a store queried by both key and ingest week wants the
  * z-curve's compromise: ~`bits`-grain locality in all dimensions.
  *
  * Standard curve mechanics (Morton order), re-derived minimally:
  *   - per column, ≤ 2^bits − 1 quantile BOUNDARIES from one bounded
  *     sample, ordered by the same canonical encoding the manifest
  *     stats use ([[SnapshotTable]]'s ordEncode/ordLt domain), so any
  *     stats-eligible type (numerics, dates, timestamps, strings)
  *     clusters consistently with how its stats will prune;
  *   - bucket(row) = #boundaries ≤ value, computed as a codegen'd
  *     array-HOF over the boundary literals — no UDF, no shuffle;
  *     nulls land in bucket 0 (they carry no order; null-count stats
  *     prune them regardless of placement);
  *   - z = bitwise interleave of the per-column buckets — plain
  *     shift/and/or Column arithmetic, whole-stage-codegen friendly.
  */
private[graft] object ZOrder {

  /** Max rows collected to derive quantile boundaries — one bounded
    * driver-side sample, never data-proportional. */
  private val sampleCap = 20000

  /** The z-value column for `cols` over `df`, or None when no column
    * yields usable boundaries (e.g. all-null everywhere) — callers fall
    * back to key clustering. `encode`/`lt` are the manifest's canonical
    * encoding and its order (SnapshotTable.ordEncode/ordLt), keyed by
    * the column's stats kind. */
  def zvalue(df: DataFrame, totalRows: Long, cols: Seq[String], bits: Int,
      kindOf: String => String,
      encode: Any => Option[String],
      lt: (String, String, String) => Boolean): Option[Column] = {
    require(bits >= 1 && bits * cols.size <= 62,
      s"z-order needs bits*cols <= 62, got $bits*${cols.size}")
    // totalRows comes from the caller's manifest arithmetic — no count job
    val frac = math.min(1.0, sampleCap.toDouble / math.max(1L, totalRows).toDouble)
    val sample = df.select(cols.map(col): _*).sample(withReplacement = false, frac, seed = 7)
      .collect()
    val buckets: Seq[Column] = cols.zipWithIndex.flatMap { case (c, i) =>
      val kind = kindOf(c)
      // distinct sampled values, canonically ordered; boundary count
      // capped at 2^bits - 1 (bucket ids then fit in `bits` bits)
      val ordered = sample.map(_.get(i)).filter(_ != null)
        .flatMap(v => encode(v).map(e => e -> v)).distinct
        .sortWith((a, b) => lt(kind, a._1, b._1)).map(_._2).toSeq
      val nBounds = (1 << bits) - 1
      val bounds =
        if (ordered.size <= nBounds) ordered.drop(1) // few distincts: one bucket each
        else (1 to nBounds).map(j => ordered((j * (ordered.size - 1)) / nBounds))
      if (bounds.isEmpty) None
      else {
        // bucket = #boundaries <= value: a filter-HOF over the boundary
        // literals, null value -> null predicate -> dropped -> bucket 0
        val arr = array(bounds.map(lit): _*)
        Some(least(size(filter(arr, b => col(c) >= b)), lit((1 << bits) - 1))
          .cast("long"))
      }
    }
    if (buckets.isEmpty) None
    else Some(interleave(buckets, bits))
  }

  /** Bit-interleave: z = Σ_bit Σ_col ((bucket_col >> bit) & 1) << (bit*n + col). */
  private def interleave(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.size
    val terms = for {
      bit <- 0 until bits
      (b, i) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(b, bit).bitwiseAND(lit(1L)), bit * n + i)
    terms.reduce(_ bitwiseOR _)
  }
}
