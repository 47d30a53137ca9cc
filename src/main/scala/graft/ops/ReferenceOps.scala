package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's smaller operators from SURVEY.md §2, as pure queries
  * over the rental view — each has a DuckDB oracle in [[graft.SparkEntry]].
  */
object ReferenceOps {

  /** F1/S2 — delta extraction: the half-open CDC interval predicate
    * `last_update ∈ (wm, max]` (etl_script_incremental_pandas.py:120-124).
    * On JDBC this predicate ships to the source; on parquet it prunes row
    * groups via min/max statistics. */
  def deltaExtract(rental: DataFrame, wm: Timestamp, max: Timestamp): DataFrame =
    rental
      .filter(col("last_update") > lit(wm) && col("last_update") <= lit(max))
      .select(col("rental_id"), col("rental_date"), col("return_date"), col("last_update"))

  /** A1/A2/A3/A8/F12 — the driver-steering scalar probes, fused into ONE
    * single-pass aggregation instead of the reference's four separate
    * round-trips (etl:98,151,162,175): max CDC timestamp, max/min activity
    * date, and their Monday weeks. */
  def watermarkProbes(rental: DataFrame): DataFrame = {
    val activity = greatest(col("rental_date"), coalesce(col("return_date"), col("rental_date")))
    rental.agg(
      max(col("last_update")).as("max_last_update"),
      max(activity).as("max_activity_date"),
      min(activity).as("min_activity_date"),
      WeeklySummary.weekStart(max(activity)).as("max_activity_week"),
      WeeklySummary.weekStart(min(activity)).as("min_activity_week"),
      count(lit(1)).as("n_rentals"))
  }

  /** A9/U1/U2/U3/F3 — affected weeks of a delta window: distinct Monday
    * weeks of rental_date ∪ return_date (etl:131-146), sorted (etl:199). */
  def affectedWeeks(rental: DataFrame, wm: Timestamp, max: Timestamp): DataFrame =
    // Both week columns leave the scan in ONE pass (explode of a 2-array)
    // instead of a union of two subplans that each rescan the delta; the
    // null filter recovers the reference's per-column null handling.
    deltaExtract(rental, wm, max)
      .select(explode(array(
        WeeklySummary.weekStart(to_date(col("rental_date"))),
        WeeklySummary.weekStart(to_date(col("return_date"))))).as("week_beginning"))
      .filter(col("week_beginning").isNotNull)
      .distinct()
      .orderBy("week_beginning")

  /** S3/U4 — the existence/limit probe (`SELECT … LIMIT 1`, etl:70-71),
    * made deterministic by keyed ordering. */
  def firstRental(rental: DataFrame): DataFrame =
    rental.orderBy("rental_id").limit(1)
      .select(col("rental_id"), col("rental_date"), col("return_date"), col("last_update"))

  /** S5/J4 — one observable upsert round as a pure query: the summary
    * built from source state as of `t` (the "existing" target), merged
    * with a recompute of the weeks touched by the delta after `t`
    * (the "incoming" rows). Equals one Faithful incremental step. */
  def upsertRound(rental: DataFrame, t: Timestamp, asOf: java.time.LocalDate): DataFrame =
    WeeklySummary.upsertRound(rental, t, asOf)
}
