package graft.ops

import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** The flagship computation of the reference: the weekly rental summary
  * (full-snapshot form, /root/reference/airflow_setup/dags/reference_query.sql:1-57;
  * the incremental form recomputes the same three counts per affected week,
  * etl_script_incremental_pandas.py:221-247).
  *
  * Per Monday-start week `w` over `rental(rental_id, rental_date, return_date)`:
  *   - newly_rented_during_week      = #{ rental_date ∈ [w, w+6d] }           (sql:28-34)
  *   - returned_rentals_during_week  = #{ return_date ∈ [w, w+6d] }           (sql:20-27)
  *   - outstanding_rentals_at_week_end = #{ rental_date ≤ w+6d AND
  *         (return_date IS NULL OR return_date > w+6d) }                      (sql:40-49)
  *   - net_change_in_outstanding     = newly − returned                       (sql:39)
  *
  * `CURRENT_DATE` in the reference's spine-extension rule (sql:7) is
  * parameterized as `asOf` for deterministic oracle comparison (SURVEY.md F9).
  *
  * Two physical formulations:
  *
  * '''snapshot''' (default, scale path): the reference's correlated
  * outstanding-count subquery is O(weeks × rentals). We reformulate it as
  * O(n): `outstanding(w) = cumulative(rented ≤ w) − cumulative(closed ≤ w)`
  * where a rental is "closed" in `week(GREATEST(rental_date, return_date))` —
  * the GREATEST guards the (data-anomaly) case `return_date < rental_date`,
  * keeping the identity `#{rental ≤ e ∧ return ≤ e} = cum_closed(e)` exact for
  * arbitrary inputs. One scan feeds three map-side-combined week-grain
  * aggregations; everything after the partial agg is at week cardinality
  * (a few hundred rows per decade), so the spine joins broadcast and the
  * single-partition cumulative window is trivially safe at any source scale.
  *
  * '''snapshotNestedLoop''' (cross-check): faithful non-equi-join shape of
  * sql:40-49 — `weeks × rental` with the range predicate, counted. Spark
  * plans `BroadcastNestedLoopJoin` with the tiny spine broadcast. Kept for
  * small-scale cross-validation of the cumulative rewrite (SURVEY.md J3).
  */
object WeeklySummary {

  /** Monday-start week truncation, as DATE. Spark's `date_trunc("week")` is
    * ISO Monday-start — identical to PostgreSQL `DATE_TRUNC('week', x)` and
    * to the reference's Python `d - timedelta(days=d.weekday())`
    * (etl_script_incremental_pandas.py:143-145; SURVEY.md F3). */
  def weekStart(c: Column): Column = date_trunc("week", c).cast(DateType)

  /** End (inclusive last day) of the week beginning at `weekBeginning`. */
  def weekEnd(weekBeginning: Column): Column = date_add(weekBeginning, 6)

  /** The Monday-week spine [week(min), week(max)] at 1-week step —
    * reference_query.sql:12-19 (`GENERATE_SERIES`) as `sequence` + `explode`.
    * Built from a 1-row aggregate: no driver round-trip. */
  def weekSpine(rental: DataFrame, asOf: LocalDate): DataFrame = {
    val maxDateExpr = max(
      when(col("return_date").isNotNull, to_date(col("return_date")))
        .otherwise(greatest(to_date(col("rental_date")), lit(asOf))))
    rental
      .agg(
        weekStart(min(to_date(col("rental_date")))).as("min_week"),
        weekStart(maxDateExpr).as("max_week"))
      .select(explode(
        sequence(col("min_week"), col("max_week"), expr("INTERVAL 7 DAYS")))
        .as("week_beginning"))
  }

  /** Week-grain summary stats for an arbitrary set of requested weeks.
    *
    * Shared core of the snapshot (requested = the contiguous spine) and the
    * incremental recompute (requested = the sparse affected-week set,
    * etl_script_incremental_pandas.py:218-243 — but as ONE join-based plan
    * instead of the reference's per-week driver loop, SURVEY.md G2).
    *
    * The cumulative window must see every activity week ≤ any requested
    * week, so it runs over `requested ∪ activity-weeks` and the result is
    * then inner-joined back to `requested`. All frames past the partial
    * aggregation are week-cardinality.
    *
    * @param weeks single `week_beginning: DATE` column, distinct Monday dates
    */
  def statsForWeeks(rental: DataFrame, weeks: DataFrame): DataFrame = {
    val r = rental.select(
      col("rental_id"),
      to_date(col("rental_date")).as("rd"),
      to_date(col("return_date")).as("ret"))

    val rented = r
      .groupBy(weekStart(col("rd")).as("week_beginning"))
      .agg(count(col("rental_id")).as("n_rented"))
    val returned = r
      .filter(col("ret").isNotNull)
      .groupBy(weekStart(col("ret")).as("week_beginning"))
      .agg(count(col("rental_id")).as("n_returned"))
    val closed = r
      .filter(col("ret").isNotNull)
      .groupBy(weekStart(greatest(col("rd"), col("ret"))).as("week_beginning"))
      .agg(count(col("rental_id")).as("n_closed"))

    val allWeeks = weeks.select(col("week_beginning"))
      .union(rented.select(col("week_beginning")))
      .union(closed.select(col("week_beginning")))
      .distinct()

    // Post-aggregation sides are week-cardinality: broadcast them so the
    // week-spine join never shuffles.
    val joined = allWeeks
      .join(broadcast(rented), Seq("week_beginning"), "left")
      .join(broadcast(returned), Seq("week_beginning"), "left")
      .join(broadcast(closed), Seq("week_beginning"), "left")

    val nRented = coalesce(col("n_rented"), lit(0L))
    val nReturned = coalesce(col("n_returned"), lit(0L))
    val nClosed = coalesce(col("n_closed"), lit(0L))
    // Single-partition window is intentional: input is week-grain.
    val cum = Window.orderBy("week_beginning")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    joined
      .select(
        col("week_beginning"),
        nRented.as("newly_rented_during_week"),
        nReturned.as("returned_rentals_during_week"),
        (nRented - nReturned).as("net_change_in_outstanding"),
        (sum(nRented).over(cum) - sum(nClosed).over(cum))
          .as("outstanding_rentals_at_week_end"))
      .join(broadcast(weeks.select(col("week_beginning"))), Seq("week_beginning"), "left_semi")
      .orderBy("week_beginning")
  }

  /** Scale-path snapshot: cumulative-window reformulation (see object doc). */
  def snapshot(rental: DataFrame, asOf: LocalDate): DataFrame =
    statsForWeeks(rental, weekSpine(rental, asOf))

  /** The reference's snapshot SQL run through `spark.sql` — the literal
    * query shape of reference_query.sql:1-57 in Spark dialect (week
    * spine via sequence/explode, `CURRENT_DATE` parameterized), keeping
    * the CORRELATED scalar subquery for the outstanding count. Catalyst
    * decorrelates it (`DecorrelateInnerQuery` handles the non-equi
    * predicate), which is the SURVEY.md §4 "subquery decorrelation"
    * row demonstrated end-to-end: a user's existing SQL runs unchanged
    * and still plans without a driver-side loop. */
  def snapshotSql(rental: DataFrame, asOf: LocalDate): DataFrame = {
    val spark = rental.sparkSession
    val view = s"rental_snapshot_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    rental.createOrReplaceTempView(view)
    spark.sql(
      s"""WITH date_range AS (
         |  SELECT MIN(to_date(rental_date)) AS min_date,
         |         MAX(CASE WHEN return_date IS NOT NULL THEN to_date(return_date)
         |             ELSE GREATEST(to_date(rental_date), DATE '$asOf') END) AS max_date
         |  FROM $view
         |),
         |all_weeks AS (
         |  SELECT explode(sequence(
         |    to_date(date_trunc('week', (SELECT min_date FROM date_range))),
         |    to_date(date_trunc('week', (SELECT max_date FROM date_range))),
         |    INTERVAL 7 DAYS)) AS week_beginning
         |),
         |weekly_returned_counts AS (
         |  SELECT to_date(date_trunc('week', return_date)) AS week_of_return,
         |         COUNT(rental_id) AS num_returned_rentals
         |  FROM $view WHERE return_date IS NOT NULL GROUP BY 1
         |),
         |weekly_rented_counts AS (
         |  SELECT to_date(date_trunc('week', rental_date)) AS week_of_rental,
         |         COUNT(rental_id) AS num_newly_rented
         |  FROM $view GROUP BY 1
         |)
         |SELECT
         |  aw.week_beginning,
         |  COALESCE(wrc_rented.num_newly_rented, 0) AS newly_rented_during_week,
         |  COALESCE(wrc_returned.num_returned_rentals, 0) AS returned_rentals_during_week,
         |  COALESCE(wrc_rented.num_newly_rented, 0)
         |    - COALESCE(wrc_returned.num_returned_rentals, 0) AS net_change_in_outstanding,
         |  (SELECT COUNT(r_inv.rental_id) FROM $view r_inv
         |   WHERE to_date(r_inv.rental_date) <= date_add(aw.week_beginning, 6)
         |     AND (r_inv.return_date IS NULL
         |          OR to_date(r_inv.return_date) > date_add(aw.week_beginning, 6))
         |  ) AS outstanding_rentals_at_week_end
         |FROM all_weeks aw
         |LEFT JOIN weekly_returned_counts wrc_returned
         |  ON aw.week_beginning = wrc_returned.week_of_return
         |LEFT JOIN weekly_rented_counts wrc_rented
         |  ON aw.week_beginning = wrc_rented.week_of_rental
         |ORDER BY aw.week_beginning""".stripMargin)
  }

  /** Faithful O(weeks × rentals) shape of reference_query.sql:40-49 for
    * cross-checking: non-equi join spine × rental, conditional count. */
  def snapshotNestedLoop(rental: DataFrame, asOf: LocalDate): DataFrame = {
    val r = rental.select(
      col("rental_id"),
      to_date(col("rental_date")).as("rd"),
      to_date(col("return_date")).as("ret"))

    val spine = weekSpine(rental, asOf)
    val e = weekEnd(col("week_beginning"))
    val outstanding = broadcast(spine)
      .join(r, col("rd") <= e && (col("ret").isNull || col("ret") > e), "left")
      .groupBy(col("week_beginning"))
      .agg(count(col("rental_id")).as("outstanding_rentals_at_week_end"))

    val rented = r
      .groupBy(weekStart(col("rd")).as("week_beginning"))
      .agg(count(col("rental_id")).as("n_rented"))
    val returned = r
      .filter(col("ret").isNotNull)
      .groupBy(weekStart(col("ret")).as("week_beginning"))
      .agg(count(col("rental_id")).as("n_returned"))

    val nRented = coalesce(col("n_rented"), lit(0L))
    val nReturned = coalesce(col("n_returned"), lit(0L))
    spine
      .join(broadcast(rented), Seq("week_beginning"), "left")
      .join(broadcast(returned), Seq("week_beginning"), "left")
      .join(broadcast(outstanding), Seq("week_beginning"), "left")
      .select(
        col("week_beginning"),
        nRented.as("newly_rented_during_week"),
        nReturned.as("returned_rentals_during_week"),
        (nRented - nReturned).as("net_change_in_outstanding"),
        coalesce(col("outstanding_rentals_at_week_end"), lit(0L))
          .as("outstanding_rentals_at_week_end"))
      .orderBy("week_beginning")
  }
}
