package graft

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.WeeklySummary

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers here as a named
  * query; `oracleSql` carries the DuckDB-equivalent ANSI SQL over the same
  * parquet tables (bare table names; the driver mounts them as views).
  * Column names/aliases must match between the two sides — the driver's
  * compare sorts columns by name before hashing.
  */
object SparkEntry {

  /** Deterministic stand-in for the reference's `CURRENT_DATE`
    * (reference_query.sql:7) — beyond the data's date range, so the week
    * spine extends past the last open rental exactly as the reference's
    * snapshot does, but reproducibly (SURVEY.md F9 determinism hazard). */
  val AsOf: LocalDate = LocalDate.parse("2002-01-01")

  /** The rental-shaped view over the harness tables, as DuckDB SQL —
    * definition identical to [[Tables.rental]] (see its doc; FIXTURES.md §C). */
  val rentalCte: String =
    """rental AS (
      |  SELECT o.o_orderkey AS rental_id,
      |         o.o_orderdate AS rental_date,
      |         CASE WHEN o.o_orderstatus = 'F' THEN m.max_ship END AS return_date,
      |         GREATEST(o.o_orderdate,
      |                  COALESCE(CASE WHEN o.o_orderstatus = 'F' THEN m.max_ship END,
      |                           o.o_orderdate)) AS last_update
      |  FROM orders o
      |  LEFT JOIN (SELECT l_orderkey, MAX(l_shipdate) AS max_ship
      |             FROM lineitem GROUP BY l_orderkey) m
      |    ON o.o_orderkey = m.l_orderkey
      |)""".stripMargin

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    WeeklySummary.snapshot(Tables.rental(spark, "/root/testdata/sf0.001"), AsOf)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "weekly_summary" -> ((s, dir) =>
      WeeklySummary.snapshot(Tables.rental(s, dir), AsOf)),
    "weekly_summary_nl" -> ((s, dir) =>
      WeeklySummary.snapshotNestedLoop(Tables.rental(s, dir), AsOf)),
  )

  private val weeklySummaryOracle: String =
    s"""WITH $rentalCte,
       |date_range AS (
       |  SELECT MIN(rental_date)::date AS min_date,
       |         MAX(CASE WHEN return_date IS NOT NULL THEN return_date::date
       |             ELSE GREATEST(rental_date::date, DATE '2002-01-01') END) AS max_date
       |  FROM rental
       |),
       |all_weeks AS (
       |  SELECT UNNEST(GENERATE_SERIES(
       |    DATE_TRUNC('week', (SELECT min_date FROM date_range)),
       |    DATE_TRUNC('week', (SELECT max_date FROM date_range)),
       |    INTERVAL 7 DAY))::date AS week_beginning
       |),
       |weekly_returned_counts AS (
       |  SELECT DATE_TRUNC('week', return_date)::date AS week_of_return,
       |         COUNT(rental_id) AS num_returned
       |  FROM rental WHERE return_date IS NOT NULL GROUP BY 1
       |),
       |weekly_rented_counts AS (
       |  SELECT DATE_TRUNC('week', rental_date)::date AS week_of_rental,
       |         COUNT(rental_id) AS num_rented
       |  FROM rental GROUP BY 1
       |)
       |SELECT aw.week_beginning,
       |  COALESCE(wr.num_rented, 0) AS newly_rented_during_week,
       |  COALESCE(wret.num_returned, 0) AS returned_rentals_during_week,
       |  (COALESCE(wr.num_rented, 0) - COALESCE(wret.num_returned, 0)) AS net_change_in_outstanding,
       |  (SELECT COUNT(r_inv.rental_id) FROM rental r_inv
       |   WHERE r_inv.rental_date::date <= aw.week_beginning + 6
       |     AND (r_inv.return_date IS NULL OR r_inv.return_date::date > aw.week_beginning + 6)
       |  ) AS outstanding_rentals_at_week_end
       |FROM all_weeks aw
       |LEFT JOIN weekly_returned_counts wret ON aw.week_beginning = wret.week_of_return
       |LEFT JOIN weekly_rented_counts wr ON aw.week_beginning = wr.week_of_rental
       |ORDER BY aw.week_beginning""".stripMargin

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "weekly_summary" -> weeklySummaryOracle,
    "weekly_summary_nl" -> weeklySummaryOracle,
  )
}
