package graft

import java.sql.Timestamp
import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{ReferenceOps, WeeklySummary}

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

  /** Fixed CDC window for the delta-operator queries (F1): the data's
    * `last_update` spans 1995..2001-11. */
  val DeltaFrom: Timestamp = Timestamp.valueOf("1999-01-01 00:00:00")
  val DeltaTo: Timestamp = Timestamp.valueOf("2000-01-01 00:00:00")

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

  /** Snapshot weekly-summary CTE chain over source CTE `src`, names
    * prefixed with `p`; returns (cteText, finalCteName). Mirrors
    * reference_query.sql:1-57 with the deterministic as-of date. */
  private def snapshotCtes(src: String, p: String): (String, String) = (
    s"""${p}date_range AS (
       |  SELECT MIN(rental_date)::date AS min_date,
       |         MAX(CASE WHEN return_date IS NOT NULL THEN return_date::date
       |             ELSE GREATEST(rental_date::date, DATE '2002-01-01') END) AS max_date
       |  FROM $src),
       |${p}all_weeks AS (
       |  SELECT UNNEST(GENERATE_SERIES(
       |    DATE_TRUNC('week', (SELECT min_date FROM ${p}date_range)),
       |    DATE_TRUNC('week', (SELECT max_date FROM ${p}date_range)),
       |    INTERVAL 7 DAY))::date AS week_beginning),
       |${p}ret_counts AS (
       |  SELECT DATE_TRUNC('week', return_date)::date AS wk, COUNT(rental_id) AS n
       |  FROM $src WHERE return_date IS NOT NULL GROUP BY 1),
       |${p}rent_counts AS (
       |  SELECT DATE_TRUNC('week', rental_date)::date AS wk, COUNT(rental_id) AS n
       |  FROM $src GROUP BY 1),
       |${p}summary AS (
       |  SELECT aw.week_beginning,
       |    COALESCE(rc.n, 0) AS newly_rented_during_week,
       |    COALESCE(retc.n, 0) AS returned_rentals_during_week,
       |    COALESCE(rc.n, 0) - COALESCE(retc.n, 0) AS net_change_in_outstanding,
       |    (SELECT COUNT(r_inv.rental_id) FROM $src r_inv
       |     WHERE r_inv.rental_date::date <= aw.week_beginning + 6
       |       AND (r_inv.return_date IS NULL OR r_inv.return_date::date > aw.week_beginning + 6)
       |    ) AS outstanding_rentals_at_week_end
       |  FROM ${p}all_weeks aw
       |  LEFT JOIN ${p}ret_counts retc ON aw.week_beginning = retc.wk
       |  LEFT JOIN ${p}rent_counts rc ON aw.week_beginning = rc.wk)""".stripMargin,
    s"${p}summary")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    WeeklySummary.snapshot(Tables.rental(spark, "/root/testdata/sf0.001"), AsOf)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "weekly_summary" -> ((s, dir) =>
      WeeklySummary.snapshot(Tables.rental(s, dir), AsOf)),
    "weekly_summary_nl" -> ((s, dir) =>
      WeeklySummary.snapshotNestedLoop(Tables.rental(s, dir), AsOf)),
    "delta_extract" -> ((s, dir) =>
      ReferenceOps.deltaExtract(Tables.rental(s, dir), DeltaFrom, DeltaTo)),
    "watermark_probes" -> ((s, dir) =>
      ReferenceOps.watermarkProbes(Tables.rental(s, dir))),
    "affected_weeks" -> ((s, dir) =>
      ReferenceOps.affectedWeeks(Tables.rental(s, dir), DeltaFrom, DeltaTo)),
    "first_rental" -> ((s, dir) =>
      ReferenceOps.firstRental(Tables.rental(s, dir))),
    "upsert_round" -> ((s, dir) =>
      ReferenceOps.upsertRound(Tables.rental(s, dir), DeltaFrom, AsOf)),
  )

  private val weeklySummaryOracle: String = {
    val (ctes, fin) = snapshotCtes("rental", "")
    s"WITH $rentalCte,\n$ctes\nSELECT * FROM $fin ORDER BY week_beginning"
  }

  private val upsertRoundOracle: String = {
    val (oldCtes, oldFin) = snapshotCtes("old_src", "old_")
    s"""WITH $rentalCte,
       |old_src AS (SELECT * FROM rental WHERE last_update <= TIMESTAMP '1999-01-01 00:00:00'),
       |$oldCtes,
       |delta AS (SELECT * FROM rental WHERE last_update > TIMESTAMP '1999-01-01 00:00:00'),
       |affected AS (
       |  SELECT DISTINCT DATE_TRUNC('week', rental_date)::date AS week_beginning FROM delta
       |  UNION
       |  SELECT DISTINCT DATE_TRUNC('week', return_date)::date FROM delta WHERE return_date IS NOT NULL),
       |new_base AS (
       |  SELECT a.week_beginning,
       |    (SELECT COUNT(*) FROM rental r
       |     WHERE DATE_TRUNC('week', r.rental_date)::date = a.week_beginning) AS newly_rented_during_week,
       |    (SELECT COUNT(*) FROM rental r
       |     WHERE r.return_date IS NOT NULL
       |       AND DATE_TRUNC('week', r.return_date)::date = a.week_beginning) AS returned_rentals_during_week,
       |    (SELECT COUNT(*) FROM rental r
       |     WHERE r.rental_date::date <= a.week_beginning + 6
       |       AND (r.return_date IS NULL OR r.return_date::date > a.week_beginning + 6)) AS outstanding_rentals_at_week_end
       |  FROM affected a),
       |new_rows AS (
       |  SELECT week_beginning, newly_rented_during_week, returned_rentals_during_week,
       |         newly_rented_during_week - returned_rentals_during_week AS net_change_in_outstanding,
       |         outstanding_rentals_at_week_end
       |  FROM new_base)
       |SELECT week_beginning, newly_rented_during_week, returned_rentals_during_week,
       |       net_change_in_outstanding, outstanding_rentals_at_week_end FROM new_rows
       |UNION ALL
       |SELECT o.week_beginning, o.newly_rented_during_week, o.returned_rentals_during_week,
       |       o.net_change_in_outstanding, o.outstanding_rentals_at_week_end FROM $oldFin o
       |WHERE o.week_beginning NOT IN (SELECT week_beginning FROM affected)
       |ORDER BY week_beginning""".stripMargin
  }

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "weekly_summary" -> weeklySummaryOracle,
    "weekly_summary_nl" -> weeklySummaryOracle,
    "delta_extract" ->
      s"""WITH $rentalCte
         |SELECT rental_id, rental_date, return_date, last_update FROM rental
         |WHERE last_update > TIMESTAMP '1999-01-01 00:00:00'
         |  AND last_update <= TIMESTAMP '2000-01-01 00:00:00'""".stripMargin,
    "watermark_probes" ->
      s"""WITH $rentalCte
         |SELECT MAX(last_update) AS max_last_update,
         |       MAX(GREATEST(rental_date, COALESCE(return_date, rental_date))) AS max_activity_date,
         |       MIN(GREATEST(rental_date, COALESCE(return_date, rental_date))) AS min_activity_date,
         |       DATE_TRUNC('week', MAX(GREATEST(rental_date, COALESCE(return_date, rental_date))))::date AS max_activity_week,
         |       DATE_TRUNC('week', MIN(GREATEST(rental_date, COALESCE(return_date, rental_date))))::date AS min_activity_week,
         |       COUNT(*) AS n_rentals
         |FROM rental""".stripMargin,
    "affected_weeks" ->
      s"""WITH $rentalCte,
         |delta AS (
         |  SELECT * FROM rental
         |  WHERE last_update > TIMESTAMP '1999-01-01 00:00:00'
         |    AND last_update <= TIMESTAMP '2000-01-01 00:00:00')
         |SELECT DISTINCT DATE_TRUNC('week', rental_date)::date AS week_beginning FROM delta
         |UNION
         |SELECT DISTINCT DATE_TRUNC('week', return_date)::date FROM delta
         |WHERE return_date IS NOT NULL
         |ORDER BY week_beginning""".stripMargin,
    "first_rental" ->
      s"""WITH $rentalCte
         |SELECT rental_id, rental_date, return_date, last_update FROM rental
         |ORDER BY rental_id LIMIT 1""".stripMargin,
    "upsert_round" -> upsertRoundOracle,
  )
}
