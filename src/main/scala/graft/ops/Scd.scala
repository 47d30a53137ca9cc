package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) history build — the dimension-side
  * counterpart of the reference's keyed fact upsert (SURVEY.md S5/J4,
  * `etl_script_incremental_pandas.py` merge step): instead of replacing a
  * row in place, every attribute change opens a new version row with a
  * half-open `[effective_from, effective_to)` validity interval, the
  * standard Kimball SCD-2 contract.
  */
object Scd {

  /** Collapse a change log into SCD-2 version rows.
    *
    * One shuffle on `key`; the change-detection lag, the version
    * row_number, and the interval lead all share the same
    * (`key` × (`orderCol`, `tieBreak`)) sort, so Catalyst plans a single
    * exchange. Rows where no tracked attribute changed (vs the previous
    * row in order) are dropped BEFORE the numbering windows, so the
    * window over versions sorts |changes|, not |log|.
    *
    * @param tracked  attribute columns whose change opens a new version;
    *                 compared null-safely as a struct (`<=>`), so
    *                 null→value and value→null transitions both count
    * @param tieBreak unique column making the per-key order total —
    *                 without it two same-instant rows would make version
    *                 assignment nondeterministic
    * @return input columns + `effective_from` (= `orderCol` of the change
    *         row), `effective_to` (next change's `effective_from`; null =
    *         open), `version` (1-based per key), `is_current` (0/1)
    */
  def scd2(
      log: DataFrame,
      key: String,
      orderCol: String,
      tieBreak: String,
      tracked: Seq[String]): DataFrame = {
    require(tracked.nonEmpty, "tracked attribute columns must be non-empty")
    val w = Window.partitionBy(col(key)).orderBy(col(orderCol), col(tieBreak))
    val attrs = struct(tracked.map(col): _*)
    val changes = log
      // first row per key: lag is null, struct <=> null is false ⇒ a
      // key's first observation always opens version 1
      .withColumn("__chg", !(attrs <=> lag(attrs, 1).over(w)))
      .filter(col("__chg"))
      .drop("__chg")
    changes
      .withColumn("effective_from", col(orderCol))
      .withColumn("effective_to", lead(col(orderCol), 1).over(w))
      .withColumn("version", row_number().over(w).cast("int"))
      .withColumn("is_current", col("effective_to").isNull.cast("int"))
  }

  /** Interval analytics over the [[scd2]] history: per key, how many
    * versions, how long they last on average, and the age of the current
    * one — the dimension-churn report a warehouse runs on its SCD2
    * tables. Closed-version durations only for the average (the open
    * version has no end); current age measures against the deterministic
    * as-of date. One key-grouped aggregation over the version rows. */
  def versionDurations(versions: DataFrame, key: String,
      asOf: java.time.LocalDate): DataFrame =
    versions
      .groupBy(col(key))
      .agg(
        count(lit(1)).as("n_versions"),
        round(avg(when(col("effective_to").isNotNull,
          datediff(col("effective_to"), col("effective_from")))), 6)
          .as("avg_version_days"),
        max(when(col("is_current") === 1,
          datediff(lit(java.sql.Date.valueOf(asOf)), col("effective_from"))))
          .as("current_age_days"))

  /** Point-in-time dimension lookup: enrich each fact row with the
    * dimension version that was valid at the fact's timestamp — the
    * Kimball PIT join every SCD-2 warehouse runs, here planned as the
    * custom physical as-of join ([[AsOfJoin.asOfExec]]): one shuffle +
    * sort per side, O(1) merge state, NO interval explosion and no
    * per-fact interval scan.
    *
    * Several versions can open at the same `effective_from` instant
    * (ties on the change log's orderCol — 16 keys at sf0.01, 177 at
    * sf0.1); "the state at t" is only well-defined per instant, so the
    * lookup first collapses to the LAST version per (key, instant)
    * (end-of-instant state, the half-open-interval reading). Without
    * the collapse the as-of tie-break would be engine-dependent.
    *
    * @param versions [[scd2]] output (or any frame with `key`,
    *                 `effective_from`, `version`, and `dimCols`)
    * @return facts + `asof_<c>` for each dimension column; facts before
    *         a key's first version (or with an unknown key) keep nulls */
  def pitEnrich(
      facts: DataFrame,
      versions: DataFrame,
      key: String,
      factTs: String,
      dimCols: Seq[String]): DataFrame = {
    val wd = Window.partitionBy(col(key), col("effective_from"))
      .orderBy(col("version").desc)
    val eod = versions
      .withColumn("__rn", row_number().over(wd)).filter(col("__rn") === 1)
      .select((key +: "effective_from" +: dimCols).map(col): _*)
    AsOfJoin.asOfExec(facts, eod, key, factTs, "effective_from", dimCols)
  }
}
