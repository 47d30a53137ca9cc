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
}
