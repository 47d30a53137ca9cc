package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DoubleType, TimestampType}

/** Column-level data-quality profiling (deequ/Great-Expectations shape):
  * per column, row count, null count, exact distinct count, and min/max —
  * the validation pass an ETL pipeline runs against a landed table before
  * trusting it (the reference trusts its source blindly; this is the
  * guard it lacks).
  */
object Profile {

  /** One profile row per requested column: a UNION of per-column
    * single-distinct aggregates, one pruned scan each.
    *
    * Deliberately NOT the one-scan multi-`countDistinct` form: Catalyst
    * plans N distinct aggregates in one `agg` as an Expand (row count
    * ×(N+1)), and the string min/max buffers force that whole expanded
    * stream through SortAggregate — two wide sorts of N× the input. The
    * union form scans the parquet N times but each scan PRUNES to its
    * single column (same total bytes read from columnar storage as the
    * one full-width scan), each distinct is a two-phase hash aggregate,
    * and nothing ever sorts. The N subplans are independent stages —
    * they also parallelize across the cluster rather than serializing
    * into one stage's sort. Measured on orders sf0.1: 4.8 s → 2.2 s vs
    * the Expand form (the remainder is per-subplan codegen, not data —
    * the gap widens with input size).
    *
    * min/max compute on the TYPED column (lexicographic string min would
    * order "100" < "99"), then canonicalize to strings so one schema fits
    * every column: dates/timestamps render ISO, doubles through
    * DECIMAL(18,2) (both engines print decimals identically; raw
    * double→string flips to scientific notation at different thresholds).
    */
  /** Deequ-style verification suite over the order pipeline: named
    * checks → (check, metric, passed) rows, the gate an ingest runs
    * before publishing a partition.
    *
    * Scale shape: all single-table checks (row count, completeness,
    * key uniqueness, value range, domain membership) fuse into ONE
    * aggregation pass over orders — countDistinct rides the same agg
    * (one Expand of ×2, no string min/max so it stays a hash
    * aggregate). Referential checks are LEFT ANTI key-only joins (the
    * orphan side prunes to the key column). The three 1-row results
    * meet in broadcast cross joins; the per-check reshape is a
    * row-local explode of a 7-struct literal array. Nothing here is
    * proportional to anything but the two fact scans. */
  private def check(name: String, metric: Column, passed: Column) =
    struct(lit(name).as("check"), metric.cast(DoubleType).as("metric"),
      passed.as("passed"))

  /** DQ gate for the incremental pipeline's rental change log — run by
    * IncrementalRun BEFORE any state mutation (`SPARK_GRAFT_DQ_GATE=
    * warn|fail|off`). One aggregation pass, no joins.
    *
    * Two check tiers, split by what the PIPELINE depends on:
    * `required = true` — row count and identity/date completeness (join
    * keys, week truncation, watermark column); a failure here would
    * corrupt state, so fail-mode aborts on it. `required = false` —
    * interval sanity (return/update before the rental): real upstream
    * data genuinely contains these (92 early returns at sf0.001 in this
    * very testdata — discovered BY this check), the pipeline is
    * indifferent to them, and a gate that can't pass real data trains
    * operators to turn it off. They report, they don't block. */
  def rentalDqChecks(rental: DataFrame): DataFrame =
    rental.agg(
      count(lit(1)).as("n"),
      count(col("rental_id")).as("n_id"),
      count(col("rental_date")).as("n_rd"),
      count(col("last_update")).as("n_lu"),
      sum(when(col("return_date") < col("rental_date"), 1L).otherwise(0L))
        .as("neg_dur"),
      sum(when(col("last_update") < col("rental_date"), 1L).otherwise(0L))
        .as("early_lu"))
      .select(explode(array(
        tiered("row_count", col("n"), col("n") > 0, required = true),
        tiered("completeness_rental_id",
          round(col("n_id").cast(DoubleType) / col("n"), 6), col("n_id") === col("n"),
          required = true),
        tiered("completeness_rental_date",
          round(col("n_rd").cast(DoubleType) / col("n"), 6), col("n_rd") === col("n"),
          required = true),
        tiered("completeness_last_update",
          round(col("n_lu").cast(DoubleType) / col("n"), 6), col("n_lu") === col("n"),
          required = true),
        tiered("return_not_before_rental", col("neg_dur"), col("neg_dur") === 0,
          required = false),
        tiered("update_not_before_rental", col("early_lu"), col("early_lu") === 0,
          required = false)
      )).as("c"))
      .select(col("c.check").as("check"), col("c.metric").as("metric"),
        col("c.passed").as("passed"), col("c.required").as("required"))

  private def tiered(name: String, metric: Column, passed: Column,
      required: Boolean) =
    struct(lit(name).as("check"), metric.cast(DoubleType).as("metric"),
      passed.as("passed"), lit(required).as("required"))

  def dqChecks(orders: DataFrame, lineitem: DataFrame, customer: DataFrame): DataFrame = {
    val base = orders.agg(
      count(lit(1)).as("n"),
      count(col("o_custkey")).as("n_cust"),
      countDistinct(col("o_orderkey")).as("n_key"),
      min(col("o_totalprice")).as("min_price"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
        .as("bad_status"))
    // null FKs are a COMPLETENESS failure, not a referential one (SQL FK
    // semantics: a null reference references nothing) — filter them out
    // so the two checks stay independent signals
    val orphOrders = orders.select(col("o_custkey"))
      .filter(col("o_custkey").isNotNull)
      .join(customer.select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("orph_orders"))
    val orphLines = lineitem.select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("orph_lines"))
    base.crossJoin(broadcast(orphOrders)).crossJoin(broadcast(orphLines))
      .select(explode(array(
        check("row_count", col("n"), col("n") > 0),
        check("completeness_o_custkey",
          round(col("n_cust").cast(DoubleType) / col("n"), 6),
          col("n_cust") === col("n")),
        check("uniqueness_o_orderkey",
          round(col("n_key").cast(DoubleType) / col("n"), 6),
          col("n_key") === col("n")),
        check("min_totalprice_positive", col("min_price"), col("min_price") > 0),
        check("status_in_domain", col("bad_status"), col("bad_status") === 0),
        check("fk_orders_customer", col("orph_orders"), col("orph_orders") === 0),
        check("fk_lineitem_orders", col("orph_lines"), col("orph_lines") === 0)
      )).as("c"))
      .select(col("c.check").as("check"), col("c.metric").as("metric"),
        col("c.passed").as("passed"))
  }

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    def canon(e: Column, c: String) = df.schema(c).dataType match {
      case DoubleType => e.cast("decimal(18,2)").cast("string")
      case TimestampType | DateType => e.cast("string")
      case _ => e.cast("string")
    }
    cols.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        sum(col(c).isNull.cast("long")).as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        canon(min(col(c)), c).as("min_str"),
        canon(max(col(c)), c).as("max_str"))
        .select(lit(c).as("column"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_str"), col("max_str"))
    }.reduce(_ unionAll _)
  }
}
