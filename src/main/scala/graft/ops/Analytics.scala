package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** TPC-H-shaped analytical queries over the harness star schema — the
  * engine's general-purpose scan/join/aggregate surface and the bench
  * workload. Shapes: wide-scan aggregation, multi-way star join with
  * broadcast dims, semi-join decorrelation, grouped top-k.
  *
  * All money aggregates run through DECIMAL(18,2) (exact and
  * order-independent, so distributed partial aggregation cannot change
  * the result) and surface as doubles; averages are exact-sum/count
  * rounded to 6dp.
  */
object Analytics {

  private def dec(c: String) = col(c).cast("decimal(18,2)")

  /** Q1-shape pricing summary: one wide scan of lineitem, hash agg on
    * two low-cardinality keys. Filter + column pruning reach the parquet
    * scan; partial aggregation collapses everything map-side. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum((dec("l_extendedprice") * (lit(1) - dec("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("sum_disc_price"),
        round(sum(dec("l_quantity")).cast("double") / count(lit(1)), 6).as("avg_qty"),
        round(sum(dec("l_extendedprice")).cast("double") / count(lit(1)), 6).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Q5-shape revenue by nation for one region: star join where every
    * dimension side (region → nation → customer-keys) is broadcast; the
    * only shuffles are the orders⋈lineitem equi-join and the final
    * nation-grain aggregation. */
  def revenueByNation(spark: SparkSession, dir: String, region: String = "ASIA"): DataFrame = {
    val nations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    val revenue = (dec("l_extendedprice") * (lit(1) - dec("l_discount"))).cast("decimal(18,4)")
    Tables.orders(spark, dir)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("n_name"))
      .agg(sum(revenue).cast("double").as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Q3/Q10-shape top customers by revenue: join + agg + deterministic
    * top-k (rank on 2dp-exact revenue, id tiebreak). */
  def topCustomers(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val revenue = (dec("l_extendedprice") * (lit(1) - dec("l_discount"))).cast("decimal(18,4)")
    val perCust = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(revenue).cast("double").as("revenue"), count(lit(1)).as("n_items"))
    perCust
      .join(broadcast(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("revenue"), col("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(k)
  }

  /** Q4-shape: orders having ≥1 lineitem shipped after order date —
    * EXISTS as ONE left-semi join carrying the non-equi conjunct in the
    * join condition (no decorrelation, no intermediate distinct: the
    * semi join short-circuits per order key, so the "≥1" semantics come
    * free), counted per priority. */
  def latePriorityCounts(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.join(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_shipdate")),
        o("o_orderkey") === col("l_orderkey") && col("l_shipdate") > o("o_orderdate"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** Q16-shape: distinct suppliers per (brand, type-prefix) — distinct
    * aggregation over a two-fact join with a broadcast part side. */
  def supplierDiversity(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_brand"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(countDistinct(col("l_suppkey")).as("n_suppliers"),
        count(lit(1)).as("n_lineitems"))
      .orderBy(col("p_brand"))

  /** Window-rank per group over a join: top part by revenue within each
    * brand (dense grouped top-1 via row_number). */
  def topPartPerBrand(spark: SparkSession, dir: String): DataFrame = {
    val revenue = (dec("l_extendedprice") * (lit(1) - dec("l_discount"))).cast("decimal(18,4)")
    val perPart = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(revenue).cast("double").as("revenue"))
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("revenue").desc, col("p_partkey"))
    perPart
      .join(broadcast(Tables.part(spark, dir).select("p_partkey", "p_brand", "p_name")),
        col("l_partkey") === col("p_partkey"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("p_brand"), col("p_partkey"), col("p_name"), col("revenue"))
      .orderBy(col("p_brand"))
  }

  /** Calendar reconciliation across UNRELATED fact tables (orders span
    * 1995–2001, events 2024): per-day totals FULL OUTER joined, so each
    * side's unmatched days surface with a zero for the other — the join
    * type the rest of the surface (inner/left/semi/anti/as-of/range)
    * doesn't exercise. Both sides pre-aggregate to day grain before the
    * join: the full-outer shuffle moves two day-cardinality frames, not
    * facts. */
  def activityCalendar(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n_orders"))
    val e = Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("n_events"))
    o.join(e, Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }
}
