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
      // part scales with SF (200k × SF) — no broadcast hint; stats/AQE
      // pick broadcast while it fits and fall back to shuffle at scale
      .join(Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_brand"), col("p_type")),
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
      // part is SF-scaled: unhinted, stats/AQE decide (policy as above)
      .join(Tables.part(spark, dir).select("p_partkey", "p_brand", "p_name"),
        col("l_partkey") === col("p_partkey"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("p_brand"), col("p_partkey"), col("p_name"), col("revenue"))
      .orderBy(col("p_brand"))
  }

  /** Q13-shape customer order-count distribution: LEFT OUTER join keeps
    * zero-order customers (their `o_orderkey` stays null, and
    * `count(col)` skips nulls — the exact COUNT(column) semantics), then
    * a second aggregation over the per-customer counts. Both
    * aggregations partial-combine map-side; the join shuffles on the
    * customer key once and the second groupBy reduces a
    * customer-cardinality frame, never facts. */
  def customerOrderDistribution(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_custkey"))
      .join(Tables.orders(spark, dir).select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_orders"))

  /** Q14-shape promo revenue share per ship month: conditional
    * aggregation (`sum(when(...))`) over a fact⋈broadcast-dim join — one
    * scan, one shuffle at month grain. The share divides two doubles
    * derived from exact DECIMAL sums, so partial-aggregation order can
    * never change the 6dp-rounded result. */
  def promoRevenueShare(spark: SparkSession, dir: String): DataFrame = {
    val revenue = (dec("l_extendedprice") * (lit(1) - dec("l_discount"))).cast("decimal(18,4)")
    Tables.lineitem(spark, dir)
      // part is SF-scaled: unhinted, stats/AQE decide (policy as above)
      .join(Tables.part(spark, dir).select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(date_trunc("month", col("l_shipdate")).cast("date").as("ship_month"))
      .agg(
        sum(when(col("p_type") === "PROMO", revenue)
          .otherwise(lit(0).cast("decimal(18,4)"))).cast("double").as("promo_revenue"),
        sum(revenue).cast("double").as("total_revenue"))
      .select(col("ship_month"), col("promo_revenue"), col("total_revenue"),
        round(col("promo_revenue") / col("total_revenue"), 6).as("promo_share"))
      .orderBy(col("ship_month"))
  }

  /** Q18-shape large-volume orders: grouped HAVING over lineitem (the
    * "IN (GROUP BY … HAVING)" subquery, decorrelated by construction),
    * joined back to orders + broadcast customer. The having-filter runs
    * at order grain BEFORE either join, so only qualifying keys shuffle
    * further; top-20 via deterministic (qty desc, orderkey) TakeOrdered
    * — no global sort materializes. */
  def bigOrders(spark: SparkSession, dir: String, minQty: Double = 250.0,
      k: Int = 20): DataFrame = {
    val qty = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec("l_quantity")).cast("double").as("total_qty"))
      .filter(col("total_qty") > minQty)
    Tables.orders(spark, dir)
      .join(qty, col("o_orderkey") === col("l_orderkey"))
      // no broadcast hint on customer: it is FACT-sized (scales with the
      // corpus), and the having-filtered join output here is tiny — let
      // stats/AQE pick the build side
      .join(Tables.customer(spark, dir).select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("o_orderdate"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(k)
  }

  /** Q22-shape dormant high-value customers: global-average scalar
    * subquery (one tiny agg, broadcast as a 1-row cross join) + LEFT
    * ANTI join against the year's active customer keys. The anti join's
    * build side is order keys only; the average rides an exact DECIMAL
    * sum so the `>` cut is engine-portable. */
  def dormantHighValue(spark: SparkSession, dir: String, yr: Int = 1998): DataFrame = {
    val c = Tables.customer(spark, dir)
    val avgBal = c.agg(
      (sum(dec("c_acctbal")).cast("double") / count(lit(1))).as("avg_bal"))
    val active = Tables.orders(spark, dir)
      .filter(year(col("o_orderdate")) === yr)
      .select(col("o_custkey"))
    c.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(active, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_dormant"),
        sum(dec("c_acctbal")).cast("double").as("total_balance"))
      .orderBy(col("c_mktsegment"))
  }

  /** Q19-shape disjunctive join: revenue over lineitem⋈part where the
    * OR-of-conjuncts predicate mixes both sides. The partkey equi-key is
    * kept OUT of the disjunction so Catalyst still plans a (broadcast)
    * HASH join — the disjunction evaluates as a post-join filter instead
    * of degrading the whole join to nested-loop. */
  def disjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val revenue = (dec("l_extendedprice") * (lit(1) - dec("l_discount"))).cast("decimal(18,4)")
    val qualifies =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 20)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 30) &&
        col("l_quantity").between(10, 30)) ||
      (col("p_brand") === "Brand#34" && col("p_size").between(1, 50) &&
        col("l_quantity").between(20, 40))
    Tables.lineitem(spark, dir)
      // part is SF-scaled: unhinted, stats/AQE decide (policy as above)
      .join(Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_brand"), col("p_size")),
        col("l_partkey") === col("p_partkey"))
      .filter(qualifies)
      .groupBy(col("p_brand"))
      .agg(sum(revenue).cast("double").as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("p_brand"))
  }

  /** Q15-shape top supplier(s): per-supplier revenue in a ship-date
    * window, kept where revenue equals the global max — the scalar-max
    * subquery as a 1-row broadcast cross join. Revenue values on both
    * sides derive from the same exact DECIMAL sum, so the `===` equality
    * is well-defined (no floating-point drift between the two plans). */
  def topSuppliers(spark: SparkSession, dir: String,
      from: String = "1996-01-01", until: String = "1996-04-01"): DataFrame = {
    val revenue = (dec("l_extendedprice") * (lit(1) - dec("l_discount"))).cast("decimal(18,4)")
    val perSupp = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf(s"$from 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf(s"$until 00:00:00")))
      .groupBy(col("l_suppkey"))
      .agg(sum(revenue).cast("double").as("revenue"))
    val top = perSupp.agg(max(col("revenue")).as("max_revenue"))
    perSupp.crossJoin(broadcast(top))
      .filter(col("revenue") === col("max_revenue"))
      .join(broadcast(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** Q12-shape shipping-latency buckets: conditional aggregation of
    * ship-lag bands per order priority over the orders⋈lineitem join —
    * the CASE-pivot shape. One fact-fact equi-join shuffle, then a
    * 5-row aggregate. */
  def shipLatencyByPriority(spark: SparkSession, dir: String): DataFrame = {
    val lag = datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_shipdate")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(lag <= 30, 1).otherwise(0)).as("shipped_30d"),
        sum(when(lag > 30 && lag <= 90, 1).otherwise(0)).as("shipped_90d"),
        sum(when(lag > 90, 1).otherwise(0)).as("shipped_late"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))
  }

  /** Set-operation coverage: customers ordering in BOTH years —
    * `intersect` (set semantics, = SQL INTERSECT) of the two year-sliced
    * key sets, then a key join to the dimension for the rollup. Spark
    * plans intersect as a left-semi over distincts; both inputs are
    * key-only projections so the shuffle moves 8-byte rows. */
  def repeatCustomers(spark: SparkSession, dir: String,
      y1: Int = 1997, y2: Int = 1998): DataFrame = {
    val o = Tables.orders(spark, dir)
    def ids(y: Int) = o.filter(year(col("o_orderdate")) === y).select(col("o_custkey"))
    ids(y1).intersect(ids(y2))
      .join(Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_repeat"))
      .orderBy(col("c_mktsegment"))
  }

  /** The EXCEPT twin of [[repeatCustomers]]: customers active in `y1`
    * but gone by `y2` — churn. `except` plans as a left-anti over
    * distincts on the same key-only projections. */
  def churnedCustomers(spark: SparkSession, dir: String,
      y1: Int = 1997, y2: Int = 1998): DataFrame = {
    val o = Tables.orders(spark, dir)
    def ids(y: Int) = o.filter(year(col("o_orderdate")) === y).select(col("o_custkey"))
    ids(y1).except(ids(y2))
      .join(Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_churned"))
      .orderBy(col("c_mktsegment"))
  }

  /** Percent-of-total via a window OVER a grouped aggregate: revenue per
    * nation, then each nation's share of its region — the window runs on
    * the 25-row aggregate, never the facts. Shares divide two doubles
    * derived from one exact DECIMAL sum, so the window's evaluation
    * order can't move the 6dp round. */
  def nationRevenueShare(spark: SparkSession, dir: String): DataFrame = {
    val dims = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name"), col("r_name"))
    // dims is customer-cardinality (fact-sized at scale) — no broadcast
    // hint; the nation/region sides above ARE bounded and stay hinted
    val perNation = Tables.orders(spark, dir)
      .join(dims, col("o_custkey") === col("c_custkey"))
      .groupBy(col("r_name"), col("n_name"))
      // keep the DECIMAL through the window: a double window-sum would
      // accumulate in row order (nondeterministic across engines)
      .agg(sum(dec("o_totalprice")).as("revenue_dec"))
    val byRegion = Window.partitionBy(col("r_name"))
    perNation
      .withColumn("region_revenue", sum(col("revenue_dec")).over(byRegion))
      .select(col("r_name"), col("n_name"),
        col("revenue_dec").cast("double").as("revenue"),
        round(col("revenue_dec").cast("double")
          / col("region_revenue").cast("double"), 6).as("region_share"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Q8-shape market share: one region's share of GLOBAL revenue per
    * order year — conditional aggregation over the orders⋈customer join
    * with the bounded nation→region map broadcast (customer itself is
    * fact-sized: no hint, stats decide). Share = two doubles off one
    * exact DECIMAL sum each, so distributed partial-agg order cannot
    * move the 6dp round. */
  def marketShare(spark: SparkSession, dir: String, region: String = "ASIA"): DataFrame = {
    val nations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("r_name"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("r_name"))
    val inRegion = (col("r_name") === region).cast("int")
    Tables.orders(spark, dir)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(year(col("o_orderdate")).as("order_year"))
      .agg(
        sum((dec("o_totalprice") * inRegion).cast("decimal(18,2)"))
          .cast("double").as("region_revenue"),
        sum(dec("o_totalprice")).cast("double").as("total_revenue"))
      .select(col("order_year"), col("region_revenue"), col("total_revenue"),
        round(col("region_revenue") / col("total_revenue"), 6).as("market_share"))
      .orderBy(col("order_year"))
  }

  /** Window-frame coverage: each customer's first / second / latest
    * order via `first_value` / `nth_value` / `last_value` over an
    * EXPLICIT full-partition frame — the default frame ends at CURRENT
    * ROW, where `last_value` degenerates to the row itself (a classic
    * window bug both engines share; the explicit frame is the fix and
    * the portable form). One shuffle on the customer key; the rn=1
    * filter collapses to one row per customer without a second
    * aggregation pass. */
  def customerOrderSpan(spark: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      .withColumn("first_order", to_date(first_value(col("o_orderdate")).over(full)))
      .withColumn("second_order", to_date(nth_value(col("o_orderdate"), 2).over(full)))
      .withColumn("latest_order", to_date(last_value(col("o_orderdate")).over(full)))
      .withColumn("n_orders", count(lit(1)).over(full))
      .withColumn("rn", row_number().over(ord))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("first_order"), col("second_order"),
        col("latest_order"), col("n_orders"))
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

  /** Q2-shape cheapest supplier per part (adapted: the harness schema
    * has no partsupp, so "supply cost" is the average realized unit
    * price from lineitem). Two deliberate shape choices:
    *  - the p_size predicate SEMI-JOINS into lineitem BEFORE the
    *    aggregation — the per-part argmin is independent across parts,
    *    so filtering first is result-identical and cuts the fact agg to
    *    the qualifying ~10% (the "cut facts first" rule, pushed through
    *    an argmin);
    *  - the argmin itself is `min(struct(price, suppkey))` — a second
    *    hash aggregation (ties to the lower suppkey via the struct's
    *    lexicographic order), not a row_number window: nothing sorts,
    *    and map-side partials apply to both aggs.
    * Supplier/part joins stay unhinted (SF-scaled; stats/AQE decide). */
  def cheapestSupplier(spark: SparkSession, dir: String, maxSize: Int = 5): DataFrame = {
    val keep = Tables.part(spark, dir).filter(col("p_size") <= maxSize)
      .select(col("p_partkey"), col("p_name"))
    val unit = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_quantity"))
      .join(keep.select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg((sum(dec("l_extendedprice")).cast("double")
        / sum(dec("l_quantity")).cast("double")).as("unit_price"))
    unit
      .groupBy(col("l_partkey"))
      .agg(min(struct(col("unit_price"), col("l_suppkey"))).as("m"))
      .select(col("l_partkey"), col("m.l_suppkey").as("l_suppkey"),
        col("m.unit_price").as("unit_price"))
      .join(keep, col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"),
        round(col("unit_price"), 6).as("unit_price"))
      .orderBy(col("p_partkey"))
  }

  /** Q6-shape forecast revenue change: pure filter + 1-row aggregate.
    * Every predicate is on a base column, so the whole WHERE ships to
    * the parquet scan (PushedFilters) — the query reads only the row
    * groups whose min/max stats overlap the year. */
  def forecastRevenue(spark: SparkSession, dir: String, yr: Int = 1998): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(
        col("l_shipdate") >= lit(java.sql.Timestamp.valueOf(s"$yr-01-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf(s"${yr + 1}-01-01 00:00:00")) &&
        col("l_discount").between(0.02, 0.04) && col("l_quantity") < 24)
      .agg(sum((dec("l_extendedprice") * dec("l_discount")).cast("decimal(18,4)"))
        .cast("double").as("revenue_increase"),
        count(lit(1)).as("n_lineitems"))

  /** Q7-shape bilateral trade volume: revenue shipped from supplier
    * nation A to customer nation B (both directions) by ship year. Two
    * fact tables join on the order key; each fact side picks up its
    * nation via an SF-scaled key map (unhinted) built against the
    * bounded broadcast nation table. The pair filter runs BEFORE the
    * fact-fact join, shrinking both inputs. */
  def nationTradeVolume(spark: SparkSession, dir: String,
      nationA: String = "NATION_1", nationB: String = "NATION_2"): DataFrame = {
    val nations = Tables.nation(spark, dir)
      .filter(col("n_name").isin(nationA, nationB))
      .select(col("n_nationkey"), col("n_name"))
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val revenue = (dec("l_extendedprice") * (lit(1) - dec("l_discount"))).cast("decimal(18,4)")
    Tables.lineitem(spark, dir)
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir)
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("cust_nation")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("ship_year"))
      .agg(sum(revenue).cast("double").as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("ship_year"))
  }

  /** Q9-shape product-line profit by supplier nation and year (adapted:
    * no partsupp, so cost = 80% of the part's retail price × quantity).
    * Part filter (name pattern) cuts the fact rows before the
    * order-date join; nation map broadcast; profit is an exact DECIMAL
    * difference so partial-agg order can't move the result. */
  def productProfit(spark: SparkSession, dir: String, namePattern: String = "%red%"): DataFrame = {
    val profit = (dec("l_extendedprice") * (lit(1) - dec("l_discount")))
      .cast("decimal(18,4)")
      .minus((dec("p_retailprice") * lit(0.8).cast("decimal(18,2)") * dec("l_quantity"))
        .cast("decimal(18,4)"))
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir).filter(col("p_name").like(namePattern))
        .select(col("p_partkey"), col("p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("l_shipdate")).as("ship_year"))
      .agg(sum(profit).cast("double").as("profit"))
      .orderBy(col("nation"), col("ship_year").desc)
  }

  /** Q10-shape returned-item losses: top customers by revenue of their
    * RETURNED lineitems in one quarter. The return-flag and date
    * filters hit the scans before any join; customer is fact-sized so
    * the final name join is unhinted; TakeOrdered top-k, no global
    * sort. */
  def returnedRevenue(spark: SparkSession, dir: String,
      from: String = "2000-10-01", k: Int = 20): DataFrame = {
    val fromTs = java.sql.Timestamp.valueOf(s"$from 00:00:00")
    val untilTs = java.sql.Timestamp.valueOf(
      s"${java.time.LocalDate.parse(from).plusMonths(3)} 00:00:00")
    val revenue = (dec("l_extendedprice") * (lit(1) - dec("l_discount"))).cast("decimal(18,4)")
    Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= lit(fromTs) && col("o_orderdate") < lit(untilTs))
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(revenue).cast("double").as("revenue"), count(lit(1)).as("n_items"))
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("revenue"), col("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(k)
  }

  /** Q11-shape major parts: parts whose revenue exceeds a multiple of
    * the MEAN per-part revenue — grouped HAVING against a scalar
    * subquery. The threshold is scale-invariant (mean-relative, not a
    * fixed fraction of the grand total, which empties as the part
    * count grows with SF — a fraction-of-total band that returns rows
    * at one SF is vacuously empty at 10×). Both sides derive from ONE
    * per-part aggregate: the global (total, count) re-aggregates the
    * part-grain frame (part-cardinality math, not a second fact scan),
    * then rides a 1-row broadcast. */
  def majorParts(spark: SparkSession, dir: String, meanMultiple: Double = 1.5): DataFrame = {
    val revenue = (dec("l_extendedprice") * (lit(1) - dec("l_discount"))).cast("decimal(18,4)")
    val perPart = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(revenue).as("revenue_dec"))
      .localCheckpoint() // reused by both branches: one fact scan total
    val total = perPart.agg(sum(col("revenue_dec")).as("total_dec"),
      count(lit(1)).as("n_parts"))
    perPart.crossJoin(broadcast(total))
      .filter(col("revenue_dec").cast("double") >
        col("total_dec").cast("double") / col("n_parts") * meanMultiple)
      .select(col("l_partkey").as("p_partkey"),
        col("revenue_dec").cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("p_partkey"))
  }

  /** Q17-shape small-quantity revenue: lineitems of one brand whose
    * quantity is under half the part's average quantity — the classic
    * correlated-average filter, decorrelated into a part-grain
    * aggregate joined back on the part key (both sides shuffle on
    * l_partkey, co-partitioned). */
  def smallQtyRevenue(spark: SparkSession, dir: String, brand: String = "Brand#23"): DataFrame = {
    val perPartAvg = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg((sum(dec("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"))
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir).filter(col("p_brand") === brand)
        .select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(perPartAvg, Seq("l_partkey"))
      .filter(col("l_quantity") < col("avg_qty") * 0.5)
      .agg(round(sum(dec("l_extendedprice")).cast("double") / 7.0, 6).as("avg_weekly"),
        count(lit(1)).as("n_lineitems"))
  }

  /** Q20-shape dominant suppliers: suppliers shipping more than
    * `fairShareMultiple` × the FAIR share (part total / suppliers on
    * the part) of some qualifying part's volume — nested aggregate
    * ((part,supplier) grain vs part grain) with the part total AND
    * supplier count joined back on the part key, then a distinct
    * semi-join into supplier. Fair-share-relative rather than a fixed
    * absolute share: with ~30 suppliers per part, no supplier ever
    * clears an absolute 30% bar at any SF (vacuously empty), while
    * "ships 2.5× its fair share" selects genuine concentration at
    * every scale. The comparison is two exact DECIMAL sums cast to
    * double. */
  def dominantSuppliers(spark: SparkSession, dir: String,
      fairShareMultiple: Double = 2.5, maxSize: Int = 10): DataFrame = {
    val qualifying = Tables.part(spark, dir)
      .filter(col("p_size") <= maxSize).select(col("p_partkey"))
    val shipped = Tables.lineitem(spark, dir)
      .join(qualifying, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(dec("l_quantity")).as("supp_qty_dec"))
    val partTotal = shipped.groupBy(col("l_partkey"))
      .agg(sum(col("supp_qty_dec")).as("part_qty_dec"),
        count(lit(1)).as("n_supps"))
    val dominant = shipped.join(partTotal, Seq("l_partkey"))
      .filter(col("supp_qty_dec").cast("double") >
        col("part_qty_dec").cast("double") / col("n_supps") * fairShareMultiple)
      .select(col("l_suppkey")).distinct()
    Tables.supplier(spark, dir)
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  /** Q21-shape sole late suppliers (adapted: the schema has no
    * commit/receipt dates, so "late" = shipped more than `lateDays`
    * after the order date): suppliers who were the ONLY late supplier
    * on a multi-supplier order. The exists/not-exists double
    * correlation decorrelates into ONE (order,supplier)-grain aggregate
    * plus order-partitioned window counts — no self-joins of lineitem.
    * The window's exchange moves only the aggregated
    * (order,supplier)-grain rows (map-side combine already collapsed
    * the facts), which is strictly less data motion than forcing a
    * single order-key shuffle of the raw join output. */
  def soleLateSuppliers(spark: SparkSession, dir: String,
      lateDays: Int = 100, k: Int = 10): DataFrame = {
    val perOrderSupp = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("l_suppkey"))
      .agg(max((col("l_shipdate") > col("o_orderdate")
        + expr(s"INTERVAL $lateDays DAYS")).cast("int")).as("was_late"))
    val w = Window.partitionBy(col("o_orderkey"))
    val flagged = perOrderSupp
      .withColumn("n_suppliers", count(lit(1)).over(w))
      .withColumn("n_late", sum(col("was_late")).over(w))
    flagged
      .filter(col("was_late") === 1 && col("n_suppliers") >= 2 && col("n_late") === 1)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_orders"))
      .join(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_orders"))
      .orderBy(col("n_orders").desc, col("s_suppkey"))
      .limit(k)
  }
}
