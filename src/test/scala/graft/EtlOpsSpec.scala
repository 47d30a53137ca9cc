package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{EventOps, Profile, Scd}
import TestSpark._

class EtlOpsSpec extends AnyFunSuite {

  private def t(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("scd2 collapses runs and chains half-open validity intervals") {
    val s = spark
    import s.implicits._
    // customer 10: O,O,F,O — the repeated O collapses, the later O reopens;
    // customer 20: one row only
    val log = Seq(
      (10L, 1L, t("2024-01-01"), "O"),
      (10L, 2L, t("2024-01-05"), "O"),
      (10L, 3L, t("2024-02-01"), "F"),
      (10L, 4L, t("2024-03-01"), "O"),
      (20L, 5L, t("2024-01-10"), "F"))
      .toDF("custkey", "okey", "odate", "status")
    val out = Scd.scd2(log, "custkey", "odate", "okey", Seq("status"))
      .orderBy("custkey", "version").collect()
    assert(out.length == 4)
    val c10 = out.take(3).map(r => (
      r.getAs[String]("status"),
      r.getAs[Timestamp]("effective_from"),
      r.getAs[Timestamp]("effective_to"),
      r.getAs[Int]("version"),
      r.getAs[Int]("is_current")))
    assert(c10(0) == (("O", t("2024-01-01"), t("2024-02-01"), 1, 0)))
    assert(c10(1) == (("F", t("2024-02-01"), t("2024-03-01"), 2, 0)))
    assert(c10(2) == (("O", t("2024-03-01"), null, 3, 1)))
    assert(out(3).getAs[Int]("version") == 1 && out(3).getAs[Int]("is_current") == 1)
  }

  test("scd2 counts null-to-value and value-to-null as changes") {
    val s = spark
    import s.implicits._
    val log = Seq(
      (1L, 1L, t("2024-01-01"), Option.empty[String]),
      (1L, 2L, t("2024-01-02"), Some("A")),
      (1L, 3L, t("2024-01-03"), Option.empty[String]),
      (1L, 4L, t("2024-01-04"), Option.empty[String]))
      .toDF("k", "id", "d", "v")
    val out = Scd.scd2(log, "k", "d", "id", Seq("v"))
    assert(out.count() == 3) // null, A, null — the trailing null collapses
    assert(out.filter(col("is_current") === 1).count() == 1)
  }

  test("scd2 intervals tile each key's timeline without overlap") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus")
    val out = Scd.scd2(orders, "o_custkey", "o_orderdate", "o_orderkey",
      Seq("o_orderstatus")).cache()
    try {
      // exactly one open (current) version per key
      val keys = out.select("o_custkey").distinct().count()
      assert(out.filter(col("is_current") === 1).count() == keys)
      // every closed interval ends where the next one starts, never before
      assert(out.filter(col("effective_to") < col("effective_from")).isEmpty)
      // versions are dense 1..n per key
      val dense = out.groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), max(col("version")).as("vmax"))
        .filter(col("n") =!= col("vmax"))
      assert(dense.isEmpty)
    } finally out.unpersist()
  }

  test("profile reports nulls, distincts, and typed min/max per column") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(9L), Some(100.0), Some("b")),
      (Some(100L), None, Some("a")),
      (None, Some(99.5), Some("a")))
      .toDF("id", "price", "tag")
    val rows = Profile.profile(df, Seq("id", "price", "tag"))
      .collect().map(r => r.getAs[String]("column") -> r).toMap
    assert(rows("id").getAs[Long]("n_rows") == 3)
    assert(rows("id").getAs[Long]("n_null") == 1)
    assert(rows("id").getAs[Long]("n_distinct") == 2)
    // typed (numeric) min — NOT lexicographic, where "100" < "9"
    assert(rows("id").getAs[String]("min_str") == "9")
    assert(rows("id").getAs[String]("max_str") == "100")
    // doubles canonicalize through DECIMAL(18,2)
    assert(rows("price").getAs[String]("min_str") == "99.50")
    assert(rows("price").getAs[String]("max_str") == "100.00")
    assert(rows("tag").getAs[Long]("n_distinct") == 2)
    assert(rows("tag").getAs[String]("min_str") == "a")
  }

  test("histogram bins partition the events and conserve the count") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val h = EventOps.valueHistogram(events).cache()
    try {
      assert(h.agg(sum("n_events")).head().getLong(0) == events.count())
      // bin_lo is consistent with the bin ordinal
      assert(h.filter(col("bin_lo") =!= col("bin") * 50.0).isEmpty)
      // every event's value falls inside its bin's [lo, lo+width) interval
      val joined = events.withColumn("bin", floor(col("value") / 50.0).cast("long"))
        .join(h, Seq("event_type", "bin"))
        .filter(col("value") < col("bin_lo") || col("value") >= col("bin_lo") + 50.0)
      assert(joined.isEmpty)
    } finally h.unpersist()
  }

  test("HLL sketch union over daily parts equals the one-shot sketch, near exact") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val merged = EventOps.distinctUsersSketchMerge(events).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = events.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("d"),
        countDistinct(col("user_id")).as("exact"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    for ((t, d, exact) <- direct) {
      assert(merged(t) == d, s"$t: union-of-daily ${merged(t)} != direct $d")
      assert(math.abs(merged(t) - exact).toDouble / exact < 0.05,
        s"$t: sketch ${merged(t)} vs exact $exact")
    }
  }

  test("PIT enrich picks the version valid at each fact date; same-instant collapses to last") {
    val s = spark
    import s.implicits._
    val log = Seq(
      (1L, 10L, t("2024-01-01"), "A"),
      (1L, 11L, t("2024-01-05"), "B"),
      (1L, 12L, t("2024-01-10"), "C"),
      (1L, 13L, t("2024-01-10"), "D")) // same instant as C, later tieBreak
      .toDF("k", "ord", "ts", "status")
    val dim = Scd.scd2(log, key = "k", orderCol = "ts", tieBreak = "ord",
      tracked = Seq("status"))
    val facts = Seq(
      (100L, 1L, t("2023-12-31")), // before the first version
      (101L, 1L, t("2024-01-01")), // exactly on a version open
      (102L, 1L, t("2024-01-07")), // mid-interval
      (103L, 1L, t("2024-01-10")), // on the tied instant
      (104L, 2L, t("2024-01-07"))) // key with no dimension history
      .toDF("fid", "k", "ft")
    val out = Scd.pitEnrich(facts, dim, key = "k", factTs = "ft",
      dimCols = Seq("status", "version"))
      .select("fid", "asof_status", "asof_version")
      .as[(Long, Option[String], Option[Int])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(100L) == ((None, None)), "fact before v1 must stay null")
    assert(out(101L) == ((Some("A"), Some(1))))
    assert(out(102L) == ((Some("B"), Some(2))))
    assert(out(103L) == ((Some("D"), Some(4))),
      "same-instant versions collapse to the LAST (end-of-instant state)")
    assert(out(104L) == ((None, None)), "unknown dimension key stays null")
  }

  test("dq checks flag planted violations and pass clean data") {
    val s = spark
    import s.implicits._
    import graft.ops.Profile
    def toOrders(rows: Seq[(Long, Option[Long], String, Double)]) =
      rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .withColumn("o_orderdate", lit(null).cast("timestamp"))
        .withColumn("o_orderpriority", lit("1-URGENT"))
    val customer = Seq(1L, 2L).toDF("c_custkey")
    val lineitem = Seq(10L, 10L, 999L).toDF("l_orderkey") // 999 is an orphan

    // planted: duplicate o_orderkey, null custkey, orphan custkey 7,
    // non-positive price, status 'X' outside the domain
    val dirty = toOrders(Seq(
      (10L, Some(1L), "O", 5.0),
      (10L, Some(7L), "X", -1.0),
      (11L, None, "F", 2.0)))
    val out = Profile.dqChecks(dirty, lineitem, customer)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(out("row_count") == ((3.0, true)))
    assert(out("completeness_o_custkey") == ((math.rint(2.0 / 3 * 1e6) / 1e6, false)))
    assert(out("uniqueness_o_orderkey") == ((math.rint(2.0 / 3 * 1e6) / 1e6, false)))
    assert(out("min_totalprice_positive") == ((-1.0, false)))
    assert(out("status_in_domain") == ((1.0, false)))
    assert(out("fk_orders_customer") == ((1.0, false)), "custkey 7 has no customer")
    assert(out("fk_lineitem_orders") == ((1.0, false)), "l_orderkey 999 has no order")

    val clean = toOrders(Seq((10L, Some(1L), "O", 5.0), (11L, Some(2L), "F", 2.0)))
    val cleanOut = Profile.dqChecks(clean, Seq(10L, 11L).toDF("l_orderkey"), customer)
      .collect()
    assert(cleanOut.length == 7 && cleanOut.forall(_.getBoolean(2)),
      s"clean data must pass every check: ${cleanOut.mkString(", ")}")
  }

  test("rental DQ gate passes real data and flags planted interval violations") {
    // the gate defaults ON in IncrementalRun, so real data must pass
    // every REQUIRED check — otherwise the default breaks the production
    // path. The advisory interval checks genuinely fail on this data (92
    // early returns at sf0.001): that is the point of the tiering —
    // report the quirk, don't block the pipeline on it.
    val real = Profile.rentalDqChecks(
      Tables.rental(spark, "/root/testdata/sf0.001")).collect()
    assert(real.length == 6)
    assert(real.filter(_.getBoolean(3)).forall(_.getBoolean(2)),
      s"required checks failed on real data: ${real.filterNot(_.getBoolean(2)).mkString(", ")}")
    val earlyReturns = real.find(_.getString(0) == "return_not_before_rental").get
    assert(!earlyReturns.getBoolean(2) && earlyReturns.getDouble(1) > 0,
      "the advisory check should surface the real early-return quirk")

    val dirty = rentalDf(Seq(
      // return precedes the rental
      RentalVersion(1L, ts("2024-01-05 10:00:00"),
        Some(ts("2024-01-04 10:00:00")), ts("2024-01-05 10:00:00")),
      // last_update precedes the rental
      RentalVersion(2L, ts("2024-01-05 10:00:00"), None, ts("2024-01-01 10:00:00"))))
    val out = Profile.rentalDqChecks(dirty).collect()
      .map(r => r.getString(0) -> ((r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(out("return_not_before_rental") == ((false, false)))
    assert(out("update_not_before_rental") == ((false, false)))
    assert(Seq("row_count", "completeness_rental_id", "completeness_rental_date",
      "completeness_last_update").forall(k => out(k) == ((true, true))),
      "required checks must pass on structurally-clean data")
  }

  test("histogram handles negative values with floor (not truncation) binning") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a", -0.5), (2L, "a", -50.0), (3L, "a", 0.0))
      .toDF("event_id", "event_type", "value")
    val bins = EventOps.valueHistogram(df)
      .select("bin", "n_events").collect()
      .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("n_events")).toMap
    assert(bins == Map(-1L -> 2L, 0L -> 1L)) // -0.5 and -50.0 → bin -1
  }
}
