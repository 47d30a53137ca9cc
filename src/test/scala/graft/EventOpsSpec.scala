package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventOps
import TestSpark._

class EventOpsSpec extends AnyFunSuite {
  private lazy val events = Tables.events(spark, "/root/testdata/sf0.001")

  test("sessionization splits exactly at the gap boundary") {
    val s = spark
    import s.implicits._
    def t(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)
    // user 1: gap of exactly 30min (no split), then 30min+1s (split)
    val fixture = Seq(
      (1L, t(0), 1L, "a", 1.0, "{}"),
      (2L, t(1800), 1L, "a", 1.0, "{}"),       // 30:00 gap -> same session
      (3L, t(1800 + 1801), 1L, "b", 1.0, "{}"), // 30:01 gap -> new session
      (4L, t(100), 2L, "a", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.sessionize(fixture).orderBy("user_id", "session_seq").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_events") == 2) // user 1 session 1
    assert(out(1).getAs[Long]("n_events") == 1) // user 1 session 2
    assert(out(2).getAs[Long]("n_events") == 1) // user 2
  }

  test("session totals conserve events") {
    val total = EventOps.sessionize(events).agg(sum("n_events")).head().getLong(0)
    assert(total == events.count())
  }

  test("rolling range frame skips calendar gaps a row frame would cross") {
    val s = spark
    import s.implicits._
    def t(day: Int) = new Timestamp(java.time.LocalDate.of(2024, 3, 1).plusDays(day)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli)
    // days 0, 1, then a gap to day 20 — the trailing 7-day window at
    // day 20 must contain only day 20 itself
    val fixture = Seq(
      (1L, t(0), 1L, "a", 10.0, "{}"), (2L, t(1), 1L, "a", 20.0, "{}"),
      (3L, t(20), 1L, "a", 40.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.rollingDaily(fixture).collect()
      .map(r => r.getDate(1).toString -> (r.getLong(4), r.getDouble(5))).toMap
    assert(out("2024-03-01") == ((1L, 10.0)))
    assert(out("2024-03-02") == ((2L, 30.0)), "day 2 accumulates day 1")
    assert(out("2024-03-21") == ((1L, 40.0)), s"gap must reset the range frame: $out")
  }

  test("z-score outliers flag exactly the planted extreme values") {
    val s = spark
    import s.implicits._
    def t(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)
    // 20 values at 10.0 +- 1 and one at 100: only the spike is >= 3 sigma
    val rows = (1 to 10).map(i => (i.toLong, t(i), 1L, "a", 9.0, "{}")) ++
      (11 to 20).map(i => (i.toLong, t(i), 1L, "a", 11.0, "{}")) :+
      (21L, t(21), 1L, "a", 100.0, "{}")
    val fixture = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.valueOutliers(fixture).collect()
    assert(out.length == 1 && out.head.getAs[Long]("event_id") == 21L)
    assert(out.head.getAs[Double]("z_score") > 4.0)
    // conservation: every event of a type with zero variance is dropped, not NaN-flagged
    val flat = Seq((1L, t(1), 1L, "b", 5.0, "{}"), (2L, t(2), 1L, "b", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(EventOps.valueOutliers(flat).collect().isEmpty)
  }

  test("retention cohorts count users at each week offset") {
    val s = spark
    import s.implicits._
    def t(day: Int) = new Timestamp(java.time.LocalDate.of(2023, 1, 2).plusDays(day)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli) // Mon W0
    val fixture = Seq(
      (1L, t(0), 1L, "a", 1.0, "{}"),   // u1 cohort W0
      (2L, t(15), 1L, "a", 1.0, "{}"),  // u1 active W2
      (3L, t(2), 2L, "a", 1.0, "{}"),   // u2 cohort W0 only
      (4L, t(8), 3L, "a", 1.0, "{}"),   // u3 cohort W1
      (5L, t(16), 3L, "a", 1.0, "{}"),  // u3 active W2 (offset 1)
      (6L, t(18), 3L, "a", 1.0, "{}"))  // same week, must not double-count
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.retention(fixture).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2))).toSet
    assert(out == Set(
      ("2023-01-02", 0, 2L), ("2023-01-02", 2, 1L),
      ("2023-01-09", 0, 1L), ("2023-01-09", 1, 1L)), s"got $out")
  }

  test("sliding windows: every event lands in exactly width/slide windows") {
    val n = events.count()
    val out = EventOps.slidingRollup(events)
    assert(out.agg(sum("n_events")).head().getLong(0) == 4 * n)
    // each window is [start, start+1h) on a 15-min grid
    val s = spark
    import s.implicits._
    def t(sec: Int) = new Timestamp(1700000000000L + sec * 1000L) // 2023-11-14 22:13:20
    val one = Seq((1L, t(0), 1L, "a", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val wins = EventOps.slidingRollup(one).collect()
      .map(r => r.getTimestamp(0).toInstant.toString).sorted
    assert(wins.toSeq == Seq("2023-11-14T21:15:00Z", "2023-11-14T21:30:00Z",
      "2023-11-14T21:45:00Z", "2023-11-14T22:00:00Z"), s"got ${wins.toSeq}")
  }

  test("approx distinct users within rsd bound of exact") {
    val exact = EventOps.distinctUsers(events).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = EventOps.approxDistinctUsers(events).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val err = math.abs(approx(k) - n).toDouble / n
      assert(err <= 0.1, s"$k: approx=${approx(k)} exact=$n err=$err")
    }
  }

  test("TopK aggregator matches the window top-k exactly") {
    assertSameRows(EventOps.topKPerTypeAgg(events), EventOps.topKPerType(events))
  }

  test("TopK aggregator is insertion-order invariant (merge correctness)") {
    val s = spark
    import s.implicits._
    def t(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)
    // ties on value resolve by event_id; spread across many partitions so
    // partial buffers must merge
    val rows = (1L to 200L).map(i => (i, t(i.toInt), i % 7, "a", (i % 5).toDouble, "{}"))
    val fixture = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(16)
    assertSameRows(EventOps.topKPerTypeAgg(fixture), EventOps.topKPerType(fixture))
  }

  test("TopK aggregator tolerates null value/id rows (drops them)") {
    val s = spark
    import s.implicits._
    def t(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)
    val rows: Seq[(java.lang.Long, Timestamp, java.lang.Long, String, java.lang.Double, String)] =
      (1L to 10L).map(i => (java.lang.Long.valueOf(i), t(i.toInt),
        java.lang.Long.valueOf(i % 3), "a",
        java.lang.Double.valueOf(i.toDouble), "{}")) ++ Seq(
        (java.lang.Long.valueOf(99L), t(99), java.lang.Long.valueOf(1L), "a", null, "{}"),
        (null, t(98), java.lang.Long.valueOf(2L), "a", java.lang.Double.valueOf(50.0), "{}"))
    val fixture = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.topKPerTypeAgg(fixture, kTop = 3).collect()
    // null value and null event_id rows never rank; top-3 = values 10,9,8
    assert(out.map(_.getAs[Double]("value")).sorted.toSeq == Seq(8.0, 9.0, 10.0))
  }

  test("cube levels are consistent (incl. the day-only level rollup lacks)") {
    val out = EventOps.cubeByTypeDay(events)
    val grand = out.filter(col("grouping_level") === 3).head()
    assert(grand.getAs[Long]("n_events") == events.count())
    val perDay = out.filter(col("grouping_level") === 2)
      .agg(sum("n_events")).head().getLong(0)
    assert(perDay == events.count(), "day-only slice must cover every event")
    val perType = out.filter(col("grouping_level") === 1)
      .agg(sum("n_events")).head().getLong(0)
    assert(perType == events.count())
  }

  test("extremesByType agrees with a window-derived argmax/argmin") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id").desc)
    val expectTop = events
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("event_type"), col("event_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = EventOps.extremesByType(events)
      .select(col("event_type"), col("top_event_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expectTop)
  }

  test("valueRanks: pct/cume bounded, quartiles near-balanced, rank ties-aware") {
    val out = EventOps.valueRanks(events).cache()
    try {
      assert(out.filter(col("pct_rank") < 0 || col("pct_rank") > 1).isEmpty)
      assert(out.filter(col("cume") <= 0 || col("cume") > 1).isEmpty)
      val qSizes = out.filter(col("event_type") === "click")
        .groupBy("quartile").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(qSizes.keySet == Set(1, 2, 3, 4))
      assert(qSizes.values.max - qSizes.values.min <= 1, s"ntile balance: $qSizes")
    } finally out.unpersist()
  }

  test("approx percentiles are rank-accurate (the sketch's actual guarantee)") {
    // GK sketches bound RANK error (≤ 1/accuracy), not value error — in a
    // sparse tail adjacent data points can be far apart in value, so the
    // right assertion is: the reported quantile's rank is within ε of q.
    val approx = EventOps.valuePercentilesApprox(events).collect()
      .map(r => r.getString(0) -> Seq(0.5 -> r.getDouble(1), 0.9 -> r.getDouble(2),
        0.99 -> r.getDouble(3))).toMap
    approx.foreach { case (tpe, qs) =>
      val vals = events.filter(col("event_type") === tpe)
        .select("value").collect().map(_.getDouble(0)).sorted
      qs.foreach { case (q, v) =>
        val rank = vals.count(_ <= v).toDouble / vals.length
        assert(math.abs(rank - q) < 0.005, s"$tpe q=$q: value $v has rank $rank")
      }
    }
  }

  test("funnel counts are order-aware and monotonically non-increasing") {
    val s = spark
    import s.implicits._
    def t(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)
    // user 1: full ordered funnel; user 2: click BEFORE view (stops at view);
    // user 3: view+click ordered, no purchase; user 4: purchase only (stage 0)
    val rows = Seq(
      (1L, t(1), 1L, "view", 0.0, "{}"), (2L, t(2), 1L, "click", 0.0, "{}"),
      (3L, t(3), 1L, "purchase", 5.0, "{}"),
      (4L, t(10), 2L, "click", 0.0, "{}"), (5L, t(11), 2L, "view", 0.0, "{}"),
      (6L, t(20), 3L, "view", 0.0, "{}"), (7L, t(21), 3L, "click", 0.0, "{}"),
      (8L, t(30), 4L, "purchase", 1.0, "{}"))
    val fixture = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.funnel(fixture).collect()
      .map(r => r.getAs[Int]("stage") -> r.getAs[Long]("n_users")).toMap
    assert(out == Map(1 -> 3L, 2 -> 2L, 3 -> 1L), s"got $out")
    // on the real corpus: each stage can only lose users
    val corpus = EventOps.funnel(events).collect()
      .sortBy(_.getAs[Int]("stage")).map(_.getAs[Long]("n_users"))
    assert(corpus.sliding(2).forall(p => p(0) >= p(1)), corpus.toSeq.toString)
  }

  test("pivot/unpivot round trip conserves per-type totals") {
    val long = EventOps.unpivotDaily(events)
    assert(long.agg(sum("n_events")).head().getLong(0) == events.count())
    val fromLong = long.groupBy("event_type").agg(sum("n_events").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = events.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fromLong == direct)
    // pinned pivot schema is data-independent
    assert(EventOps.pivotByType(events.limit(0)).columns.toSeq ==
      Seq("day", "n_click", "n_error", "n_purchase", "n_signup", "n_view"))
  }

  test("rollup levels are consistent") {
    val out = EventOps.multiRollup(events)
    val grand = out.filter(col("grouping_level") === 3).head()
    assert(grand.getAs[Long]("n_events") == events.count())
    val perType = out.filter(col("grouping_level") === 1)
      .agg(sum("n_events")).head().getLong(0)
    assert(perType == events.count())
  }

  test("weekly drift PSI: stable weeks quiet, a shifted week alarms, first week has no row") {
    val s = spark
    import s.implicits._
    // Mondays 2024-03-04 / 11 / 18; weeks 1-2 share a 70/30 mix, week 3
    // flips to 5/95 — a mix inversion the PSI must flag
    def t(week: Int, i: Int) = new Timestamp(
      java.time.LocalDate.of(2024, 3, 4).plusDays((week - 1) * 7L)
        .atTime(1, 0).plusSeconds(i.toLong)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
    def wk(week: Int, views: Int, clicks: Int) =
      (0 until views).map(i => (t(week, i), "view")) ++
        (0 until clicks).map(i => (t(week, 1000 + i), "click"))
    val events = (wk(1, 70, 30) ++ wk(2, 70, 30) ++ wk(3, 5, 95))
      .toDF("ts", "event_type")
    val out = EventOps.weeklyDriftPsi(events)
      .collect().map(r => (r.getDate(0).toString, r.getDouble(1), r.getLong(2)))
      .sortBy(_._1)
    // the first week has no predecessor → exactly two scored weeks
    assert(out.map(_._1).toSeq == Seq("2024-03-11", "2024-03-18"))
    assert(out(0)._2 < 0.01, s"identical-mix week flagged: ${out(0)}")
    assert(out(1)._2 > 0.25, s"mix inversion missed: ${out(1)}")
    assert(out.map(_._3).toSeq == Seq(100L, 100L))
  }
}
