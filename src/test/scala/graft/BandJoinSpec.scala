package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RangeJoin
import graft.plans.BandJoinRewrite
import TestSpark._

class BandJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  override def beforeAll(): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BandJoinRewrite

  // The shared session outlives this suite: take the rule back out so
  // other suites (e.g. RangeJoinSpec's genuine-NL cross-checks) see
  // stock planning.
  override def afterAll(): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq BandJoinRewrite)

  private lazy val (points, intervals) = {
    val s = spark
    import s.implicits._
    val pts = (0 until 200).map(i => (i.toLong, ts(f"2024-03-01 ${i / 12}%02d:${(i % 12) * 5}%02d:00")))
      .toDF("point_id", "p_ts")
    val ivs = Seq(
      (1L, ts("2024-03-01 00:07:00"), ts("2024-03-01 01:02:00")),
      (2L, ts("2024-03-01 03:00:00"), ts("2024-03-01 05:30:00")),
      (3L, ts("2024-03-01 11:59:00"), ts("2024-03-01 12:01:00"))
    ).toDF("interval_id", "i_start", "i_end")
    (pts, ivs)
  }

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("a BETWEEN-shaped DataFrame join plans as an equi join, same result") {
    val nlShaped = points.join(intervals,
      col("p_ts") >= col("i_start") && col("p_ts") <= col("i_end"))
    assert(!physical(nlShaped).contains("NestedLoop"),
      "band join was not rewritten away from a nested loop")
    assertSameRows(nlShaped,
      RangeJoin.pointInInterval(points, intervals, "p_ts", "i_start", "i_end"))
  }

  test("literal SQL BETWEEN join goes through the rewrite too") {
    points.createOrReplaceTempView("bj_points")
    intervals.createOrReplaceTempView("bj_intervals")
    val sql = spark.sql(
      """SELECT point_id, interval_id FROM bj_points p JOIN bj_intervals i
        |ON p.p_ts BETWEEN i.i_start AND i.i_end""".stripMargin)
    assert(!physical(sql).contains("NestedLoop"))
    assertSameRows(sql,
      RangeJoin.pointInInterval(points, intervals, "p_ts", "i_start", "i_end")
        .select("point_id", "interval_id"))
  }

  test("strict bounds rewrite and preserve exclusivity") {
    val strict = points.join(intervals,
      col("p_ts") > col("i_start") && col("p_ts") < col("i_end"))
    assert(!physical(strict).contains("NestedLoop"))
    assertSameRows(strict,
      RangeJoin.pointInIntervalNL(points, intervals, "p_ts", "i_start", "i_end")
        .filter(col("p_ts") =!= col("i_start") && col("p_ts") =!= col("i_end")))
  }

  test("date-typed bands rewrite too, bucketed at day grain") {
    val dPts = points.select(col("point_id"),
      to_date(lit("2024-03-01")).as("p_d"))
      .withColumn("p_d", date_add(col("p_d"), (col("point_id") % 40).cast("int")))
    val dIvs = intervals.select(col("interval_id"),
      date_add(to_date(lit("2024-03-01")), 3).as("d_start"),
      date_add(to_date(lit("2024-03-01")), 17).as("d_end"))
    val joined = dPts.join(dIvs,
      col("p_d") >= col("d_start") && col("p_d") <= col("d_end"))
    assert(!physical(joined).contains("NestedLoop"))
    assertSameRows(joined,
      RangeJoin.pointInIntervalNL(dPts, dIvs, "p_d", "d_start", "d_end"))
  }

  test("inverted intervals (end < start) match nothing instead of crashing") {
    val s = spark
    import s.implicits._
    // One legal interval and two inverted ones — the latter legal-but-empty
    // under the nested-loop semantics (no point satisfies start<=ts<=end).
    // An unguarded ascending Sequence would throw ILLEGAL_SEQUENCE_BOUNDARIES.
    val dirty = Seq(
      (1L, ts("2024-03-01 00:07:00"), ts("2024-03-01 01:02:00")),
      (2L, ts("2024-03-01 05:30:00"), ts("2024-03-01 03:00:00")), // inverted, crosses buckets
      (3L, ts("2024-03-01 11:59:00"), ts("2024-03-01 11:55:00"))  // inverted, same bucket
    ).toDF("interval_id", "i_start", "i_end")
    val joined = points.join(dirty,
      col("p_ts") >= col("i_start") && col("p_ts") <= col("i_end"))
    assert(!physical(joined).contains("NestedLoop"))
    assert(joined.filter(col("interval_id") =!= 1L).isEmpty,
      "inverted intervals must match no points")
    assertSameRows(joined,
      RangeJoin.pointInIntervalNL(points, dirty, "p_ts", "i_start", "i_end"))
  }

  test("a join that already has an equi key is left untouched") {
    val keyed = points.withColumn("k", col("point_id") % 3)
      .join(intervals.withColumn("k", col("interval_id") % 3).drop("interval_id"),
        Seq("k"))
    assert(!keyed.queryExecution.optimizedPlan.toString.contains("_graft"),
      "rule fired on an equi join")
  }

  test("non-timestamp bands are not rewritten") {
    val ids = points.select(col("point_id"))
    val ranges = intervals.select(
      (col("interval_id") * 10).as("lo"), (col("interval_id") * 10 + 60).as("hi"))
    val numeric = ids.join(ranges,
      col("point_id") >= col("lo") && col("point_id") <= col("hi"))
    assert(!numeric.queryExecution.optimizedPlan.toString.contains("_graft"))
    assert(numeric.count() ==
      RangeJoin.pointInIntervalNL(ids, ranges, "point_id", "lo", "hi").count())
  }
}
