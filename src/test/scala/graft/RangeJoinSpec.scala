package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RangeJoin
import TestSpark._

class RangeJoinSpec extends AnyFunSuite {

  /** Points every 10 min over 6 h; intervals of assorted lengths, some
    * overlapping each other, some spanning many buckets, one zero-length. */
  private lazy val (points, intervals) = {
    val s = spark
    import s.implicits._
    val pts = (0 until 36).map(i => (i.toLong, ts(f"2024-03-01 ${i / 6}%02d:${(i % 6) * 10}%02d:00")))
      .toDF("point_id", "p_ts")
    val ivs = Seq(
      (1L, ts("2024-03-01 00:05:00"), ts("2024-03-01 00:25:00")),
      (2L, ts("2024-03-01 00:20:00"), ts("2024-03-01 02:40:00")), // multi-bucket
      (3L, ts("2024-03-01 01:30:00"), ts("2024-03-01 01:30:00")), // zero-length
      (4L, ts("2024-03-01 04:59:59"), ts("2024-03-01 05:00:00")), // bucket edge
      (5L, ts("2024-03-01 07:00:00"), ts("2024-03-01 08:00:00"))  // past all points
    ).toDF("interval_id", "i_start", "i_end")
    (pts, ivs)
  }

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("point_id", "interval_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("bucketized join equals the nested-loop reference") {
    val nl = pairs(RangeJoin.pointInIntervalNL(points, intervals, "p_ts", "i_start", "i_end"))
    val bk = pairs(RangeJoin.pointInInterval(points, intervals, "p_ts", "i_start", "i_end"))
    assert(bk == nl && nl.nonEmpty)
  }

  test("result is invariant to bucket size") {
    val ref = pairs(RangeJoin.pointInInterval(points, intervals, "p_ts", "i_start", "i_end", 3600))
    for (b <- Seq(60L, 599L, 7200L, 86400L)) {
      assert(pairs(RangeJoin.pointInInterval(points, intervals, "p_ts", "i_start", "i_end", b)) == ref,
        s"bucketSeconds=$b diverged")
    }
  }

  test("bounds are inclusive at both ends and candidates are not duplicated") {
    val out = RangeJoin.pointInInterval(points, intervals, "p_ts", "i_start", "i_end")
    val rows = out.select("point_id", "interval_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows.size == rows.distinct.size, "duplicate (point, interval) pairs")
    val ps = pairs(out)
    assert(ps.contains((9L, 3L)))  // 01:30 point in the zero-length interval
    assert(ps.contains((30L, 4L))) // 05:00 point at inclusive interval end
  }
}
