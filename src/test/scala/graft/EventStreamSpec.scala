package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream
import TestSpark._

/** Top-level so the product encoder needs no outer instance. */
case class Ev(ts: Timestamp, event_type: String, user_id: Long, value: Double)

/** Watermark + tumbling-window streaming aggregation: windows finalize
  * exactly once when the watermark passes, and events later than the
  * watermark delay are dropped — not re-opened.
  */
class EventStreamSpec extends AnyFunSuite {

  private def runQuery(input: MemoryStream[Ev], sinkName: String) = {
    val out = EventStream.hourlyRollup(input.toDF(), watermarkDelay = "30 minutes")
    out.writeStream.format("memory").queryName(sinkName).outputMode("append").start()
  }

  test("windows finalize once past the watermark; later events are dropped") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[Ev](s)
    val q = runQuery(input, "ev_rollup")
    try {
      // hour-0 window: two events, two users
      input.addData(
        Ev(ts("2024-05-01 00:10:00"), "view", 1, 2.0),
        Ev(ts("2024-05-01 00:40:00"), "view", 2, 3.0))
      q.processAllAvailable()
      // nothing final yet: watermark = 00:40 - 30min < window end 01:00
      assert(spark.table("ev_rollup").isEmpty)

      // an event at 01:45 pushes the watermark to 01:15 > 01:00 → hour-0 finalizes
      input.addData(Ev(ts("2024-05-01 01:45:00"), "view", 3, 5.0))
      q.processAllAvailable()
      val fin = spark.table("ev_rollup").collect()
      assert(fin.length == 1)
      val r = fin.head
      assert(r.getAs[Timestamp]("hour") == ts("2024-05-01 00:00:00"))
      assert(r.getAs[Long]("n_events") == 2L)
      assert(r.getAs[Long]("n_users_approx") == 2L)
      assert(r.getAs[Double]("sum_value") == 5.0)

      // a straggler for hour 0 (behind the 01:15 watermark) must be dropped:
      // no new hour-0 row, no count change after the next finalization
      input.addData(Ev(ts("2024-05-01 00:50:00"), "view", 9, 100.0))
      q.processAllAvailable()
      assert(spark.table("ev_rollup").filter(col("hour") === ts("2024-05-01 00:00:00")).count() == 1)

      // close out hour 1 and confirm the straggler never surfaced anywhere
      input.addData(Ev(ts("2024-05-01 03:00:00"), "click", 4, 1.0))
      q.processAllAvailable()
      val all = spark.table("ev_rollup").collect()
      assert(all.map(_.getAs[Long]("n_events")).sum == 3L,
        "late event leaked into a finalized or new window")
      assert(all.filter(_.getAs[Timestamp]("hour") == ts("2024-05-01 01:00:00"))
        .map(r => (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSeq == Seq((1L, 5.0)))
    } finally q.stop()
  }

  test("grouping is per (window, type): types roll up independently") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[Ev](s)
    val q = runQuery(input, "ev_rollup2")
    try {
      input.addData(
        Ev(ts("2024-06-01 10:05:00"), "view", 1, 1.0),
        Ev(ts("2024-06-01 10:06:00"), "click", 1, 2.0),
        Ev(ts("2024-06-01 10:07:00"), "view", 2, 4.0),
        Ev(ts("2024-06-01 12:00:00"), "view", 3, 0.0)) // advances watermark
      q.processAllAvailable()
      val rows = spark.table("ev_rollup2")
        .filter(col("hour") === ts("2024-06-01 10:00:00"))
        .orderBy("event_type").collect()
      assert(rows.map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
        r.getAs[Double]("sum_value"))).toSeq ==
        Seq(("click", 1L, 2.0), ("view", 2L, 5.0)))
    } finally q.stop()
  }
}
