package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{EventStream, SessionEvent}
import TestSpark._

/** Top-level so the product encoder needs no outer instance. */
case class Ev(ts: Timestamp, event_type: String, user_id: Long, value: Double)

/** Keyed variant for the join/dedup streaming specs. */
case class EvId(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** Fact row for the streaming PIT-enrichment spec. */
case class Fact(fid: Long, k: Long, ft: Timestamp)

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

  test("stream-stream attribution joins views to purchases within the horizon only") {
    val s = spark
    import s.implicits._
    val views = MemoryStream[EvId](s)
    val purchases = MemoryStream[EvId](s)
    val out = EventStream.attribution(views.toDF(), purchases.toDF(), horizon = "1 HOUR")
    val q = out.writeStream.format("memory").queryName("attr").outputMode("append").start()
    try {
      views.addData(
        EvId(100, ts("2024-05-01 10:00:00"), 1, "view", 0.0),  // in horizon
        EvId(101, ts("2024-05-01 08:00:00"), 1, "view", 0.0),  // too old
        EvId(102, ts("2024-05-01 10:20:00"), 2, "view", 0.0))  // other user
      purchases.addData(EvId(200, ts("2024-05-01 10:30:00"), 1, "purchase", 9.99))
      q.processAllAvailable()
      val got = spark.table("attr")
        .select("purchase_id", "view_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSet == Set((200L, 100L)), s"got ${got.toSeq}")

      // a view AFTER the purchase never attributes
      views.addData(EvId(103, ts("2024-05-01 10:45:00"), 1, "view", 0.0))
      q.processAllAvailable()
      assert(spark.table("attr").count() == 1)
    } finally q.stop()
  }

  test("stream-static enrichment attaches dimension rows, nulls for misses") {
    val s = spark
    import s.implicits._
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "segment")
    val input = MemoryStream[EvId](s)
    val q = EventStream.enrich(input.toDF(), dim)
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    try {
      input.addData(
        EvId(1, ts("2024-05-01 10:00:00"), 1, "view", 2.0),
        EvId(2, ts("2024-05-01 10:01:00"), 9, "view", 1.0)) // no dim row
      q.processAllAvailable()
      val got = spark.table("enriched").select("event_id", "segment").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got == Map(1L -> Some("gold"), 2L -> None), s"got $got")
    } finally q.stop()
  }

  test("streaming Misra-Gries keeps the heavy user across micro-batches within bounds") {
    val s = spark
    import s.implicits._
    val k = 8
    val input = MemoryStream[Ev](s)
    val q = EventStream.frequentUsersStream(input.toDF(), k)
      .writeStream.format("memory").queryName("hh_stream")
      .outputMode("update").start()
    try {
      def ev(u: Long) = Ev(ts("2024-05-01 00:00:00"), "a", u, 1.0)
      // batch 1: heavy user 7 + distinct tail
      input.addData(Seq.fill(200)(ev(7)) ++ (100L until 140L).map(ev): _*)
      q.processAllAvailable()
      // batch 2: more weight on 7, fresh tail — state must carry over
      input.addData(Seq.fill(100)(ev(7)) ++ (200L until 240L).map(ev): _*)
      q.processAllAvailable()
      val n = 200 + 40 + 100 + 40
      val bound = n.toDouble / (k + 1)
      val est7 = s.table("hh_stream")
        .filter(col("user_id") === 7).agg(max("est_count")).head().getLong(0)
      assert(est7 <= 300, s"over-count: $est7")
      assert(est7 >= 300 - bound, s"heavy user under bound: $est7 vs ${300 - bound}")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark suppresses redelivered event ids") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[EvId](s)
    val q = EventStream.dedupStream(input.toDF(), watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("dedup_s").outputMode("append").start()
    try {
      input.addData(
        EvId(1, ts("2024-05-01 00:00:00"), 1, "view", 1.0),
        EvId(2, ts("2024-05-01 00:05:00"), 2, "view", 2.0))
      q.processAllAvailable()
      // same ids redelivered in a later batch, still inside the watermark
      input.addData(
        EvId(1, ts("2024-05-01 00:00:00"), 1, "view", 1.0),
        EvId(2, ts("2024-05-01 00:06:00"), 2, "view", 2.0),
        EvId(3, ts("2024-05-01 00:10:00"), 3, "view", 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_s").select("event_id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stateful sessionization: gap splits in-batch, event-time timeout closes idle") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[SessionEvent](s)
    val q = EventStream
      .sessionizeStateful(input.toDS(), gapMinutes = 30, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("sess_s").outputMode("append").start()
    try {
      // one batch, one user, two sessions: 10:00-10:10 then (gap > 30m) 11:00
      input.addData(
        SessionEvent(1, ts("2024-05-01 10:00:00"), 1.0),
        SessionEvent(1, ts("2024-05-01 10:10:00"), 2.0),
        SessionEvent(1, ts("2024-05-01 11:00:00"), 4.0))
      q.processAllAvailable()
      val first = spark.table("sess_s").collect()
      assert(first.length == 1, "in-batch gap must close the first session")
      assert(first.head.getAs[Timestamp]("session_start") == ts("2024-05-01 10:00:00"))
      assert(first.head.getAs[Timestamp]("session_end") == ts("2024-05-01 10:10:00"))
      assert(first.head.getAs[Long]("n_events") == 2L)
      assert(first.head.getAs[Double]("sum_value") == 3.0)

      // another user far in the future drives the watermark past 11:00+30m
      // → user 1's open session times out and emits exactly once
      input.addData(SessionEvent(2, ts("2024-05-01 13:00:00"), 0.0))
      q.processAllAvailable()
      input.addData(SessionEvent(2, ts("2024-05-01 14:30:00"), 0.0))
      q.processAllAvailable()
      val u1 = spark.table("sess_s").filter(col("user_id") === 1).collect()
      assert(u1.length == 2, s"timeout should close the 11:00 session: ${u1.toSeq}")
      assert(u1.map(_.getAs[Long]("n_events")).sum == 3L)
    } finally q.stop()
  }

  test("streaming PIT enrichment equals the batch PIT join over the full log") {
    val s = spark
    import s.implicits._
    def ts(d: String) = Timestamp.valueOf(d + " 00:00:00")
    val log = Seq(
      (1L, 10L, ts("2024-01-01"), "A"),
      (1L, 11L, ts("2024-01-05"), "B"),
      (2L, 12L, ts("2024-01-03"), "X"))
      .toDF("k", "ord", "t", "status")
    val dim = graft.ops.Scd.scd2(log, key = "k", orderCol = "t",
      tieBreak = "ord", tracked = Seq("status"))
    val input = MemoryStream[Fact](s)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[String])]
    val q = EventStream.enrichPitStream(
      input.toDF(), () => dim, key = "k", factTs = "ft",
      dimCols = Seq("status")) { enriched =>
      got.synchronized {
        got ++= enriched.select("fid", "asof_status")
          .collect().map(r => (r.getLong(0), Option(r.getString(1))))
      }
    }
    try {
      val b1 = Seq(Fact(100L, 1L, ts("2024-01-02")), Fact(101L, 2L, ts("2024-01-02")))
      val b2 = Seq(Fact(102L, 1L, ts("2024-01-06")), Fact(103L, 3L, ts("2024-01-06")))
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val batch = graft.ops.Scd.pitEnrich(
        (b1 ++ b2).toDF(), dim, key = "k", factTs = "ft", dimCols = Seq("status"))
        .select("fid", "asof_status")
        .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      assert(got.toSet == batch,
        s"stream=${got.toSet} batch=$batch")
      // temporal correctness, not latest-state: fid 100 predates version B
      assert(got.toMap.apply(100L).contains("A"))
      assert(got.toMap.apply(102L).contains("B"))
      assert(got.toMap.apply(101L).isEmpty, "k=2 fact predates its first version")
      assert(got.toMap.apply(103L).isEmpty, "unknown key stays null")
    } finally q.stop()
  }
}
