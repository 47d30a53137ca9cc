package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOfJoin
import TestSpark._

class AsOfJoinSpec extends AnyFunSuite {
  private def t(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)

  test("as-of picks the latest right row at or before the left timestamp") {
    val s = spark
    import s.implicits._
    val trades = Seq(
      (1L, t(10), "T1"), (1L, t(20), "T2"), (1L, t(5), "T0"),
      (2L, t(10), "T3"))
      .toDF("sym", "ts", "trade")
    val quotes = Seq(
      (1L, t(8), 100.0), (1L, t(10), 101.0), (1L, t(15), 102.0),
      (2L, t(11), 200.0))
      .toDF("sym", "ts", "px")

    val out = AsOfJoin.asOf(trades, quotes, "sym", "ts", "ts", Seq("px"))
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(out("T0").isEmpty)            // no quote at or before t(5)
    assert(out("T1").contains(101.0))    // equal-ts quote matches
    assert(out("T2").contains(102.0))    // latest ≤ t(20)
    assert(out("T3").isEmpty)            // sym 2 quote is after the trade
  }

  test("forward direction picks the earliest right row at or after the left timestamp") {
    val s = spark
    import s.implicits._
    val trades = Seq(
      (1L, t(10), "T1"), (1L, t(20), "T2"), (1L, t(5), "T0"),
      (2L, t(12), "T3"))
      .toDF("sym", "ts", "trade")
    val quotes = Seq(
      (1L, t(8), 100.0), (1L, t(10), 101.0), (1L, t(15), 102.0),
      (2L, t(11), 200.0))
      .toDF("sym", "ts", "px")
    val out = AsOfJoin.asOf(trades, quotes, "sym", "ts", "ts", Seq("px"),
      direction = "forward")
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(out("T0").contains(100.0))    // earliest ≥ t(5)
    assert(out("T1").contains(101.0))    // equal-ts quote matches
    assert(out("T2").isEmpty)            // nothing after t(20)
    assert(out("T3").isEmpty)            // sym 2 quote precedes the trade
  }

  test("nearest direction picks the closer side; ties and one-sided cases resolve backward-first") {
    val s = spark
    import s.implicits._
    val trades = Seq(
      (1L, t(10), "FWD"),   // quotes at 7 and 12 -> forward (|2| < |3|)
      (1L, t(30), "TIE"),   // quotes at 28 and 32 -> tie |2| -> backward
      (1L, t(50), "EXACT"), // quote at exactly 50 -> itself (distance 0)
      (2L, t(10), "ONLYB"), // only a quote before
      (3L, t(10), "ONLYF"), // only a quote after
      (4L, t(10), "NONE"))  // no quotes for the key
      .toDF("sym", "ts", "trade")
    val quotes = Seq(
      (1L, t(7), 7.0), (1L, t(12), 12.0),
      (1L, t(28), 28.0), (1L, t(32), 32.0),
      (1L, t(50), 50.0),
      (2L, t(2), 2.0),
      (3L, t(19), 19.0))
      .toDF("sym", "ts", "px")
    val out = AsOfJoin.asOfNearest(trades, quotes, "sym", "ts", "ts", Seq("px"))
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(out("FWD").contains(12.0))
    assert(out("TIE").contains(28.0), s"tie must resolve backward: ${out("TIE")}")
    assert(out("EXACT").contains(50.0))
    assert(out("ONLYB").contains(2.0))
    assert(out("ONLYF").contains(19.0))
    assert(out("NONE").isEmpty)
    // and agreement with the directional pair everywhere one side wins
    assert(out.size == 6)
  }

  test("every left row survives exactly once") {
    val e = Tables.events(spark, "/root/testdata/sf0.001")
    import org.apache.spark.sql.functions.col
    val p = e.filter(col("event_type") === "purchase").select("event_id", "ts", "user_id")
    val v = e.filter(col("event_type") === "view").select("event_id", "ts", "user_id")
    val out = AsOfJoin.asOf(p, v, "user_id", "ts", "ts", Seq("event_id"))
    assert(out.count() == p.count())
    assert(out.select("event_id").distinct().count() == p.count())
  }
}
