package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DriftStream
import graft.streaming.DriftStream.DriftMonitor
import TestSpark._

/** Streaming PSI drift monitor: in-distribution batches stay quiet, a
  * shifted batch alarms, and the math matches a hand computation. */
class DriftStreamSpec extends AnyFunSuite {

  /** (user_id, event_type) rows; the bin is the event_type. */
  private def rows(spec: (String, Int)*): Seq[(Long, String)] =
    spec.flatMap { case (t, n) => (0 until n).map(i => (i.toLong, t)) }

  test("in-distribution batches stay under threshold; a shifted batch alarms") {
    val s = spark
    import s.implicits._
    val reference = Map("view" -> 700L, "click" -> 200L, "purchase" -> 100L)
    val monitor = new DriftMonitor(reference, threshold = 0.25)
    val input = MemoryStream[(Long, String)](s)
    val q = DriftStream.monitorWriter(
      input.toDF().toDF("user_id", "event_type"), col("event_type"), monitor).start()
    try {
      // batch 0: same 7/2/1 mix — quiet
      input.addData(rows("view" -> 70, "click" -> 20, "purchase" -> 10): _*)
      q.processAllAvailable()
      // batch 1: bot flood — clicks dominate, views vanish
      input.addData(rows("click" -> 95, "purchase" -> 5): _*)
      q.processAllAvailable()
      // batch 2: back to normal
      input.addData(rows("view" -> 140, "click" -> 40, "purchase" -> 20): _*)
      q.processAllAvailable()
    } finally q.stop()
    val r = monitor.readings
    assert(r.map(_.batchId) == Seq(0L, 1L, 2L))
    assert(!r(0).drifted && r(0).psi < 0.05, s"in-dist batch flagged: ${r(0)}")
    assert(r(1).drifted && r(1).psi > 0.25, s"bot flood missed: ${r(1)}")
    assert(!r(2).drifted, s"recovery flagged: ${r(2)}")
    assert(r.map(_.nRows) == Seq(100L, 100L, 200L))
  }

  test("PSI value matches the hand formula; empty batches score zero") {
    val reference = Map("a" -> 90L, "b" -> 10L)
    val m = new DriftMonitor(reference, alpha = 0.5, threshold = 0.25)
    val got = m.update(0L, Map("a" -> 10L, "b" -> 90L)).psi
    val bins = Seq("a", "b")
    val expect = bins.map { b =>
      val p = (Map("a" -> 10L, "b" -> 90L)(b) + 0.5) / (100L + 0.5 * 2)
      val q = (reference(b) + 0.5) / (100L + 0.5 * 2)
      (p - q) * math.log(p / q)
    }.sum
    assert(math.abs(got - expect) < 1e-12)
    assert(m.update(1L, Map.empty).psi == 0.0)
    assert(!m.update(2L, Map.empty).drifted)
    // a bin unseen in the reference still contributes (smoothed), not NaN
    val novel = m.update(3L, Map("c" -> 100L))
    assert(novel.psi > 0.25 && novel.drifted && !novel.psi.isNaN)
  }

  test("referenceHistogram snapshots a static frame's bin counts") {
    val s = spark
    import s.implicits._
    val df = rows("view" -> 7, "click" -> 3).toDF("user_id", "event_type")
    assert(DriftStream.referenceHistogram(df, col("event_type"))
      == Map("view" -> 7L, "click" -> 3L))
  }
}
