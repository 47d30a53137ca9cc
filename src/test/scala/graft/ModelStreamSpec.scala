package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextOps
import graft.streaming.ModelStream
import graft.streaming.ModelStream.LogregRefresh
import TestSpark._

/** Streaming classifier refresh vs batch training: one micro-batch is
  * one gradient step, so a full-corpus replay IS batch training. */
class ModelStreamSpec extends AnyFunSuite {

  private val prose = "the quick brown fox jumps over the lazy dog and then " +
    "the small cat naps by the warm fire while we watch the rain fall"
  private val noise = "$$$ 111 222 %%% 333 ### 444 &&& 555 @@@"
  private lazy val fixture: Seq[(Long, String)] =
    (0 until 12).map(i => (i.toLong, prose + s" day $i")) ++
      (100 until 112).map(i => (i.toLong, noise + s" $i"))

  private def runBatches(refresh: LogregRefresh,
      batches: Seq[Seq[(Long, String)]]): Unit = {
    val s = spark
    import s.implicits._
    val input = MemoryStream[(Long, String)](s)
    val q = ModelStream
      .refreshWriter(input.toDF().toDF("doc_id", "text"), refresh)
      .start()
    try batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
  }

  test("full-corpus replay per batch equals batch GD, bit for bit") {
    val s = spark
    import s.implicits._
    val docsDf = fixture.toDF("doc_id", "text")
    val refresh = new LogregRefresh(lr = 1.0)
    runBatches(refresh, Seq(fixture, fixture, fixture))
    assert(refresh.batchesSeen == 3)
    val streamed = refresh.score(docsDf)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getInt(3))).sortBy(_._1)
    val batch = TextOps.docQualityLogreg(docsDf, iters = 3, lr = 1.0)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getInt(3))).sortBy(_._1)
    assert(streamed.toSeq == batch.toSeq,
      "three full-corpus refresh steps must replay batch GD exactly")
  }

  test("incremental slices still learn the separation; empty batches are no-ops") {
    val refresh = new LogregRefresh(lr = 1.0)
    // 12 disjoint slices (interleaved classes), repeated twice = 24 steps
    val slices = fixture.sortBy(_._1 % 13).grouped(2).toSeq
    runBatches(refresh, slices ++ slices)
    val s = spark
    import s.implicits._
    val scored = refresh.score(fixture.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val (good, bad) = scored.partition(_._1 < 100)
    assert(good.map(_._2).min > bad.map(_._2).max,
      s"online model failed to separate: ${good.map(_._2).min} <= ${bad.map(_._2).max}")
    // an empty step leaves weights untouched
    val before = refresh.weights.toSeq
    graft.ops.TextOps.logregStep(
      TextOps.logregFeatures(Seq.empty[(Long, String)].toDF("doc_id", "text")),
      refresh.weights, 1.0)
    assert(refresh.weights.toSeq == before)
  }
}
