package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import TestSpark._

class MultimodalSpec extends AnyFunSuite {
  private lazy val media =
    Multimodal.syntheticMedia(Tables.documents(spark, "/root/testdata/sf0.001"))

  test("decode is deterministic and partition-invariant") {
    val a = collectSorted(Multimodal.extractFeatures(media, parallelism = 1).toDF()
      .select(col("media_id"), col("n_bytes"), col("checksum"), col("features")))
    val b = collectSorted(Multimodal.extractFeatures(media, parallelism = 7).toDF()
      .select(col("media_id"), col("n_bytes"), col("checksum"), col("features")))
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("decoded n_bytes equals the payload byte length") {
    val joined = Multimodal.extractFeatures(media).toDF()
      .join(media.select(col("media_id"), length(col("payload")).as("plen")), Seq("media_id"))
      .filter(col("n_bytes") =!= col("plen")).count()
    assert(joined == 0)
  }

  test("features have the declared shape and are vector-pipeline compatible") {
    val f = Multimodal.extractFeatures(media).toDF()
      .select(col("media_id").as("vec_id"), col("features").as("embedding"))
    assert(f.select(size(col("embedding"))).distinct().head().getInt(0) == 16)
    // feeds straight into the ANN operators
    val top = graft.ops.VectorOps.annBruteForce(f, nQueries = 2, k = 3)
    assert(top.count() == 6)
  }

  test("sampled frames are exact byte slices of the payload") {
    val frames = Multimodal.sampleFrames(media, frameSize = 16, stride = 2)
    val first = frames.filter(col("frame_index") === 0)
      .join(media, Seq("media_id"))
      .filter(col("frame") =!= substring(col("payload"), 1, 16))
      .count()
    assert(first == 0)
    assert(frames.count() > 0)
  }
}
