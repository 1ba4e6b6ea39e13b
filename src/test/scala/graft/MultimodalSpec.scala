package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("fixture carries binary payload + typed metadata") {
    val items = Multimodal.fixtureFromDocuments(spark, docs)
    val r = items.head()
    assert(Set("image", "audio", "video").contains(r.kind))
    assert(r.content.nonEmpty)
    assert(items.count() == 500)
  }

  test("feature extraction is deterministic, fixed-dim, per-partition batched") {
    val items = Multimodal.fixtureFromDocuments(spark, docs).repartition(4)
    val f1 = Multimodal.extractFeatures(items).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(items).collect().sortBy(_.media_id)
    assert(f1.length == 500)
    assert(f1.forall(_.feature.length == Multimodal.FeatureDim))
    assert(f1.map(_.feature.toSeq).toSeq == f2.map(_.feature.toSeq).toSeq)
  }

  test("resize rewrites payload and metadata") {
    val items = Multimodal.fixtureFromDocuments(spark, docs)
    val resized = Multimodal.resizeAll(items, 32, 32).head()
    assert(resized.width == 32 && resized.height == 32)
  }

  test("frame sampling explodes only videos with deterministic counts") {
    val items = Multimodal.fixtureFromDocuments(spark, docs)
    val frames = Multimodal.sampleFrames(items, everyMs = 500)
    val nVideos = items.filter(_.kind == "video").count()
    assert(frames.count() > nVideos) // multiple frames per video
    assert(frames.select("media_id").distinct().count() == nVideos)
  }
}
