package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  def sf: String = SparkTestSession.sf

  test("media table carries binary payloads with typed metadata") {
    val m = Multimodal.mediaTable(spark, sf).collect()
    assert(m.nonEmpty)
    assert(m.forall(_.payload.length > 0))
    assert(m.map(_.media_type).toSet ==
      Set("image/png", "audio/wav", "video/mp4"))
  }

  test("decode stub is deterministic and derives features from bytes") {
    val a = Multimodal.decodeStub(Multimodal.mediaTable(spark, sf))
      .collect().map(f => f.media_id -> f.checksum).toMap
    val b = Multimodal.decodeStub(Multimodal.mediaTable(spark, sf))
      .collect().map(f => f.media_id -> f.checksum).toMap
    assert(a == b)
    assert(a.values.toSet.size > 1, "checksums differ across payloads")
  }

  test("feature extraction preserves row count (one features row per media)") {
    val n = Multimodal.mediaTable(spark, sf).count()
    assert(Multimodal.decodeStub(Multimodal.mediaTable(spark, sf)).count() == n)
  }

  test("frame sample emits stride-spaced indices within n_frames") {
    val rows = Multimodal.frameSample(spark, sf, stride = 8).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nFrames = r.getInt(1); val idx = r.getInt(2)
      assert(idx >= 0 && idx < nFrames && idx % 8 == 0)
    }
  }
}
