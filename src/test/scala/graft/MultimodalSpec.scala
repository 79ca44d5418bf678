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

  test("media feature vectors are deterministic, in [0,1), one row per media") {
    val rows = Multimodal.mediaFeatures(spark, sf).collect()
    assert(rows.length == Multimodal.mediaTable(spark, sf).count())
    rows.foreach { r =>
      (2 to 5).foreach { i =>
        val f = r.getDouble(i)
        assert(f >= 0.0 && f < 1.0, s"f out of range: $f")
      }
    }
    // distinct payloads produce distinct feature vectors (md5-derived)
    val vecs = rows.map(r => (2 to 5).map(r.getDouble))
    assert(vecs.distinct.length > rows.length / 2)
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
