package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import org.apache.spark.sql.functions.{col, md5}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  def sf: String = SparkTestSession.sf

  test("container round-trip: synthesized headers parse back to their fields") {
    val body = "the quick brown fox".getBytes("UTF-8")
    val bmp = Multimodal.parseFeatures(1, "image/bmp",
      Multimodal.bmpPayload(width = 640, height = 480, body))
    assert((bmp.width, bmp.height, bmp.n_frames) == (640, 480, 1))
    assert(bmp.n_bytes == Multimodal.BmpHeaderLen + body.length)

    // 2 channels * 16-bit -> block align 4 -> 19 bytes = 4 full frames
    val wav = Multimodal.parseFeatures(2, "audio/wav",
      Multimodal.wavPayload(channels = 2, sampleRate = 8500, body))
    assert((wav.width, wav.height, wav.n_frames) == (0, 0, body.length / 4))
    assert(wav.n_bytes == Multimodal.WavHeaderLen + body.length)

    val avi = Multimodal.parseFeatures(3, "video/avi",
      Multimodal.aviPayload(width = 328, height = 248, totalFrames = 17, body))
    assert((avi.width, avi.height, avi.n_frames) == (328, 248, 17))
    assert(avi.n_bytes == Multimodal.AviHeaderLen + body.length)
  }

  test("decoder identifies the container from magic, not the type hint") {
    val body = Array.fill[Byte](64)(7)
    // a WAV payload labeled as video still parses as WAV
    val f = Multimodal.parseFeatures(9, "video/avi",
      Multimodal.wavPayload(channels = 1, sampleRate = 8000, body))
    assert((f.width, f.height, f.n_frames) == (0, 0, 32))
    // garbage bytes fail loudly instead of producing fake features
    val junk = Array.fill[Byte](200)(0x42)
    val e = intercept[IllegalArgumentException](
      Multimodal.parseFeatures(10, "image/bmp", junk))
    assert(e.getMessage.contains("unrecognized container"))
  }

  test("media table carries valid container payloads with typed metadata") {
    val m = Multimodal.mediaTable(spark, sf).collect()
    assert(m.nonEmpty)
    assert(m.map(_.media_type).toSet ==
      Set("image/bmp", "audio/wav", "video/avi"))
    // every payload begins with its container's magic
    m.foreach { r =>
      val head = new String(r.payload.take(4), "US-ASCII")
      r.media_type match {
        case "image/bmp" => assert(head.startsWith("BM"))
        case _           => assert(head == "RIFF")
      }
    }
  }

  test("decode is deterministic and derives features from container bytes") {
    val a = Multimodal.decode(Multimodal.mediaTable(spark, sf))
      .collect().map(f => f.media_id -> f.checksum).toMap
    val b = Multimodal.decode(Multimodal.mediaTable(spark, sf))
      .collect().map(f => f.media_id -> f.checksum).toMap
    assert(a == b)
    assert(a.values.toSet.size > 1, "checksums differ across payloads")
  }

  test("feature extraction preserves row count (one features row per media)") {
    val n = Multimodal.mediaTable(spark, sf).count()
    assert(Multimodal.decode(Multimodal.mediaTable(spark, sf)).count() == n)
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

  test("image phash: re-containered perturbed copies pair; byte dedup would not") {
    import spark.implicits._
    // ids all ≡ 0 (mod 3) so every record is a BMP; 3 = a 1-byte
    // perturbation of 0 (same length -> same w/h -> near-identical
    // sample grid); 6 = unrelated content
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val docs = Seq(
      (0L, base),
      (3L, base.dropRight(1) + "Q"),
      (6L, "completely different content here " * 12))
      .toDF("doc_id", "text")
    val pairs = graft.operators.Multimodal.imagePhashPairs(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // the perturbed copy pairs with its original within the band
    assert(pairs.contains((0L, 3L)))
    assert(pairs((0L, 3L)) <= 3L)
    // byte-exact dedup on the same corpus finds NOTHING (the copies
    // differ in one byte) — the reason the perceptual hash exists
    // all three texts are byte-distinct, which is what defeats
    // digest-based exact dedup on this corpus
    assert(docs.select(md5(col("text"))).distinct().count() == 3)
    // unrelated content does not pair with either copy
    assert(!pairs.contains((0L, 6L)) && !pairs.contains((3L, 6L)))
  }

  test("audio energy: PCM16 LE sign math and window assignment are exact") {
    import spark.implicits._
    // id 1 (wav): "aAbB" -> samples 0x4161=16737 (win 0) and
    // 0x4262=16994 (win 8, since s*16/2); id 4 (wav): "\u00e9" is
    // UTF-8 C3 A9 -> one sample 0xA9C3=43459 -> SIGNED -22077 ->
    // abs 22077 (the negative-sample branch ASCII bodies never hit)
    val docs = Seq((1L, "aAbB"), (4L, "\u00e9")).toDF("doc_id", "text")
      .write.mode("overwrite")
      .parquet("/tmp/graft-audio-test/documents.parquet")
    val got = graft.operators.Multimodal
      .audioEnergy(spark, "/tmp/graft-audio-test")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    assert(got((1L, 0)) == ((1L, 16737L, false)))
    assert(got((1L, 8)) == ((1L, 16994L, false)))
    assert(got((4L, 0)) == ((1L, 22077L, false)))
    assert(got.size == 3)
  }

  test("binary lake: file roundtrip through binaryFile matches synthesis formulas") {
    val got = graft.operators.Multimodal.binaryLake(spark, sf)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val expected = graft.sources.Tables.load(spark, sf, "documents")
      .where(org.apache.spark.sql.functions.col("doc_id") % 3 === 0)
      .select("doc_id", "text").collect()
      .map { r =>
        val n = r.getString(1)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong
        r.getLong(0) -> ((n + 54L, 16L + n % 64, 16L + n % 48, n))
      }.toMap
    assert(got == expected && got.nonEmpty)
  }

  test("loudness gain: hand-decoded sample, silent-clip sentinel") {
    import spark.implicits._
    // doc 1 (%3==1 → WAV): body "ab" = one LE sample 0x6261 = 25185;
    // doc 4: two NUL bytes = one zero sample → silent
    Seq((1L, "ab"), (4L, "\u0000\u0000"))
      .toDF("doc_id", "text")
      .write.mode("overwrite")
      .parquet("/tmp/graft-gain-test/documents.parquet")
    val got = graft.operators.Multimodal
      .loudnessGain(spark, "/tmp/graft-gain-test")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val s = 25185L
    assert(got(1L) == ((1L, s * s,
      math.floor(1e6 * math.sqrt((s * s).toDouble)).toLong,
      math.floor(1e6 * (10000.0 / math.sqrt((s * s).toDouble))).toLong)))
    assert(got(4L) == ((1L, 0L, -1L, -1L)))
  }

  test("spectral bands: a pure tone concentrates energy in its own bin") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // 128 samples (2 frames) of a k=4 tone: v[n] = 1000*cos(2*pi*4*n/64)
    def pcm16(samples: Seq[Int]): Array[Byte] =
      samples.flatMap { v =>
        val x = if (v < 0) v + 65536 else v
        Seq((x & 0xFF).toByte, ((x >> 8) & 0xFF).toByte)
      }.toArray
    val tone = (0 until 128).map(n =>
      math.round(1000.0 * math.cos(2.0 * math.Pi * 4 * n / 64.0)).toInt)
    val silence = Seq.fill(128)(0)
    val recs = Seq(
      Multimodal.MediaRecord(1L, "audio/wav",
        Multimodal.wavPayload(1, 8000, pcm16(tone))),
      Multimodal.MediaRecord(2L, "audio/wav",
        Multimodal.wavPayload(1, 8000, pcm16(silence))),
      // 63 samples: no complete frame -> absent from the output
      Multimodal.MediaRecord(3L, "audio/wav",
        Multimodal.wavPayload(1, 8000, pcm16(Seq.fill(63)(100)))))
    val got = Multimodal.spectralBandsOn(spark.createDataset(recs))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    // clip 1: 5 bins, 2 frames each; bin 4 dominates, others near zero
    assert(got.keySet.map(_._1) == Set(1L, 2L))
    val e1 = Multimodal.SpectralBins.map(k => got((1L, k.toLong))._2)
    val e4 = got((1L, 4L))._2
    assert(got((1L, 4L))._1 == 2L)
    assert(e4 > 0 && e4 == e1.max)
    assert(got((1L, 4L))._3, "tone bin must be above average")
    Multimodal.SpectralBins.filter(_ != 4).foreach { k =>
      assert(!got((1L, k.toLong))._3, s"bin $k must not be above average")
      assert(got((1L, k.toLong))._2 * 100 < e4,
        s"bin $k leakage too high: ${got((1L, k.toLong))._2} vs $e4")
    }
    // clip 2 (silence): all-zero energies, nothing above average
    Multimodal.SpectralBins.foreach { k =>
      assert(got((2L, k.toLong))._2 == 0L && !got((2L, k.toLong))._3)
    }
  }

  test("audio fingerprint: identical clips match at 0, perturbed within band, distinct miss (q235)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    def pcm16(samples: Seq[Int]): Array[Byte] =
      samples.flatMap { v =>
        val x = if (v < 0) v + 65536 else v
        Seq((x & 0xFF).toByte, ((x >> 8) & 0xFF).toByte)
      }.toArray
    // 4 x 32-sample frames of deterministic pseudo-noise
    val rnd = new scala.util.Random(42)
    val base = Seq.fill(128)(rnd.nextInt(2000) - 1000)
    val rnd2 = new scala.util.Random(7)
    val other = Seq.fill(128)(rnd2.nextInt(2000) - 1000)
    // mild re-recording: +1 on every sample of the last frame only
    val perturbed = base.take(96) ++ base.drop(96).map(_ + 1)
    // short clip: 3 frames only -> no fingerprint
    val short3 = base.take(96)
    def rec(id: Long, ss: Seq[Int]) = Multimodal.MediaRecord(
      id, "audio/wav", Multimodal.wavPayload(1, 8000, pcm16(ss)))
    val fps = Multimodal.audioFingerprints(spark.createDataset(Seq(
      rec(1L, base), rec(2L, base), rec(3L, perturbed),
      rec(4L, other), rec(5L, short3))))
    val fpMap = fps.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!fpMap.contains(5L), "3-frame clip must hold no fingerprint")
    assert(fpMap(1L) == fpMap(2L))
    // 45-bit packing stays in range
    fpMap.values.foreach(fp => assert(fp >= 0L && fp < (1L << 45)))
    val got = Multimodal.matchFingerprints(fps)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((1L, 2L)) == 0L)
    // the match table is EXACTLY the pairs within Hamming 2 of each
    // other (pigeonhole completeness at 3 chunks): recompute naively
    val ids = fpMap.keys.toSeq.sorted
    val want = (for {
      a <- ids; b <- ids if a < b
      h = java.lang.Long.bitCount(fpMap(a) ^ fpMap(b))
      if h <= 2
    } yield (a, b) -> h.toLong).toMap
    assert(got == want)
    // the perturbed twin flips only last-transition bits (frames 0-2
    // untouched -> transitions 0-1 identical)
    assert(((fpMap(1L) ^ fpMap(3L)) & ((1L << 30) - 1)) == 0L,
      "perturbation outside frame 3 must not flip transition-0/1 bits")
    // independent noise is far outside the band
    assert(java.lang.Long.bitCount(fpMap(1L) ^ fpMap(4L)) > 2)
  }

  test("scene cuts: a byte-level jump fires exactly at its transition (q244)") {
    val spark = SparkTestSession.spark
    // 4 frames x 10 bytes: quiet, quiet, LOUD, loud -> the only cut
    // is the 2->3 transition (j = 2); constant clip -> no cuts
    val quiet = Array.fill(20)(10.toByte)
    val loud = Array.fill(20)(100.toByte)
    val jump = quiet ++ loud
    val flat = Array.fill(40)(10.toByte)
    def rec(id: Long, body: Array[Byte], frames: Int) =
      Multimodal.MediaRecord(id, "video/avi",
        Multimodal.aviPayload(320, 240, frames, body))
    val ds = spark.createDataset(Seq(
      rec(1L, jump, 4), rec(2L, flat, 4)))(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord])
    val got = Multimodal.sceneCutsOn(ds).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(4)).toMap
    assert(got((1L, 1L)) == false && got((1L, 2L)) == true &&
      got((1L, 3L)) == false)
    assert(Seq(1L, 2L, 3L).forall(j => !got((2L, j))))
    // and the fixture-driven entry emits one row per interior
    // transition with consistent energies
    val entry = Multimodal.sceneCuts(spark, SparkTestSession.sf).collect()
    assert(entry.nonEmpty)
    entry.foreach { r =>
      val (ep, ec, cut) = (r.getLong(2), r.getLong(3), r.getBoolean(4))
      assert(cut == (8L * math.abs(ec - ep) > ep + ec))
    }
  }

  test("q255 activity segments exactly tile the non-quiet windows of the energy contour") {
    val sf = SparkTestSession.sf
    val contour = Multimodal.audioEnergy(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(3), r.getBoolean(4))).toMap
    val segs = Multimodal.activitySegments(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(segs.nonEmpty)
    // each segment is a maximal run: every window inside is active,
    // span matches count, energy is the windows' sum, and the windows
    // just outside the span are quiet or absent
    segs.foreach { case (id, s, e, n, energy) =>
      assert(e - s + 1 == n, s"clip $id span")
      val inside = (s to e).map(w => contour((id, w.toInt)))
      assert(inside.forall(!_._2), s"clip $id has a quiet window inside")
      assert(energy == inside.map(_._1).sum, s"clip $id energy")
      for (w <- Seq(s - 1, e + 1))
        assert(contour.get((id, w.toInt)).forall(_._2),
          s"clip $id segment not maximal at window $w")
    }
    // tiling: segment windows partition the active set exactly
    val covered = segs.flatMap { case (id, s, e, _, _) =>
      (s to e).map(w => (id, w.toInt)) }.toSet
    // NB: Map.collect over key tuples would rebuild a Map and collapse
    // one entry per clip — filter().keySet keeps every (clip, window)
    val active = contour.filter(!_._2._2).keySet
    assert(covered == active)
  }

  test("q256 patch grid conserves pixel mass and emits a full 4x4 grid per image") {
    val sf = SparkTestSession.sf
    val rows = Multimodal.patchGrid(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val byImage = rows.groupBy(_._1)
    // recompute whole-image totals from the raw bytes
    import org.apache.spark.sql.functions.{col, octet_length}
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .where(col("doc_id") % 3 === 0 && octet_length(col("text")) >= 1)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    byImage.foreach { case (id, patches) =>
      assert(patches.length == 16, s"image $id patch count")
      assert(patches.map(p => (p._2, p._3)).toSet ==
        (for (a <- 0L to 3L; b <- 0L to 3L) yield (a, b)).toSet)
      val body = docs(id).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = body.length
      val (w, h) = (16 + n % 64, 16 + n % 48)
      assert(patches.map(_._4).sum == w.toLong * h, s"image $id n_px")
      var total = 0L
      for (r <- 0 until h; c <- 0 until w)
        total += body(((r * w + c) * 3) % n) & 0xFF
      assert(patches.map(_._5).sum == total, s"image $id intensity mass")
      patches.foreach(p => assert(p._6 == p._5 * 1000L / p._4))
    }
  }
}
