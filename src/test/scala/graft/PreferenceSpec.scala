package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Preference

class PreferenceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.01"

  test("q269 conservation laws: total Borda points == total pairwise wins") {
    val scores = Preference.preferenceScores(spark, sf).collect()
    assert(scores.nonEmpty)
    val totalBorda = scores.map(_.getLong(2)).sum
    val totalWins = scores.map(_.getLong(3)).sum
    // each contest of size m hands out m(m-1)/2 Borda points AND
    // m(m-1)/2 pairwise wins — the same quantity by construction
    assert(totalBorda == totalWins)
    val contests = Preference.contestRanked(spark, sf)
      .groupBy(col("user_id"), col("d")).agg(max(col("m")).as("m"))
      .collect().map(_.getLong(2))
    val expectPairs = contests.map(m => m * (m - 1) / 2).sum
    assert(totalWins == expectPairs)
  }

  test("q269 Copeland is bounded by the opponent count and sums to <= 0 asymmetry") {
    val scores = Preference.preferenceScores(spark, sf).collect()
    val k = scores.length
    scores.foreach { r =>
      assert(math.abs(r.getLong(4)) <= (k - 1).toLong,
        s"${r.getString(0)} copeland out of bounds")
    }
    // pairwise: a beats b contributes +1 to a and -1 to b, ties 0 —
    // so the Copeland column always sums to exactly zero
    assert(scores.map(_.getLong(4)).sum == 0L)
  }

  test("q270 Bradley-Terry: normalization, positivity, and MM convergence") {
    val p15 = Preference.bradleyTerry(spark, sf, iters = 15)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val p16 = Preference.bradleyTerry(spark, sf, iters = 16)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(p15.nonEmpty && p15.keySet == p16.keySet)
    val total = p15.values.sum
    // renormalization targets 1e6; truncation loses < k micros
    assert(total <= 1000000L && total > 1000000L - p15.size)
    p15.values.foreach(v => assert(v >= 0L))
    // one more MM round moves every strength by < 1% of the scale:
    // the iteration has converged, the reported fit is a fixed point
    p15.foreach { case (t, v) =>
      assert(math.abs(v - p16(t)) < 10000L, s"$t not converged: $v vs ${p16(t)}")
    }
  }

  test("q270 strength ORDER matches an independent float MM fit of the same matrix") {
    // BT is allowed to disagree with raw win totals (that is the
    // point — it discounts wins over weak opponents; the fixture
    // genuinely swaps click/signup). The right ordering check is
    // against an independent double-precision MM fit run to deep
    // convergence from the same win matrix.
    val wins = Preference.pairWins(Preference.contestRanked(spark, sf))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    val types = wins.keys.flatMap(k => Seq(k._1, k._2)).toSeq.distinct.sorted
    def w(a: String, b: String) = wins.getOrElse((a, b), 0L).toDouble
    var p = types.map(_ => 1.0)
    for (_ <- 1 to 200) {
      val raw = types.zipWithIndex.map { case (a, i) =>
        val wi = types.map(b => w(a, b)).sum
        val denom = types.zipWithIndex.collect {
          case (b, j) if j != i && (w(a, b) + w(b, a)) > 0 =>
            (w(a, b) + w(b, a)) / (p(i) + p(j))
        }.sum
        if (denom == 0) p(i) else wi / denom
      }
      val s = raw.sum
      p = raw.map(_ / s)
    }
    val floatOrder = types.zip(p).sortBy(-_._2).map(_._1)
    val gotOrder = Preference.bradleyTerry(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2))).sortBy(-_._2).map(_._1).toSeq
    assert(gotOrder == floatOrder)
  }

  test("q321 preference pairs: selections equal a replay under the composite order; pairs well-formed") {
    val scored = graft.operators.Experiment.rocAucScored(spark, sf)
      .select(col("doc_id"), col("score")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .filter(d => scored.contains(d._1))
    val want = docs.groupBy(d => (d._2, d._3)).collect {
      case ((src, lang), ds) if ds.length >= 2 =>
        val byOrder = ds.map(d => (scored(d._1), d._1)).sorted
        val (loS, loId) = byOrder.head
        val (hiS, hiId) = byOrder.last
        (src, lang, ds.length.toLong, hiId, loId, hiS, loS, hiS - loS)
    }.toSeq.sortBy(p => (p._1, p._2))
    val got = Preference.preferencePairs(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .sortBy(p => (p._1, p._2))
    assert(got.toSeq == want.toSeq)
    // well-formed pairs: distinct docs, nonnegative margin, scores
    // really are the stratum extremes
    assert(got.nonEmpty)
    got.foreach { p =>
      assert(p._4 != p._5, s"${p._1}/${p._2} chose itself")
      assert(p._8 >= 0L && p._6 >= p._7)
    }
    // margins genuinely vary on the fixture (not all ties)
    assert(got.exists(_._8 > 0L))
  }

  test("q321 packed-key guard raises on ids outside the declared domain instead of silently reordering") {
    val spark = SparkTestSession.spark
    // the fixture's ids are inside [0, 10^7) so the default passes
    // (every green q321 row proves that); an idBound BELOW the
    // corpus's ids must fail loudly with the documented message
    val e = intercept[Exception] {
      graft.operators.Preference
        .preferencePairs(spark, SparkTestSession.sf, idBound = 10L)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("packed-key")), s"unexpected: $e")
  }

  test("q353 length-bias audit: per-pair lengths replay; sign-test globals are exact") {
    val lens = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Preference.preferencePairs(spark, sf).collect()
      .map(r => (r.getLong(3), r.getLong(4))) // chosen_id, rejected_id
    val gaps = pairs.map { case (c, rj) => lens(c) - lens(rj) }
    val nTies = gaps.count(_ == 0L).toLong
    val nLonger = gaps.count(_ > 0L).toLong
    val wantPpm = nLonger * 1000000L / (pairs.length - nTies)
    val wantGap = gaps.sum * 1000L / pairs.length
    val got = Preference.lengthBiasAudit(spark, sf)
      .select("chosen_id", "rejected_id", "chosen_len", "rejected_len",
        "len_gap", "chosen_longer", "n_pairs", "n_ties", "longer_ppm",
        "mean_gap_milli")
      .collect()
    assert(got.length == pairs.length)
    got.foreach { r =>
      assert(r.getLong(2) == lens(r.getLong(0)))
      assert(r.getLong(3) == lens(r.getLong(1)))
      assert(r.getLong(4) == r.getLong(2) - r.getLong(3))
      assert(r.getBoolean(5) == (r.getLong(4) > 0L))
      assert(r.getLong(6) == pairs.length.toLong)
      assert(r.getLong(7) == nTies)
      assert(r.getLong(8) == wantPpm)
      assert(r.getLong(9) == wantGap)
    }
    // the audit is non-vacuous: the fixture's judge shows a real
    // direction (not exactly 50/50), and both directions occur
    assert(wantPpm != 500000L)
    assert(gaps.exists(_ > 0L) && gaps.exists(_ < 0L))
  }
}
