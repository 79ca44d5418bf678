package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{CleanPipeline, Dedup, TextAnalysis}

class CleanPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  def sf: String = SparkTestSession.sf
  import spark.implicits._

  test("cleanCorpus applies all four gates on a fixture with known structure") {
    // doc 1: good English text, unique           -> survives
    // doc 2: exact copy of 1 (higher id)         -> dropped (exact dedup)
    // doc 3: near-dup of 1, one word changed     -> dropped (near-dup, id_b)
    // doc 4: no language markers at all ('und')  -> dropped (lang gate)
    // doc 5: too short                           -> dropped (token gate)
    // doc 6: good English, unrelated             -> survives
    val good = ("the project is built of many parts and " +
      "the tests are run for each of them with care in every case " +
      "and the results are kept on record for the future")
    val near = good.replace("record", "CHANGED")
    val unidentifiable = Seq.tabulate(25)(i => s"zz${i}qx").mkString(" ")
    val short = "the end is here"
    val other = ("a list of other words and phrases for the second " +
      "document that is long enough to pass the gate and stands on " +
      "its own with no copies in the corpus at all everywhere")
    Seq((1L, good), (2L, good), (3L, near), (4L, unidentifiable), (5L, short), (6L, other))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet("/tmp/graft-clean-test/documents.parquet")
    val out = CleanPipeline.cleanCorpus(spark, "/tmp/graft-clean-test",
      minTokens = 20, jaccardThreshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.map(_._1).sorted.toSeq == Seq(1L, 6L), s"got ${out.toSeq}")
    assert(out.forall(_._2 == "en"))
    assert(out.forall(_._3 >= 20))
  }

  test("cleanCorpus on the fixture equals the stage-by-stage composition") {
    val out = CleanPipeline.cleanCorpus(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val lang = TextAnalysis.langId(spark, sf)
      .filter(col("lang_pred") =!= "und")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val toks = TextAnalysis.tokenStats(spark, sf)
      .filter(col("n_ws_tokens") >= 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val exact = Dedup.exactSurvivors(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val nearDrop = Dedup.minhashLshPairsVerified(spark, sf)
      .select("id_b").collect().map(_.getLong(0)).toSet
    assert(out == ((lang & toks & exact) -- nearDrop))
    assert(out.nonEmpty)
  }

  test("quality verdict: each gate fires alone on its crafted doc, fixed reason order") {
    val healthy = "the cat sat on the mat and the dog is here " +
      "for a walk in the park with me today friends"
    val docs = Seq(
      (1L, healthy),
      (2L, "a b"),                                     // short (+ tiny-alphabet entropy)
      (3L, (1 to 60).map(i => s"the tok$i").mkString(" ")), // > 400 chars, varied
      (4L, (1 to 16).map(i => s"kumquat$i").mkString(" ")), // no stopwords
      (5L, Seq.fill(12)("the quick brown fox jumps").mkString(" ")), // period-5 grams
      (6L, "write to me at foo@bar.com about the plan for the day " +
        "with all of us today okay")
    ).toDF("doc_id", "text")
    val got = graft.operators.CleanPipeline.qualityVerdictOn(docs)
      .collect()
      .map(r => r.getLong(0) -> (r.getBoolean(3), r.getString(4)))
      .toMap
    assert(got(1L) == ((true, "")))
    assert(got(2L) == ((false, "too_short,low_entropy")))
    assert(got(3L) == ((false, "too_long")))
    assert(got(4L) == ((false, "low_stopword")))
    assert(got(5L) == ((false, "repetitive")))
    assert(got(6L) == ((false, "has_pii")))
    // planting: doc_id % 7 == 0 gains an email even when the text has
    // none — the PII gate has positives on any corpus slice
    val planted = graft.operators.CleanPipeline
      .qualityVerdictOn(Seq((7L, healthy)).toDF("doc_id", "text"))
      .head()
    assert(!planted.getBoolean(3) && planted.getString(4) == "has_pii")
    // round-12: the q234 encoding gate joined the verdict — a crafted
    // mojibake doc and the % 11 planting both carry the reason code
    val mojiDoc = healthy + " caf\u00c3\u00a9"
    val gotMoji = graft.operators.CleanPipeline
      .qualityVerdictOn(Seq((1L, mojiDoc), (11L, healthy))
        .toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(gotMoji(1L) == "mojibake")
    assert(gotMoji(11L) == "mojibake")
  }

  test("dp release: noise follows the exact dyadic two-sided geometric (q241)") {
    val spark = SparkTestSession.spark
    val got = graft.operators.CleanPipeline
      .dpGeometricRelease(spark, SparkTestSession.sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (rel, noise, tru, eps) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(rel == tru + noise)
      assert(eps == graft.operators.CleanPipeline.DpEpsilonMicro)
      // independent recompute of the inverse CDF from the md5 word
      val et = r.getString(0)
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(("dp:" + et).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val u = java.lang.Long.parseLong(hex, 16)
      val a = 3L * u
      val b = 3L * (4294967295L - u)
      def bl(x: Long) = if (x == 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(x)
      val want =
        if (a < 4294967296L) -(33 - bl(a))
        else if (b < 4294967296L) 33 - bl(b)
        else 0
      assert(noise == want, s"type $et")
    }
    // distribution sanity on the grid itself: thirds are exact
    val N = 1 << 20
    var zero = 0
    var neg = 0
    (0 until N).foreach { i =>
      val u = i.toLong * 4096 // stride the 32-bit grid
      val a = 3 * u; val b = 3 * (4294967295L - u)
      if (a >= 4294967296L && b >= 4294967296L) zero += 1
      else if (a < 4294967296L) neg += 1
    }
    assert(math.abs(zero.toDouble / N - 1.0 / 3) < 0.01)
    assert(math.abs(neg.toDouble / N - 1.0 / 3) < 0.01)
  }

  test("luhn pii: checksum separates valid from same-length invalid (q242)") {
    val spark = SparkTestSession.spark
    val got = graft.operators.TextAnalysis
      .luhnPii(spark, SparkTestSession.sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.nonEmpty)
    // planting: % 9 == 0 docs carry the valid card, % 9 == 3 the
    // invalid twin — candidate counted, checksum refused
    got.foreach { case (id, (nc, nv)) =>
      assert(nv <= nc)
      if (id % 9 == 0) assert(nv >= 1, s"doc $id lost its valid card")
      if (id % 9 == 3) assert(nv == 0 || nc > nv,
        s"doc $id validated the invalid number")
    }
    assert(got.keys.exists(_ % 9 == 0) && got.keys.exists(_ % 9 == 3))
    // the classic test number is Luhn-valid, its +1 twin is not
    // (driver-side recompute of the same checksum)
    def luhn(s: String): Boolean = {
      val sum = s.zipWithIndex.map { case (ch, i0) =>
        val d = ch - '0'
        if ((s.length - (i0 + 1)) % 2 == 0) d
        else { val dd = 2 * d; if (dd > 9) dd - 9 else dd }
      }.sum
      sum % 10 == 0
    }
    assert(luhn("4111111111111111") && !luhn("4111111111111112"))
  }

  test("q282 secret scan: entropy gate flags the planted key, rejects the repeated-pattern decoy") {
    val spark = SparkTestSession.spark
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def entGapOk(c: String): Boolean = {
      val n = c.length
      val s = c.groupBy(identity).values.map(_.length).filter(_ > 1)
        .map(k => k.toLong *
          math.floor(1e6 * math.log(k.toDouble)).toLong).sum
      math.floor(1e6 * math.log(n.toDouble)).toLong * n - s >= 2000000L * n
    }
    val docs = spark.read
      .parquet(s"${SparkTestSession.sf}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.flatMap { case (id, text) =>
      val t = text +
        (if (id % 7 == 0) " api_key=" + md5hex("sk:" + id) else "") +
        (if (id % 7 == 3) " session=" + "ab" * 16 else "")
      val cands = "[a-z0-9]{24,}".r.findAllIn(t).toSeq
      if (cands.isEmpty) None
      else {
        val secrets = cands.filter(entGapOk).sorted
        Some((id, cands.size.toLong, secrets.size.toLong,
          md5hex(secrets.mkString(","))))
      }
    }.sortBy(_._1)
    val rows = graft.operators.TextAnalysis
      .secretScan(spark, SparkTestSession.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(rows.toSeq == expect.toSeq)
    // a real key is caught; the same-shape low-entropy decoy is not
    assert(expect.exists(e => e._1 % 7 == 0 && e._3 == 1))
    assert(expect.filter(_._1 % 7 == 3).forall(_._3 == 0))
    assert(expect.exists(_._1 % 7 == 3), "decoy population must exist")
  }

  test("k-anonymity audit: small classes and homogeneous classes both suppress") {
    // class (sA, bucket 0): 6 members, 2 langs → passes both gates;
    // class (sB, bucket 0): 2 members → k fails;
    // class (sC, bucket 0): 6 members all one lang → l fails
    val docs = (
      (1 to 3).map(i => (i.toLong, "x", "en", "sA", 10L)) ++
      (4 to 6).map(i => (i.toLong, "x", "de", "sA", 10L)) ++
      Seq((7L, "x", "en", "sB", 10L), (8L, "x", "de", "sB", 10L)) ++
      (9 to 14).map(i => (i.toLong, "x", "en", "sC", 10L))
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite")
      .parquet("/tmp/graft-kanon-test/documents.parquet")
    val got = graft.operators.CleanPipeline
      .kAnonymityAudit(spark, "/tmp/graft-kanon-test")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5),
          r.getBoolean(6)))
      .toMap
    assert(got("sA") == ((6L, 2L, true, true, false)))
    assert(got("sB") == ((2L, 2L, false, true, true)))
    assert(got("sC") == ((6L, 1L, true, false, true)))
  }

  test("source scorecard: conservation and naive dup-rate recount") {
    val spark = SparkTestSession.spark
    val rows = graft.operators.CleanPipeline
      .sourceScorecard(spark, SparkTestSession.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val docs = graft.sources.Tables
      .load(spark, SparkTestSession.sf, "documents")
      .select(org.apache.spark.sql.functions.col("source"),
        graft.operators.TextAnalysis.normalizedText(
          org.apache.spark.sql.functions.col("text")).as("nt"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.map(_._2).sum == docs.length.toLong)
    val fpCount = docs.groupBy(_._2).view.mapValues(_.length).toMap
    val dupBySource = docs.filter(d => fpCount(d._2) > 1)
      .groupBy(_._1).view.mapValues(_.length.toLong).toMap
    rows.foreach { case (src, nd, _, ndup, rate, _) =>
      assert(ndup == dupBySource.getOrElse(src, 0L), s"source $src")
      assert(rate == ndup * 1000000L / nd)
    }
    // token shares tile the corpus (truncation loses < #sources units)
    val shares = rows.map(_._6).sum
    assert(shares <= 1000000L && shares > 1000000L - rows.length * 2)
  }

  test("q264 pseudonymized join equals the original-key join and salting is collision-free") {
    import org.apache.spark.sql.functions._
    val sf = SparkTestSession.sf
    val got = graft.operators.CleanPipeline.pseudonymizedJoin(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val orig = graft.sources.Tables.load(spark, sf, "orders")
      .join(graft.sources.Tables.load(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("o_custkey")).as("nc"),
        count(lit(1)).as("no"),
        sum(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .as("rev"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == orig, "pseudonym-space join must preserve every FK edge")
    // collision audit: pseudonyms are injective on the key domain
    val cust = graft.sources.Tables.load(spark, sf, "customer")
    val nKeys = cust.select(col("c_custkey")).distinct().count()
    val nPseud = cust.select(
      md5(concat(lit("pseud:"), col("c_custkey").cast("string"))))
      .distinct().count()
    assert(nKeys == nPseud)
  }

  test("q355 t-closeness equals a BigInt EMD replay; bounds and non-vacuity hold") {
    val docs = spark.read
      .parquet(s"${SparkTestSession.sf}/documents.parquet")
      .select("source", "n_chars", "lang").collect()
      .map(r => (r.getString(0), math.min(r.getLong(1) / 64, 9L),
        r.getString(2)))
    val langs = docs.map(_._3).distinct.sorted
    val n = docs.length.toLong
    val v = langs.length.toLong
    val globCum = langs.map { l =>
      l -> docs.count(d => d._3 <= l).toLong }.toMap
    val want = docs.groupBy(d => (d._1, d._2)).map { case ((s, b), g) =>
      val nCell = g.length.toLong
      val emd = langs.map { l =>
        val cumCell = g.count(_._3 <= l).toLong
        (BigInt(cumCell) * n - BigInt(globCum(l)) * nCell).abs
      }.sum
      ((s, b), (nCell, (emd * 1000000 / (BigInt(nCell) * n * (v - 1)))
        .toLong))
    }
    val got = CleanPipeline.tClosenessAudit(spark, SparkTestSession.sf)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getBoolean(4))))
    assert(got.length == want.size)
    got.foreach { case (key, (nCell, tPpm, tOk)) =>
      val (wN, wT) = want(key)
      assert(nCell == wN && tPpm == wT, s"cell $key")
      assert(tOk == (tPpm <= 200000L))
      assert(tPpm >= 0L && tPpm <= 1000000L)
    }
    // small cells genuinely diverge from the global mix
    assert(got.exists(_._2._2 > 0L), "every cell matches globally - vacuous")
  }

  test("q361 toxicity gate: planted docs score exactly; fixture is organically clean") {
    // the fixture corpus never contains lexicon words — that's the
    // expected clean-corpus reading, and it must NOT quarantine
    val clean = CleanPipeline.toxicityGate(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(clean.nonEmpty)
    assert(clean.forall(t => t._4 == 0L && t._5 == 0L && !t._7),
      "organic fixture should be hit-free")
    // planted corpus through the SAME core: multiplicity, weighting,
    // per-doc flag, and the source-grain quarantine all exact.
    // bad: "kill kill hate" = hits 3, score 3+3+2=8, 3 words
    //      -> score_ppm 2_666_666 > 20_000 -> flagged
    //      "Stupid idiot!" normalizes to "stupid idiot!" — "idiot!"
    //      is NOT a whole-word hit (word equality, not substring):
    //      hits 1, score 1, 2 words -> 500_000 ppm -> flagged
    // ok:  "the data pipeline runs" + "kill" x1 in a 50-word doc
    //      -> score_ppm 3*1e6/50 = 60_000 > 20_000 -> flagged, but
    //      the source's OTHER 19 docs are clean -> 50_000 ppm share
    //      -> below the 100_000 quarantine bar
    val okDocs = (1 to 19).map(i =>
      (100L + i, "ok", ("spark " * 10).trim)) :+
      (120L, "ok", (("spark " * 49).trim + " kill"))
    val docs = (Seq(
      (1L, "bad", "kill kill hate"),
      (2L, "bad", "Stupid idiot!")) ++ okDocs)
      .toDF("doc_id", "source", "text")
    val got = CleanPipeline.toxicityGateOn(docs).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    assert(got("bad") == ((2L, 2L, 4L, 9L, 1000000L, true)),
      s"bad source wrong: ${got("bad")}")
    assert(got("ok") == ((20L, 1L, 1L, 3L, 50000L, false)),
      s"ok source wrong: ${got("ok")}")
  }

  test("q375 filter curve: threshold-0 keeps all; monotone tradeoff laws") {
    val rows = CleanPipeline.filterOperatingCurve(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8)))
    assert(rows.nonEmpty)
    // threshold 0 is the identity filter (scores are nonnegative)
    rows.filter(_._2 == 0L).foreach { t =>
      assert(t._5 == t._3 && t._6 == t._4 && t._7 == 1000000L)
    }
    rows.groupBy(_._1).values.foreach { g =>
      val byT = g.sortBy(_._2)
      // kept docs and kept tokens can only shrink as the bar rises
      byT.map(_._5).sliding(2).foreach(p => assert(p.head >= p.last))
      byT.map(_._6).sliding(2).foreach(p => assert(p.head >= p.last))
      // survivors' mean quality can only rise (where anything is kept)
      byT.map(_._9).filter(_ >= 0L).sliding(2)
        .foreach(p => if (p.length == 2) assert(p.head <= p.last))
    }
    // the grid genuinely discriminates somewhere: the top bar drops
    // documents for at least one source
    assert(rows.filter(_._2 == 300000L).exists(t => t._5 < t._3),
      "top threshold filters nothing - vacuous")
  }
}
