package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Experiment

class ExperimentSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  def sf: String = SparkTestSession.sf

  private lazy val events = graft.sources.Tables.load(spark, sf, "events")
    .selectExpr("user_id", "unix_micros(ts) as us", "event_id",
      "event_type", "value")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
      r.getDouble(4)))

  test("ab test: counts match an independent unit build; z from the same formula") {
    val row = Experiment.abTest(spark, sf).collect().head
    val units = events.groupBy { case (u, us, _, _, _) =>
      (u, java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L))
        .atZone(java.time.ZoneOffset.UTC).toLocalDate)
    }.toSeq.map { case ((u, _), rows) =>
      (u % 2, if (rows.exists(_._4 == "purchase")) 1L else 0L)
    }
    val nA = units.count(_._1 == 0).toLong
    val nB = units.count(_._1 == 1).toLong
    val cA = units.filter(_._1 == 0).map(_._2).sum
    val cB = units.filter(_._1 == 1).map(_._2).sum
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3)) == ((nA, nB, cA, cB)))
    val p = (cA + cB).toDouble / (nA + nB)
    val z = (cA.toDouble / nA - cB.toDouble / nB) /
      math.sqrt(p * (1 - p) * (1.0 / nA + 1.0 / nB))
    assert(row.getDouble(4) == cA.toDouble / nA)
    assert(row.getDouble(5) == cB.toDouble / nB)
    assert(row.getDouble(6) == z, "z must be bit-identical: all inputs " +
      "are exact counts through single IEEE operations")
  }

  test("attribution: last touch and 7-day counts match a naive per-user sweep; one shuffle") {
    val df = Experiment.attribution(spark, sf)
    val got = df.collect().map(r => r.getLong(0) ->
      ((Option(r.getString(4)), r.getLong(5), r.getLong(6)))).toMap
    val stream = events
      .filter(e => Set("click", "view", "purchase").contains(e._4))
    val byUser = stream.groupBy(_._1)
    var checked = 0
    byUser.foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      ordered.zipWithIndex.filter(_._1._4 == "purchase").foreach {
        case ((_, pus, pid, _, _), i) =>
          val touches = ordered.take(i + 1)
            .filter(t => t._4 == "click" || t._4 == "view")
          val lastTouch = touches.lastOption.map(_._4)
          val inRange = ordered
            .filter(t => t._2 >= pus - 7L * 86400L * 1000000L && t._2 <= pus)
          val (o, c, v) = got(pid)
          assert(o == lastTouch, s"purchase $pid last touch")
          assert(c == inRange.count(_._4 == "click"), s"purchase $pid clicks")
          assert(v == inRange.count(_._4 == "view"), s"purchase $pid views")
          checked += 1
      }
    }
    assert(checked == got.size && checked > 0)
    // all three windows ride ONE user_id exchange
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n == 1, s"expected a single shuffle, saw $n:\n$plan")
  }

  test("co-occurrence matches a naive basket build; support fractions exact") {
    val got = Experiment.coOccurrence(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    val units = events.groupBy { case (u, us, _, _, _) =>
      (u, Math.floorDiv(us, 86400000000L))
    }.view.mapValues(_.map(_._4).toSet).toMap
    val nUnits = units.size.toLong
    val want = units.values.toSeq
      .flatMap(ts => ts.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (pair, n) =>
      assert(got(pair) == ((n, n.toDouble / nUnits)), s"pair $pair")
    }
    got.keys.foreach { case (a, b) => assert(a < b) }
  }

  test("cep pattern: paths follow the total order; matches agree with a naive regex sweep") {
    val got = Experiment.cepPattern(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) ->
        ((r.getString(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5),
          r.getLong(6)))).toMap
    val initial = Map("view" -> 'v', "click" -> 'c', "purchase" -> 'p',
      "signup" -> 's').withDefaultValue('e')
    val browse = "v+c+p".r
    val burst = "e{2,}".r
    val naive = events.groupBy { case (u, us, _, _, _) =>
      (u, java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L))
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString)
    }.toSeq.flatMap { case (k, rows) =>
      val path = rows.sortBy(r => (r._2, r._3)).map(r => initial(r._4))
        .mkString
      val bb = browse.findFirstIn(path).isDefined
      val eb = burst.findFirstIn(path).isDefined
      if (bb || eb)
        Some(k -> ((path, rows.length.toLong, bb, eb,
          path.count(_ == 'p').toLong)))
      else None
    }.toMap
    assert(got == naive)
    assert(got.nonEmpty)
  }

  test("association rules: marginals consistent, symmetric pair counts, lift symmetric") {
    val rows = Experiment.associationRules(spark, SparkTestSession.sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case ((a, b), (na, nb, nab, conf, lift)) =>
      // reversed direction exists with mirrored counts and equal lift
      val (rna, rnb, rnab, _, rlift) = rows((b, a))
      assert(rna == nb && rnb == na && rnab == nab)
      assert(rlift == lift, s"lift must be symmetric for ($a,$b)")
      assert(conf == nab.toDouble / na.toDouble)
      assert(nab <= na && nab <= nb, "a pair can't outnumber a marginal")
    }
  }

  test("km survival matches an independent estimator; curve is nonincreasing") {
    val got = Experiment.kmSurvival(spark, SparkTestSession.sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // independent unit build + KM recursion in plain Scala
    val units = graft.sources.Tables
      .load(spark, SparkTestSession.sf, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"),
        unix_micros(col("ts")).as("us"), col("event_type")).collect()
      .map(r => ((r.getLong(0), r.getDate(1).toString),
        (r.getLong(2), r.getString(3))))
      .groupBy(_._1).values.map { rows =>
        val ts = rows.map(_._2)
        val t0 = ts.map(_._1).min
        val tp = ts.filter(_._2 == "purchase").map(_._1)
          .minOption
        val tl = ts.map(_._1).max
        ((tp.getOrElse(tl) - t0) / 60000000L, tp.isDefined)
      }.toSeq
    val byDur = units.groupBy(_._1).view.mapValues { us =>
      (us.count(_._2).toLong, us.count(!_._2).toLong)
    }.toMap
    val total = units.size.toLong
    var gone = 0L
    var logSurv = 0L
    val expect = byDur.toSeq.sortBy(_._1).flatMap { case (dur, (d, c)) =>
      val n = total - gone
      gone += d + c
      if (n > d) {
        logSurv += math.floor(1000000.0 *
          math.log((n - d).toDouble / n.toDouble)).toLong
        Some(dur -> (n, d, c, logSurv))
      } else None
    }
    assert(got.toMap == expect.toMap,
      s"got=${got.length} expect=${expect.length}")
    // survival never increases (log_surv_micro nonincreasing in time)
    val curve = got.sortBy(_._1).map(_._2._4)
    assert(curve.zip(curve.drop(1)).forall { case (a, b) => b <= a })
  }

  test("listagg WITHIN GROUP paths are char-identical to the collect_list device") {
    val viaListagg = Experiment.listaggPaths(spark, SparkTestSession.sf)
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) ->
        (r.getString(2), r.getLong(3))).toMap
    // q134's array_sort(collect_list) formulation, minus its match filter
    val initial = when(col("event_type") === "view", "v")
      .when(col("event_type") === "click", "c")
      .when(col("event_type") === "purchase", "p")
      .when(col("event_type") === "signup", "s")
      .otherwise("e")
    val viaCollect = graft.sources.Tables
      .load(spark, SparkTestSession.sf, "events")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("ts"), col("event_id"),
          initial.as("i")))), x => x.getField("i")), "").as("path"),
        count(lit(1)).as("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) ->
        (r.getString(2), r.getLong(3))).toMap
    assert(viaListagg == viaCollect)
    assert(viaListagg.nonEmpty)
  }

  test("cuped: perfectly predictive covariate removes ALL metric variance") {
    import spark.implicits._
    // y = 2x exactly → θ = 2 and every user's adjusted metric is the
    // same constant y − 2(x − x̄) = 2x̄ = 500 cents
    val rows = Seq(
      (1L, 0L, "2024-01-01 10:00:00", 1.00), (2L, 0L, "2024-01-03 10:00:00", 2.00),
      (3L, 1L, "2024-01-01 10:00:00", 2.00), (4L, 1L, "2024-01-03 10:00:00", 4.00),
      (5L, 2L, "2024-01-01 10:00:00", 3.00), (6L, 2L, "2024-01-03 10:00:00", 6.00),
      (7L, 3L, "2024-01-01 10:00:00", 4.00), (8L, 3L, "2024-01-03 10:00:00", 8.00))
    rows.map { case (id, u, t, v) => (id, u, "purchase", t, v) }
      .toDF("event_id", "user_id", "event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .write.mode("overwrite")
      .parquet("/tmp/graft-cuped-test/events.parquet")
    val got = graft.operators.Experiment
      .cupedAbTest(spark, "/tmp/graft-cuped-test")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(6)))
      .toMap
    // variant 0 = users {0, 2}: y = 200 + 600; variant 1: 400 + 800
    assert(got(0L) == ((2L, 800L, 2L * 500000000L, 2000000L)))
    assert(got(1L) == ((2L, 1200L, 2L * 500000000L, 2000000L)))
  }

  test("churn labels: recency vs horizon, short-history users not observable") {
    import spark.implicits._
    // obs_end = 2024-02-01. A: last seen Jan 1 (recency 31 > 14,
    // history 31 ≥ 14) → churned. B: long history, last seen Jan 30
    // (recency 2) → observable, retained. C: first seen Jan 25
    // (history 7 < 14) → NOT observable, never labeled churned.
    val rows = Seq(
      (1L, 1L, "2024-01-01 10:00:00"),
      (2L, 2L, "2024-01-01 10:00:00"), (3L, 2L, "2024-01-30 10:00:00"),
      (4L, 3L, "2024-01-25 10:00:00"), (5L, 2L, "2024-02-01 10:00:00"))
    rows.map { case (id, u, t) => (id, u, "view", t, 1.0) }
      .toDF("event_id", "user_id", "event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .write.mode("overwrite")
      .parquet("/tmp/graft-churn-test/events.parquet")
    val got = graft.operators.Experiment
      .churnLabels(spark, "/tmp/graft-churn-test")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4), r.getBoolean(5), r.getBoolean(6)))
      .toMap
    assert(got(1L) == ((1L, 31L, true, true)))
    assert(got(2L) == ((3L, 0L, true, false)))
    assert(got(3L) == ((1L, 7L, false, false)))
  }

  test("roc auc: exact tie-corrected Mann-Whitney equals the naive pair count") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val row = graft.operators.Experiment
      .rocAuc(spark, SparkTestSession.sf).head()
    val (nPos, nNeg, u2, aucMicro) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    // naive replay: score + label per doc, then count (pos > neg) and
    // ties over all P*N pairs
    val docs = graft.sources.Tables
      .load(spark, SparkTestSession.sf, "documents")
    val scored = graft.operators.Experiment.rocAucScored(spark, SparkTestSession.sf)
      .collect().map(r => (r.getLong(1), r.getBoolean(2)))
    val pos = scored.filter(_._2).map(_._1)
    val neg = scored.filterNot(_._2).map(_._1)
    assert(pos.length.toLong == nPos && neg.length.toLong == nNeg)
    var wins = 0L; var ties = 0L
    pos.foreach(p => neg.foreach { q =>
      if (p > q) wins += 1 else if (p == q) ties += 1
    })
    // U2 = 2*wins + ties (doubled units)
    assert(u2 == 2 * wins + ties, s"u2 $u2 vs ${2 * wins + ties}")
    val expAuc = math.floor(1000000.0 * (2.0 * wins + ties) /
      (2.0 * pos.length * neg.length)).toLong
    assert(aucMicro == expAuc)
    assert(aucMicro > 500000L,
      "stopword ratio must separate English better than chance")
    // degenerate corpus (single class) hits the -1 sentinel
    val dir = "/tmp/graft-auc-degenerate"
    Seq((1L, "the the and of is"), (2L, "the and is of the"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val deg = graft.operators.Experiment.rocAuc(spark, dir).head()
    assert(deg.getLong(3) == -1L)
  }

  test("calibration bins: naive recount of deciles, rates, and gaps") {
    val spark = SparkTestSession.spark
    val got = graft.operators.Experiment
      .calibrationBins(spark, SparkTestSession.sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    val scored = graft.operators.Experiment
      .rocAucScored(spark, SparkTestSession.sf).collect()
      .map(r => (r.getLong(1), r.getBoolean(2)))
    val byBin = scored.groupBy { case (sc, _) => math.min(sc / 100000, 9L) }
    assert(got.keySet == byBin.keySet)
    byBin.foreach { case (bin, xs) =>
      val n = xs.length.toLong
      val ssum = xs.map(_._1).sum
      val pos = xs.count(_._2).toLong
      val mean = ssum / n
      val rate = pos * 1000000L / n
      val gap = mean - rate
      // round-12: reliability numerator reported micro-scaled
      // ((n*gap^2) DIV 1e6) with DECIMAL(38)/HUGEINT intermediates
      assert(got(bin) == ((n, mean, rate, gap, n * gap * gap / 1000000L)),
        s"bin $bin")
    }
  }

  test("scorer agreement: tau-b components match a naive pair walk (q247)") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions._
    val row = graft.operators.Experiment
      .scorerAgreement(spark, SparkTestSession.sf).head()
    val (nd, np, c, d, tx, ty) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5))
    // naive O(n^2) recompute over the collected binned pairs
    val sc = graft.operators.Experiment
      .rocAucScored(spark, SparkTestSession.sf)
      .select(col("doc_id"),
        least(floor(col("score").cast("double") / 100000.0)
          .cast("long"), lit(9L)).as("bx"))
    val ent = graft.operators.TextAnalysis.charEntropy(spark, SparkTestSession.sf)
      .select(col("doc_id"),
        least(expr("""greatest((CAST(FLOOR(1000000.0 * ln(CAST(n_chars AS DOUBLE)))
              AS BIGINT) * n_chars - s_micro) DIV n_chars DIV 100000 - 25,
            CAST(0 AS BIGINT))"""),
          lit(9L)).as("by"))
    val xs = sc.join(ent, Seq("doc_id"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(nd == xs.length)
    var cc = 0L; var dd = 0L; var ttx = 0L; var tty = 0L; var n0 = 0L
    for (i <- xs.indices; j <- (i + 1) until xs.length) {
      n0 += 1
      val ((x1, y1), (x2, y2)) = (xs(i), xs(j))
      if (x1 == x2) ttx += 1
      if (y1 == y2) tty += 1
      if (x1 != x2 && y1 != y2) {
        if ((x2 - x1) * (y2 - y1) > 0) cc += 1 else dd += 1
      }
    }
    assert(np == n0 && c == cc && d == dd && tx == ttx && ty == tty)
    assert(c > 0 && d > 0, "degenerate contingency - audit is vacuous")
  }

  test("benford audit: digit shares recount; benford constants pinned") {
    val spark = SparkTestSession.spark
    val rows = graft.operators.Experiment
      .benfordAudit(spark, SparkTestSession.sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(rows.keySet.subsetOf((1L to 9L).toSet))
    val cents = graft.sources.Tables
      .load(spark, SparkTestSession.sf, "events")
      .select(org.apache.spark.sql.functions.col("value"))
      .collect().map(r => math.floor(r.getDouble(0) * 100.0 + 0.5).toLong)
      .filter(_ > 0)
    val exp = cents.map(_.toString.head.asDigit.toLong)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val t = cents.length.toLong
    exp.foreach { case (d, n) =>
      assert(rows(d)._1 == n, s"digit $d")
      assert(rows(d)._2 == n * 1000000L / t)
      val benford = math.floor(1000000.0 * math.log10(1.0 + 1.0 / d)).toLong
      assert(rows(d)._3 == benford)
      assert(rows(d)._4 == rows(d)._2 - benford)
    }
  }

  test("langid kappa: matches a naive contingency computation, below accuracy") {
    val spark = SparkTestSession.spark
    val row = graft.operators.Experiment
      .langIdKappa(spark, SparkTestSession.sf).head()
    val (n, agree, sumRc, kappa) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    val pairs = graft.sources.Tables
      .load(spark, SparkTestSession.sf, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val preds = graft.operators.TextAnalysis
      .langId(spark, SparkTestSession.sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val both = pairs.keys.toSeq.map(id => (pairs(id), preds(id)))
    assert(n == both.length.toLong)
    assert(agree == both.count { case (a, b) => a == b }.toLong)
    val rMarg = both.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cMarg = both.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val src = (rMarg.keySet ++ cMarg.keySet).toSeq
      .map(k => rMarg.getOrElse(k, 0L) * cMarg.getOrElse(k, 0L)).sum
    assert(sumRc == src)
    val expKappa = math.floor(1000000.0 * (n * agree - src).toDouble /
      (n * n - src).toDouble).toLong
    assert(kappa == expKappa)
    // chance correction must pull kappa strictly below raw accuracy
    // (its sign is a fixture property — the sf0.001 slice sits near
    // chance — so only the ordering is asserted)
    assert(kappa < agree * 1000000L / n)
  }

  test("decayed activity: per-event shift-divide recount") {
    val spark = SparkTestSession.spark
    val got = graft.operators.Experiment
      .decayedActivity(spark, SparkTestSession.sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val ev = graft.sources.Tables
      .load(spark, SparkTestSession.sf, "events")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("ts").cast("date").as("d"),
        org.apache.spark.sql.functions.floor(
          org.apache.spark.sql.functions.col("value") * 100.0 + 0.5)
          .cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val anchor = ev.map(_._2.toEpochDay).max
    val exp = ev.groupBy(_._1).view.mapValues { es =>
      val terms = es.map { case (_, d, c) =>
        val age = math.min(anchor - d.toEpochDay, 40L).toInt
        c / (1L << age)
      }
      (es.length.toLong, es.map(_._3).sum, terms.sum)
    }.toMap
    assert(got == exp)
  }

  test("markov stationary: normalized, deterministic, tracks the double-precision chain") {
    val spark = SparkTestSession.spark
    val rows = graft.operators.Experiment
      .markovStationary(spark, SparkTestSession.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val total = rows.map(_._3).sum
    assert(math.abs(total - 1000000L) <= rows.length,
      s"pi must renormalize to ~1e6, got $total")
    assert(rows.forall(_._3 >= 0))
    // double-precision reference chain from the same counts
    val counts = graft.sources.Tables
      .load(spark, SparkTestSession.sf, "events")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getString(3)))
      .groupBy(_._1).values.flatMap { es =>
        val sorted = es.sortBy(e => (e._2, e._3)).map(_._4)
        sorted.zip(sorted.drop(1))
      }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val states = rows.map(_._1).sorted
    val idx = states.zipWithIndex.toMap
    val k = states.length
    val m = Array.ofDim[Double](k, k)
    counts.foreach { case ((f, t), n) => m(idx(f))(idx(t)) = n.toDouble }
    val rs = m.map(_.sum)
    var pi = Array.fill(k)(1.0 / k)
    (1 to 200).foreach { _ =>
      val nw = Array.tabulate(k)(j =>
        (0 until k).map(i => if (rs(i) == 0) 0.0 else pi(i) * m(i)(j) / rs(i)).sum)
      val sp = nw.sum
      pi = nw.map(_ / sp)
    }
    rows.foreach { case (st, _, p) =>
      assert(math.abs(p / 1e6 - pi(idx(st))) < 0.01,
        s"state $st integer pi ${p / 1e6} vs reference ${pi(idx(st))}")
    }
  }

  test("gains table: decile recount, monotone capture, lift telescopes to 1") {
    val spark = SparkTestSession.spark
    val rows = graft.operators.Experiment
      .gainsTable(spark, SparkTestSession.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L to 9L).toSeq)
    val scored = graft.operators.Experiment
      .rocAucScored(spark, SparkTestSession.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val n = scored.length.toLong
    val orderKey = scored.sortBy { case (id, sc, _) => (-sc, id) }
    val exp = orderKey.zipWithIndex.groupBy { case (_, i) =>
      10L * i / n
    }.view.mapValues { xs =>
      (xs.length.toLong, xs.count(_._1._3).toLong)
    }.toMap
    val tp = scored.count(_._3).toLong
    var cum = 0L
    rows.foreach { case (d, nd, np, cp, cap, lift) =>
      assert((nd, np) == exp(d), s"decile $d")
      cum += np
      assert(cp == cum)
      assert(cap == cum * 1000000L / tp)
      assert(lift == cum * 10000000L / (tp * (d + 1)))
    }
    // capture is monotone and ends at 100%; the final lift is exactly 1
    assert(rows.last._5 == 1000000L && rows.last._6 == 1000000L)
  }

  test("q251 correlation matrix: statistic tracks the float corr^2 within floor slack") {
    val sf = "/root/testdata/sf0.01"
    val rows = Experiment.correlationMatrix(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length == 6 && rows.map(_._1).distinct.length == 6)
    // recompute the float correlation on the same fixed-point values
    import org.apache.spark.sql.functions._
    val vals = graft.sources.Tables.load(spark, sf, "lineitem")
      .select(
        expr("CAST(l_quantity AS BIGINT)").as("qty"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) DIV 100")
          .as("price"),
        expr("CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)").as("disc"),
        expr("CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT)").as("tax"))
      .cache()
    rows.foreach { case (pair, n, _, _, aNum, r2) =>
      val Array(a, b) = pair.split("~")
      val c = vals.agg(corr(col(a).cast("double"), col(b).cast("double")))
        .head().getDouble(0)
      val expected = math.signum(c) * c * c * 1e6
      // two floors, each dropping < 1 ulp of the scaled value, plus
      // the denominator's own floor: allow a small absolute band
      assert(math.abs(r2 - expected) <= 3.0,
        s"$pair: r2_ppm=$r2 float=$expected")
      assert(n == 60000L)
      assert(math.signum(r2.toDouble) == math.signum(aNum.toDouble)
        || r2 == 0L, s"$pair sign")
    }
    vals.unpersist()
  }

  test("q258 KS statistic equals a driver-side walk over the exact cents") {
    val sf = "/root/testdata/sf0.001"
    val Array(row) = Experiment.ksDrift(spark, sf).collect()
    val (n1, n2, dMicro, argmax) =
      (row.getLong(0), row.getLong(1), row.getLong(3), row.getLong(4))
    // brute-force replay on collected values
    import org.apache.spark.sql.functions._
    val vals = graft.sources.Tables.load(spark, sf, "events")
      .where(col("event_type").isin("purchase", "click"))
      .select(col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val a = vals.filter(_._1 == "purchase").map(_._2).sorted
    val b = vals.filter(_._1 == "click").map(_._2).sorted
    assert((a.length.toLong, b.length.toLong) == ((n1, n2)))
    val domain = (a ++ b).distinct.sorted
    var best = BigInt(0); var bestV = Long.MaxValue
    domain.foreach { x =>
      val gap = (BigInt(a.count(_ <= x)) * b.length -
        BigInt(b.count(_ <= x)) * a.length).abs
      if (gap > best || (gap == best && x < bestV)) { best = gap; bestV = x }
    }
    assert(row.getLong(2) == best.toLong && best.isValidLong)
    assert(dMicro == (best * 1000000 / (BigInt(n1) * n2)).toLong)
    assert(argmax == bestV)
    assert(dMicro >= 0L && dMicro <= 1000000L)
  }

  test("q268 Fleiss kappa matches a from-first-principles driver-side replay") {
    val sf = "/root/testdata/sf0.01"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val next = Map("de" -> "en", "en" -> "es", "es" -> "fr",
      "fr" -> "zh", "zh" -> "de")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ratings = for {
      (id, lang) <- docs
      r <- 1 to 3
    } yield {
      val h = java.lang.Long.parseLong(md5hex(s"rate:$id:$r").take(15), 16)
      if (h % 10 < r) (id, next(lang)) else (id, lang)
    }
    val nItems = docs.length.toLong
    val nic = ratings.groupBy(identity).view.mapValues(_.size.toLong)
    val ss = nic.values.map(c => c * c).sum
    val sC = ratings.groupBy(_._2).view.mapValues(_.size.toLong)
    val peNum = sC.values.map(c => BigInt(c) * c).sum
    val pbar = (ss - nItems * 3) * 1000000L / (nItems * 3 * 2)
    val pe = (peNum * 1000000 / (BigInt(nItems) * 3 * nItems * 3)).toLong
    val kappa = (pbar - pe) * 1000000L / (1000000L - pe)
    val row = Experiment.fleissKappa(spark, sf).head()
    assert(row.getLong(0) == nItems)
    assert(row.getLong(1) == 3L)
    assert(row.getLong(2) == pbar, "pbar_micro")
    assert(row.getLong(3) == pe, "pe_micro")
    assert(row.getLong(4) == kappa, "kappa_micro")
    // 10/20/30% corruption leaves substantial real agreement
    assert(kappa > 300000L && kappa < 1000000L)
  }

  test("q273 conformal: rank formula, nearest-rank quantile, exact coverage") {
    val sf = "/root/testdata/sf0.01"
    val scored = Experiment.rocAucScored(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .map { case (id, score, isEn) =>
        (id, if (isEn) 1000000L - score else score) }
    val cal = scored.filter(_._1 % 2 == 0)
    val eval = scored.filter(_._1 % 2 != 0)
    val k = (cal.length + 1) * 90 / 100 +
      (if ((cal.length + 1) * 90 % 100 == 0) 0 else 1)
    val qhat = cal.sortBy(t => (t._2, t._1)).apply(k - 1)._2
    val covered = eval.count(_._2 <= qhat).toLong
    val row = Experiment.conformalCalibration(spark, sf).head()
    assert(row.getLong(0) == cal.length.toLong)
    assert(row.getLong(1) == k.toLong)
    assert(row.getLong(2) == qhat)
    assert(row.getLong(3) == eval.length.toLong)
    assert(row.getLong(4) == covered)
    assert(row.getLong(5) == covered * 1000000L / eval.length)
  }

  test("q274 chi-square matches a BigInt driver-side replay incl. zero cells") {
    val sf = "/root/testdata/sf0.01"
    val cells = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy(col("source"), col("lang")).count()
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    val sources = cells.keys.map(_._1).toSeq.distinct
    val langs = cells.keys.map(_._2).toSeq.distinct
    val n = cells.values.sum
    val rM = sources.map(s => s -> cells.collect {
      case ((s2, _), c) if s2 == s => c }.sum).toMap
    val cM = langs.map(l => l -> cells.collect {
      case ((_, l2), c) if l2 == l => c }.sum).toMap
    val chi2 = (for (s <- sources; l <- langs) yield {
      val o = BigInt(cells.getOrElse((s, l), 0L))
      val d = o * n - BigInt(rM(s)) * cM(l)
      val den = BigInt(rM(s)) * cM(l) * n
      (d * d / den) * 1000000 + (d * d % den) * 1000000 / den
    }).sum
    val row = Experiment.chiSquareIndependence(spark, sf).head()
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == sources.length.toLong)
    assert(row.getLong(2) == langs.length.toLong)
    assert(BigInt(row.getLong(3)) == chi2, "chi2_micro")
    assert(row.getLong(4) == (sources.length - 1).toLong * (langs.length - 1))
  }

  test("q275 average precision matches a driver-side replay of the total order") {
    val scored = Experiment.rocAucScored(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val ranked = scored.sortBy { case (id, score, _) => (-score, id) }
    var cum = 0L
    var apSum = 0L
    ranked.zipWithIndex.foreach { case ((_, _, isEn), i) =>
      if (isEn) { cum += 1; apSum += cum * 1000000L / (i + 1) }
    }
    val nPos = ranked.count(_._3).toLong
    val row = Experiment.averagePrecision(spark, sf).head()
    assert(row.getLong(0) == ranked.length.toLong)
    assert(row.getLong(1) == nPos)
    assert(row.getLong(2) == apSum, "ap_sum_micro")
    assert(row.getLong(3) == apSum / nPos, "ap_micro")
    // AP of a better-than-random ranking beats the positive prior
    assert(apSum / nPos > nPos * 1000000L / ranked.length)
    assert(apSum / nPos <= 1000000L)
  }

  test("q276 Mann-Whitney: U and tie terms match per-row midrank arithmetic") {
    val scored = Experiment.rocAucScored(spark, sf)
      .collect().map(r => (r.getLong(1), r.getBoolean(2)))
    val n = scored.length.toLong
    val nPos = scored.count(_._2).toLong
    val nNeg = n - nPos
    // doubled midranks straight from the definition (ascending score)
    val byScore = scored.groupBy(_._1).map { case (s, g) =>
      (s, g.length.toLong, g.count(_._2).toLong) }.toSeq.sortBy(_._1)
    var cum = 0L; var r2 = 0L; var cubes = 0L
    byScore.foreach { case (_, c, p) =>
      r2 += p * (2 * cum + c + 1); cubes += c * c * c - c; cum += c }
    val u2 = r2 - nPos * (nPos + 1)
    val dev2 = u2 - nPos * nNeg
    val tieTerm = n * (n - 1) * (n + 1) - cubes
    val z2 = BigInt(3000000) * dev2 * dev2 * n * (n - 1) /
      (BigInt(nPos) * nNeg * tieTerm)
    val row = Experiment.mannWhitney(spark, sf).head()
    assert((row.getLong(0), row.getLong(1)) == ((nPos, nNeg)))
    assert(row.getLong(2) == u2, "u2")
    assert(row.getLong(3) == cubes, "tie_cubes")
    assert(row.getLong(4) == dev2, "dev2")
    assert(row.getLong(5) == tieTerm, "tie_term")
    assert(BigInt(row.getLong(6)) == z2, "z2_micro")
    // 2U1 is bounded by twice the pair count
    assert(u2 >= 0L && u2 <= 2 * nPos * nNeg)
  }

  test("q278 isotonic: minimax fit equals the classic PAV stack algorithm; monotone; pooling exercised") {
    // sf0.01: the 0.001 fixture's raw rates are already monotone, so
    // only the larger fixture exercises the pooling path
    val sf = "/root/testdata/sf0.01"
    val binned = Experiment.rocAucScored(spark, sf)
      .collect().map(r => (math.min(r.getLong(1) / 100000L, 9L),
        if (r.getBoolean(2)) 1L else 0L))
      .groupBy(_._1).map { case (b, g) =>
        (b, g.length.toLong, g.map(_._2).sum) }.toSeq.sortBy(_._1)
    // classic PAV: merge adjacent blocks while the rate decreases
    // (exact rational compare by cross-multiplication)
    var stack = List.empty[(Long, Long)] // (n, pos) newest first
    binned.foreach { case (_, n, p) =>
      var top = (n, p)
      while (stack.nonEmpty &&
          stack.head._2 * top._1 >= top._2 * stack.head._1) {
        top = (stack.head._1 + top._1, stack.head._2 + top._2)
        stack = stack.tail
      }
      stack = top :: stack
    }
    // expand per bin: walk bins against the pooled blocks
    val blocks = stack.reverse
    var bi = 0; var left = blocks.head._1
    val perBin = binned.map { case (b, n, p) =>
      // bins fall entirely inside blocks (PAV pools whole bins)
      val (bn, bp) = blocks(bi)
      val fit = bp * 1000000L / bn
      left -= n
      if (left == 0 && bi < blocks.length - 1) { bi += 1; left = blocks(bi)._1 }
      (b, n, p, fit)
    }
    val rows = Experiment.isotonicCalibration(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == perBin.map(_._1).toSeq)
    rows.zip(perBin).foreach { case ((b, n, p, raw, fit), (b2, n2, p2, fitPav)) =>
      assert((n, p) == ((n2, p2)), s"bin $b counts")
      assert(raw == p * 1000000L / n, s"bin $b raw")
      assert(fit == fitPav, s"bin $b: minimax fit must equal PAV")
    }
    // monotone nondecreasing, and at least one bin actually pooled
    assert(rows.map(_._5).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    assert(rows.exists(r => r._5 != r._4),
      "fixture must exercise the pooling path (a raw-rate violation)")
  }

  test("q300 Markov attribution: transitions and value iteration equal a replay; removal bites") {
    // journey replay from the shared events fixture
    val firstP = events.filter(_._4 == "purchase")
      .groupBy(_._1).map { case (u, g) => (u, g.map(_._2).min) }
    val users = events.map(_._1).distinct
    val trans = collection.mutable.Map[(String, String), Long]()
    def bump(s: String, d: String): Unit =
      trans((s, d)) = trans.getOrElse((s, d), 0L) + 1L
    for (u <- users) {
      val fp = firstP.get(u)
      val path = events.filter(e => e._1 == u && e._4 != "purchase" &&
        fp.forall(e._2 < _)).sortBy(e => (e._2, e._3)).map(_._4)
      val outcome = if (fp.isDefined) "CONV" else "NULL"
      if (path.isEmpty) bump("S", outcome)
      else {
        bump("S", path.head)
        path.zip(path.tail).foreach { case (a, b) => bump(a, b) }
        bump(path.last, outcome)
      }
    }
    val channels = trans.keys.map(_._1).filter(_ != "S").toSeq.distinct.sorted
    val outN = trans.groupBy(_._1._1).map { case (a, g) => a -> g.values.sum }
    def absorb(removed: Option[String]): Long = {
      val nonAbs = "S" +: channels.filterNot(removed.contains)
      var p = (nonAbs.map(_ -> 0L) :+ ("CONV" -> 1000000L) :+
        ("NULL" -> 0L)).toMap ++ removed.map(_ -> 0L)
      for (_ <- 1 to 40) {
        p = p ++ nonAbs.map { a =>
          a -> trans.collect { case ((s, d), c) if s == a =>
            c * p(if (removed.contains(d)) "NULL" else d) / outN(a)
          }.sum
        }.toMap
      }
      p("S")
    }
    val base = absorb(None)
    val want = channels.map { c =>
      val pc = absorb(Some(c))
      (c, base, pc, if (base == 0L) 0L else (base - pc) * 1000000L / base)
    }
    val got = Experiment.markovAttribution(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    // the base conversion probability is a real probability, and
    // removing a channel never helps
    assert(base > 0L && base <= 1000000L)
    got.foreach { case (_, b, r, re) =>
      assert(r <= b && re >= 0L && re <= 1000000L) }
    assert(got.exists(_._4 > 0L), "some channel must carry real credit")
  }

  test("q286 Shapley attribution: equals a direct lattice replay; efficiency law holds") {
    val channels = events.map(_._4).distinct.filter(_ != "purchase").sorted
    val n = channels.length
    val firstP = events.filter(_._4 == "purchase")
      .groupBy(_._1).map { case (u, g) => (u, g.map(_._2).min) }
    val users = events.map(_._1).distinct
    val stats = users.map { u =>
      val fp = firstP.get(u)
      val key = events.filter(e => e._1 == u && e._4 != "purchase" &&
        fp.forall(e._2 < _)).map(_._4).distinct.toSet
      (key, fp.isDefined)
    }.groupBy(_._1).map { case (s, g) =>
      (s, (g.size.toLong, g.count(_._2).toLong)) }
    def fact(x: Int): Long = (1 to x).map(_.toLong).product
    def vmu(s: Set[String]): Long =
      stats.get(s).map { case (m, c) => c * 1000000L / m }.getOrElse(0L)
    val want = channels.map { ch =>
      val others = channels.filterNot(_ == ch)
      var phi = 0L
      for (mask <- 0 until (1 << (n - 1))) {
        val s = others.zipWithIndex
          .collect { case (c2, i) if ((mask >> i) & 1) == 1 => c2 }.toSet
        phi += fact(s.size) * fact(n - 1 - s.size) * (vmu(s + ch) - vmu(s))
      }
      (ch, stats.collect { case (s, (m, _)) if s.contains(ch) => m }.sum,
        phi, n.toLong)
    }
    val got = Experiment.shapleyAttribution(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    // efficiency: Sum phi_num = n! * (v(N) - v(empty)) — the credit
    // exactly exhausts the full-coalition lift
    assert(got.map(_._3).sum ==
      fact(n) * (vmu(channels.toSet) - vmu(Set.empty)))
    // the game is non-trivial: some channel earns nonzero credit
    assert(got.exists(_._3 != 0L))
  }

  test("q287 quantile align: equals a rank replay; rescale fires; alignment monotone per source") {
    val scored = Experiment.rocAucScored(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val srcOf = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val ref = scored.filter { case (id, _, en) => en && srcOf(id) == "src0" }
      .map { case (id, sc, _) => (sc, id) }.sorted.map(_._1)
    val nRef = ref.length.toLong
    assert(nRef > 0, "reference slice must be non-empty")
    val want = scored.map { case (id, sc, _) => (srcOf(id), sc, id) }
      .groupBy(_._1).toSeq.flatMap { case (src, g) =>
        val sorted = g.map { case (_, sc, id) => (sc, id) }.sorted
        val m = sorted.length.toLong
        sorted.zipWithIndex.map { case ((sc, id), i) =>
          val rk = i + 1L
          val refRk = (rk * nRef + m - 1) / m
          (id, src, sc, rk, ref((refRk - 1).toInt))
        }
      }.sortBy(_._1)
    val got = Experiment.quantileAlign(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(got.toSeq == want)
    // the ceiling rescale genuinely fires (ref is a strict slice)
    assert(nRef != 25L)
    // per source, higher rank never aligns lower
    got.groupBy(_._2).values.foreach { g =>
      val srt = g.sortBy(_._4).map(_._5)
      assert(srt.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    }
  }

  test("q291 item neighbors: top-k equals a direct replay; cosine normalization reranks vs raw counts") {
    val baskets = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val ci = baskets.groupBy(_._2).map { case (i, g) => (i, g.length.toLong) }
    val byOrder = baskets.groupBy(_._1).values
      .map(_.map(_._2).sorted).toSeq
    val cij = collection.mutable.Map[(Long, Long), Long]()
    for (items <- byOrder; a <- items; b <- items if a < b)
      cij((a, b)) = cij.getOrElse((a, b), 0L) + 1L
    val sym = cij.toSeq.filter(_._2 >= 2L).flatMap { case ((x, y), c) =>
      Seq((x, y, c), (y, x, c)) }
    val want = sym.groupBy(_._1).toSeq.flatMap { case (item, g) =>
      val scored = g.map { case (_, nb, c) =>
        val s2 = BigInt(c) * c * BigInt(1000000000000L) /
          (BigInt(ci(item)) * ci(nb))
        (nb, c, ci(item), ci(nb), s2.toLong)
      }.sortBy { case (nb, _, _, _, s2) => (-s2, nb) }.take(5)
      scored.zipWithIndex.map { case ((nb, c, cit, cnb, s2), i) =>
        (item, i + 1L, nb, c, cit, cnb, s2) }
    }.sortBy(t => (t._1, t._2))
    val got = Experiment.itemNeighbors(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == want)
    assert(got.nonEmpty)
    // normalization is not a no-op: some item's top neighbor by
    // cosine is not its top neighbor by raw count
    val rerank = sym.groupBy(_._1).exists { case (item, g) =>
      val byCount = g.maxBy { case (_, nb, c) => (c, -nb) }._2
      val byCos = g.maxBy { case (_, nb, c) =>
        (BigInt(c) * c * BigInt(1000000000000L) /
          (BigInt(ci(item)) * ci(nb)), -nb) }._2
      byCount != byCos
    }
    assert(rerank, "cosine must rerank at least one item")
  }

  test("q288 QTE: arm quantiles match a sorted replay; quantiles monotone in pct") {
    val spendByUser = events.groupBy(_._1).map { case (u, g) =>
      (u, g.filter(_._4 == "purchase")
        .map(e => math.floor(e._5 * 100.0 + 0.5).toLong).sum)
    }
    val arms = spendByUser.toSeq.groupBy(_._1 % 2)
    val want = (1 to 9).map { d =>
      val pct = d * 10L
      def pick(v: Long): (Long, Long) = {
        val sorted = arms(v).map { case (u, c) => (c, u) }.sorted.map(_._1)
        val n = sorted.length.toLong
        (n, sorted(((pct * n + 99) / 100).toInt - 1))
      }
      val (nt, t) = pick(1); val (nc, c) = pick(0)
      (pct, nt, nc, t, c, t - c)
    }
    val got = Experiment.quantileTreatmentEffects(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(got.toSeq == want)
    assert(got.length == 9)
    // quantiles nondecreasing in pct within each arm
    assert(got.map(_._4).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    assert(got.map(_._5).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
  }

  test("q277 MAD outliers: medians and gate match a per-type replay; robust to a planted whale") {
    val cents = events.map { case (_, _, _, t, v) =>
      (t, math.floor(v * 100.0 + 0.5).toLong) }
    val rows = Experiment.madOutliers(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.nonEmpty)
    cents.groupBy(_._1).foreach { case (t, g) =>
      val xs = g.map(_._2).sorted
      val med = xs((xs.length + 1) / 2 - 1)
      val devs = xs.map(x => math.abs(x - med)).sorted
      val mad = devs((devs.length + 1) / 2 - 1)
      val out = xs.count(x => math.abs(x - med) * 6745 > mad * 35000).toLong
      val r = rows(t)
      assert(r.getLong(1) == xs.length.toLong, s"$t n")
      assert(r.getLong(2) == med, s"$t med")
      assert(r.getLong(3) == mad, s"$t mad")
      assert(r.getLong(4) == out, s"$t outliers")
      assert(r.getLong(5) == out * 1000000L / xs.length, s"$t ppm")
      // robustness: a 100x whale added to this type moves the median
      // by at most one rank step — the mean would move by ~100x/n
      val whale = (xs :+ xs.max * 100).sorted
      val med2 = whale((whale.length + 1) / 2 - 1)
      assert(math.abs(med2 - med) <= math.abs(xs(
        math.min(xs.length - 1, (xs.length + 1) / 2)) - med))
    }
  }

  test("q325 pass@k: estimator equals a replay; monotone in k; short-circuit hits pass@k = 1") {
    val spark = SparkTestSession.spark
    import graft.sources.Tables
    val per = Tables.load(spark, SparkTestSession.sf, "events")
      .select(col("user_id"), col("value")).collect()
      .map(r => (r.getLong(0),
        math.floor(r.getDouble(1) * 100.0 + 0.5).toLong))
      .groupBy(_._1).map { case (u, rows) =>
        (u, rows.length.toLong, rows.count(_._2 >= 5000L).toLong)
      }.toSeq
    val want = Seq(1, 5, 10).flatMap { k =>
      per.filter(_._2 >= k).map { case (u, n, c) =>
        val prod = (0 until k).foldLeft(1.0) { (acc, i) =>
          acc * (if (n - c - i <= 0) 0.0
                 else (n - c - i).toDouble / (n - i).toDouble)
        }
        (u, k.toLong, n, c,
          math.floor(1000000.0 * (1.0 - prod)).toLong)
      }
    }.sortBy(t => (t._1, t._2))
    val got = Experiment.passAtK(spark, SparkTestSession.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(t => (t._1, t._2))
    assert(got.toSeq == want.toSeq)
    // pass@k is monotone non-decreasing in k per user (more draws can
    // only help), and a user with c > n - k short-circuits to exactly 1
    val byUser = got.groupBy(_._1)
    byUser.values.foreach { rows =>
      val s = rows.sortBy(_._2).map(_._5)
      assert(s.zip(s.tail).forall { case (a, b) => a <= b })
    }
    got.foreach { case (_, k, n, c, ppm) =>
      if (c > n - k) assert(ppm == 1000000L) }
    // the default 5000-cent threshold never saturates a user on the
    // fixture, so the short-circuit arm (a zero factor => pass@k = 1
    // EXACTLY, no float residue) is driven explicitly: with threshold
    // 0 every attempt is correct, c = n, and every factor's numerator
    // n - c - i = -i <= 0
    val saturated = Experiment.passAtK(spark, SparkTestSession.sf,
      ks = Seq(2), centsThreshold = 0L).collect()
    assert(saturated.nonEmpty)
    saturated.foreach(r => assert(r.getLong(4) == 1000000L,
      s"short-circuit must yield exactly 1000000 ppm, got ${r.getLong(4)}"))
    assert(got.exists(r => r._5 > 0L && r._5 < 1000000L),
      "fixture never exercises a strict-interior estimate")
  }

  test("q331 feature drift equals a replay; TVD bounded by construction") {
    val spark = SparkTestSession.spark
    import graft.sources.Tables
    val ev = Tables.load(spark, SparkTestSession.sf, "events")
      .select(col("event_type"), unix_micros(col("ts")).as("tm"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        math.floor(r.getDouble(2) * 100.0 + 0.5).toLong))
    val tmin = ev.map(_._2).min; val tmax = ev.map(_._2).max
    val cmin = ev.map(_._3).min; val cmax = ev.map(_._3).max
    val binned = ev.map { case (t, tm, c) =>
      (t, tm * 2 <= tmin + tmax, (c - cmin) * 10L / (cmax - cmin + 1L))
    }
    val want = binned.groupBy(_._1).map { case (t, g) =>
      val nE = g.count(_._2).toLong; val nL = g.count(!_._2).toLong
      val gaps = g.groupBy(_._3).map { case (_, cell) =>
        val ce = cell.count(_._2).toLong
        val cl = cell.count(!_._2).toLong
        math.abs(ce * 1000000L / nE - cl * 1000000L / nL)
      }.toSeq
      (t, nE, nL, gaps.sum / 2L, gaps.max, gaps.sum / 2L > 50000L)
    }.toSeq.sortBy(_._1)
    val got = Experiment.featureDrift(spark, SparkTestSession.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    // sanity: TVD lives in [0, 10^6], both halves are populated, and
    // the fixture's organic early/late noise registers somewhere
    got.foreach { case (_, nE, nL, tvd, mg, _) =>
      assert(nE > 0 && nL > 0 && tvd >= 0 && tvd <= 1000000L && mg >= tvd / 5)
    }
    assert(got.exists(_._4 > 0L))
  }

  test("q337 IPS/SNIPS equals a replay; weight-mass and range laws hold") {
    val ev = events.map(t => (t._1, t._4,
      math.floor(t._5 * 100.0 + 0.5).toLong))
    val ua = ev.groupBy(e => (e._1, e._2)).map { case ((u, a), g) =>
      (u, a, g.length.toLong, g.map(_._3).sum) }.toSeq
    val nU = ua.groupBy(_._1).map { case (u, g) => (u, g.map(_._3).sum) }
    val n = ev.length.toLong
    val want = ua.map { case (u, a, nua, rua) =>
      (a, nua, rua, nU(u) * 1000L / nua)
    }.groupBy(_._1).map { case (a, g) =>
      val nl = g.map(_._2).sum
      val mass = g.map(x => x._4 * x._2).sum
      val wr = g.map(x => x._4 * x._3).sum
      (a, nl, g.map(_._3).sum / nl, mass, wr / n, wr / mass)
    }.toSeq.sortBy(_._1)
    val got = Experiment.ipsPolicyEval(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    // weight mass can only fall SHORT of n*1000 (users who never took
    // the action contribute nothing; truncation only shrinks), and
    // SNIPS is a convex combination of logged rewards, so it lives
    // inside the per-action reward range
    val range = ev.groupBy(_._2).map { case (a, g) =>
      a -> (g.map(_._3).min, g.map(_._3).max) }
    got.foreach { case (a, _, _, mass, _, snips) =>
      assert(mass <= n * 1000L)
      val (lo, hi) = range(a)
      assert(snips >= lo && snips <= hi)
    }
    assert(got.exists(r => r._3 != r._6),
      "DM and SNIPS agree everywhere - reweighting is vacuous")
  }

  test("q338 best-of-n equals a replay; k=1 is the mean; monotone in k") {
    val pools = events.sortBy(_._3).groupBy(_._4).map { case (a, g) =>
      (a, g.take(256).map(t => math.floor(t._5 * 100.0 + 0.5).toLong)
        .sorted)
    }
    val want = pools.flatMap { case (a, pool) =>
      val nn = pool.length.toLong
      Seq(1, 2, 4).map { k =>
        def pw(x: Long) = (1 to k).map(_ => x).product
        val e = pool.zipWithIndex.map { case (r, i) =>
          r * (pw(i + 1L) - pw(i.toLong)) }.sum / pw(nn)
        val mean = pool.sum / nn
        (a, k.toLong, mean, e, e - mean)
      }
    }.toSeq.sortBy(t => (t._1, t._2))
    val got = Experiment.bestOfN(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(t => (t._1, t._2))
    assert(got.toSeq == want.toSeq)
    got.groupBy(_._1).values.foreach { rows =>
      val byK = rows.sortBy(_._2)
      assert(byK.head._4 == byK.head._3,
        "k=1 must reproduce the pool mean exactly (telescoping law)")
      val curve = byK.map(_._4)
      assert(curve.zip(curve.tail).forall { case (a, b) => a <= b },
        "E[max of n] must be monotone in n")
    }
    assert(got.exists(_._5 > 0L), "no arm shows best-of-n lift - vacuous")
  }

  test("q339 arena equals a replay; Copeland mass law; synthetic cycle fires the audit") {
    val ua = events.map(t => (t._1, t._4,
        math.floor(t._5 * 100.0 + 0.5).toLong))
      .groupBy(e => (e._1, e._2)).map { case ((u, a), g) =>
        ((u, a), (g.length.toLong, g.map(_._3).sum)) }
    val models = ua.keys.map(_._2).toSeq.distinct.sorted
    val byUser = ua.groupBy(_._1._1)
    val duels = (for {
      (_, cells) <- byUser.toSeq
      ((_, a), (na, ra)) <- cells
      ((_, b), (nb, rb)) <- cells if a != b
    } yield (a, b, ra * nb > rb * na, ra * nb == rb * na))
      .groupBy(t => (t._1, t._2)).map { case ((a, b), g) =>
        ((a, b), (g.count(_._3).toLong, g.count(_._4).toLong,
          g.length.toLong)) }.toMap
    val want = models.map { m =>
      val mine = models.filter(_ != m).map(o => (duels((m, o)), duels((o, m))))
      val borda = mine.map(_._1._1).sum
      val judges = mine.map(_._1._3).sum
      val beats = mine.count { case (d, o) => d._1 > o._1 }.toLong
      val drawn = mine.count { case (d, o) => d._1 == o._1 }.toLong
      (m, borda, borda * 1000000L / judges, 2 * beats + drawn,
        beats == models.length - 1L)
    }
    val got = Experiment.arenaLeaderboard(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getLong(5))).sortBy(_._1)
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5)).toSeq == want)
    // Copeland mass law: every unordered pair hands out exactly 2
    // points, so the column sums to K(K-1); at most one Condorcet
    // winner can exist
    val k = models.length.toLong
    assert(got.map(_._4).sum == k * (k - 1))
    assert(got.count(_._5) <= 1)
    // replay the majority-3-cycle count (the sf0.01 fixture happens
    // to carry a real intransitivity — the audit is non-vacuous on
    // organic data, not just on the synthetic tripwire below)
    val beats = (for {
      a <- models; b <- models if a != b
      if duels((a, b))._1 > duels((b, a))._1
    } yield (a, b)).toSet
    val wantCycles = (for {
      a <- models; b <- models; c <- models
      if beats((a, b)) && beats((b, c)) && beats((c, a))
    } yield 1L).sum / 3L
    assert(got.forall(_._6 == wantCycles))
    // tripwire: a rock-paper-scissors judgment frame must register
    // exactly one majority 3-cycle and NO Condorcet winner through
    // the same plan
    val sess = spark
    import sess.implicits._
    val rps = Seq(
      (1L, "rock", 1L, 30L), (1L, "scissors", 1L, 20L),
      (2L, "scissors", 1L, 30L), (2L, "paper", 1L, 20L),
      (3L, "paper", 1L, 30L), (3L, "rock", 1L, 20L))
      .toDF("user_id", "event_type", "n", "r")
    val cyc = Experiment.arenaFromJudgments(rps).collect()
      .map(r => (r.getString(0), r.getBoolean(4), r.getLong(5)))
    assert(cyc.length == 3 && cyc.forall(_._3 == 1L))
    assert(cyc.forall(!_._2), "a cycle admits no Condorcet winner")
  }

  test("q340 RLOO advantages equal a replay; baseline-cancellation laws hold") {
    val ev = events.map(t => (t._1, t._3, t._4,
      math.floor(t._5 * 100.0 + 0.5).toLong))
    val groups = ev.groupBy(_._1).toSeq.filter(_._2.length >= 2)
    val want = groups.flatMap { case (u, g) =>
      val n = g.length.toLong
      val s = g.map(_._4).sum
      g.sortBy(e => (-e._4, e._2)).zipWithIndex.map {
        case ((_, eid, et, c), i) =>
          (u, eid, et, c, n, (n * c - s) * 1000L / (n - 1),
            n + 1 - 2L * (i + 1))
      }
    }.toSeq.sortBy(t => (t._1, t._2))
    val got = Experiment.rlooAdvantage(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == want)
    // signed-DIV cross-engine pin: replay used Scala / (truncates
    // toward zero) and some advantage must be negative for it to bite
    assert(got.exists(_._6 < 0L), "no negative advantage - the signed " +
      "truncation semantics are untested by this fixture")
    // baseline cancellation: centered ranks sum to ZERO per group
    // exactly; RLOO numerators cancel too (pre-truncation law)
    got.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._7).sum == 0L)
      val n = rows.head._5
      assert(rows.map(r => n * r._4).sum ==
        rows.map(_._4).sum * rows.length)
    }
    // singleton groups are excluded, nothing else
    assert(got.map(_._1).distinct.length ==
      ev.groupBy(_._1).count(_._2.length >= 2))
  }

  test("q342 successive halving equals a replay; halving counts are exact") {
    val ev = events.map(t => (t._3, t._4,
      math.floor(t._5 * 100.0 + 0.5).toLong))
    val byArm = ev.groupBy(_._2).view.mapValues(
      _.sortBy(_._1).map(_._3)).toMap
    def mean(xs: Seq[Long], b: Int): Long = {
      val p = xs.take(b); p.sum * 1000000L / p.length
    }
    val arms = byArm.map { case (a, xs) =>
      (a, math.min(xs.length, 512).toLong,
        mean(xs, 128), mean(xs, 256), mean(xs, 512))
    }.toSeq
    val k0 = arms.length
    val s1 = arms.sortBy(t => (-t._3, t._1)).take((k0 + 1) / 2)
      .map(_._1).toSet
    val s2 = arms.filter(t => s1(t._1)).sortBy(t => (-t._4, t._1))
      .take((s1.size + 1) / 2).map(_._1).toSet
    val s3 = arms.filter(t => s2(t._1)).sortBy(t => (-t._5, t._1))
      .take((s2.size + 1) / 2).map(_._1).toSet
    val want = arms.map { case (a, nr, m0, m1, m2) =>
      (a, nr, m0, if (s1(a)) Some(m1) else None,
        if (s2(a)) Some(m2) else None, s1(a), s2(a), s3(a))
    }.sortBy(_._1)
    val got = Experiment.successiveHalving(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getBoolean(5), r.getBoolean(6), r.getBoolean(7)))
      .sortBy(_._1)
    assert(got.toSeq == want)
    // the race genuinely eliminates and crowns: ceil-half counts at
    // every round, and at least one arm is eliminated at round 0
    assert(got.count(_._6) == (k0 + 1) / 2)
    assert(got.count(_._7) == ((k0 + 1) / 2 + 1) / 2)
    assert(got.count(_._8) == (((k0 + 1) / 2 + 1) / 2 + 1) / 2)
    assert(got.exists(!_._6), "no arm eliminated - the race is vacuous")
  }

  test("q343 doubly robust equals a BigInt replay; the correction is non-vacuous") {
    val ev = events.map(t => (t._1, t._4,
      math.floor(t._5 * 100.0 + 0.5).toLong))
    val ua = ev.groupBy(e => (e._1, e._2)).map { case ((u, a), g) =>
      (u, a, g.length.toLong, g.map(_._3).sum) }.toSeq
    val nU = ua.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val n = ev.length.toLong
    val rhat = ua.groupBy(_._2).view.mapValues { g =>
      g.map(_._4).sum * 1000L / g.map(_._3).sum }.toMap
    val want = ua.groupBy(_._2).map { case (a, g) =>
      val mass = g.map { case (u, _, nua, rua) =>
        BigInt(nU(u) * 1000L / nua) * (rua * 1000L - nua * rhat(a))
      }.sum
      val corr = (mass / BigInt(n * 1000L)).toLong
      (a, g.map(_._3).sum, rhat(a), corr, rhat(a) + corr)
    }.toSeq.sortBy(_._1)
    val got = Experiment.doublyRobust(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(got.toSeq == want)
    assert(got.exists(_._4 != 0L),
      "every correction is zero - the coarse model is not coarse")
  }

  test("q346 Kruskal-Wallis equals a replay; rank-sum conservation holds") {
    val ev = events.map(t => (t._4, math.floor(t._5 * 100.0 + 0.5).toLong))
    val byV = ev.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val vals = byV.keys.toSeq.sorted
    val cums = vals.scanLeft(0L)((acc, v) => acc + byV(v)).init
    val r2v = vals.zip(cums).map { case (v, c) =>
      v -> (2L * c + byV(v) + 1L) }.toMap
    val groups = ev.groupBy(_._1).view.mapValues { g =>
      (g.length.toLong, g.map(e => r2v(e._2)).sum) }.toMap
    val n = ev.length.toLong
    val tieCubes = byV.values.map(c => c * c * c - c).sum
    val sumT = groups.values.map { case (ni, r2) =>
      (BigInt(r2) * r2 / ni).toLong }.map(BigInt(_)).sum
    val hMilli = (BigInt(3000) * sumT / (n * (n + 1))).toLong -
      3000L * (n + 1)
    val hTie = (BigInt(hMilli) * (BigInt(n) * n * n - n) /
      (BigInt(n) * n * n - n - tieCubes)).toLong
    val want = groups.toSeq.map { case (a, (ni, r2)) =>
      (a, ni, r2, n, hMilli, hTie) }.sortBy(_._1)
    val got = Experiment.kruskalWallis(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(got.toSeq == want)
    // conservation: doubled mid-ranks sum to n(n+1) exactly
    assert(got.map(_._3).sum == n * (n + 1))
    // tie correction can only inflate a nonnegative H
    assert(hMilli >= 0L && hTie >= hMilli)
    assert(got.map(_._1).distinct.length >= 3,
      "fewer than 3 arms - KW degenerates to Mann-Whitney")
  }

  test("q349 self-consistency equals a replay; eligibility and non-vacuity hold") {
    val byUser = events.groupBy(_._1).toSeq.filter(_._2.length >= 5)
    def mode(g: Seq[String]): String = g.groupBy(identity).toSeq
      .map { case (t, xs) => (-xs.length.toLong, t) }.min._2
    val want = Seq(1L, 3L, 5L).map { k =>
      val pairs = byUser.map { case (_, g) =>
        val ordered = g.sortBy(e => (e._2, e._3)).map(_._4).toSeq
        (mode(ordered.take(k.toInt)), mode(ordered))
      }
      val agree = pairs.count(p => p._1 == p._2).toLong
      (k, pairs.length.toLong, agree, agree * 1000000L / pairs.length)
    }
    val got = Experiment.selfConsistency(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == want)
    // same eligible population at every k; the curve is non-vacuous
    // in both directions (some disagreement at k=1, none invented at
    // k=5 beyond what the prefix mode actually is)
    assert(got.map(_._2).distinct.length == 1)
    assert(got.head._3 < got.head._2,
      "k=1 already agrees everywhere - the curve is flat/vacuous")
  }

  test("q356 head-set drift equals a replay; footrule and jaccard laws hold") {
    val tms = events.map(_._2)
    val mid = tms.min + tms.max
    val counts = events.groupBy(_._1).map { case (u, g) =>
      (u, g.count(_._2 * 2 <= mid).toLong,
        g.count(_._2 * 2 > mid).toLong) }.toSeq
    def topK(sel: ((Long, Long, Long)) => Long): Map[Long, Long] =
      counts.sortBy(t => (-sel(t), t._1)).take(10).zipWithIndex
        .map { case (t, i) => t._1 -> (i + 1L) }.toMap
    val te = topK(_._2); val tl = topK(_._3)
    val want = (te.keySet ++ tl.keySet).toSeq.sorted.map { u =>
      val re = te.getOrElse(u, 11L); val rl = tl.getOrElse(u, 11L)
      (u, re, rl, math.abs(re - rl))
    }
    val nBoth = (te.keySet intersect tl.keySet).size.toLong
    val footrule = want.map(_._4).sum
    val got = Experiment.headSetDrift(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).sortBy(_._1)
    assert(got.map(t => (t._1, t._2, t._3, t._4)).toSeq == want)
    got.foreach { t =>
      assert(t._5 == nBoth && t._6 == footrule)
      assert(t._7 == nBoth * 1000000L / (20L - nBoth))
      assert(t._4 <= 10L, "displacement cannot exceed k")
    }
    // the fixture's head genuinely moves between halves (some churn),
    // yet the halves share at least one heavy user (some stability)
    assert(footrule > 0L && nBoth >= 1L)
  }

  test("q338/q342 arrival-rank prunes compile to WindowGroupLimit at the scan") {
    // the docstrings CLAIM the srk <= budget filter pushes below the
    // sort via InferWindowGroupLimit — pin it so a regression in the
    // window shape (e.g. an added unbounded frame) surfaces here, not
    // as a silent full-sort at 100 TB
    for ((name, df) <- Seq(
        "q338" -> Experiment.bestOfN(spark, sf),
        "q342" -> Experiment.successiveHalving(spark, sf))) {
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("WindowGroupLimit"),
        s"$name arrival-rank prune must be a bounded window, got:\n" +
          plan.take(4000))
    }
  }

  test("q366 wilson gate equals a double replay; interval laws") {
    val ev = spark.read
      .parquet(s"${SparkTestSession.sf}/events.parquet")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    def wilson(k: Long, n: Long, sign: Double): Long = {
      val p = k.toDouble / n
      val b = (p + 3.8416 / (2.0 * n) +
        sign * 1.96 * math.sqrt((p * (1.0 - p) + 3.8416 / (4.0 * n)) / n)) /
        (1.0 + 3.8416 / n)
      math.floor(1000000.0 * b).toLong
    }
    val want = ev.groupBy(_._1).map { case (t, g) =>
      val (n, k) = (g.length.toLong, g.count(_._2 > 50.0).toLong)
      t -> (n, k, k * 1000000L / n, wilson(k, n, -1.0), wilson(k, n, 1.0))
    }
    val got = Experiment.wilsonGate(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6))))
    assert(got.length == want.size)
    got.foreach { case (t, (n, k, rate, lo, hi, gate)) =>
      assert((n, k, rate, lo, hi) == want(t), s"task $t")
      // the score interval brackets the point estimate (floored micro
      // bounds can touch it but never cross)
      assert(lo <= rate && rate <= hi + 1L, s"task $t bracket")
      assert(gate == (lo > 333333L))
    }
    // both gate arms fire on the fixture (value > 50 splits tasks)
    assert(got.exists(_._2._6) && got.exists(!_._2._6),
      "gate is vacuous on this fixture")
  }

  test("q368 krippendorff alpha: hand matrix with exclusion; fixture sanity") {
    import spark.implicits._
    // units: [a,a] agree, [a,b] disagree, [b,b,b] agree, [a] excluded
    // do2 = 0 + 4 + 0; margins a=3, b=4, n=7, sq=25
    // alpha = 1 - 6*4 / (2*(49-25)) = 1/2 exactly
    val rated = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"),
      (3L, "b"), (3L, "b"), (3L, "b"), (4L, "a")).toDF("doc_id", "label")
    val r = Experiment.krippendorffFromRatings(rated).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 1L, 7L, 500000L)))
    // perfect agreement reads exactly 1.0
    val perfect = Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"))
      .toDF("doc_id", "label")
    assert(Experiment.krippendorffFromRatings(perfect)
      .collect().head.getLong(3) == 1000000L)
    // fixture: raters 1/2 rate everything, so nothing is excluded;
    // the noisy raters keep alpha strictly inside (0, 1)
    val fx = Experiment.krippendorffAlpha(spark, sf).collect().head
    assert(fx.getLong(1) == 0L)
    assert(fx.getLong(3) > 0L && fx.getLong(3) < 1000000L)
  }

  test("q368 krippendorff m_u >= 4 guard: errors loudly, never truncates") {
    import spark.implicits._
    // the x2-scaled exact-integer per-unit term is only exact for
    // coverage m_u in {2,3}; a 4-rater item must raise, not drift
    // alpha (round-17 advice: the DuckDB oracle twin carries the same
    // CASE/error() guard — tools/check_q368_guard.py pins THAT side,
    // this spec pins the Spark side, so an engine upgrade changing
    // error() evaluation order on either side fails in CI, not in the
    // driver round)
    val four = Seq((1L, "a"), (1L, "a"), (1L, "b"), (1L, "b"),
      (2L, "a"), (2L, "a")).toDF("doc_id", "label")
    val e = intercept[Exception] {
      Experiment.krippendorffFromRatings(four).collect()
    }
    def rootMsg(t: Throwable): String = {
      val m = Option(t.getMessage).getOrElse("")
      if (m.contains("m_u <= 3") || t.getCause == null) m
      else rootMsg(t.getCause)
    }
    assert(rootMsg(e).contains("m_u <= 3"),
      s"expected the raise_error guard, got: ${e.getMessage}")
    // and the boundary case m_u == 3 stays on the happy path (the
    // denominators 1 and 2 are exact): a pure 3-rater frame computes
    val three = Seq((1L, "a"), (1L, "a"), (1L, "b"),
      (2L, "a"), (2L, "a"), (2L, "a")).toDF("doc_id", "label")
    assert(Experiment.krippendorffFromRatings(three)
      .collect().head.getLong(2) == 6L)
  }

  test("q370 early stopping: hand curve fires at patience; fixture laws") {
    import spark.implicits._
    val mk = (uid: Long, vs: Seq[Double], base: Long) => vs.zipWithIndex.map {
      case (v, i) => (uid, java.sql.Timestamp.valueOf(
        s"2026-01-01 10:0${i / 10}:${i % 10}0"), base + i, v)
    }
    val ev = (mk(1L, Seq(0.50, 0.40, 0.41, 0.42, 0.43, 0.44, 0.45, 0.35), 1L)
      ++ mk(2L, Seq(0.80, 0.70, 0.60, 0.50, 0.40, 0.30, 0.20, 0.10), 11L))
      .toDF("user_id", "ts", "event_id", "value")
    val got = Experiment.earlyStoppingAuditOn(ev).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getLong(5), r.getLong(6)))).toMap
    // run 1: improvements at steps 1,2,8; patience-5 fires at step 7
    // (7 - 2 = 5) BEFORE the true best lands at step 8 — the classic
    // early-stopping miss, reported honestly (best_step > stop_step)
    assert(got(1L) == ((8L, 35L, 8L, true, 7L, 1L)))
    // run 2: strictly improving, never fires
    assert(got(2L) == ((8L, 10L, 8L, false, 8L, 0L)))
    // fixture-wide laws
    val fx = Experiment.earlyStoppingAudit(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getLong(5), r.getLong(6)))
    assert(fx.nonEmpty)
    fx.foreach { case (n, _, best, stopped, stop, saved) =>
      assert(best >= 1L && best <= n && stop <= n && saved == n - stop)
      if (stopped) assert(stop >= 6L) // patience 5 needs >= 6 steps
      else assert(saved == 0L)
    }
    assert(fx.exists(_._4), "no run ever triggers patience - vacuous")
  }

  test("q374 permutation test equals an md5 replay; p is valid") {
    def md5head(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .take(15), 16)
    val ev = spark.read.parquet(s"${SparkTestSession.sf}/events.parquet")
      .select("user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .filter(t => t._2 == "click" || t._2 == "view")
    val diffs = ev.groupBy(_._1).flatMap { case (u, g) =>
      def mean(t: String): Option[Long] = {
        val cs = g.filter(_._2 == t)
          .map(e => math.floor(e._3 * 100.0 + 0.5).toLong)
        if (cs.isEmpty) None else Some(cs.sum / cs.length)
      }
      for (c <- mean("click"); v <- mean("view")) yield (u, c - v)
    }.toSeq
    val tObs = diffs.map(_._2).sum
    val extreme = (1 to 200).count { r =>
      val tR = diffs.map { case (u, d) =>
        if (md5head(s"flip:$u:$r") % 2L == 0L) d else -d
      }.sum
      math.abs(tR) >= math.abs(tObs)
    }
    val got = Experiment.permutationTest(spark, sf).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4)) == ((diffs.length.toLong, tObs, extreme.toLong, 200L,
      (extreme + 1L) * 1000000L / 201L)))
    // add-one p is valid: never zero, never above one
    assert(got.getLong(4) >= 1000000L / 201L && got.getLong(4) <= 1000000L)
  }

  test("q379 funnel significance equals a flip replay; Holm step-down holds") {
    def md5head(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .take(15), 16)
    val funnel = graft.operators.Relational.funnel(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(4))) // (user_id, steps)
    val want = Seq(1, 2).map { step =>
      val scope = funnel.filter(_._2 >= step)
        .map { case (u, s) => (u, if (s >= step + 1) 1L else 0L,
          u % 2L == 0L) }
      def t(arm: (Long, Long, Boolean) => Boolean): Long = {
        val a = scope.filter(x => arm(x._1, x._2, x._3))
        val b = scope.filterNot(x => arm(x._1, x._2, x._3))
        a.map(_._2).sum * b.length - b.map(_._2).sum * a.length
      }
      val tObs = t((_, _, a) => a)
      val extreme = (1 to 200).count { r =>
        val tR = {
          val flipped = scope.map { case (u, c, a) =>
            (u, c, a != (md5head(s"fs:$step:$u:$r") % 2L == 1L))
          }
          val a = flipped.filter(_._3); val b = flipped.filterNot(_._3)
          a.map(_._2).sum * b.length - b.map(_._2).sum * a.length
        }
        math.abs(tR) >= math.abs(tObs)
      }
      (step.toLong, (scope.count(_._3).toLong,
        scope.filter(_._3).map(_._2).sum,
        scope.count(!_._3).toLong,
        scope.filterNot(_._3).map(_._2).sum,
        tObs, extreme.toLong, (extreme + 1L) * 1000000L / 201L))
    }.toMap
    val got = Experiment.funnelSignificance(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getBoolean(9))))
    assert(got.length == 2)
    got.foreach { case (step, t) =>
      assert((t._1, t._2, t._3, t._4, t._5, t._6, t._7) == want(step))
    }
    // Holm step-down: ranks are 1 and 2, rank order follows p, and a
    // significant rank-2 requires a significant rank-1
    val byRank = got.sortBy(_._2._8)
    assert(byRank.map(_._2._8).toSeq == Seq(1L, 2L))
    assert(byRank.head._2._7 <= byRank.last._2._7)
    if (byRank.last._2._9) assert(byRank.head._2._9)
    byRank.foreach { case (_, t) =>
      val expectOk = t._7 * (2L - t._8 + 1L) <= 50000L
      if (t._8 == 1L) assert(t._9 == expectOk)
    }
  }

  test("q382 bot gate: metronome fires, jitter passes, fixture is organic") {
    import spark.implicits._
    // metronome: 9 events exactly 60 s apart -> CV2 = 0 -> bot;
    // jitter: gaps alternating 10 s / 110 s -> CV2 ~ 0.69 -> clean
    def at(uid: Long, secs: Seq[Long], base: Long) =
      secs.zipWithIndex.map { case (s, i) =>
        (uid, new java.sql.Timestamp(1600000000000L + s * 1000L),
          base + i) }
    val ev = (at(1L, (0L to 8L).map(_ * 60L), 1L)
      ++ at(2L, Seq(0L, 10L, 120L, 130L, 240L, 250L, 360L, 370L, 480L), 11L))
      .toDF("user_id", "ts", "event_id")
    val got = Experiment.botRegularityGateOn(ev).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    assert(got(1L) == ((8L, 60000000L, 0L, true)))
    val (nj, mj, cvj, botj) = got(2L)
    assert(nj == 8L && mj == 60000000L && !botj)
    // alternating 10/110 around a 60 mean: CV2 = (50/60)^2 ~ 694444
    assert(cvj == 694444L, s"jitter cv2 $cvj")
    // the organic fixture is bot-free and bursty (CV2 well above the bar)
    val fx = Experiment.botRegularityGate(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getBoolean(4)))
    assert(fx.nonEmpty)
    fx.foreach { case (n, cv2, bot) =>
      assert(n >= 5L && cv2 >= 0L && !bot)
    }
  }

  test("q390 quality-dup calibration equals a replay; mass conserves") {
    val scored = Experiment.rocAucScored(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val dup = graft.operators.Dedup.ngramJaccardPairs(spark, sf)
      .collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val want = scored.groupBy(t => math.min(t._2 / 100000L, 9L))
      .map { case (d, g) =>
        val nd = g.count(t => dup(t._1)).toLong
        d -> (g.length.toLong, nd, nd * 1000000L / g.length)
      }
    val got = Experiment.qualityDupCalibration(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == want)
    // every doc lands in exactly one decile; dup mass matches the
    // pair universe
    assert(got.values.map(_._1).sum == scored.length.toLong)
    assert(got.values.map(_._2).sum == dup.size.toLong)
    assert(got.values.exists(_._2 > 0L), "no dup mass anywhere - vacuous")
  }

  test("q391 splitter bias equals a chi-square replay; margins conserve") {
    val docs = spark.read
      .parquet(s"${SparkTestSession.sf}/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def md5head(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .take(15), 16)
    val asg = docs.map { case (id, src) =>
      val b = md5head(id.toString) % 10L
      (if (b < 8) "train" else if (b == 8) "val" else "test", src)
    }
    val cells = asg.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rT = asg.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cT = asg.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = asg.length.toLong
    val wantContrib = cells.map { case ((sp, src), o) =>
      val diff = BigInt(o) * BigInt(n) - BigInt(rT(sp)) * BigInt(cT(src))
      (sp, src) -> (o, rT(sp), cT(src),
        (diff * diff * 1000000 / (BigInt(rT(sp)) * BigInt(cT(src))
          * BigInt(n))).toLong)
    }
    val got = Experiment.splitterBias(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))
    assert(got.map(t => t._1 -> (t._2._1, t._2._2, t._2._3, t._2._4))
      .toMap == wantContrib)
    val chi2 = wantContrib.values.map(_._4).sum
    got.foreach { case (_, t) =>
      assert(t._5 == chi2)
      assert(t._6 == (rT.size.toLong - 1L) * (cT.size.toLong - 1L))
    }
    // a content-addressed splitter should NOT be wildly source-biased:
    // chi2/dof stays within an order of magnitude of 1 (in micro)
    val dof = (rT.size.toLong - 1L) * (cT.size.toLong - 1L)
    assert(chi2 / dof < 10000000L, s"splitter badly biased: $chi2/$dof")
  }

  test("q399 BH FDR equals a full randomization replay; rejections are a p-rank prefix") {
    def md5hex(x: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val ev = spark.read.parquet(s"${SparkTestSession.sf}/events.parquet")
      .select(col("event_type"), col("user_id"),
        expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val pu = ev.groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(_._3).sum).toMap
    val R = Experiment.bhReplicates
    val stats = pu.keys.map(_._1).toSeq.distinct.sorted.map { tp =>
      val users = pu.keys.filter(_._1 == tp).map(_._2).toSeq
      def signed(u: Long) =
        (if (u % 2 == 0) 1L else -1L) * pu((tp, u))
      val tObs = users.map(signed).sum
      val nExtreme = (1 to R).count { r =>
        val tr = users.map { u =>
          val f = if (java.lang.Long.parseLong(
            md5hex(s"bh:$tp:$u:$r").substring(0, 15), 16) % 2 == 0) 1L
          else -1L
          f * signed(u)
        }.sum
        math.abs(tr) >= math.abs(tObs)
      }
      (tp, users.size.toLong, tObs,
        (nExtreme + 1).toLong * 1000000L / (R + 1))
    }
    val m = stats.size.toLong
    val ranked = stats.sortBy(s => (s._4, s._1)).zipWithIndex
      .map { case ((tp, n, t, p), i) =>
        (tp, n, t, p, (i + 1).toLong,
          p * m <= (i + 1) * Experiment.bhAlphaMicro) }
    val kStar = ranked.filter(_._6).map(_._5).maxOption.getOrElse(0L)
    val got = Experiment.bhFdr(spark, SparkTestSession.sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6), r.getLong(7),
        r.getBoolean(8))).toMap
    assert(got.keySet == ranked.map(_._1).toSet)
    ranked.foreach { case (tp, n, t, p, rk, ok) =>
      val g = got(tp)
      assert((g._1, g._2, g._3, g._4) == ((n, t, p, rk)), s"type $tp")
      assert(g._5 == m && g._6 == ok && g._7 == kStar)
      assert(g._8 == (rk <= kStar))
    }
    // structural law: the rejection set is a PREFIX of the p-ranking
    val rejRanks = got.values.filter(_._8).map(_._4).toSeq.sorted
    assert(rejRanks == (1L to rejRanks.size.toLong))
  }

  test("q400 position-bias audit: replay exact; planted bias visible; tie semantics pinned") {
    def md5hex(x: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def noise(a: Long, o: Int, amp: Long): Long =
      java.lang.Long.parseLong(md5hex(s"pj:$a:$o").substring(0, 15), 16) %
        (2 * amp + 1) - amp
    // fixture replay through the production scorer
    val sc = Experiment.rocAucScored(spark, SparkTestSession.sf)
      .select("doc_id", "score").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val B = Experiment.pjBiasMicro; val A = Experiment.pjNoiseAmp
    val verd = sc.keys.filter(a => a % 2 == 0 && sc.contains(a + 1)).toSeq
      .map { a =>
        val (sa, sb) = (sc(a), sc(a + 1))
        val w0 = sa - sb + B + noise(a, 0, A) >= 0
        val w1 = sb - sa + B + noise(a, 1, A) >= 0
        (math.min(math.abs(sa - sb) / 100000L, 9L),
          w0 != w1,
          (if (w0) 1L else 0L) + (if (w1) 1L else 0L))
      }
    val want = verd.groupBy(_._1).map { case (d, g) =>
      d -> (g.size.toLong, g.count(_._2).toLong, g.map(_._3).sum)
    }
    val got = Experiment.judgePositionBias(spark, SparkTestSession.sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(got.keySet == want.keySet)
    val (tp, tc, tf) = (verd.size.toLong, verd.count(_._2).toLong,
      verd.map(_._3).sum)
    want.foreach { case (d, (n, c, f)) =>
      val g = got(d)
      assert((g._1, g._2, g._3) == ((n, c, f)), s"bucket $d")
      assert(g._4 == c * 1000000L / n && g._5 == f * 1000000L / (2 * n))
      assert(g._6 == tc * 1000000L / tp && g._7 == tf * 1000000L / (2 * tp))
    }
    // the planted first-position bias is DETECTED: global first-win
    // share reads above 50%
    assert(got.values.head._7 > 500000L,
      s"planted +${B} bias invisible: ${got.values.head._7} ppm")
    // tie semantics on a hand frame with bias = 0, amp = 0: an exact
    // score tie prefers the first presentation BOTH times ->
    // inconsistent; a strict order is consistent with first-win = 1
    import spark.implicits._
    val hand = Experiment.judgePositionBiasOn(
      Seq((0L, 500000L), (1L, 500000L), (2L, 700000L), (3L, 100000L))
        .toDF("doc_id", "score"), biasMicro = 0L, noiseAmp = 0L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(hand(0L) == ((1L, 0L, 2L)), "tie pair: inconsistent, first wins both")
    assert(hand(6L) == ((1L, 1L, 1L)), "decided pair: consistent, one first win")
  }

  test("q401 Kendall W: replay exact; zero-noise panel reads W = 1 exactly") {
    def md5hex(x: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val sc = Experiment.rocAucScored(spark, SparkTestSession.sf)
      .select("doc_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val m = Experiment.kwJudges; val A = Experiment.kwNoiseAmp
    val ranks = (1 to m).flatMap { j =>
      sc.map { case (id, s) =>
        val e = java.lang.Long.parseLong(
          md5hex(s"kw:$j:$id").substring(0, 15), 16) % (2 * A + 1) - A
        (j, id, s + e)
      }.sortBy { case (_, id, js) => (-js, id) }
        .zipWithIndex.map { case ((_, id, _), i) => (id, (i + 1).toLong) }
    }
    val n = sc.length.toLong
    val rsum = ranks.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val s2 = rsum.values.map { r =>
      val d = BigInt(2 * r - m * (n + 1)); d * d
    }.sum
    val wantW = (BigInt(3) * s2 * 1000000 /
      (BigInt(m * m) * (BigInt(n) * n * n - n))).toLong
    val row = Experiment.kendallW(spark, SparkTestSession.sf).collect().head
    assert((row.getLong(0), row.getLong(1)) == ((m.toLong, n)))
    assert(row.getLong(2) == wantW, s"W ${row.getLong(2)} vs $wantW")
    assert(row.getLong(3) == (m * row.getLong(2) - 1000000L) / (m - 1))
    // identical judges (zero noise) = perfect concordance, exactly
    import spark.implicits._
    val perfect = Experiment.kendallWOn(
      (1L to 30L).map(i => (i, i * 1000L)).toDF("doc_id", "score"),
      judges = 3, noiseAmp = 0L).collect().head
    assert(perfect.getLong(2) == 1000000L && perfect.getLong(3) == 1000000L)
    // the fixture panel genuinely disagrees somewhere (noise works)
    assert(row.getLong(2) < 1000000L)
  }

  test("q402 adaptive ECE: doc-grain rank replay; equal-mass bins within one") {
    val sc = Experiment.rocAucScored(spark, SparkTestSession.sf)
      .select("doc_id", "score", "is_en").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val n = sc.length.toLong
    val per = sc.sortBy(t => (-t._2, t._1)).zipWithIndex
      .map { case ((_, s, en), i) => (10L * i / n, s, en) }
      .groupBy(_._1).map { case (d, g) =>
        d -> (g.size.toLong, g.map(_._2).sum, g.count(_._3).toLong)
      }
    val tGap = per.values.map { case (_, ss, p) =>
      BigInt((ss - 1000000L * p).abs) }.sum
    val got = Experiment.adaptiveEce(spark, SparkTestSession.sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet == per.keySet && got.keySet == (0L to 9L).toSet)
    per.foreach { case (d, (nd, ss, p)) =>
      val g = got(d)
      assert(g._1 == nd && g._2 == ss / nd && g._3 == p * 1000000L / nd,
        s"decile $d")
      assert(g._4 == ss / nd - p * 1000000L / nd)
      assert(g._5 == (tGap / n).toLong)
      // the equal-mass property q218's fixed-width bins cannot give
      assert(math.abs(nd - n / 10) <= 1L, s"decile $d holds $nd of $n")
    }
  }

  test("decile split routing: the chunked big-tie-group arm equals the window arm exactly") {
    // round-17: scoreGroupDecileAgg routes its straddle arm by the
    // LARGEST straddling group (<= 9-row bounded probe) - the cheap
    // per-score window while every straddling group fits one
    // partition, the chunked-rank device (bucket = score x 1024-way
    // doc_id range) when a corpus-scale tie group is present (the
    // round-16 advice hazard). Both arms must be result-identical.
    // Fixture: one giant tie group (score 500, 700 docs) guaranteed
    // to straddle several decile boundaries, plus distinct-score
    // head/tail mass, alternating positives keyed off doc_id.
    import spark.implicits._
    val rows =
      (1L to 150L).map(i => (i, 1000L + i, i % 3 == 0)) ++
      (1L to 700L).map(i => (10000L + i * 7L, 500L, i % 2 == 0)) ++
      (1L to 150L).map(i => (100000L + i, 10L + i, i % 5 == 0))
    val df = rows.toDF("doc_id", "score", "is_en")
    def canon(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val window = canon(
      Experiment.scoreGroupDecileAgg(df, straddleWindowMax = Long.MaxValue))
    val chunked = canon(
      Experiment.scoreGroupDecileAgg(df, straddleWindowMax = 0L))
    assert(window == chunked,
      s"arms disagree:\nwindow=$window\nchunked=$chunked")
    // sanity: all 10 deciles present, doc mass conserved
    assert(window.keySet == (0L to 9L).toSet)
    assert(window.values.map(_._1).sum == rows.size.toLong)
  }
}
