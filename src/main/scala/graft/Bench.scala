package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  * Uses the `noop` sink so the FULL physical plan executes (a bare
  * `.count()` would let Catalyst prune projections and undercount).
  *
  * Each query is timed SPARK_GRAFT_RUNS times (default 3) and the
  * MEDIAN is reported — single-run numbers made round-over-round
  * deltas unattributable noise (the round-2 verdict's q07 "+13%").
  *
  * REGRESSION GATE: the previous round's medians are read from the
  * newest BENCH_r*.json in the working directory and every query whose
  * median grew by >1.5x AND >0.1 s absolute (the floor keeps
  * sub-100 ms queries from flapping the gate on scheduler noise) is
  * listed under "regressions" in the output line — so an unexplained
  * swing like round 4's q24 +44% is flagged the round it happens, not
  * a round later.
  *
  * BEST-EVER GATE: the prev-round compare alone lets a slow drift
  * through (+40% spread over three rounds never trips 1.5x once), so
  * the same thresholds are ALSO applied against each query's best-ever
  * median across ALL BENCH_r*.json files → "regressions_vs_best".
  */
object Bench {

  /** Per-query medians from a previous round's BENCH_r*.json. The
    * driver wraps the bench line in a log-tail string with escaped
    * quotes — AND keeps only the final ~2 KB, so once the suite grew
    * past ~90 entries the head of the "queries" object (the label
    * included) is truncated away: an object-scoped scrape returns {}
    * and silently disables the vs-prev gate (round 7 found BENCH_r06
    * in exactly that state). Medians and ratios are instead told
    * apart by OUR OWN print format: medians are always f"%.3f",
    * regression/suspect ratios always f"%.2f" — so scrape every
    * `qNN_name":D.DDD` pair with exactly three decimals anywhere in
    * the content. A truncated tail then still yields the surviving
    * partial baseline (missing queries simply aren't compared)
    * instead of nothing.
    */
  def parsePrevMedians(content: String): Map[String, Double] =
    """(q\d{2,}_[a-z0-9_]+)\\?":(-?\d+\.\d{3})(?!\d)""".r
      .findAllMatchIn(content)
      .map(m => m.group(1) -> m.group(2).toDouble)
      .toMap

  def regressions(
      prev: Map[String, Double],
      cur: Seq[(String, Double)],
      floor: Double = 0.1): Seq[(String, Double)] =
    cur.collect {
      case (name, t) if t > 0 && prev.getOrElse(name, -1.0) > 0 &&
          t > prev(name) * 1.5 && t - prev(name) > floor =>
        name -> t / prev(name)
    }

  /** Per-query best-ever (minimum) median across many rounds' parsed
    * medians — the baseline for the slow-drift gate.
    */
  def bestEver(rounds: Seq[Map[String, Double]]): Map[String, Double] =
    rounds.flatMap(_.toSeq).filter(_._2 > 0)
      .groupMapReduce(_._1)(_._2)(math.min)

  /** CONFIRM PASS (round-7): a trip flagged during the full sweep may
    * be measurement contention, not a plan change — BENCH_r06
    * published 20 phantom regressions because the sweep ran
    * concurrently with the correctness gate; a quiet rerun put all 20
    * inside noise. So each flagged query is re-measured (fresh
    * `runs`-median) AFTER the sweep completes, and only trips that
    * reproduce on the re-measured median are published as
    * regressions; the raw sweep flags are kept under "suspect" keys
    * so no information is dropped.
    */
  def confirmRegressions(
      baseline: Map[String, Double],
      flagged: Seq[String],
      remeasure: String => Double): Seq[(String, Double)] =
    // the PUBLISHED floor is 0.25 s absolute (vs 0.1 s for sweep
    // suspects): the same sub-second query spreads 0.2-0.4 s between
    // quiet JVMs on this machine (q86 measured 0.57-1.81 s within ONE
    // fresh-JVM QuickTime run), so a sub-quarter-second delta against
    // a single historical median is indistinguishable from scheduler/
    // GC jitter even when the ratio clears 1.5x. A real regression on
    // a 100 TB-relevant query moves more than 0.25 s; the raw sweep
    // flags stay visible under "suspect" and the re-measured medians
    // under "confirm_times", so nothing is hidden.
    regressions(baseline, flagged.map(n => n -> remeasure(n)), floor = 0.25)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = GraftSession.local(cores = cpus, appName = "graft-bench")
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(s: SparkSession)(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(s, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
      }
    }

    def runMedian(s: SparkSession)(name: String): Double = {
      val ts = Seq.fill(runs)(runOnce(s)(name))
      if (ts.contains(-1.0)) -1.0 else ts.sorted.apply(runs / 2)
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    // one warm-up of the flagship to absorb JVM/codegen first-run cost
    runOnce(spark)("q04_agg_2a")
    val results = names.map(n => n -> runMedian(spark)(n))
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val benchFiles = Option(new java.io.File(".").listFiles()).toSeq.flatten
      .filter(_.getName.matches("BENCH_r\\d+\\.json"))
      .sortBy(_.getName)
    val allRounds = benchFiles.map(f => parsePrevMedians(
      new String(java.nio.file.Files.readAllBytes(f.toPath))))
    val prev = allRounds.lastOption.getOrElse(Map.empty)
    def fmt(rs: Seq[(String, Double)]) = rs
      .map { case (k, r) => "\"" + k + "\":" + f"$r%.2f" }
      .mkString("{", ",", "}")
    val best = bestEver(allRounds)
    val sweepRegr = regressions(prev, results)
    val sweepBest = regressions(best, results)
    // re-measure each flagged query quiet (the sweep is over) on a
    // FRESH SparkContext: after 100+ queries x `runs` the long-lived
    // session itself is ~1.5-2x slower on sub-second queries
    // (accumulated listener/UI/codegen-cache state), so an in-session
    // confirm pass CONFIRMS aging noise instead of killing it —
    // round 7 measured q40 at 0.73 s in-session vs 0.33 s fresh
    // against a 0.29 s best. The fresh context is the honest twin of
    // the baseline it is compared to.
    val flagged = (sweepRegr.map(_._1) ++ sweepBest.map(_._1)).distinct
    val remeasured = if (flagged.isEmpty) Map.empty[String, Double] else {
      spark.stop()
      val fresh = GraftSession.local(cores = cpus, appName = "graft-bench-confirm")
      fresh.sparkContext.setLogLevel("WARN")
      runOnce(fresh)("q04_agg_2a") // warm the new context
      flagged.map(n => n -> runMedian(fresh)(n)).toMap
    }
    val regr = fmt(confirmRegressions(prev, flagged, remeasured))
    val regrBest = fmt(confirmRegressions(best, flagged, remeasured))
    val confirmTimes = remeasured.toSeq.sorted
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val prevName = benchFiles.lastOption.map(_.getName).getOrElse("none")
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"prev":"$prevName","regressions":$regr,"regressions_vs_best":$regrBest,"suspect":${fmt(sweepRegr)},"suspect_vs_best":${fmt(sweepBest)},"confirm_times":$confirmTimes,"sf":"$sfDir"}""")
    SparkSession.getActiveSession.foreach(_.stop())
  }
}
