package graft.tools

/** Median-time a comma-separated list of driver entries on a fresh,
  * quiet JVM — the diagnostic that separates plan cost from
  * bench-sweep session aging (a 100-query session reads ~1.5-2x slow
  * on sub-second queries; see Bench's confirm-pass note). Round 7
  * used this to exonerate six "confirmed" vs-best trips.
  *
  * Usage: runMain graft.tools.QuickTime q40_lang_id,q28_percentiles
  */
object QuickTime {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(cores = 32, appName = "quicktime")
    spark.sparkContext.setLogLevel("ERROR")
    def once(n: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once("q04_agg_2a") // warm-up
    // QUIETNESS SELF-CHECK (round-9): after the warm-up, median-time
    // the q04 flagship and report it on a non-query label. The parent
    // (Bench.forkQuickTime) compares it to q04's committed median: a
    // fork launched into a still-busy window (round 8's confirm pass
    // read 2-13x high because it started right after the 34-min sweep)
    // reads the flagship high too, and the parent then retries after a
    // backoff or publishes confirm_unreliable instead of numbers.
    // The label deliberately does NOT match the q\d+_ query-name shape
    // so no scraper can mistake it for a query median.
    val checkTs = Seq.fill(3)(once("q04_agg_2a")).sorted
    println(f"[quick] flagship_check median=${checkTs(1)}%.3f min=${checkTs.head}%.3f max=${checkTs.last}%.3f")
    names.foreach { n =>
      // a query that throws must not kill the remaining re-measures
      // (Bench's confirm pass runs a whole flagged set in one fork);
      // median=-1.000 marks the failure machine-readably
      val ts = Seq.fill(5)(scala.util.Try(once(n)).getOrElse(-1.0)).sorted
      val med = if (ts.contains(-1.0)) -1.0 else ts(2)
      println(f"[quick] $n median=$med%.3f min=${ts.head}%.3f max=${ts.last}%.3f")
    }
    spark.stop()
  }
}
