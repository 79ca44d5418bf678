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
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = GraftSession.local(cores = cpus, appName = "graft-bench")
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
      }
    }

    def runMedian(name: String): Double = {
      val ts = Seq.fill(runs)(runOnce(name))
      if (ts.contains(-1.0)) -1.0 else ts.sorted.apply(runs / 2)
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    // one warm-up of the flagship to absorb JVM/codegen first-run cost
    runOnce("q04_agg_2a")
    val results = names.map(n => n -> runMedian(n))
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
