package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level wall-clock probe for the few multi-second driver
  * entries: times each internal stage of an entry in isolation (same
  * code paths the entry composes) so an optimization targets the
  * measured hot stage instead of a guessed one. Run on a QUIET box:
  *   sbt "runMain graft.tools.StageProbe q332 /root/testdata/sf0.1"
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("q332")
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(cores = 32, appName = "graft-stageprobe")
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[stage] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    which match {
      case "q332" =>
        val docs = graft.sources.Tables.load(spark, sf, "documents")
        // warm-up: JVM + codegen + parquet footer cache
        noop(docs.select(count(lit(1))))
        time("truth: prefixFilterJoinOn") {
          noop(graft.operators.Dedup.prefixFilterJoinOn(docs))
        }
        time("sigs: bandingSigs") {
          noop(graft.operators.Dedup.bandingSigs(docs))
        }
        time("full: lshBandingEval") {
          noop(graft.operators.Dedup.lshBandingEval(spark, sf))
        }
      case other =>
        System.err.println(s"[stage] no stage breakdown wired for $other")
    }
    spark.stop()
  }
}
