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
        noop(graft.operators.Dedup.lshBandingEval(spark, sf))
        for (r <- 1 to 2) {
          time(s"truth: prefixFilterJoinOn #$r") {
            noop(graft.operators.Dedup.prefixFilterJoinOn(docs))
          }
          time(s"sigs: bandingSigs #$r") {
            noop(graft.operators.Dedup.bandingSigs(docs))
          }
          time(s"bands+cand #$r") {
            val sigs = graft.operators.Dedup.bandingSigs(docs)
              .localCheckpoint(true)
            val bands = sigs.select(col("doc_id"), explode(expr(
                """transform(sequence(0, 15), b -> struct(b AS band,
                     md5(array_join(transform(slice(sig, 4 * b + 1, 4),
                       x -> CAST(x AS STRING)), ':')) AS bh))""")).as("bk"))
              .select(col("doc_id"), col("bk.band").as("band"),
                col("bk.bh").as("bh"))
            noop(bands.as("a").join(bands.as("b"),
                col("a.band") === col("b.band") &&
                  col("a.bh") === col("b.bh") &&
                  col("a.doc_id") < col("b.doc_id"))
              .select(col("a.doc_id").as("id_a"),
                col("b.doc_id").as("id_b"))
              .distinct())
          }
          time(s"full: lshBandingEval #$r") {
            noop(graft.operators.Dedup.lshBandingEval(spark, sf))
          }
        }
      case "q233" =>
        noop(graft.sources.Tables.load(spark, sf, "documents")
          .select(count(lit(1))))
        noop(graft.operators.Experiment.gainsTable(spark, sf)) // warm-up
        for (r <- 1 to 3) {
          time(s"scored: rocAucScored #$r") {
            noop(graft.operators.Experiment.rocAucScored(spark, sf))
          }
          time(s"scored+checkpoint #$r") {
            graft.operators.Experiment.rocAucScored(spark, sf)
              .localCheckpoint(true)
          }
          time(s"chunked rank #$r") {
            val scored = graft.operators.Experiment.rocAucScored(spark, sf)
              .localCheckpoint(true)
            val withN = scored.crossJoin(broadcast(
              scored.agg(count(lit(1)).as("n"))))
            noop(graft.operators.Relational.chunkedRowNumber(withN,
              bucket = graft.operators.Relational.rangeBucket(
                col("score"), 10000L, descending = true),
              order = Seq(col("score").desc, col("doc_id").asc)))
          }
          time(s"full: gainsTable #$r") {
            noop(graft.operators.Experiment.gainsTable(spark, sf))
          }
        }
      case other =>
        System.err.println(s"[stage] no stage breakdown wired for $other")
    }
    spark.stop()
  }
}
