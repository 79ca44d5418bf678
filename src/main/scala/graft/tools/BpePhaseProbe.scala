package graft.tools

import org.apache.spark.sql.functions._

/** Measure the two-phase BPE loop against the pure-recount twin at a
  * round count deep enough for the delta phase to engage (the
  * fixture's 20 rounds stay in the frequent regime at sf0.1). Prints
  * per-variant wall seconds and the argmax-count trajectory so the
  * phase switch point is visible.
  *
  * Usage: runMain graft.tools.BpePhaseProbe [rounds]
  */
object BpePhaseProbe {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(60)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(cores = 32, appName = "bpe-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("text"))
    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[bpe-probe] $label%-28s $s%8.2f s"); s
    }
    // warm-up
    graft.operators.TextAnalysis.bpeTrainOn(spark, docs, 3).collect()
    val rows = spark.sparkContext.broadcast(0) // keep session warm
    val mergesTwo = new Array[Seq[org.apache.spark.sql.Row]](1)
    val tTwo = time(s"two-phase @$rounds rounds") {
      mergesTwo(0) = graft.operators.TextAnalysis
        .bpeTrainOn(spark, docs, rounds).collect().toSeq
    }
    val mergesRec = new Array[Seq[org.apache.spark.sql.Row]](1)
    val tRec = time(s"recount  @$rounds rounds") {
      mergesRec(0) = graft.operators.TextAnalysis
        .bpeTrainOnRecount(spark, docs, rounds).collect().toSeq
    }
    require(mergesTwo(0) == mergesRec(0), "variants disagree!")
    val ns = mergesTwo(0).map(r => r.getLong(4))
    val totalRows = docs.where(length(col("text")) >= 2).count()
    val switchAt = ns.indexWhere(_ < totalRows / 3)
    println(f"[bpe-probe] rows=$totalRows switch_round=${switchAt + 1} " +
      f"first_n=${ns.head} last_n=${ns.last} ratio=${tTwo / tRec}%.2f")
    spark.stop()
  }
}
