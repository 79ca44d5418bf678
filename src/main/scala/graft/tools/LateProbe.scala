package graft.tools

/** Probe for q265: runs the operator and prints the watermark-dropped
  * row count from the progress metrics next to the result size.
  */
object LateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.local(cores = 8, appName = "late-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val (df, dropped) = graft.streaming.EventStream.lateDataRun(spark, sfDir)
    println(s"[probe] rows=${df.count()} dropped=$dropped")
    spark.stop()
  }
}
