// scratch profiler — run with: sbt "runMain graft.tools.ProfileShingles"
package graft.tools

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Dedup

object ProfileShingles {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "profile")
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }
    val docs = Tables.load(spark, sf, "documents")
    time("docs count")(docs.count())
    time("normalize+split only")(
      docs.select(split(graft.operators.TextAnalysis.normalizedText(col("text")), " ").as("w"))
        .selectExpr("size(w) s").agg(sum("s")).count())
    time("shingles explode (no distinct)")(
      Dedup.shingles(docs, 5, distinctPerDoc = false).count())
    time("shingle hashes (custom expr)")(
      Dedup.shingleHashes(docs, 5).count())
    time("minhash signatures")(
      Dedup.minhashSignatures(docs, 5).count())
    time("inverted index")(
      Dedup.shingleHashes(docs, 5)
        .groupBy("sh").agg(collect_set(col("doc_id"))).count())
    time("full q21")(Dedup.ngramJaccardPairs(spark, sf).count())
    time("full q22")(Dedup.minhashLshPairs(spark, sf).count())
    spark.stop()
  }
}
