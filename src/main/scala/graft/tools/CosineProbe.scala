// scratch: dump exact spark cosines for duckdb bit-compare
package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.Vectors
import graft.sources.Tables

object CosineProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8, "cosine-probe")
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(col("vec_id") < 50)
      .select(col("vec_id"), Vectors.l2normalize(col("embedding")).as("u"))
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        Vectors.dot(col("a.u"), col("b.u")).as("cosine"))
    pairs.coalesce(1).write.mode("overwrite").parquet("/tmp/cosine_probe")
    spark.stop()
  }
}
