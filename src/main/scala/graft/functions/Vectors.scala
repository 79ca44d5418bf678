package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, built
  * from higher-order functions (`zip_with`, `aggregate`) — codegen'd
  * Catalyst expressions, no UDF, no driver-side math (SURVEY.md §7.3:
  * "higher-order functions first; custom Expression only as an
  * optimization").
  *
  * All arithmetic is double-precision with a fixed left-to-right fold
  * order, so results are bit-deterministic under any partitioning —
  * required for the DuckDB differential oracle.
  */
object Vectors {

  /** Σ a_i * b_i, double accumulation in element order. Codegen'd
    * custom expression; the HOF twin `aggregate(zip_with(...))` is
    * semantically identical but interpreted (VectorExpressionsSpec
    * pins the equivalence).
    */
  def dot(a: Column, b: Column): Column =
    VectorExpressions.dot_product(a, b)

  /** HOF reference implementation of [[dot]] — kept for the
    * differential spec; not on any hot path.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** Σ a_i², double. */
  def normSq(a: Column): Column =
    VectorExpressions.dot_product(a, a)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** a / ||a||, as array<double>; zero vector maps to zeros. */
  def l2normalize(a: Column): Column = {
    val n = norm(a)
    transform(a, x =>
      when(n > 0.0, x.cast("double") / n).otherwise(lit(0.0)))
  }

  /** cos(a,b) = dot/(||a||·||b||); 0.0 when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn > 0.0, d / nn).otherwise(lit(0.0))
  }
}
