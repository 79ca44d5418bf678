package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Robustness sweep: EVERY SparkEntry query must execute (not throw)
  * on schema-correct but EMPTY fixture tables. Empty partitions are
  * the norm at 100 TB (filters and buckets that match nothing);
  * operators that crash on zero rows are not shippable.
  */
class EmptyInputSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  lazy val emptyDir: String = {
    val dir = "/tmp/graft-empty-fixtures"
    Tables.fixtureNames.foreach { n =>
      spark.read.parquet(s"${SparkTestSession.sf}/$n.parquet")
        .limit(0)
        .write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    dir
  }

  test("every query runs to completion on empty tables") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          fn(spark, emptyDir).collect() // force full execution
          None
        } catch {
          case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
        }
    }
    assert(failures.isEmpty, s"queries failing on empty input:\n${failures.mkString("\n")}")
  }
}
