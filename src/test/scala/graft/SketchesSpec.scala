package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches

class SketchesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("HLL cardinality estimate lands within the documented bound on every group") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = Sketches.cardinalityRaw(spark, sf).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val exact = r.getLong(1)
        val approx = r.getLong(2)
        val relErr = math.abs(approx - exact).toDouble / math.max(exact, 1L)
        assert(relErr <= Sketches.hllBound,
          s"$sf ${r.getString(0)}: exact=$exact approx=$approx relErr=$relErr")
      }
    }
  }

  test("q39 entry reports approx_ok = true for every group (the oracle's claim)") {
    val rows = Sketches.cardinality(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(2), s"${r.getString(0)} out of bound"))
  }

  test("q48 quantile sketch lands inside the exact p±slack band on every group") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = Sketches.quantiles(spark, sf).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getBoolean(4), s"$sf ${r.getString(0)}: approx out of band")
        assert(r.getDouble(1) <= r.getDouble(2), "p50 <= p95 sanity")
      }
    }
  }

  test("sketch is deterministic: two runs produce identical estimates") {
    val a = Sketches.cardinalityRaw(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val b = Sketches.cardinalityRaw(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(a == b)
  }
}
