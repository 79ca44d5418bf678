package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Relational

class RelationalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  def sf: String = SparkTestSession.sf

  test("broadcast join plan actually broadcasts the dimension side") {
    val plan = Relational.joinBroadcast(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  test("semi + anti join partition the customer set") {
    val total = graft.sources.Tables.load(spark, sf, "customer").count()
    val withOrders = graft.sources.Tables.load(spark, sf, "customer")
      .join(graft.sources.Tables.load(spark, sf, "orders"),
        col("c_custkey") === col("o_custkey"), "left_semi").count()
    val without = Relational.joinAnti(spark, sf).count()
    assert(withOrders + without == total)
  }

  test("window top-per-key returns at most 2 rows per customer, ranked") {
    val rows = Relational.windowTopPerKey(spark, sf).collect()
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      assert(g.length <= 2)
      val sorted = g.sortBy(_.getInt(3))
      if (sorted.length == 2)
        assert(sorted(0).getDouble(2) >= sorted(1).getDouble(2))
    }
  }

  test("rollup emits group, subtotal and grand-total rows") {
    val rows = Relational.rollupAgg(spark, sf).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    val leaf = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    val subtotal = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    assert(leaf.nonEmpty && subtotal.nonEmpty)
    // subtotals sum to grand total (counts are exact)
    assert(subtotal.map(_.getLong(3)).sum == grand.head.getLong(3))
  }

  test("union keeps duplicates (UNION ALL semantics)") {
    val o = graft.sources.Tables.load(spark, sf, "orders")
    val both = o.filter(col("o_orderstatus") === "F")
      .filter(col("o_totalprice") > 450000.0).count()
    val expected = o.filter(col("o_orderstatus") === "F").count() +
      o.filter(col("o_totalprice") > 450000.0).count()
    assert(Relational.unionScans(spark, sf).count() == expected)
    assert(both >= 0) // rows in both filters appear twice by design
  }
}
