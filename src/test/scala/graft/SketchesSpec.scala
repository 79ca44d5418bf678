package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
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

  test("bloom pre-filtered semi join is row-identical to the plain semi join") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val plain = {
      val keys = graft.sources.Tables.load(spark, sf, "orders")
        .filter(col("o_totalprice") > 300000.0).select(col("o_orderkey"))
      graft.sources.Tables.load(spark, sf, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"))
        .join(keys, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    }
    val bloomed = Sketches.bloomSemiJoin(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(bloomed == plain)
    assert(bloomed.nonEmpty)
  }

  test("q58 semi join reads the build side from the cache, not a re-scan") {
    val (joined, keys) =
      Sketches.bloomSemiJoinPlanned(spark, "/root/testdata/sf0.001", 300000.0)
    try {
      // node-level check on the optimized LOGICAL plan (the physical
      // tree hides under AdaptiveSparkPlanExec, and the InMemoryRelation
      // description string still embeds the original scan, so neither
      // executedPlan.collect nor string-matching would see the truth)
      val plan = joined.queryExecution.optimizedPlan
      val cached = plan.collect {
        case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
      }
      assert(cached.nonEmpty, s"expected cached build side in plan:\n$plan")
      val ordersScans = plan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
            if l.relation.toString.contains("orders") => l
      }
      assert(ordersScans.isEmpty, s"build side re-scans orders from file:\n$plan")
    } finally keys.unpersist()
  }

  test("q60 CMS estimate lands inside the guarantee band on every probe") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = Sketches.cmsFrequency(spark, sf).collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getBoolean(3),
        s"$sf ${r.getString(0)}/${r.getLong(1)}: CMS out of band"))
    }
  }

  test("sketch is deterministic: two runs produce identical estimates") {
    val a = Sketches.cardinalityRaw(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val b = Sketches.cardinalityRaw(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(a == b)
  }

  test("hll overlap: crafted segment intersections are exact; estimates stay in band") {
    import spark.implicits._
    // A = users 1-100, B = 51-150 (overlap 50), C = 200-209 (disjoint)
    val tu = ((1 to 100).map(u => ("A", u.toLong)) ++
      (51 to 150).map(u => ("B", u.toLong)) ++
      (200 to 209).map(u => ("C", u.toLong)))
      .toDF("event_type", "user_id")
    val got = graft.operators.Sketches.hllOverlapOn(tu)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toMap
    assert(got(("A", "B")) == ((100L, 100L, 50L, true)))
    assert(got(("A", "C")) == ((100L, 10L, 0L, true)))
    assert(got(("B", "C")) == ((100L, 10L, 0L, true)))
    assert(got.size == 3)
  }

  test("q250 KMV: ALL row merged from per-type sketches equals the from-scratch bottom-k") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // crafted: two overlapping segments, each > k distinct users, so
    // the merge must actually SELECT among competing sketch hashes
    val tu = ((1L to 90L).map(u => ("A", u)) ++
      (46L to 140L).map(u => ("B", u))).toDF("event_type", "user_id")
    val rows = graft.operators.Sketches.kmvSketchOn(tu).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // from-scratch bottom-k over the distinct union of user hashes
    val k = graft.operators.Sketches.KmvK
    val hashes = tu.select(conv(substring(md5(concat(lit("kmv:"),
        col("user_id").cast("string"))), 1, 15), 16, 10).cast("long")
        .as("h")).distinct()
      .collect().map(_.getLong(0)).sorted
    val kth = hashes(k - 1)
    val est = (BigInt(k - 1) * (BigInt(1) << 60) / kth).toLong
    assert(rows("ALL") == ((140L, k.toLong, kth, est)))
    // per-type exacts and sketch fill
    assert(rows("A")._1 == 90L && rows("B")._1 == 95L)
    assert(rows("A")._2 == k.toLong && rows("B")._2 == k.toLong)
    // a sketch smaller than k reports the exact count as its estimate
    val small = (1L to 5L).map(u => ("S", u)).toDF("event_type", "user_id")
    val s = graft.operators.Sketches.kmvSketchOn(small).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(s("S") == ((5L, 5L, -1L, 5L)))
    assert(s("ALL") == ((5L, 5L, -1L, 5L)))
  }

  test("q250 KMV: the rank<=k window runs under WindowGroupLimit (partitions ship <= k rows/group)") {
    import org.apache.spark.sql.functions.col
    val tu = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_type"), col("user_id"))
    val df = graft.operators.Sketches.kmvSketchFrame(tu)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("WindowGroupLimit"),
      s"the bottom-k sketch must push the group limit below the exchange:\n$plan")
  }

  test("q250 KMV: estimate lands within 2 sigma (~36% at k=32) on the fixtures") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = Sketches.kmvSketch(spark, sf).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val (exact, est) = (r.getLong(1), r.getLong(4))
        val relErr = math.abs(est - exact).toDouble / math.max(exact, 1L)
        assert(relErr <= 0.36,
          s"$sf ${r.getString(0)}: exact=$exact est=$est relErr=$relErr")
      }
    }
  }

  test("q253 bitmap intersection equals the exact distinct-user intersection") {
    import org.apache.spark.sql.functions.col
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val tu = graft.sources.Tables.load(spark, sf, "events")
        .select(col("event_type"), col("user_id")).distinct()
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val byType = tu.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val got = Sketches.bitmapIntersect(spark, sf).collect()
      assert(got.nonEmpty)
      got.foreach { r =>
        val (a, b) = (r.getString(0), r.getString(1))
        assert(r.getLong(2) == byType(a).size.toLong, s"$sf $a size")
        assert(r.getLong(3) == byType(b).size.toLong, s"$sf $b size")
        assert(r.getLong(4) == (byType(a) & byType(b)).size.toLong,
          s"$sf $a~$b intersection")
      }
    }
  }

  test("q267 Misra-Gries summary: size bound, undercount bound, no false negatives") {
    import spark.implicits._
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val cap = 1300
      val keys = spark.read.parquet(s"$sf/lineitem.parquet")
        .select(col("l_partkey")).as[Long]
      val mg = keys.select(new Sketches.MisraGriesAgg(cap).toColumn).head()
      val exact = keys.toDF("k").groupBy("k").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val n = exact.values.sum
      assert(mg.n == n, s"$sf exact item count")
      assert(mg.counts.size <= cap, s"$sf summary size")
      mg.counts.foreach { case (k, c) =>
        val t = exact(k)
        assert(c <= t, s"$sf key $k: summary over-counts")
        assert(t - c <= n / (cap + 1), s"$sf key $k: undercount bound")
      }
      // the theorem under the q267 oracle: every true heavy hitter
      // (freq > n/cap) is present in the summary
      exact.foreach { case (k, t) =>
        if (t * cap > n)
          assert(mg.counts.contains(k), s"$sf true HH $k missing")
      }
    }
  }

  test("q267 trim path: tiny cap on a skewed stream still keeps the heavy key") {
    import spark.implicits._
    // 500 distinct cold keys + one key at 30% frequency, cap = 5:
    // massive trimming, but freq > n/(cap+1) guarantees survival
    val data = (1 to 500).map(_.toLong) ++ Seq.fill(220)(9999L)
    val ds = spark.createDataset(data).repartition(7)
    val mg = ds.select(new Sketches.MisraGriesAgg(5).toColumn).head()
    assert(mg.counts.size <= 5)
    assert(mg.counts.contains(9999L), "heavy key trimmed away")
    assert(mg.n == data.length.toLong)
  }

  test("q267 end-to-end equals the exact heavy-hitter query and is partitioning-invariant") {
    val got = Sketches.heavyHittersExact(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.nonEmpty)
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val n = li.count()
    val expect = li.groupBy(col("l_partkey")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (_, c) => c * 1300 > n }
      .map { case (k, c) => (k, c, n, c * 1000000L / n) }
      .sortBy(_._1)
    assert(got.toSeq == expect.toSeq)
  }

  test("q289 weighted histogram median equals the direct running-mass rule; weights matter") {
    val sf = SparkTestSession.sf
    val row = Sketches.weightedHistogramMedian(spark, sf).head()
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(floor(col("l_extendedprice") * 100.0 + 0.5).cast("long"),
        floor(col("l_quantity") + 0.5).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val w = rows.map(_._2).sum
    val k = (w + 1) / 2
    assert(row.getLong(0) == w && row.getLong(3) == k)
    // direct rule: smallest cents whose cumulative mass reaches k
    val byVal = rows.groupBy(_._1).map { case (c, g) => (c, g.map(_._2).sum) }
      .toSeq.sorted
    var cum = 0L
    val med = byVal.collectFirst {
      case (c, vw) if { cum += vw; cum >= k } => c }.get
    assert(row.getLong(6) == med, "weighted median must be exact")
    // the weighted median differs from the unweighted one here —
    // weights genuinely move the statistic (fixture property)
    val un = rows.map(_._1).sorted.apply(((rows.length + 1) / 2) - 1)
    assert(med != un || rows.map(_._2).distinct.length == 1)
  }

  test("q279 histogram-refine median equals the full-sort nearest-rank; refinement genuinely refines") {
    val sf = SparkTestSession.sf
    val row = Sketches.histogramMedian(spark, sf).head()
    val cents = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(floor(col("l_extendedprice") * 100.0 + 0.5).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val n = cents.length.toLong
    val k = (n + 1) / 2
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == cents.head && row.getLong(2) == cents.last)
    assert(row.getLong(3) == k)
    assert(row.getLong(6) == cents(k.toInt - 1), "median must be exact")
    // the pass-3 slice is a small fraction of the corpus — the point
    val inBucket = row.getLong(5)
    assert(inBucket >= 1L && inBucket < n / 10,
      s"bucket slice $inBucket should be far under n=$n")
    // bucket bookkeeping: the k-th value falls inside the candidate
    val width = cents.last - cents.head + 1
    val bucketOfMedian = (cents(k.toInt - 1) - cents.head) * 1024 / width
    assert(row.getLong(4) == bucketOfMedian)
  }
}
