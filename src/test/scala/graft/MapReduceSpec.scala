package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.{MapReduceSurface, ReferenceQueries}

class MapReduceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  def sf: String = SparkTestSession.sf
  import spark.implicits._

  test("typed Aggregator path agrees with the declarative flagship") {
    val typed = MapReduceSurface.agg2aTyped(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val declarative = ReferenceQueries.agg2a(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(typed == declarative)
  }

  test("mapReduce surface runs arbitrary user map logic (reference's splice point)") {
    val lines = Seq(
      "1.2.3.4,x,y,0.5", "1.2.3.9,x,y,1.0", "9.9.9.9,x,y,2.25").toDS()
    // user mapper: the AMPLab 2a handler body, as a plain Scala closure
    val result = MapReduceSurface.mapReduce[String](lines, { line =>
      val f = line.split(',')
      Seq(f(0).take(7) -> f(3).toDouble)
    }).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(result == Map("1.2.3.4" -> 0.5, "1.2.3.9" -> 1.0, "9.9.9.9" -> 2.25))
  }

  test("CentsSum merge is associative and commutative (ScalaCheck)") {
    // the algebra the reference's reduction tree assumes (SURVEY.md §5):
    // agg(data) == merge(parts.map(agg)) under ANY partitioning
    val moneyGen = Gen.listOf(
      Gen.chooseNum(-99999999L, 99999999L).map(_ / 100.0))
    val prop = Prop.forAll(moneyGen) { vals =>
      val whole = vals.foldLeft(0L)((b, a) => MapReduceSurface.CentsSum.reduce(b, a))
      (0 to vals.length).forall { cut =>
        val (l, r) = vals.splitAt(cut)
        val lb = l.foldLeft(0L)((b, a) => MapReduceSurface.CentsSum.reduce(b, a))
        val rb = r.foldLeft(0L)((b, a) => MapReduceSurface.CentsSum.reduce(b, a))
        MapReduceSurface.CentsSum.merge(lb, rb) == whole &&
          MapReduceSurface.CentsSum.merge(rb, lb) == whole
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("TopK buffer is k-bounded and partition-order invariant (ScalaCheck)") {
    val agg = new MapReduceSurface.TopK(3)
    val rowsGen = Gen.listOf(Gen.zip(
      Gen.chooseNum(-1000L, 1000L).map(_ / 10.0), Gen.chooseNum(0L, 50L)))
    val prop = Prop.forAll(rowsGen) { rows =>
      val whole = rows.foldLeft(agg.zero)(agg.reduce)
      whole.length <= 3 && (0 to rows.length).forall { cut =>
        val (l, r) = rows.splitAt(cut)
        val lb = l.foldLeft(agg.zero)(agg.reduce)
        val rb = r.foldLeft(agg.zero)(agg.reduce)
        // every intermediate buffer is bounded, merge is symmetric,
        // and any split reproduces the unsplit answer
        lb.length <= 3 && rb.length <= 3 &&
          agg.merge(lb, rb) == whole && agg.merge(rb, lb) == whole
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("TopK aggregate rows equal the window top-per-key formulation") {
    val viaAgg = MapReduceSurface.topKPerGroup(spark, SparkTestSession.sf)
    // partial aggregation must appear below the exchange — that is
    // the whole point vs the shuffle-everything window plan
    val plan = viaAgg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.toLowerCase.contains("partial_"), plan)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getInt(3))
    val a = viaAgg.collect().map(key).toMap
    val b = graft.operators.Relational
      .windowTopPerKey(spark, SparkTestSession.sf).collect().map(key).toMap
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("TopK shuffle is bounded like WindowGroupLimit's; both beat the naive window") {
    // heavy groups: 200 groups x 500 rows; k=2. Three measured plans:
    //  1. TopK aggregate — partial buffers ship ≤k rows/(group,partition)
    //  2. window rank-filter — Spark 3.5+'s InferWindowGroupLimit
    //     plants a partial group-limit below the exchange (same bound)
    //  3. window rank-filter with that rule EXCLUDED — the pre-3.5
    //     plan, which shuffles every row (the cliff)
    import org.apache.spark.sql.functions._
    val data = spark.range(0, 100000)
      .select((col("id") % 200).as("g"),
        (col("id") * 37 % 10007).cast("double").as("v"),
        col("id").as("rid"))
      .repartition(8).localCheckpoint(true)

    val topk = udaf(new MapReduceSurface.TopK(2),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaLong))
    val (_, aggM) = graft.sinks.Sinks.withMetrics(spark) {
      data.groupBy("g").agg(topk(col("v"), col("rid")).as("top")).collect()
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("v").desc, col("rid").asc)
    def windowRun() = data.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2).collect()
    val (_, winM) = graft.sinks.Sinks.withMetrics(spark)(windowRun())

    val key = "spark.sql.optimizer.excludedRules"
    val saved = spark.conf.getOption(key)
    val (_, naiveM) = try {
      spark.conf.set(key,
        "org.apache.spark.sql.catalyst.optimizer.InferWindowGroupLimit")
      graft.sinks.Sinks.withMetrics(spark)(windowRun())
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }

    assert(aggM.shuffleBytes > 0 && winM.shuffleBytes > 0 && naiveM.shuffleBytes > 0)
    assert(aggM.shuffleBytes * 5 < naiveM.shuffleBytes,
      s"bounded agg ${aggM.shuffleBytes} vs naive window ${naiveM.shuffleBytes}")
    assert(winM.shuffleBytes * 5 < naiveM.shuffleBytes,
      s"group-limit window ${winM.shuffleBytes} vs naive ${naiveM.shuffleBytes}")
    // and the two bounded plans are in the same class
    assert(aggM.shuffleBytes < naiveM.shuffleBytes / 5 &&
      winM.shuffleBytes < naiveM.shuffleBytes / 5)
  }

  test("treeAggregate twin equals the shuffle global sum") {
    val tree = MapReduceSurface.treeSum(spark, sf, fanIn = 2)
    val shuffle = ReferenceQueries.globalSum(spark, sf).head().getDouble(0)
    assert(math.abs(tree - shuffle) < 1e-9, s"$tree vs $shuffle")
  }

  test("q403 reduction tree: depth-3 agg chain, corpus shuffles zero rows, AQE coalesces rounds") {
    // value parity with the one-shuffle plan (the driver re-checks
    // this via the shared q06 oracle every round)
    val df = MapReduceSurface.treeReduceSum(spark, sf, fanIn = 4, leaves = 64)
    val row = df.collect().head
    val q06 = ReferenceQueries.globalSum(spark, sf).collect().head
    assert(row.getDouble(0) == q06.getDouble(0) && row.getLong(1) == q06.getLong(1))
    // PLAN SHAPE (round-17 verdict #6): 64 leaves at fan-in 4 is a
    // 3-round tree on top of the round-0 bucketing -> exactly 4
    // exchanges, each a fresh grouping key Catalyst must not fuse
    // AdaptiveSparkPlan.toString prints the Final AND Initial plans —
    // count exchanges in the final section only
    val executed = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val nExchanges = executed.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(nExchanges == 4,
      s"expected 4 tree-round exchanges (1 bucketing + ceil(log_4 64)=3 folds):\n$executed")
    // the fact table reduces MAP-SIDE in round 0: every exchange
    // carries partial (bucket, sum, count) rows — at most `leaves`
    // distinct keys — never lineitem rows. Read the real shuffle
    // volume off the executed metrics rather than trusting the plan.
    val metrics = {
      val sl = new org.apache.spark.scheduler.SparkListener {
        val recs = new java.util.concurrent.atomic.AtomicLong
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          recs.addAndGet(e.taskMetrics.shuffleWriteMetrics.recordsWritten)
      }
      spark.sparkContext.addSparkListener(sl)
      try {
        df.write.format("noop").mode("overwrite").save()
        org.apache.spark.graftbus.drainListenerBus(spark.sparkContext)
      } finally spark.sparkContext.removeSparkListener(sl)
      sl.recs.get()
    }
    val nParts = ReferenceQueriesSpecHelpers.factPartitions(spark, sf)
    val lineitemRows = q06.getLong(1)
    assert(metrics < lineitemRows / 10,
      s"tree shuffled $metrics records - round 0 must combine map-side " +
        s"(<= 64 partials x $nParts tasks), never shuffle the fact table")
    // AQE collapses each micro-round to a single-partition exchange:
    // the post-round-0 folds read <= 64 rows, so the final plan must
    // show AQEShuffleRead coalescing, not 32 near-empty partitions
    assert(executed.contains("AQEShuffleRead") ||
      executed.contains("coalesced"),
      s"AQE did not coalesce the micro-rounds:\n$executed")
  }
}

/** q403's spec needs the fact-scan task count for its shuffle-volume
  * bound; split out so the listener arithmetic above stays readable.
  */
object ReferenceQueriesSpecHelpers {
  def factPartitions(spark: org.apache.spark.sql.SparkSession, sf: String): Int =
    graft.sources.Tables.load(spark, sf, "lineitem").rdd.getNumPartitions
}
