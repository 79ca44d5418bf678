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
}
