package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The reference's user-pluggable map/reduce surface (SURVEY.md §2
  * "UDF/UDAF surface"): the entire mapper/reducer body is
  * user-replaceable code over raw lines plus a keyed numeric merge
  * (`/root/reference/src/nodejs/reducer.js:46` "YOUR REDUCER LOGIC";
  * handler contracts `src/python/mapper.py:25-33`,
  * `src/python/reducer.py:28-38`).
  *
  * Spark-native equivalents:
  *  - the mapper slot  -> `Dataset.flatMap` (record -> 0..n key/value pairs);
  *  - the combiner/reducer slot -> `Aggregator[IN, BUF, OUT]` — Spark
  *    runs it partially per partition (the map-side combine of
  *    `mapper.py:52-54`) and merges across the shuffle (the reduce
  *    rounds of `reducer.py:47-56`), collapsing the reference's
  *    multi-round S3 tree into one exchange;
  *  - the reduction tree itself -> [[treeSum]] shows the literal
  *    `treeAggregate` twin for when a driver-side scalar is wanted.
  */
object MapReduceSurface {

  /** The generic surface: user map fn + keyed sum, like the shipped
    * AMPLab 2a handlers. `mapper` runs distributed per record; the
    * aggregation is Spark's partial+final hash agg.
    */
  def mapReduce[T](
      input: Dataset[T],
      mapper: T => IterableOnce[(String, Double)]): DataFrame = {
    implicit val enc: Encoder[(String, Double)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaDouble)
    input.flatMap(mapper)
      .toDF("key", "value")
      .groupBy(col("key"))
      .agg(sum(col("value")).as("value"))
  }

  /** Deterministic keyed money-sum Aggregator: accumulates exact
    * cents (Long) so the merge is order-independent — the same
    * determinism the oracle needs, achieved in the *typed* path where
    * DECIMAL casts aren't available. Integer addition is associative
    * and commutative, so any partitioning and any reduction-tree
    * shape yields identical output (the property the reference's
    * coordinator relies on, ScalaCheck'd in MapReduceSpec).
    */
  class CentsSumOf[T](f: T => Double) extends Aggregator[T, Long, Double] {
    def zero: Long = 0L
    def reduce(b: Long, a: T): Long = b + Math.round(f(a) * 100.0)
    def merge(b1: Long, b2: Long): Long = b1 + b2
    def finish(b: Long): Double = b / 100.0
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  object CentsSum extends CentsSumOf[Double](identity)

  /** The flagship 2a query implemented through the *typed*
    * user-pluggable path (flatMap mapper + Aggregator reducer)
    * instead of DataFrame expressions. Same oracle SQL as agg2a —
    * differential proof that the pluggable surface agrees with the
    * declarative one.
    */
  def agg2aTyped(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.load(spark, sfDir, "events")
      .select(col("event_type"), col("value"))
      .as[(String, Double)]
    events
      .groupByKey { case (etype, _) => etype.substring(0, math.min(4, etype.length)) }
      .agg(new CentsSumOf[(String, Double)](_._2).toColumn.name("sum_value"))
      .toDF("etype_prefix", "sum_value")
  }

  /** Bounded-state top-k aggregate (q89): the buffer NEVER exceeds k
    * entries, so the aggregate gets map-side partial aggregation with
    * O(k) state per (group, partition) — each input partition ships
    * at most k rows per group to the exchange. Honest note, measured
    * in MapReduceSpec: Spark 3.5+'s `InferWindowGroupLimit` gives the
    * window formulation (q14) the SAME bounded shuffle by planting a
    * partial WindowGroupLimit below the exchange — with that rule
    * excluded the window path shuffles every row (the pre-3.5
    * behavior, and the cliff this operator guards against on engines
    * without the rewrite). What the Aggregator form adds is
    * composability: top-k as a COLUMN, usable inside one groupBy
    * alongside other aggregates (one shuffle for "top-2 orders + sum
    * + count per customer", where the window form needs a second
    * full-table pass) and in typed `groupByKey` pipelines. Ordering
    * is (value DESC, id ASC) — the id tiebreak makes top-k total, so
    * merge order can't change the result (MapReduceSpec properties).
    */
  class TopK(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    private val ord: Ordering[(Double, Long)] =
      Ordering.Tuple2(Ordering[Double].reverse, Ordering[Long])
    def zero: Seq[(Double, Long)] = Vector.empty
    def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
      // reduce runs once per input row — the overwhelming majority of
      // rows rank at-or-below a full buffer's worst entry and must not
      // pay the allocate-and-resort (ties lose to incumbents, matching
      // the stable sort in merge where `a` sorts after buffer entries)
      if (b.length >= k && ord.gteq(a, b.last)) b
      else merge(b, Vector(a))
    def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
      (x ++ y).sorted(ord).take(k)
    def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b
    def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** The q89 driver entry: q14's top-2 orders per customer computed
    * through [[TopK]] instead of a window — shares q14's oracle
    * verbatim, so row-identity across the two plans is checked by the
    * driver, not claimed. Rank is recovered from the (already total)
    * order of the k-array via posexplode.
    */
  def topKPerGroup(spark: SparkSession, sfDir: String, k: Int = 2): DataFrame = {
    val topk = udaf(new TopK(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    Tables.load(spark, sfDir, "orders")
      .groupBy(col("o_custkey"))
      .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_custkey"), posexplode(col("top")))
      .select(
        col("o_custkey"),
        col("col._2").as("o_orderkey"),
        col("col._1").as("o_totalprice"),
        (col("pos") + 1).cast("int").as("rk"))
  }

  /** Literal reduction-tree twin (O8): `treeAggregate` with depth
    * ⌈log_b(nPartitions)⌉ merges partials through executor-side
    * rounds exactly like the coordinator's reducer rounds
    * (`src/python/reducerCoordinator.py:153-159`) — but in-memory,
    * no S3 round-trips. Only for driver-side scalars; keyed
    * aggregation uses the shuffle path above.
    */
  def treeSum(spark: SparkSession, sfDir: String, fanIn: Int = 2): Double = {
    val vals = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_extendedprice")).rdd.map(r => Math.round(r.getDouble(0) * 100.0))
    val parts = math.max(vals.getNumPartitions, 2)
    val depth = math.max(1, math.ceil(math.log(parts) / math.log(math.max(fanIn, 2))).toInt)
    vals.treeAggregate(0L)(_ + _, _ + _, depth) / 100.0
  }

  /** The q403 driver entry: the O8 REDUCTION TREE as a DataFrame plan
    * (round-17 verdict #6) — the reference's coordinator state machine
    * (`src/python/reducerCoordinator.py:107-189`) schedules
    * ⌈log_F(mappers)⌉ rounds of reducer lambdas, each merging F
    * partial-aggregate objects, until one `result` remains. This is
    * that tree verbatim, in Catalyst terms: round 0 buckets the fact
    * table into `leaves` keyed partials (the "mapper outputs"), then
    * each round folds bucket → ⌊bucket/F⌋ with a keyed SUM until one
    * bucket remains — a depth-⌈log_F(leaves)⌉ chain of HashAggregates
    * the optimizer is NOT allowed to fuse (each round's grouping key
    * is a fresh projection of the last).
    *
    * Why it benches: q06 is the one-shuffle plan Spark would pick
    * itself; this entry prices the reference's literal topology on
    * the same data so the "shuffle agg beats an explicit tree"
    * superiority claim in §2/O8 is a measured number, not prose. At
    * 100 TB the corpus still shuffles ZERO rows here — round 0's
    * partial aggregation reduces map-side to ≤ leaves rows per task,
    * and every post-round-0 exchange carries ≤ `leaves` rows total;
    * AQE coalesces those micro-shuffles to single-partition exchanges
    * (MapReduceSpec asserts depth AND the coalescing) so the tree's
    * cost is per-round latency, exactly like the reference's per-round
    * lambda invocations minus the S3 round-trips.
    *
    * Shares q06's oracle verbatim (same money-sum Decimal(18,2)
    * discipline), so row-identity between the tree and the one-shuffle
    * plan is driver-checked every round, never claimed.
    */
  def treeReduceSum(
      spark: SparkSession, sfDir: String,
      fanIn: Int = 4, leaves: Int = 64): DataFrame = {
    require(fanIn >= 2 && leaves >= 1, "degenerate tree")
    // round 0 ("mappers"): deterministic key-derived bucketing — NOT
    // spark_partition_id(), whose value depends on split planning and
    // would make the result layout-dependent at a different
    // maxPartitionBytes
    var agg = Tables.load(spark, sfDir, "lineitem")
      .select(
        pmod(col("l_orderkey"), lit(leaves.toLong)).as("bucket"),
        col("l_extendedprice")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("x"))
      .groupBy(col("bucket"))
      .agg(sum(col("x")).as("part_sum"), count(lit(1)).as("part_n"))
    var width = leaves
    while (width > 1) { // static unroll: depth fixed by (leaves, fanIn)
      width = math.ceil(width.toDouble / fanIn).toInt
      agg = agg
        .groupBy((col("bucket") / fanIn).cast("long").as("bucket"))
        .agg(sum(col("part_sum")).as("part_sum"),
          sum(col("part_n")).as("part_n"))
    }
    agg.select(
      col("part_sum").cast("double").as("total_price"),
      col("part_n").cast("long").as("n_rows"))
  }
}
