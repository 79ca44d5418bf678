package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Evidence for the session's adaptive-execution posture
  * (GraftSession enables AQE + skew-join splitting): these are the
  * runtime behaviors the 100 TB claims lean on, demonstrated rather
  * than asserted from config.
  */
class AqeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    withConf(
      // force the shuffle join path and make the skew thresholds
      // reachable at test scale
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "262144",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536") {
      // one hot key carrying ~8 MB of padded payload vs 50 cold keys
      val pad = "x" * 64
      val left = spark.range(0, 120000)
        .select(
          when(col("id") % 10 =!= 0, lit(1L))
            .otherwise(col("id") % 50 + 2).as("k"),
          concat(lit(pad), col("id")).as("payload"))
      val right = spark.range(0, 52)
        .select(col("id").as("k"), (col("id") * 10).as("dim"))
      val joined = left.join(right, "k")
      // materialize THIS queryExecution (count() would plan a new one
      // and leave this adaptive plan unexecuted)
      assert(joined.collect().length == 120000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a runtime skew split in the final adaptive plan:\n$plan")
    }
  }

  test("AQE coalesces a fine-grained shuffle down to data volume") {
    // read the ACTUAL configured partition count — asserting against
    // a constant larger than the session's setting would pass even
    // with coalescing disabled
    val configured = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(configured > 1, s"test needs >1 shuffle partitions, got $configured")
    val agg = spark.range(0, 10000)
      .select((col("id") % 40).as("k"))
      .groupBy("k").count()
    assert(agg.count() == 40L)
    val coalesced = agg.rdd.getNumPartitions
    assert(coalesced < configured,
      s"AQE should coalesce $configured shuffle partitions for 40 tiny groups, got $coalesced")
  }

  test("source hygiene: every crossJoin is broadcast-pinned except the documented eval arm") {
    // Round-17 sweep wrapped every scalar/bounded-domain crossJoin in
    // broadcast(...) so a stats miss can never plan a shuffled
    // nested-loop/cartesian join; this guard keeps future operators
    // from reintroducing one. Whitelist: annRecallEval's brute
    // ground-truth arm (Similarity.scala — documented eval-only,
    // linear in corpus BY DESIGN, never the serving path).
    // occurrence-counted over the WHOLE file text (whitespace-tolerant),
    // not per line: a chained `a.crossJoin(b).crossJoin(broadcast(c))`
    // on one line must still flag the bare first call, and a broadcast(
    // wrapped onto the next line must not false-positive
    import scala.jdk.CollectionConverters._
    // SITE-ANCHORED whitelist (round-17 advice): the old form allowed
    // "<= 1 bare call anywhere in Similarity.scala", so pinning the
    // one documented site would silently open a slot for a NEW
    // unpinned crossJoin elsewhere in that file. A bare call is now
    // legal only when a BARE-CROSSJOIN-OK marker comment sits within
    // the 250 chars preceding it — the marker travels with the site.
    // lookahead INSIDE the paren (not after a backtrackable \s*): a
    // broadcast( wrapped onto the next line must not read as bare
    val bareRe = """\.crossJoin\((?!\s*broadcast\()""".r
    val marker = "BARE-CROSSJOIN-OK"
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    val offenders = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { f =>
        val txt = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
        val unmarked = bareRe.findAllMatchIn(txt).count { m =>
          val ctx = txt.substring(math.max(0, m.start - 250), m.start)
          !ctx.contains(marker)
        }
        if (unmarked > 0) Some(f.getFileName.toString -> unmarked) else None
      }.toMap
    assert(offenders.isEmpty,
      "non-broadcast crossJoin without a BARE-CROSSJOIN-OK marker - " +
        "wrap the bounded side in broadcast(...) or, for a documented " +
        s"eval-only arm, add the marker comment at the site: $offenders")
    // the marker itself stays scarce: exactly the one documented
    // eval arm (annRecallEval's brute ground truth) may carry it
    val markerCount = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .map(f => marker.r.findAllIn(
        new String(java.nio.file.Files.readAllBytes(f), "UTF-8")).size)
      .sum
    assert(markerCount == 1,
      s"BARE-CROSSJOIN-OK markers found: $markerCount (expected exactly " +
        "1, annRecallEval's brute arm) - a new marker needs its own " +
        "documented eval-only justification AND this count bumped")
  }

  test("source hygiene: exactly two udf() sites in main (the documented sketch probes)") {
    // "functions, not UDFs" (SURVEY §7.3): a Scala UDF is an opaque
    // box to Catalyst — no codegen, no null-propagation reasoning, no
    // pushdown through it. The whole main tree carries exactly two,
    // both in Sketches.scala, both probing a driver-built
    // org.apache.spark.util.sketch object that has NO public
    // expression surface (BloomFilterMightContain is optimizer-
    // internal; CountMinSketch.estimateCount has no expression at
    // all) — see the §7.3 exception table. A third site must either
    // be replaced with built-ins / a custom codegen Expression, or
    // grow the table a documented row AND bump this count.
    import scala.jdk.CollectionConverters._
    val udfRe = """(?<![\w.])udf\(""".r
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    val sites = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { f =>
        val txt = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
        val n = udfRe.findAllIn(txt).size
        if (n > 0) Some(f.getFileName.toString -> n) else None
      }.toMap
    assert(sites == Map("Sketches.scala" -> 2),
      s"udf() sites drifted from the documented exception set: $sites")
  }
}
