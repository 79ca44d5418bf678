package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.EventStream
import graft.operators.Relational

class EventStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  def sf: String = SparkTestSession.sf

  test("streaming hourly window equals the batch twin (counts per hour/type)") {
    val streamed = EventStream.runToBatch(
      spark, EventStream.hourlyStream(_, sf), "hourly_test")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val batch = Relational.eventsHourly(spark, sf)
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(streamed == batch)
  }

  test("sliding-window stream equals its batch twin") {
    val streamed = EventStream.runToBatch(
      spark, EventStream.slidingStream(_, sf), "sliding_test")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = EventStream.slidingBatch(spark, sf)
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
    // sliding: total window-event memberships = 2x event count
    val nEvents = graft.sources.Tables.load(spark, sf, "events").count()
    assert(streamed.values.sum == 2 * nEvents)
  }

  test("stream-static join (tier dimension) equals its batch twin") {
    val streamed = EventStream.runToBatch(
      spark, EventStream.tierHourlyStream(_, sf), "tier_test")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = EventStream.tierHourlyBatch(spark, sf)
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
    assert(streamed.keys.map(_._2).toSet == Set("tier_0", "tier_1", "tier_2"))
  }

  test("streaming dedup keeps each event key once (append mode)") {
    val q = EventStream.dedupedEvents(spark, sf).writeStream
      .outputMode("append")
      .format("memory")
      .queryName("dedup_test")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val ids = spark.table("dedup_test").collect().map(_.getLong(0))
    assert(ids.length == ids.distinct.length)
    // fixture event_ids are unique, so dedup passes everything through
    assert(ids.length == graft.sources.Tables.load(spark, sf, "events").count())
  }

  test("stream-stream attribution join equals its batch twin") {
    val streamed = EventStream.runToBatch(
      spark, EventStream.attributionStream(_, sf), "attr_test",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(3))).toSet
    val batch = EventStream.attributionBatch(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(3))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty, "fixture should contain attributable purchases")
    // every attributed click strictly precedes its purchase, within 1h
    EventStream.attributionBatch(spark, sf).collect().foreach { r =>
      val p = r.getTimestamp(2).getTime; val c = r.getTimestamp(3).getTime
      assert(c < p && c >= p - 3600 * 1000L)
    }
  }

  test("stateful user sessions match batch per-user aggregates (one row per user)") {
    val rows = EventStream.userSessionsBatch(spark, sf).collect()
    // userSessionsBatch dedupes to the final state: exactly one row/user
    val sessions = rows.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(sessions.size == rows.length, "duplicate users in batch view")
    val batch = graft.sources.Tables.load(spark, sf, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(sessions == batch)
  }
}
