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
      spark, EventStream.hourlyStream(spark, sf), "hourly_test")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = Relational.eventsHourly(spark, sf)
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
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
