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

  test("stateful user sessions match batch per-user aggregates") {
    val sessions = EventStream.userSessionsBatch(spark, sf)
      .groupBy("user_id")
      .agg(max("n_events").as("n_events"), max("n_purchases").as("n_purchases"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = graft.sources.Tables.load(spark, sf, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(sessions == batch)
  }
}
