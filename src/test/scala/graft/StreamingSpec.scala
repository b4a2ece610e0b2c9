package graft

import graft.streaming.Sessions
import org.apache.spark.sql.functions._

/** Structured Streaming sessionization: the streaming session_window query
  * over the events file stream must agree with the batch session_window
  * aggregation (same operator, incremental execution + watermark state).
  */
class StreamingSpec extends SparkSuite {

  test("streaming session_window equals batch session_window on replay") {
    // stage the events file into a monitored stream directory
    val streamDir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf0001, "events.parquet"),
      streamDir.resolve("events-000.parquet"))
    val stream = Sessions.streamingSessionCounts(spark, sf0001, streamDir.toString)
    val q = stream.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_sessions")
      .start()
    try {
      q.processAllAvailable()
    } finally {
      q.stop()
    }
    val streamed = spark.table("stream_sessions")
      .select("user_id", "start_ms", "end_ms", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = Sessions.sessionWindowAgg(spark, sf0001)
      .select("user_id", "start_ms", "end_ms", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // watermark may hold back the tail sessions in append mode; everything
    // emitted must match batch, and most sessions must have been emitted
    assert(streamed.subsetOf(batch), s"streamed-only rows: ${streamed -- batch}")
    assert(streamed.size >= batch.size / 2,
      s"too few streamed sessions: ${streamed.size} of ${batch.size}")
    spark.sql("DROP TABLE IF EXISTS stream_sessions")
  }

  test("flatMapGroupsWithState running totals converge to batch totals") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft-state")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf0001, "events.parquet"),
      streamDir.resolve("events-000.parquet"))
    val q = Sessions.streamingUserTotals(spark, sf0001, streamDir.toString)
      .toDF().writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_totals")
      .start()
    try q.processAllAvailable() finally q.stop()
    // last emitted state per user == batch aggregate
    val streamed = spark.table("stream_totals")
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n"), max(col("value_cents")).as("cents"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = Sessions.events(spark, sf0001)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed == batch)
    spark.sql("DROP TABLE IF EXISTS stream_totals")
  }
}
