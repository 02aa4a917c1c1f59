package graft

import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

class StreamingSpec extends SparkSpec {

  test("streaming windowed counts equal the batch aggregation") {
    val streamed = EventStreams.windowedCounts(spark, sf).collect()
    val batch = queries.Relational.q10TimeBucket(spark, sf).collect()
    assert(streamed.map(_.toString).sorted.sameElements(batch.map(_.toString).sorted))
  }

  test("streaming dedup emits exactly the distinct key set") {
    val streamed = EventStreams.streamingDedup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = Tables.events(spark, sf)
      .select("user_id", "event_type").distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed == batch)
  }

  test("streaming sessions are a prefix-subset of batch sessions") {
    val streamed = EventStreams.sessionize(spark, sf)
      .select("user_id", "session_start", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = EventStreams.sessionizeBatch(Tables.events(spark, sf))
      .select("user_id", "session_start", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty, "no sessions emitted by the stream")
    // the stream can only withhold per-user final sessions still in state
    // when the watermark stops advancing; everything emitted must be a
    // real batch session
    val missing = streamed -- batch
    assert(missing.isEmpty, s"streamed sessions not in batch: ${missing.take(5)}")
    assert(streamed.size >= batch.size / 2,
      s"stream emitted only ${streamed.size} of ${batch.size} sessions")
  }

  test("batch sessionization: gaps respected, events conserved") {
    val events = Tables.events(spark, sf)
    val sessions = EventStreams.sessionizeBatch(events)
    val totalEvents = sessions.agg(sum("n_events")).collect().head.getLong(0)
    assert(totalEvents == events.count())
    val bad = sessions
      .filter(col("session_end") - col("session_start") < 0)
      .count()
    assert(bad == 0)
  }
}
