package graft

import org.apache.spark.sql.functions._
import graft.operators.Events
import graft.streaming.EventStreams

class StreamingSpec extends SparkSpec {

  private lazy val stagedPath = {
    val p = java.nio.file.Files.createTempDirectory("events_stream").toString
    EventStreams.stageEventsForStreaming(spark, sf, p)
    p
  }

  test("streaming windowed counts equal the batch mirror") {
    val stream = EventStreams.readEvents(spark, stagedPath)
    EventStreams.runToMemorySink(
      EventStreams.windowedCounts(stream), "win_out", mode = "complete")
    val streamed = spark.table("win_out")
      .select("bucket_ms", "event_type", "n", "sum_value")
    val batch = Events.eventsWindowed(spark, sf)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming funnel counts (update mode) match batch stage counts") {
    val stream = EventStreams.readEvents(spark, stagedPath)
    EventStreams.runToMemorySink(
      EventStreams.funnelCounts(stream), "funnel_out", mode = "complete")
    val streamed = spark.table("funnel_out")
    val batch = EventStreams.funnelCounts(Tables.events(spark, sf))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
  }

  test("salted aggregation equals plain aggregation") {
    val ev = Tables.events(spark, sf)
    val salted = graft.functions.Skew.saltedCountSum(ev, Seq("event_type"), "value")
      .withColumn("sum_value", round(col("sum_value"), 6))
    val plain = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("sum_value"))
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("streaming sessionization emits exactly the batch sessions (+ watermark-flushed tails)") {
    val stream = EventStreams.readEvents(spark, stagedPath)
    EventStreams.runToMemorySink(
      EventStreams.sessionizeStream(spark, stream).toDF(), "sess_out")
    val cols = Seq("user_id", "session_idx", "session_start_ms", "session_end_ms", "n_events")
    val streamed = spark.table("sess_out").select(cols.head, cols.tail: _*)
    val batch = Events.sessionize(spark, sf).select(cols.head, cols.tail: _*)
    // every emitted session is a true batch session (no invented ones)
    assert(streamed.exceptAll(batch).count() == 0)
    // all non-final sessions are emitted; finals may be flushed too
    // when the watermark passed their gap window (event-time timeout)
    val lastIdx = Events.sessionize(spark, sf)
      .groupBy("user_id").agg(max("session_idx").as("last_idx"))
    val closedBatch = Events.sessionize(spark, sf).join(lastIdx, Seq("user_id"))
      .filter(col("session_idx") =!= col("last_idx"))
      .select(cols.head, cols.tail: _*)
    assert(closedBatch.exceptAll(streamed).count() == 0)
    assert(streamed.count() >= closedBatch.count())
    assert(streamed.count() <= batch.count())
  }
}
