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

  test("streaming sessionization closed sessions match batch sessions") {
    import spark.implicits._
    val stream = EventStreams.readEvents(spark, stagedPath)
    EventStreams.runToMemorySink(
      EventStreams.sessionizeStream(spark, stream).toDF(), "sess_out")
    val streamed = spark.table("sess_out")
    val batch = Events.sessionize(spark, sf)
    // the stream never closes each user's final session; batch minus
    // last-session-per-user must equal the streamed output
    val lastIdx = batch.groupBy("user_id").agg(max("session_idx").as("last_idx"))
    val closedBatch = batch.join(lastIdx, Seq("user_id"))
      .filter(col("session_idx") =!= col("last_idx"))
      .select("user_id", "session_idx", "session_start_ms", "session_end_ms", "n_events")
    val closedStream = streamed
      .select("user_id", "session_idx", "session_start_ms", "session_end_ms", "n_events")
    assert(closedStream.count() == closedBatch.count())
    assert(closedStream.exceptAll(closedBatch).count() == 0)
  }
}
