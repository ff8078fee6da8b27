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

  test("streaming gold: landing files upsert incrementally into the lake table, resuming from checkpoint") {
    import graft.lake.LakeTable
    val tmp = java.nio.file.Files.createTempDirectory("gold_stream").toString
    val landing = s"$tmp/landing"; val table = s"$tmp/gold_windowed"; val ckpt = s"$tmp/ckpt"
    val ev = Tables.events(spark, sf).withColumn("ts_us", unix_micros(col("ts"))).drop("ts")
    // split by time so the second file is never behind the watermark;
    // the split hour receives events from both files -> a MERGE update
    val Array(row) = ev.agg(min("ts_us"), max("ts_us")).collect()
    val mid = (row.getLong(0) + row.getLong(1)) / 2
    ev.filter(col("ts_us") <= mid).write.parquet(landing)
    val q1 = EventStreams.windowedGoldToLake(spark, EventStreams.readEvents(spark, landing), table, ckpt)
    q1.processAllAvailable(); q1.stop()
    assert(LakeTable.read(spark, table).count() > 0)
    // a later landing file arrives while the query is down; the restarted
    // query resumes from the checkpoint and merges only the new windows
    ev.filter(col("ts_us") > mid).write.mode("append").parquet(landing)
    val q2 = EventStreams.windowedGoldToLake(spark, EventStreams.readEvents(spark, landing), table, ckpt)
    q2.processAllAvailable(); q2.stop()
    val gold = LakeTable.read(spark, table).select("bucket_ms", "event_type", "n", "sum_value")
    val batch = Events.eventsWindowed(spark, sf)
    assert(gold.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(gold).count() == 0)
    // the table grew by incremental MERGE commits, not wholesale rewrites
    val hist = LakeTable.history(spark, table).collect()
    assert(hist.map(_.getString(2)).contains("MERGE"))
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
