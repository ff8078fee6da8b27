package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types._
import graft.lake.LakeTable

/** Structured Streaming pipelines — the Spark-native analog of the
  * reference's event-driven layer: S3 file sensors that trigger on new
  * landing files (ref: s3_data_landing_component.py sensors) map to a
  * file-source `readStream`; the hourly admissions refresh (ref:
  * defs/schedules/defs.yaml admissions_hourly_refresh) maps to a
  * watermarked windowed aggregation; custom session state uses
  * flatMapGroupsWithState.
  *
  * Batch mirrors with DuckDB oracles live in graft.operators.Events
  * (eventsWindowed / sessionize); the specs verify stream == batch.
  */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over an events directory (the sensor analog:
    * new files under `path` are picked up incrementally).
    * Expects parquet with an epoch-micros `ts_us` column (see
    * [[stageEventsForStreaming]]) to sidestep the TIMESTAMP(NANOS)
    * parquet limitation on streaming scans.
    */
  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema(StructType(eventSchema.fields.map {
        case StructField("ts", _, n, m) => StructField("ts_us", LongType, n, m)
        case f => f
      }))
      .parquet(path)
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .drop("ts_us")

  /** Re-stage the batch events table as streaming-readable parquet. */
  def stageEventsForStreaming(spark: SparkSession, sfDir: String, outPath: String): Unit =
    graft.Tables.events(spark, sfDir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .drop("ts")
      .write.mode("overwrite").parquet(outPath)

  /** Watermarked hourly windowed aggregation (streaming mirror of
    * Events.eventsWindowed). Late data beyond 2 hours is dropped.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), graft.functions.Money.msum(col("value")).as("sum_value"))
      .select(unix_millis(col("window.start")).as("bucket_ms"),
        col("event_type"), col("n"), col("sum_value"))

  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double) {
    def ts_ms: Long = ts.getTime
  }
  case class SessionState(start: Long, end: Long, n: Long, sum: Double, idx: Long)
  /** Per-user session tracker: at most one open session, plus the last
    * emitted session index so indices stay unique across timeout flushes.
    */
  case class SessTracker(lastIdx: Long, open: List[SessionState])
  case class SessionOut(user_id: Long, session_idx: Long, session_start_ms: Long,
                        session_end_ms: Long, n_events: Long, sum_value: Double)

  /** Stateful sessionization with flatMapGroupsWithState (30-minute
    * gap). Emits a session as soon as a newer event closes it; the
    * still-open session is flushed by event-time timeout once the
    * watermark passes its gap window (production path — without it a
    * user's final session would never be emitted).
    *
    * Per-group events are not guaranteed ordered across micro-batches;
    * each batch's group buffer is sorted, an in-gap event merges with
    * start = min, end = max (so an out-of-order event arriving within
    * the watermark cannot regress the open session's bounds), and the
    * session counter survives timeout flushes in state — no duplicate
    * (user_id, session_idx) keys. The counter itself is dropped after
    * `counterTtlMs` of user inactivity (second timeout), bounding state
    * size at 100 TB: an idx restart then requires a user silent for the
    * whole TTL.
    */
  def sessionizeStream(spark: SparkSession, events: DataFrame, gapMs: Long = 30L * 60 * 1000,
                       counterTtlMs: Long = 24L * 3600 * 1000): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", "1 minute")
      .select(col("user_id"), col("ts"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessTracker, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, evs, state: GroupState[SessTracker]) =>
          if (state.hasTimedOut) {
            val t = state.getOption.getOrElse(SessTracker(0, Nil))
            if (t.open.isEmpty) {
              // second timeout with nothing open: drop the counter
              state.remove()
              Iterator.empty
            } else {
              // watermark passed the open session's gap window: flush it,
              // keep the counter alive for counterTtlMs
              val out = t.open.map(s => SessionOut(uid, s.idx, s.start, s.end, s.n, s.sum))
              state.update(SessTracker(t.open.map(_.idx).max, Nil))
              state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + counterTtlMs)
              out.iterator
            }
          } else {
            val sorted = evs.toSeq.sortBy(e => (e.ts_ms, e.value))
            var t = state.getOption.getOrElse(SessTracker(0, Nil))
            var closed = List.empty[SessionOut]
            for (e <- sorted) {
              t.open match {
                case cur :: _ if e.ts_ms - cur.end <= gapMs =>
                  t = t.copy(open = cur.copy(
                    start = math.min(cur.start, e.ts_ms),
                    end = math.max(cur.end, e.ts_ms),
                    n = cur.n + 1, sum = cur.sum + e.value) :: Nil)
                case cur :: _ =>
                  closed = SessionOut(uid, cur.idx, cur.start, cur.end, cur.n, cur.sum) :: closed
                  t = SessTracker(cur.idx, SessionState(e.ts_ms, e.ts_ms, 1, e.value, cur.idx + 1) :: Nil)
                case Nil =>
                  t = t.copy(open = SessionState(e.ts_ms, e.ts_ms, 1, e.value, t.lastIdx + 1) :: Nil)
              }
            }
            state.update(t)
            t.open.headOption.foreach(cur => state.setTimeoutTimestamp(cur.end + gapMs))
            closed.reverseIterator
          }
      }
  }

  /** Streaming funnel-stage counts (update mode) — the streaming analog
    * of the reference's hourly admissions refresh feeding
    * admissions_funnel (ref: defs/schedules/defs.yaml
    * admissions_hourly_refresh + gold defs.yaml:91).
    */
  def funnelCounts(events: DataFrame): DataFrame =
    events
      .groupBy(graft.operators.Conform.funnelStage(col("event_type")).as("funnel_stage"))
      .agg(count(lit(1)).as("n"), graft.functions.Money.msum(col("value")).as("total_value"))

  /** Streaming gold refresh: each micro-batch's changed hourly windows
    * MERGE into a lake gold table keyed on (bucket_ms, event_type) —
    * the incremental analog of the reference's admissions_hourly_refresh
    * schedule recomputing its gold model (ref: defs/schedules/defs.yaml).
    *
    * Update mode emits a window's full new aggregate whenever a batch
    * touches it, and the keyed MERGE replaces that row in the table, so
    * replaying a batch after a failure converges to the same table
    * state (idempotent upsert = effectively exactly-once), and a query
    * restarted from its checkpoint continues without recomputing old
    * windows. Only files holding updated windows are rewritten
    * (file-granular copy-on-write), not the whole gold table.
    */
  def windowedGoldToLake(spark: SparkSession, events: DataFrame,
                         table: String, checkpoint: String): StreamingQuery =
    windowedCounts(events).writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val b = batch.persist()
        try {
          if (b.count() > 0) {
            if (LakeTable.latestSnapshot(spark, table).isEmpty)
              LakeTable.overwrite(spark, table, b.toDF())
            else
              LakeTable.merge(spark, table, b.toDF(), Seq("bucket_ms", "event_type"))
          }
        } finally b.unpersist()
        ()
      }
      .start()

  def runToMemorySink(df: DataFrame, name: String, mode: String = "append"): Unit = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
  }
}
