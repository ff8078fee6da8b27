package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Money.{msum, rnd}

/** Event-stream analytics in batch form. The reference's S3 sensors +
  * hourly admissions refresh (ref: s3_data_landing_component.py sensors;
  * defs/schedules/defs.yaml) map to Structured Streaming; these are the
  * batch mirrors of those pipelines (the streaming versions live in
  * graft.streaming.EventStreams and are spec-verified against these).
  *
  * Timestamps are emitted as epoch milliseconds (BIGINT) so results are
  * representation-stable across engines.
  */
object Events {

  /** JSON property extraction from the events.props payload column. */
  def eventsJson(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        rnd(sum(col("k")) / count(col("k")), 4).as("avg_k"))
  }

  /** Distribution statistics per event type: exact percentiles (median,
    * p90), min/max, exact distinct users. Exact `percentile` (not
    * approx_percentile) so the oracle can replay it; at 100 TB swap in
    * approx_percentile/HLL for one-pass sketching.
    */
  def eventsStats(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("distinct_users"),
        rnd(expr("percentile(value, 0.5)"), 4).as("median_value"),
        rnd(expr("percentile(value, 0.9)"), 4).as("p90_value"),
        rnd(min("value"), 4).as("min_value"),
        rnd(max("value"), 4).as("max_value"))
  }

  /** Sketch-based approximate statistics — the one-pass scale path for
    * eventsStats (HLL distinct counts, quantile sketches). No SQL
    * oracle (sketch internals are engine-specific); the spec bounds the
    * error against the exact version.
    */
  def eventsApprox(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        approx_count_distinct(col("user_id")).as("approx_users"),
        round(expr("approx_percentile(value, 0.5, 1000)"), 4).as("approx_median"),
        round(expr("approx_percentile(value, 0.9, 1000)"), 4).as("approx_p90"))
  }

  /** Hourly time-bucket aggregation — batch mirror of the watermarked
    * streaming window aggregation.
    */
  def eventsWindowed(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.groupBy(
        unix_millis(date_trunc("hour", col("ts"))).as("bucket_ms"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        msum(col("value")).as("sum_value"))
  }

  /** Gap-based sessionization (30-minute inactivity): lag → boundary
    * flag → running sum = session index → per-session rollup. One
    * shuffle on user_id; all window work is partition-local.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionizeDf(Tables.events(spark, dir)
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"), col("value")))

  /** DataFrame-level sessionization: input (user_id, ts_ms, value). */
  def sessionizeDf(ev: DataFrame, gapMs: Long = 30L * 60 * 1000): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"))
    ev.withColumn("new_session",
        when(col("ts_ms") - lag(col("ts_ms"), 1).over(byUser) > gapMs, 1)
          .otherwise(when(lag(col("ts_ms"), 1).over(byUser).isNull, 1).otherwise(0)))
      .withColumn("session_idx",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("ts_ms")).as("session_start_ms"),
        max(col("ts_ms")).as("session_end_ms"),
        count(lit(1)).as("n_events"),
        msum(col("value")).as("sum_value"))
  }

  /** As-of join: each purchase event matched to the latest prior-or-equal
    * 'view' event of the same user.
    *
    * Spark lacks a native as-of join; rather than a per-key loop this is
    * the scalable union + single-window formulation: tag both sides, sort
    * within user by (ts, side) and carry the last view forward. Exactly
    * one shuffle on user_id, no skew-prone range cross-join.
    * (View ties on (user_id, ts) are pre-reduced to max(event_id) so the
    * match is well-defined.)
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame =
    asofJoinDf(Tables.events(spark, dir))

  /** DataFrame-level as-of join: input (event_id, user_id, ts, event_type). */
  def asofJoinDf(ev: DataFrame): DataFrame = {
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), unix_millis(col("ts")).as("ts_ms"))
      .agg(max(col("event_id")).as("event_id"))
      .select(col("user_id"), col("ts_ms"), col("event_id"), lit(0).as("side"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"), col("event_id"), lit(1).as("side"))

    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    views.unionByName(purchases)
      .withColumn("view_event_id",
        last(when(col("side") === 0, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("view_ts_ms",
        last(when(col("side") === 0, col("ts_ms")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(
        col("event_id").as("purchase_event_id"),
        col("user_id"),
        col("ts_ms").as("purchase_ts_ms"),
        col("view_event_id"),
        col("view_ts_ms"),
        (col("ts_ms") - col("view_ts_ms")).as("gap_ms"))
  }

  /** Range join: each purchase joined to ALL same-user views in the
    * preceding `windowMs` (inclusive both ends), aggregated to a
    * per-purchase count + nearest gap.
    */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame =
    rangeJoinDf(Tables.events(spark, dir))

  /** Bin-bucketed range join. A naive `ON user AND v.ts BETWEEN p.ts-w
    * AND p.ts` plans as BroadcastNestedLoopJoin — O(left × right) per
    * user and a driver OOM at scale. Instead each view is keyed by its
    * time bin (`ts div w` — integer division, no float boundary risk)
    * and each purchase probes the ≤2 bins its window can overlap
    * (exploded, deduped), so the join is a plain shuffled EQUI-join on
    * (user_id, bin) with the BETWEEN as residual condition — Catalyst
    * extracts the equi keys and plans SortMergeJoin (spec-asserted).
    * Each (purchase, view) pair meets exactly once: a view has ONE
    * bin and the purchase probes distinct bins. The range predicate
    * rides IN the join condition (not a post-filter) so LEFT-join
    * semantics hold: zero-view purchases keep one null row and count
    * to 0. Work is proportional to pairs sharing a (user, bin) —
    * shuffle-on-key, skew bounded by events per user per window.
    */
  def rangeJoinDf(ev: DataFrame, windowMs: Long = 3600000L): DataFrame = {
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), unix_millis(col("ts")).as("v_ts"))
      .withColumn("v_bin", expr(s"v_ts div ${windowMs}L"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_event_id"), col("user_id"),
        unix_millis(col("ts")).as("purchase_ts_ms"))
      .withColumn("p_bin", explode(array_distinct(array(
        expr(s"(purchase_ts_ms - ${windowMs}L) div ${windowMs}L"),
        expr(s"purchase_ts_ms div ${windowMs}L")))))
    val joined = p.join(v,
      col("user_id") === col("v_user") && col("p_bin") === col("v_bin") &&
        col("v_ts") >= col("purchase_ts_ms") - windowMs &&
        col("v_ts") <= col("purchase_ts_ms"), "left")
    joined.groupBy(col("purchase_event_id"), col("user_id"), col("purchase_ts_ms"))
      .agg(count(col("v_ts")).as("views_in_window"),
        min(col("purchase_ts_ms") - col("v_ts")).as("nearest_gap_ms"))
  }
}
